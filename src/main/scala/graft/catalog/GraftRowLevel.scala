package graft.catalog

import java.nio.ByteBuffer
import java.util.UUID

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{BindReferences, Expression, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.Project
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expression => VExpression, Expressions, NamedReference, SortDirection, SortOrder => VSortOrder}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{DeltaBatchWrite, DeltaWrite, DeltaWriteBuilder, DeltaWriter, DeltaWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, RowLevelOperation, SupportsDelta, WriterCommitMessage}
import org.apache.spark.sql.connector.write.RowLevelOperation.Command
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.graftbridge.ParquetWriteBridge
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** NATIVE DSv2 row-level operations (`SupportsRowLevelOperations` /
  * `SupportsDelta`) for graft catalog tables: Spark's OWN analyzer
  * rewrites (`RewriteDeleteFromTable` / `RewriteUpdateTable` /
  * `RewriteMergeIntoTable`) plan SQL `DELETE` / `UPDATE` / `MERGE
  * INTO` against `graft.db.t` — full SQL surface, including subqueries
  * in predicates and arbitrary `ON` conditions the injected
  * resolution rule (`graft.plans.GraftSqlDmlRule`, now the DSv1
  * temp-view shim) never supported, plus Spark's built-in MERGE
  * cardinality check.
  *
  * The operation is DELTA-based (merge-on-read): the scan exposes
  * each row's identity as two metadata columns — the data file URI
  * and the row ordinal ([[GraftV2Table.MetaFileCol]] /
  * [[GraftV2Table.MetaPosCol]], served by the same position-aware
  * snapshot read the Scala-API vector paths use) — and the write
  * receives per-row deltas: DELETEs and UPDATEs mark positions into
  * roaring-bitmap delete vectors built EXECUTOR-side, INSERTs and
  * update images stream into parquet data files written EXECUTOR-side
  * through Spark's own parquet factory ([[org.apache.spark.sql
  * .graftbridge.ParquetWriteBridge]]). One atomic commit attaches
  * both ([[SnapshotTable.commitDelta]]). ZERO existing data files are
  * rewritten — the 100 TB shape for CDC-heavy tables, and the native
  * answer to the reference's `optimize_rewrite_delete_file_threshold`
  * knob (`/root/reference/src/utils/spark/spark_utils.py:170`):
  * vector debris is folded by `CALL graft.system.rewrite_dvs` /
  * compaction.
  *
  * Scale posture: DELETE/UPDATE conditions push down to the scan as
  * ordinary v2 filters (manifest stats prune candidate files); MERGE
  * reads the target without file-level runtime pruning (the join
  * filters rows, not files) — the manifest-pruned key-range MERGE
  * remains available through the Scala API and DSv1 views. Positions
  * are valid only against the scanned snapshot: the commit pins the
  * base version and raises [[SnapshotConflictException]] on any
  * concurrent commit.
  */
final class GraftRowLevelOperation(v2: GraftV2Table, cmd: Command)
    extends RowLevelOperation with SupportsDelta {

  /** The version the statement scans AND commits against — captured
    * once, so scan and commit can never observe different file sets.
    * The HEAD, not the published view: row-level writes target the
    * head like every other write verb, so a DML inside an open WAP
    * audit window sees (and edits) the unpublished rows instead of
    * spuriously conflicting at commit.
    */
  private[graft] val baseVersion: Long = v2.table.currentVersion()

  /** The underlying catalog table, for the optimizer's source-derived
    * MERGE pruning ([[graft.plans.GraftMergeSourcePrune]]).
    */
  private[graft] def v2Table: GraftV2Table = v2

  /** Data-file count / properties of the scanned base snapshot — the
    * prune rule's gates, without exposing the snapshot type.
    */
  private[graft] def baseFileCount: Int =
    v2.table.snapshotAt(baseVersion).files.size
  private[graft] def baseProperties: Map[String, String] =
    v2.table.snapshotAt(baseVersion).properties

  override def command(): Command = cmd

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    v2.scanBuilderAt(Some(baseVersion))

  /** The write side: `info.schema()` is the ROW-image projection —
    * the table's columns for UPDATE/MERGE, EMPTY for DELETE (vectors
    * only); `rowIdSchema` is always (file, pos) per [[rowId]].
    */
  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite =
        new GraftDeltaWrite(v2.table, baseVersion, cmd, info.schema())
    }

  override def rowId(): Array[NamedReference] = Array(
    Expressions.column(GraftV2Table.MetaFileCol),
    Expressions.column(GraftV2Table.MetaPosCol))

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array.empty

  override def description(): String =
    s"GraftRowLevelOperation[$cmd, base=v$baseVersion]"
}

/** The delta write: allocates the staging batch directories up front
  * (data files and vector files in SEPARATE batches — the stats
  * read-back must never parse a vector file as data) and builds the
  * serializable writer factory driver-side.
  *
  * `RequiresDistributionAndOrdering` (the knob Iceberg's position-
  * delta write turns, and VERDICT r12's lead item): without it, a
  * MERGE whose images span P partitions across T tasks stages up to
  * T×P small files per statement and each task holds one OPEN parquet
  * writer per partition it encounters. The declared plan instead:
  *
  *  - DELETE (no row images): cluster by the row's data FILE and sort
  *    by (file, pos) — each file's delete bitmap is built by exactly
  *    one task, sequentially, so the commit carries ONE vector entry
  *    per touched file no matter how many scan splits read it.
  *  - UPDATE / MERGE on a partitioned table: cluster by
  *    (partition-transform(row), file) and sort the same way + pos.
  *    Delete deltas project a NULL partition (no row image) → they
  *    cluster per file; INSERT images project a NULL file → they
  *    cluster per partition; UPDATE images keep their source file, so
  *    a partition's updates hash across its (partition, source-file)
  *    groups — keeping `file` in the key is what spreads delete-vector
  *    building AND lets each task close vectors and images together.
  *    ONE open writer per task, so the bound is ≤1 data file per
  *    touched (partition, source-file) pair per statement (≤1 per
  *    partition for pure inserts), a little looser when AQE splits a
  *    skewed cluster — never back to T×P.
  *  - unpartitioned UPDATE / MERGE: ordering only (file, pos) — a
  *    clustered distribution would funnel every insert (NULL file)
  *    into one task; local sort still yields one open writer and
  *    sequential bitmaps, at ≤1 file per task.
  *
  * Partition transforms resolve through the catalog's v2
  * `FunctionCatalog` ([[GraftFunctions]]) — identity clusters on the
  * column itself. `graft.write.distribution-mode=none` (Iceberg's
  * `write.distribution-mode`) opts a table out of the pre-write
  * shuffle (e.g. a CDC stream whose inserts all land in the current
  * month — clustering would serialize them through one task), keeping
  * the local sort.
  */
final class GraftDeltaWrite(table: SnapshotTable, baseVersion: Long,
    cmd: Command, rowSchema: StructType) extends DeltaWrite
    with RequiresDistributionAndOrdering {

  private val base = table.snapshotAt(baseVersion)

  private def fileRef = Expressions.column(GraftV2Table.MetaFileCol)
  private def posRef = Expressions.column(GraftV2Table.MetaPosCol)

  private def partTransforms: Seq[VExpression] =
    base.spec.toSeq.map { ps =>
      ps.transform match {
        case "identity" => Expressions.column(ps.source)
        case "month" => Expressions.apply(GraftFunctions.MonthsName,
          Expressions.column(ps.source))
        case SnapshotTable.BucketXform(n) => Expressions.bucket(n.toInt,
          ps.source)
        case other => throw org.apache.spark.SparkException.internalError(
          s"unknown partition transform '$other' in the manifest of " +
            s"${table.root}")
      }
    }

  /** A bad property value is a USER error surfaced at planning — a
    * structured AnalysisException, not a bare RuntimeException that
    * would fail every DML on the table with an unexplained stack.
    */
  private def distributionMode: String =
    base.properties.getOrElse("graft.write.distribution-mode", "hash") match {
      case m @ ("hash" | "none") => m
      case other => throw new org.apache.spark.sql.AnalysisException(
        "INVALID_CONF_VALUE.REQUIREMENT",
        Map("confValue" -> other,
          "confName" -> "graft.write.distribution-mode",
          "confRequirement" -> ("Use 'hash' (cluster deltas by " +
            "partition/file before the write) or 'none' (local sort " +
            "only) in the table's TBLPROPERTIES.")))
    }

  override def requiredDistribution(): Distribution =
    if (distributionMode == "none") Distributions.unspecified()
    else if (rowSchema.isEmpty) Distributions.clustered(Array(fileRef))
    else if (base.spec.isEmpty) Distributions.unspecified()
    else Distributions.clustered((partTransforms :+ fileRef).toArray)

  override def requiredOrdering(): Array[VSortOrder] = {
    val keys =
      if (rowSchema.isEmpty) Seq(fileRef, posRef)
      else partTransforms ++ Seq(fileRef, posRef)
    keys.map(k => Expressions.sort(k, SortDirection.ASCENDING)).toArray
  }

  /** Advisory, not strict: Spark then plans the clustering as a
    * REBALANCE rather than a hard repartition, so AQE may split one
    * skewed partition's rows across tasks (a few extra files) instead
    * of funnelling a hot partition through a single task — the right
    * trade at 100 TB, where a CDC batch is often 90% one partition.
    * Correctness never depends on the clustering: the writers accept
    * any row order, the distribution only shapes file/vector counts.
    */
  override def distributionStrictlyRequired(): Boolean = false

  override def toBatch: DeltaBatchWrite =
    new GraftDeltaBatchWrite(table, baseVersion, cmd, rowSchema)
}

final class GraftDeltaBatchWrite(table: SnapshotTable, baseVersion: Long,
    cmd: Command, rowSchema: StructType) extends DeltaBatchWrite {

  private def freshRel(): String =
    s"${SnapshotLog.DataDirName}/" +
      UUID.randomUUID().toString.replace("-", "").take(16)

  private val dataRel = freshRel()
  private val dvRel = freshRel()

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DeltaWriterFactory = {
    val spark = table.session
    val base = table.snapshotAt(baseVersion)
    // the partition transform bound to the WRITE schema's ordinals:
    // serialized as a Catalyst expression, projected per-row in the
    // task — identical rendering to stage()'s withColumn, so the
    // hand-laid __graft_p=... directories decode to the same manifest
    // partition values
    // DELETE carries no row images (row schema empty): no partition
    // projection, no data-file factory — the writers only mark vectors
    val partExpr: Option[Expression] =
      if (rowSchema.isEmpty) None
      else base.spec.map { ps =>
        val dummy = spark.createDataFrame(
          java.util.Collections.emptyList[Row](), rowSchema)
        val plan = dummy.select(
          SnapshotTable.partitionExpr(ps, rowSchema, base.properties))
          .queryExecution.analyzed.asInstanceOf[Project]
        BindReferences.bindReference(plan.projectList.head,
          plan.child.output)
      }
    val dataFactory =
      if (rowSchema.isEmpty) None
      else Some(ParquetWriteBridge.writerFactory(spark, rowSchema))
    val dvFactory = ParquetWriteBridge.writerFactory(spark,
      SnapshotTable.DvSchema)
    new GraftDeltaWriterFactory(table.root.toString,
      table.qualifiedRootPath, dataRel, dvRel, rowSchema, partExpr,
      dataFactory, dvFactory,
      BloomSpec.fromProperties(base.properties),
      NdvSpec.fromProperties(base.properties),
      spark.sessionState.conf.sessionLocalTimeZone)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val msgs = messages.toSeq.collect { case m: GraftDeltaCommit => m }
    val dvs = msgs.flatMap(_.dvs)
    // adopt ONLY the files the committed task attempts name — a retried
    // or speculative task's orphans in the batch dir must not be
    // double-counted (removeOrphanFiles reclaims them later). Manifest
    // stats arrive INLINE with the commit messages (computed by the
    // writers as the rows streamed through) — no read-back job.
    val entries = msgs.flatMap(_.entries)
    val op = cmd match {
      case Command.DELETE => "delete-pos"
      case Command.UPDATE => "update-pos"
      case Command.MERGE => "merge-pos"
    }
    table.commitDelta(baseVersion, op,
      if (entries.nonEmpty) Some(dataRel) else None,
      entries.map(_.path), dvs,
      updFiles = msgs.flatMap(_.updFiles).toSet,
      inline = Some(entries))
    ()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // best-effort staging cleanup; removeOrphanFiles reclaims the rest
    val fs = new Path(table.root.toString)
      .getFileSystem(table.session.sessionState.newHadoopConf())
    Seq(dataRel, dvRel).foreach { rel =>
      try fs.delete(new Path(table.root, rel), true)
      catch { case _: java.io.IOException => }
    }
  }
}

/** One task's delta outcome. `dvs` tuples are (vector rel path, total
  * masked positions, covered data paths, op) where op ∈ delete|update
  * — the CDC provenance the labeled change feed serves
  * ([[SnapshotTable.changesCdf]]); `updFiles` names which of
  * `dataFiles` hold UPDATE/MERGE-matched row images rather than
  * genuine inserts.
  */
final case class GraftDeltaCommit(
    dvs: Seq[(String, Long, Seq[String], String)],
    dataFiles: Seq[String],
    updFiles: Seq[String],
    entries: Seq[DataFileEntry] = Nil) extends WriterCommitMessage

final class GraftDeltaWriterFactory(
    rootStr: String,
    rootPathStr: String,
    dataRel: String,
    dvRel: String,
    rowSchema: StructType,
    partExpr: Option[Expression],
    dataFactory: Option[(OutputWriterFactory, SerializableConfiguration)],
    dvFactory: (OutputWriterFactory, SerializableConfiguration),
    bloom: BloomSpec,
    ndv: NdvSpec,
    zoneId: String)
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaWriter(rootStr, rootPathStr, dataRel, dvRel, rowSchema,
      partExpr, dataFactory, dvFactory, partitionId, taskId,
      bloom, ndv, zoneId)
}

/** One task's delta writer: deleted/updated positions accumulate into
  * per-file roaring bitmaps (compressed, KB-sized — never a position
  * LIST), inserted rows and update images stream into ONE open parquet
  * writer — the write's declared ordering ([[GraftDeltaWrite]]) sorts
  * rows by partition value, so when the partition changes the current
  * writer closes before the next opens. Bounded memory regardless of
  * how many partitions a statement touches; an unsorted plan (e.g.
  * `graft.write.distribution-mode=none` with interleaved partitions)
  * still writes correctly, one file per partition RUN. Everything
  * stays inside the task; the commit message carries only file-level
  * metadata.
  */
final class GraftDeltaWriter(
    rootStr: String,
    rootPathStr: String,
    dataRel: String,
    dvRel: String,
    rowSchema: StructType,
    partExpr: Option[Expression],
    dataFactory: Option[(OutputWriterFactory, SerializableConfiguration)],
    dvFactory: (OutputWriterFactory, SerializableConfiguration),
    partitionId: Int,
    taskId: Long,
    bloom: BloomSpec,
    ndv: NdvSpec,
    zoneId: String) extends DeltaWriter[InternalRow] {

  private lazy val fsys = new Path(rootStr).getFileSystem(
    dataFactory.map(_._2).getOrElse(dvFactory._2).value)

  // separate bitmap sets per provenance (r18 CDC update images): a
  // position marked via update() is a superseded pre-image, one marked
  // via delete() is a genuine removal — reads mask both identically,
  // the labeled change feed does not
  private val delBitmaps =
    mutable.HashMap.empty[String, org.roaringbitmap.RoaringBitmap]
  private val updBitmaps =
    mutable.HashMap.empty[String, org.roaringbitmap.RoaringBitmap]

  /** One row-image output lane: its own open writer (keyed by the
    * partition value it serves) and its own file list. Two lanes —
    * genuine inserts vs update images — so a MERGE's mixed actions
    * land in separately-labeled files; memory stays bounded at two
    * open writers regardless of partition count (rows arrive sorted
    * by partition per the declared write ordering).
    */
  private final class Lane(val isUpd: Boolean) {
    var current: Option[(Option[String], OutputWriter)] = None
    private var stats: InlineFileStats = null
    private var currentRel: String = null
    val written = Seq.newBuilder[String]
    val entries = Seq.newBuilder[DataFileEntry]
    def write(row: InternalRow, part: Option[String]): Unit =
      current match {
        case Some((p, w)) if p == part =>
          stats.update(row)
          w.write(row)
        case other =>
          closeCurrent(other.map(c => (c._1, c._2)))
          val (w, rel) = openWriter(part, this)
          current = Some((part, w))
          currentRel = rel
          stats = new InlineFileStats(rowSchema, bloom, ndv, zoneId)
          stats.update(row)
          w.write(row)
      }
    private def closeCurrent(
        c: Option[(Option[String], OutputWriter)]): Unit = c.foreach {
      case (part, w) =>
        w.close()
        // manifest stats computed inline with the write — the commit
        // adopts these entries without any read-back job. Null and
        // empty partition values both live in the default partition.
        entries += DataFileEntry(currentRel,
          part.filter(_.nonEmpty), stats.rows, stats.finish(),
          seq = -1L,
          bytes = fsys.getFileStatus(
            new Path(new Path(rootStr), currentRel)).getLen)
        stats = null
    }
    def close(): Unit = { closeCurrent(current); current = None }
  }
  private val insLane = new Lane(isUpd = false)
  private val updLane = new Lane(isUpd = true)

  private lazy val partProj =
    partExpr.map(e => UnsafeProjection.create(Seq(e)))

  /** Manifest-relative path of a scanned file URI — the same
    * uriPath-decode + root-strip discipline as every vector path.
    */
  private def relOf(uri: String): String = {
    val p = SnapshotTable.uriPath(uri)
    if (p.startsWith(rootPathStr + "/")) p.stripPrefix(rootPathStr + "/")
    else p
  }

  private def mark(bitmaps: mutable.HashMap[String,
      org.roaringbitmap.RoaringBitmap], id: InternalRow): Unit = {
    val rel = relOf(id.getUTF8String(0).toString)
    val pos = id.getLong(1)
    require(pos <= 0xFFFFFFFFL,
      s"row ordinal $pos exceeds the 32-bit vector domain in $rel " +
        "— split the file (compact with a smaller targetRowsPerFile)")
    bitmaps.getOrElseUpdate(rel,
      new org.roaringbitmap.RoaringBitmap()).add(pos.toInt)
  }

  private def partOf(row: InternalRow): Option[String] = partProj match {
    case None => None
    case Some(p) =>
      val r = p(row)
      if (r.isNullAt(0)) None else Some(r.getUTF8String(0).toString)
  }

  override def delete(meta: InternalRow, id: InternalRow): Unit =
    mark(delBitmaps, id)

  override def insert(row: InternalRow): Unit =
    insLane.write(row, partOf(row))

  override def update(meta: InternalRow, id: InternalRow,
      row: InternalRow): Unit = {
    mark(updBitmaps, id)
    updLane.write(row, partOf(row))
  }

  /** The re-insert half of an update Spark chose to represent as
    * delete+reinsert — still an update image, so it rides the update
    * lane (its delete half arrives through [[delete]] in whichever
    * task scanned the row; per-row pairing is not required, only lane
    * labeling — but note [[GraftRowLevelOperation]] keeps the default
    * `representUpdateAsDeleteAndInsert = false`, so this path is
    * currently unreachable and kept for API completeness).
    */
  override def reinsert(meta: InternalRow, row: InternalRow): Unit =
    updLane.write(row, partOf(row))

  private def openWriter(part: Option[String],
      lane: Lane): (OutputWriter, String) = {
    val (factory, conf) = dataFactory.getOrElse(sys.error(
      s"$dataRel: row image arrived for a delete-only write"))
    // Spark's own partition-segment rendering (Hive %XX escaping;
    // null/empty → __HIVE_DEFAULT_PARTITION__), so these directories
    // decode exactly like a partitionBy batch's
    val dirRel = partExpr match {
      case None => dataRel
      case Some(_) => s"$dataRel/" + ExternalCatalogUtils
        .getPartitionPathString(SnapshotTable.PartCol, part.orNull)
    }
    val name = f"part-$partitionId%05d-$taskId-" +
      s"${UUID.randomUUID().toString.replace("-", "").take(8)}.parquet"
    lane.written += s"$dirRel/$name"
    (ParquetWriteBridge.newWriter(factory, conf.value,
      new Path(new Path(rootStr), s"$dirRel/$name").toString, rowSchema),
      s"$dirRel/$name")
  }

  private def writeDv(bitmaps: mutable.HashMap[String,
      org.roaringbitmap.RoaringBitmap], op: String)
      : Seq[(String, Long, Seq[String], String)] =
    if (bitmaps.isEmpty) Nil
    else {
      val (factory, conf) = dvFactory
      val name = f"dv-$op-$partitionId%05d-$taskId.parquet"
      val rel = s"$dvRel/$name"
      val w = ParquetWriteBridge.newWriter(factory, conf.value,
        new Path(new Path(rootStr), rel).toString,
        SnapshotTable.DvSchema)
      var rows = 0L
      val covered = Seq.newBuilder[String]
      bitmaps.foreach { case (dataPath, bm) =>
        bm.runOptimize()
        val buf = new Array[Byte](bm.serializedSizeInBytes())
        bm.serialize(ByteBuffer.wrap(buf))
        w.write(InternalRow(UTF8String.fromString(dataPath), buf,
          bm.getLongCardinality))
        rows += bm.getLongCardinality
        covered += dataPath
      }
      w.close()
      Seq((rel, rows, covered.result(), op))
    }

  override def commit(): WriterCommitMessage = {
    insLane.close()
    updLane.close()
    val updFiles = updLane.written.result()
    GraftDeltaCommit(
      writeDv(delBitmaps, "delete") ++ writeDv(updBitmaps, "update"),
      insLane.written.result() ++ updFiles, updFiles,
      insLane.entries.result() ++ updLane.entries.result())
  }

  override def abort(): Unit = {
    try { insLane.close(); updLane.close() }
    catch { case _: java.io.IOException => }
    // best-effort: drop this attempt's files so the staging dir does
    // not accumulate across retries (the commit-side explicit file
    // list already makes leftovers inert; removeOrphanFiles reclaims
    // whatever survives a crash)
    val conf = dataFactory.map(_._2).getOrElse(dvFactory._2).value
    (insLane.written.result() ++ updLane.written.result()).foreach { rel =>
      try {
        val p = new Path(new Path(rootStr), rel)
        p.getFileSystem(conf).delete(p, false)
        ()
      } catch { case _: java.io.IOException => }
    }
  }

  override def close(): Unit = ()
}
