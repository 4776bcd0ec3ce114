package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, SupportsReportPartitioning, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.graftbridge.ParquetReadBridge
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** NATIVE DSv2 batch scan for bucket-partitioned snapshot tables — the
  * storage-partitioned-join (SPJ) path. The default read bridges
  * through `V1Scan`, which can never report an `outputPartitioning`,
  * so joining two co-bucketed 100 TB tables shuffles BOTH sides even
  * though their layouts already agree. This scan reports
  * `KeyGroupedPartitioning(bucket(n, source))` with one input
  * partition per live bucket, each carrying its bucket value as the
  * partition key — under `spark.sql.sources.v2.bucketing.enabled`,
  * Spark's `EnsureRequirements` then plans a bucket-aligned join with
  * NO exchange on either side (Iceberg's SPJ architecture; the
  * `bucket` function the comparison resolves against is
  * [[GraftFunctions]], committed round 13 exactly for this seam).
  *
  * Eligibility is decided per scan by [[GraftBatchScan.eligible]] and
  * falls back to the V1 bridge whenever ANY read-time resolution work
  * exists, keeping this path a pure by-name parquet read:
  *
  *  - bucket partition spec, and every file written under it
  *    (`seq >= specSince` — legacy-spec files' partition values mean
  *    something else);
  *  - no positional delete vectors and no equality deletes (MoR
  *    resolution lives on the DataFrame path);
  *  - every file's (name, field-id) pairs equal the snapshot's — no
  *    renamed/dropped/added columns pending, no nested remapping, no
  *    initial-defaults to synthesize (int→long / float→double widening
  *    is still fine: Spark's vectorized parquet reader upcasts);
  *  - no metadata columns requested (row-level operations keep the
  *    position-aware path);
  *  - the scan's analyzed schema equals the snapshot's (a
  *    concurrently-evolved table falls back to the V1 path, whose
  *    drift guard raises the proper error).
  *
  * Reading reuses Spark's own vectorized parquet reader via
  * [[ParquetReadBridge]] (same decode, rebase and widening rules as
  * every DataFrame read; pushed filters become row-group skips).
  * Filters are skip-only here exactly as on the V1 path — the scan
  * declares every filter residual, Catalyst re-applies them above.
  */
final class GraftBatchScan(
    table: SnapshotTable,
    snap: Snapshot,
    required: StructType,
    filters: Array[Filter],
    bucket: Option[(Int, String)]) extends Scan with Batch
    with SupportsReportStatistics with SupportsReportPartitioning {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftBatchScan(${table.root}" +
      bucket.map { case (n, src) => s", bucket[$n]($src))" }.getOrElse(")")

  // manifest-pruned files, grouped for SPJ by bucket value (None = the
  // null bucket) on bucket tables, one task per file otherwise —
  // computed once per scan: the partitioning report and the input
  // partitions must see the SAME grouping
  private lazy val groups: Array[(Option[Int], Seq[DataFileEntry])] = {
    val kept = table.prunedFiles(snap, filters.toIndexedSeq)
    ScanEvents.record(table.root.toString, kept.size, snap.files.size)
    if (bucket.isDefined)
      kept.groupBy(_.partition.map(_.toInt)).toArray.sortBy(_._1)
    else kept.map(f => (None: Option[Int], Seq(f))).toArray
  }

  override def outputPartitioning(): Partitioning = bucket match {
    case Some((n, src)) =>
      new KeyGroupedPartitioning(
        Array(Expressions.bucket(n, src)), groups.length)
    case None => new UnknownPartitioning(groups.length)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    // manifests carry byte sizes (post-r14 writers); a legacy entry
    // without one costs a single filesystem stat
    lazy val fs = table.root.getFileSystem(
      table.session.sessionState.newHadoopConf())
    groups.map { case (key, entries) =>
      val files = entries.map { e =>
        val p = new Path(table.root, e.path)
        val len =
          if (e.bytes > 0) e.bytes else fs.getFileStatus(p).getLen
        (fs.makeQualified(p).toString, len)
      }
      GraftInputPartition(key, files.toArray): InputPartition
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GraftPartitionReaderFactory(
      ParquetReadBridge.readFunction(
        table.session, snap.schema, required, filters.toIndexedSeq),
      ParquetReadBridge.columnarReadFunction(
        table.session, snap.schema, required, filters.toIndexedSeq))


  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = {
    val rows = groups.map(_._2.map(_.rows).sum).sum
    val width = math.max(1, required.defaultSize)
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(rows * width)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(rows)
    }
  }
}

object GraftBatchScan {

  /** Session kill-switch (default on): `spark.sql.graft.nativeBatchScan`. */
  def enabled(table: SnapshotTable): Boolean =
    table.session.conf.get("spark.sql.graft.nativeBatchScan", "true") == "true"

  /** None = V1 fallback; Some(bucketInfo) = native, where bucketInfo
    * is defined only when the SPJ partitioning report is sound
    * (bucket spec AND every file written under it — legacy-spec
    * files' partition values mean something else; identity/month/
    * unpartitioned tables still read natively, just without a
    * partitioning claim).
    */
  def eligible(table: SnapshotTable, snap: Snapshot, analyzed: StructType,
      required: StructType): Option[Option[(Int, String)]] = {
    val nativeOk = enabled(table) &&
      snap.dvFiles.isEmpty && snap.deleteFiles.isEmpty &&
      snap.files.nonEmpty &&
      snap.files.forall(f =>
        (f.cols.isEmpty || f.cols == snap.ids) &&
        f.nested == snap.nestedIds) &&
      required.fieldNames.forall(!GraftV2Table.MetaCols.contains(_)) &&
      snap.schema == analyzed &&
      snap.schema.fields.forall(f =>
        SnapshotTable.initialDefault(f).isEmpty)
    if (!nativeOk) None
    else Some(snap.spec.collect {
      case PartitionSpec(source, SnapshotTable.BucketXform(n))
          if snap.files.forall(_.seq >= snap.specSince) =>
        (n.toInt, source)
    })
  }
}

/** One bucket's files; `partitionKey` is the bucket value Spark groups
  * and aligns on (null row field = the null bucket).
  */
final case class GraftInputPartition(bucket: Option[Int],
    files: Array[(String, Long)]) extends InputPartition
    with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucket.map(Int.box).orNull))
}

final case class GraftPartitionReaderFactory(
    readFile: PartitionedFile => Iterator[InternalRow],
    readColumnar: Option[PartitionedFile =>
      Iterator[org.apache.spark.sql.vectorized.ColumnarBatch]])
    extends PartitionReaderFactory {

  /** Uniform per scan (Spark requires it): batches whenever the
    * projection is vectorizable — BatchScanExec then plans a COLUMNAR
    * scan and whole-stage codegen reads the vectors directly instead
    * of row-at-a-time.
    */
  override def supportColumnarReads(p: InputPartition): Boolean =
    readColumnar.isDefined

  /** Chained per-file reader; record-reader cleanup rides the task
    * completion listener the parquet bridge registers.
    */
  private def chain[T](p: InputPartition,
      open: PartitionedFile => Iterator[T]): PartitionReader[T] = {
    val gp = p.asInstanceOf[GraftInputPartition]
    new PartitionReader[T] {
      private val files = gp.files.iterator
      private var current: Iterator[T] = Iterator.empty
      private var value: T = _

      override def next(): Boolean = {
        while (!current.hasNext && files.hasNext) {
          val (path, len) = files.next()
          current = open(ParquetReadBridge.wholeFile(path, len))
        }
        if (current.hasNext) { value = current.next(); true } else false
      }
      override def get(): T = value
      override def close(): Unit = ()
    }
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    chain(p, readFile)

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    chain(p, readColumnar.getOrElse(sys.error(
      "columnar reader requested but unsupported for this projection")))
}
