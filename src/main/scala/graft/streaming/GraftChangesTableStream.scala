package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graftbridge.ParquetReadBridge
import org.apache.spark.sql.types.StructType

import graft.catalog.SnapshotTable

/** CDC change feed of a snapshot catalog table as a DSv2 micro-batch
  * stream — `spark.readStream.table("graft.db.\`t#changes\`")`: where
  * the appends-only tail ([[GraftTableStream]]) FAILS on row-changing
  * commits, this stream delivers them as `_change_type ∈ {insert,
  * delete}` rows (updates = delete+insert pairs), the Delta-CDF read
  * shape already served by the V1 `format("graft")
  * .option("changesFrom", …)` source — unified here onto the catalog
  * table surface so a consumer switches between tail and change feed
  * by table name alone.
  *
  * Offsets are table versions (batch = `changes(s, e]`), with the CDC
  * source's admission discipline: a batch coalesces only a CONTIGUOUS
  * run of same-class commits (blind appends drain on the metadata
  * path; a run of rewriting commits diffs its endpoints once), and
  * `maxVersionsPerTrigger` bounds catch-up batches.
  *
  * Replay determinism: each planned batch is STAGED once under the
  * query's checkpoint (`graft-changes-stage/b_<s>_<e>/`, guarded by
  * the parquet `_SUCCESS` marker) and batches replay from those exact
  * bytes — a restart replays identical rows even if the versions the
  * batch diffed have since been expired or compacted away. Committed
  * batches' staging is GC'd on [[commit]]. Staging is BATCH-sized
  * (the change volume, never the table), the same bound the V1
  * source's in-flight batch carries in memory.
  *
  * The column set is pinned at query start (the analyzed `#changes`
  * schema); later batches conform — added columns are ignored until
  * restart, renamed-away columns null-fill (the V1 source's
  * fixed-schema-per-run contract).
  */
final class GraftChangesTableStream(
    table: SnapshotTable,
    pinned: StructType,
    required: StructType,
    checkpointLocation: String,
    startFrom: Option[Long],
    maxVersionsPerTrigger: Option[Long])
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  require(maxVersionsPerTrigger.forall(_ >= 1L),
    s"maxVersionsPerTrigger must be >= 1, got $maxVersionsPerTrigger")

  private def head: Long = table.currentVersion()

  private var fence: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit = { fence = Some(head) }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def reportLatestOffset(): Offset = GraftStreamOffset(head)

  /** Versions ≤ the initial offset are history the stream does not
    * replay (default: changes only AFTER query start — the CDC
    * source's contract; `changesFrom` = v streams changes after v,
    * `earliest` the full history from the create snapshot). The
    * engine checkpoints this before the first batch plans, so restart
    * never re-resolves it against the live table.
    */
  override def initialOffset(): Offset = {
    val base = startFrom.getOrElse(head)
    require(base == 0L || table.log.versions().contains(base),
      s"changesFrom version $base does not exist at ${table.root} " +
        s"(versions: ${table.log.versions().mkString(", ")})")
    GraftStreamOffset(base)
  }

  override def latestOffset(): Offset = GraftStreamOffset(head)

  /** Same-class contiguous-run coalescing under the version cap — the
    * V1 changes source's admission rule ([[GraftChangesSource
    * .getOffset]]): one mid-backlog compaction must not drag blind
    * neighbors onto the endpoint-diff path, and vice versa. Expired
    * versions appear as gaps and isolate their sub-range onto the
    * diff.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[GraftStreamOffset].v
    val bound = fence.map(math.min(_, head)).getOrElse(head)
    if (bound <= s) return GraftStreamOffset(s)
    val live = table.log.versions().filter(v => v > s && v <= bound)
    if (live.isEmpty) return GraftStreamOffset(s)
    val capped = maxVersionsPerTrigger match {
      case Some(m) => live.take(math.min(m, Int.MaxValue.toLong).toInt)
      case None => live
    }
    def isBlind(v: Long): Boolean =
      table.log.operationOf(v).exists(SnapshotTable.isBlindOp)
    var end = capped.head
    var prev = capped.head
    val headClass = isBlind(capped.head)
    var extending = capped.head == s + 1
    val it = capped.iterator.drop(1)
    while (extending && it.hasNext) {
      val v = it.next()
      if (v == prev + 1 && isBlind(v) == headClass) { end = v; prev = v }
      else extending = false
    }
    GraftStreamOffset(end)
  }

  override def deserializeOffset(json: String): Offset =
    GraftStreamOffset(json.trim.toLong)

  private def stageRoot: Path =
    new Path(checkpointLocation, "graft-changes-stage")

  private def stageDir(s: Long, e: Long): Path =
    new Path(stageRoot, s"b_${s}_$e")

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftStreamOffset].v
    val e = end.asInstanceOf[GraftStreamOffset].v
    val fs = stageRoot.getFileSystem(
      table.session.sessionState.newHadoopConf())
    val dir = stageDir(s, e)
    if (!fs.exists(new Path(dir, "_SUCCESS"))) {
      if (fs.exists(dir)) fs.delete(dir, true) // partial prior attempt
      val changes = table.changes(s, e)
      // conform to the pinned stream schema (V1 source contract): cast
      // only on a REAL type change — nullability-only differences need
      // no conversion and Spark refuses such casts
      val conformed = changes.select(pinned.fields.toIndexedSeq.map { f =>
        if (changes.columns.contains(f.name)) {
          val c = col(SnapshotTable.quoted(f.name))
          if (changes.schema(f.name).dataType.sql == f.dataType.sql)
            c.as(f.name)
          else c.cast(f.dataType).as(f.name)
        } else lit(null).cast(f.dataType).as(f.name)
      }: _*)
      conformed.write.mode("overwrite").parquet(dir.toString)
    }
    val sized = fs.listStatus(dir).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
      .map(st => (fs.makeQualified(st.getPath).toString, st.getLen))
    StreamSplits.plan(table.session, sized)
  }

  /** GC staged batches the checkpoint has committed past — their
    * offsets can never replay.
    */
  override def commit(endOffset: Offset): Unit = {
    val committed = endOffset.asInstanceOf[GraftStreamOffset].v
    val fs = stageRoot.getFileSystem(
      table.session.sessionState.newHadoopConf())
    if (fs.exists(stageRoot)) {
      fs.listStatus(stageRoot).foreach { st =>
        st.getPath.getName.split("_") match {
          case Array("b", _, e) if scala.util.Try(e.toLong).toOption
              .exists(_ <= committed) =>
            fs.delete(st.getPath, true)
            ()
          case _ => ()
        }
      }
    }
  }

  override def stop(): Unit = ()

  override def createReaderFactory(): PartitionReaderFactory =
    GraftStreamReaderFactory(IndexedSeq(ParquetReadBridge.readFunction(
      table.session, pinned, required, Nil)))

  override def toString: String =
    s"GraftChangesTableStream[${table.root}]"
}
