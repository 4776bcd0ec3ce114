package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graftbridge.StreamingBridge
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.catalog.SnapshotTable

/** CDC changelog as a STREAMING source — the Delta CDF read shape for
  * [[graft.catalog.SnapshotTable]]:
  *
  * {{{
  *   spark.readStream.format("graft")
  *     .option("changesFrom", 3)        // omitted = current version
  *     .load("/warehouse/events")
  * }}}
  *
  * The stream's offset IS the table version: `getOffset` polls the
  * snapshot log (a driver-side metadata read, no data I/O) and each
  * micro-batch materializes `SnapshotTable.changes(lastSeen, latest)`
  * — `_change_type ∈ {insert, delete}` plus the table columns. A live
  * training pipeline consumes upserts/deletes incrementally without
  * polling versions itself, and restart-safety falls out of the
  * checkpoint log replaying version ranges (`changes` is deterministic
  * for a committed range, and expired intermediates degrade to the
  * catch-up diff path, never wrong results).
  *
  * Batches-per-commit: one trigger drains TO THE LATEST version, so
  * commits that land between triggers coalesce into one netted batch —
  * the multiset netting (delete + identical re-append cancels) keeps
  * that coalescing semantically transparent to an upsert consumer.
  *
  * The column set is PINNED at stream start (the declared source
  * schema): if the table evolves mid-stream, later batches conform to
  * the pinned columns — added columns are ignored until restart,
  * renamed-away columns null-fill — matching Structured Streaming's
  * fixed-schema-per-run contract rather than failing the query.
  *
  * Restart safety: the resolved base version is persisted under the
  * query's `metadataPath` on FIRST start (atomic create-if-absent,
  * same contract as the snapshot log). Without this, a restarted query
  * whose first batch never committed would re-resolve "current
  * version" against the LIVE table — which may have advanced past the
  * already-planned end offset — and silently skip commits.
  */
final class GraftChangesSource(
    sqlContext: SQLContext,
    root: String,
    startFrom: Option[Long],
    metadataPath: String) extends Source {

  private val spark = sqlContext.sparkSession

  /** Reloaded per call: the snapshot LOG is the stream's upstream, and
    * loads are metadata-sized.
    */
  private def table: SnapshotTable = SnapshotTable.load(spark, root)

  /** Versions ≤ base are history the stream does not replay; the first
    * batch covers (base, firstSeenLatest]. Resolved ONCE per query
    * lifetime via the metadataPath pin (see class scaladoc).
    */
  private val base: Long = {
    val conf = spark.sessionState.newHadoopConf()
    val pin = new org.apache.hadoop.fs.Path(metadataPath, "graft-base")
    val fs = pin.getFileSystem(conf)
    if (fs.exists(pin)) {
      val in = fs.open(pin)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    } else {
      val t = table
      val v = startFrom.getOrElse(t.currentVersion())
      require(t.log.versions().contains(v),
        s"changesFrom version $v does not exist at $root " +
          s"(versions: ${t.log.versions().mkString(", ")})")
      fs.mkdirs(pin.getParent)
      val out = fs.create(pin, false)
      try out.write(v.toString.getBytes("UTF-8")) finally out.close()
      v
    }
  }

  override val schema: StructType =
    GraftChangesSource.changeSchema(table.schemaAt(None))

  override def getOffset: Option[Offset] = {
    val v = table.currentVersion()
    if (v <= base) None else Some(LongOffset(v))
  }

  private def version(o: Offset): Long = o match {
    case LongOffset(v) => v
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val fromV = start.map(version).getOrElse(base)
    val toV = version(end)
    val changes = table.changes(fromV, toV)
    // conform to the pinned stream schema (see scaladoc): project the
    // declared columns, null-filling any the evolved table lost
    val conformed = changes.select(schema.fields.toIndexedSeq.map { f =>
      if (changes.columns.contains(f.name))
        col(SnapshotTable.quoted(f.name)).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
    StreamingBridge.asStreaming(sqlContext, conformed)
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftChangesSource[$root, from=$base]"
}

object GraftChangesSource {
  /** `_change_type` + the table columns — identical to the batch
    * changelog relation's shape.
    */
  def changeSchema(tableSchema: StructType): StructType =
    StructType(StructField("_change_type", StringType,
      nullable = false) +: tableSchema.fields)
}
