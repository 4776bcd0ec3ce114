package graft

import java.nio.file.Files

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.catalog.SnapshotTable

/** The CDC changelog as a STREAMING source (`readStream.format("graft")`)
  * — one offset per table version, each micro-batch =
  * `SnapshotTable.changes(lastSeen, latest)`.
  */
class StreamingChangelogSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSparkSession.spark

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", DoubleType, nullable = true)))

  private def rows(ids: (Long, Double)*) = {
    val data = ids.map { case (i, v) => Row(i, v) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data, 1), schema)
  }

  /** Drain-to-buffer sink: foreachBatch (checkpoint-compatible, unlike
    * the memory sink) appending (change_type, id, v) triples.
    */
  private def startDrain(root: String, ckpt: String,
      sink: ArrayBuffer[(String, Long, Double)],
      changesFrom: Option[Long] = None) = {
    val reader = spark.readStream.format("graft")
    changesFrom.foreach(v => reader.option("changesFrom", v.toString))
    reader.load(root)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = df.select(col("_change_type"), col("id"), col("v"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        sink.synchronized { sink ++= got }
        ()
      }
      .start()
  }

  test("streams each commit incrementally: appends then delete retractions") {
    val base = Files.createTempDirectory("graft-stream-chg")
    val root = base.resolve("t").toString
    val tbl = SnapshotTable.create(spark, root, schema, None)
    tbl.append(rows(1L -> 1.0, 2L -> 2.0, 3L -> 3.0)) // history (pre-stream)

    val sink = ArrayBuffer.empty[(String, Long, Double)]
    val q = startDrain(root, base.resolve("ckpt").toString, sink)
    try {
      q.processAllAvailable()
      // changesFrom omitted = only commits AFTER stream start
      sink.synchronized(sink.toList) shouldBe empty

      tbl.append(rows(6L -> 6.0, 7L -> 7.0))
      q.processAllAvailable()
      sink.synchronized(sink.sorted.toList) shouldBe List(
        ("insert", 6L, 6.0), ("insert", 7L, 7.0))

      sink.synchronized(sink.clear())
      tbl.deleteByKeys(rows(1L -> 0.0).select("id"), Seq("id"))
      q.processAllAvailable()
      sink.synchronized(sink.sorted.toList) shouldBe List(
        ("delete", 1L, 1.0))
    } finally q.stop()
  }

  test("changesFrom replays history from a pinned version, netted") {
    val base = Files.createTempDirectory("graft-stream-chg-replay")
    val root = base.resolve("t").toString
    val tbl = SnapshotTable.create(spark, root, schema, None)
    tbl.append(rows(1L -> 1.0, 2L -> 2.0))                 // v2
    val v2 = tbl.currentVersion()
    tbl.append(rows(3L -> 3.0, 4L -> 4.0))                 // v3
    tbl.deleteByKeys(rows(2L -> 0.0).select("id"), Seq("id")) // v4

    val sink = ArrayBuffer.empty[(String, Long, Double)]
    val q = startDrain(root, base.resolve("ckpt").toString, sink,
      changesFrom = Some(v2))
    try {
      q.processAllAvailable()
      // one netted batch covering (v2, v4]: inserts 3,4 + delete 2
      sink.synchronized(sink.sorted.toList) shouldBe List(
        ("delete", 2L, 2.0), ("insert", 3L, 3.0), ("insert", 4L, 4.0))
    } finally q.stop()
  }

  test("restart resumes from the checkpoint; commits while down are delivered") {
    val base = Files.createTempDirectory("graft-stream-chg-restart")
    val root = base.resolve("t").toString
    val ckpt = base.resolve("ckpt").toString
    val tbl = SnapshotTable.create(spark, root, schema, None)
    tbl.append(rows(1L -> 1.0))

    val sink = ArrayBuffer.empty[(String, Long, Double)]
    val q1 = startDrain(root, ckpt, sink)
    try {
      q1.processAllAvailable()
      tbl.append(rows(2L -> 2.0))
      q1.processAllAvailable()
    } finally q1.stop()
    sink.synchronized(sink.sorted.toList) shouldBe List(("insert", 2L, 2.0))

    // commits landing while the query is DOWN must be delivered on
    // restart — the base version is pinned in the stream's metadata
    // dir, so the restarted source does NOT re-resolve "current" and
    // skip them
    tbl.append(rows(3L -> 3.0))
    sink.synchronized(sink.clear())
    val q2 = startDrain(root, ckpt, sink)
    try q2.processAllAvailable() finally q2.stop()
    sink.synchronized(sink.sorted.toList) shouldBe List(("insert", 3L, 3.0))
  }

  test("rejects user schema, changesTo, and unknown changesFrom versions") {
    val base = Files.createTempDirectory("graft-stream-chg-err")
    val root = base.resolve("t").toString
    val tbl = SnapshotTable.create(spark, root, schema, None)
    tbl.append(rows(1L -> 1.0))

    val userSchema = intercept[Exception] {
      spark.readStream.format("graft").schema(schema).load(root)
    }
    userSchema.getMessage should include("drop .schema")

    // start-time failures surface wrapped in StreamingQueryException —
    // match against the full cause-chain text
    def drainErr(opts: Map[String, String]): String = {
      val t = intercept[Exception] {
        val reader = spark.readStream.format("graft")
        opts.foreach { case (k, v) => reader.option(k, v) }
        val q = reader.load(root).writeStream
          .option("checkpointLocation",
            Files.createTempDirectory("graft-chg-err-ck").toString)
          .format("noop").start()
        try q.processAllAvailable() finally q.stop()
      }
      Iterator.iterate(t: Throwable)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString("\n")
    }
    drainErr(Map("changesTo" -> "3")) should
      include("changesTo only applies")
    drainErr(Map("changesFrom" -> "99")) should
      include("does not exist")
  }
}
