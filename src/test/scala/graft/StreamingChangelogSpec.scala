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

  test("maxVersionsPerTrigger drains a backlog in bounded batches, isolating a compaction") {
    val base = Files.createTempDirectory("graft-stream-chg-bounded")
    val root = base.resolve("t").toString
    val tbl = SnapshotTable.create(spark, root, schema, None)   // v1
    tbl.append(rows(1L -> 1.0, 2L -> 2.0))                      // v2
    tbl.append(rows(3L -> 3.0, 4L -> 4.0))                      // v3
    tbl.deleteByKeys(rows(1L -> 0.0).select("id"), Seq("id"))   // v4 (blind)
    tbl.compact(targetRowsPerFile = 10L)                        // v5 (rewrite)
    tbl.append(rows(5L -> 5.0, 6L -> 6.0))                      // v6
    assert(tbl.currentVersion() == 6L)

    // per-batch capture: the backlog must arrive in SEVERAL batches,
    // each spanning at most 2 commits, with the compaction alone
    val batches = ArrayBuffer.empty[List[(String, Long, Double)]]
    val q = spark.readStream.format("graft")
      .option("changesFrom", "1")
      .option("maxVersionsPerTrigger", "2")
      .load(root)
      .writeStream
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = df.select(col("_change_type"), col("id"), col("v"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        batches.synchronized { batches += got.toList.sorted }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val seen = batches.synchronized(batches.toList)
    // (1,3] blind prefix | (3,4] blind capped at 2-but-rewrite-next |
    // (4,5] the compaction alone (no net change) | (5,6]
    assert(seen.size == 4, s"expected 4 bounded batches, got: $seen")
    assert(seen(0) == List(("insert", 1L, 1.0), ("insert", 2L, 2.0),
      ("insert", 3L, 3.0), ("insert", 4L, 4.0)))
    assert(seen(1) == List(("delete", 1L, 1.0)))
    assert(seen(2) == Nil, s"a compaction batch must net to zero: ${seen(2)}")
    assert(seen(3) == List(("insert", 5L, 5.0), ("insert", 6L, 6.0)))
    // net-equivalence with the coalesced one-shot changelog
    val applied = scala.collection.mutable.Map.empty[Long, Double]
    seen.flatten.foreach {
      case ("insert", id, v) => applied(id) = v
      case ("delete", id, _) => applied.remove(id)
      case other => fail(s"unexpected change row $other")
    }
    val oneShot = tbl.changes(1L, 6L)
      .select(col("_change_type"), col("id"), col("v")).collect()
    val appliedOneShot = scala.collection.mutable.Map.empty[Long, Double]
    oneShot.foreach { r =>
      if (r.getString(0) == "insert") appliedOneShot(r.getLong(1)) = r.getDouble(2)
      else appliedOneShot.remove(r.getLong(1))
    }
    assert(applied.toMap == appliedOneShot.toMap)
    assert(applied.keySet == Set(2L, 3L, 4L, 5L, 6L))
  }

  test("an unbounded stream still splits a rewriting commit from blind neighbors") {
    val base = Files.createTempDirectory("graft-stream-chg-split")
    val root = base.resolve("t").toString
    val tbl = SnapshotTable.create(spark, root, schema, None)   // v1
    tbl.append(rows(1L -> 1.0))                                 // v2
    tbl.append(rows(3L -> 3.0))                                 // v3
    tbl.compact(targetRowsPerFile = 10L)                        // v4 (rewrite)
    tbl.append(rows(2L -> 2.0))                                 // v5
    assert(tbl.currentVersion() == 5L,
      s"compaction must have committed, at v${tbl.currentVersion()}")

    val batches = ArrayBuffer.empty[Int]
    val q = spark.readStream.format("graft")
      .option("changesFrom", "1")
      .load(root)
      .writeStream
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.synchronized { batches += df.count().toInt }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    // (1,3] blind prefix | (3,4] compaction alone | (4,5] blind — NOT
    // one giant diff batch over the whole range
    assert(batches.synchronized(batches.toList) == List(2, 0, 1),
      s"got ${batches.synchronized(batches.toList)}")
  }

  test("expiry between offset planning and batch materialization degrades to the endpoint diff") {
    import graft.streaming.GraftChangesSource
    val base = Files.createTempDirectory("graft-stream-chg-expire")
    val root = base.resolve("t").toString
    val tbl = SnapshotTable.create(spark, root, schema, None)   // v1
    tbl.append(rows(1L -> 1.0, 2L -> 2.0))                      // v2
    tbl.tag("consumer-base")        // protect the stream's base version
    tbl.append(rows(3L -> 3.0))                                 // v3
    tbl.deleteByKeys(rows(1L -> 0.0).select("id"), Seq("id"))   // v4
    tbl.append(rows(4L -> 4.0))                                 // v5
    tbl.append(rows(5L -> 5.0))                                 // v6

    // drive the Source API directly to force the race deterministically
    val src = new GraftChangesSource(spark.sqlContext, root, Some(2L),
      base.resolve("meta").toString)
    val end = src.getOffset.get
    // expiry lands BETWEEN getOffset and getBatch: keep=2 retains
    // v5,v6 + the tagged v2; intermediates v3,v4 vanish
    tbl.expireSnapshots(keep = 2)
    assert(tbl.log.versions() == Seq(2L, 5L, 6L))
    // batch planning (classification + endpoint reads — the failure
    // point) must succeed; the streaming-flagged result can't collect
    // outside a query, so values assert through the same changes() call
    val batch = src.getBatch(None, end)
    assert(batch.schema.fieldNames.head == "_change_type")
    val endV = end.json.trim.toLong
    val got = tbl.changes(2L, endV)
      .select(col("_change_type"), col("id"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sorted.toList
    // classification of the expired intermediates is impossible → the
    // endpoint diff serves the range, net-exact: (v2 → v6)
    assert(got == List(("delete", 1L, 1.0), ("insert", 3L, 3.0),
      ("insert", 4L, 4.0), ("insert", 5L, 5.0)), got)

    // an expired ENDPOINT has no sound diff semantics: clear guidance,
    // not a raw FileNotFoundException
    val e = intercept[IllegalStateException](tbl.changes(3L, 6L).collect())
    assert(e.getMessage.contains("EXPIRED"), e.getMessage)
    assert(e.getMessage.contains("tag"), e.getMessage)
  }

  test("mid-downtime schema evolution: restart picks up the new column, old rows null-fill") {
    val base = Files.createTempDirectory("graft-stream-chg-evolve")
    val root = base.resolve("t").toString
    val ckpt = base.resolve("ckpt").toString
    val tbl = SnapshotTable.create(spark, root, schema, None)   // v1
    tbl.append(rows(1L -> 1.0))                                 // v2

    // run 1: pinned schema is (id, v)
    val run1 = ArrayBuffer.empty[(String, Long, Double)]
    val q1 = startDrain(root, ckpt, run1, changesFrom = Some(1L))
    try q1.processAllAvailable() finally q1.stop()
    run1.synchronized(run1.toList) shouldBe List(("insert", 1L, 1.0))

    // while DOWN: an evolving append adds column w…
    val evolved = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(2L, 2.0, "x")), 1),
      StructType(schema.fields :+ StructField("w", org.apache.spark.sql.types.StringType)))
    tbl.append(evolved)                                          // v3
    // …and a later old-shape append leaves w null
    tbl.append(rows(3L -> 3.0))                                  // v4

    // run 2 re-derives the pinned schema at start: w is now visible,
    // old-shape rows null-filled
    val run2 = ArrayBuffer.empty[(String, Long, Double, Option[String])]
    val q2 = spark.readStream.format("graft").load(root)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = df.select(col("_change_type"), col("id"), col("v"), col("w"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
            Option(r.getString(3))))
        run2.synchronized { run2 ++= got }
        ()
      }
      .start()
    try q2.processAllAvailable() finally q2.stop()
    run2.synchronized(run2.sorted.toList) shouldBe List(
      ("insert", 2L, 2.0, Some("x")), ("insert", 3L, 3.0, None))
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

  test("applyChangesToSnapshotTable converges a replica through inserts, updates and deletes") {
    val base = Files.createTempDirectory("graft-apply-chg-unit")
    val srcRoot = base.resolve("src").toString
    val tgtRoot = base.resolve("tgt").toString
    val src = SnapshotTable.create(spark, srcRoot, schema, None)
    src.append(rows(1L -> 1.0, 2L -> 2.0, 3L -> 3.0))          // v2
    src.upsert(rows(2L -> 20.0, 4L -> 4.0), Seq("id"))          // v3
    src.deleteByKeys(rows(3L -> 3.0).select("id"), Seq("id"))   // v4
    SnapshotTable.create(spark, tgtRoot, schema, None)
    val changes = spark.readStream.format("graft")
      .option("changesFrom", "1").option("maxVersionsPerTrigger", "1")
      .load(srcRoot)
    val q = graft.streaming.EventStream.applyChangesToSnapshotTable(
      changes, tgtRoot, Seq("id"), base.resolve("ckpt").toString)
    try q.processAllAvailable() finally q.stop()
    val tgt = SnapshotTable.load(spark, tgtRoot)
    def state(t: SnapshotTable) = t.read().collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    state(tgt) shouldBe Map(1L -> 1.0, 2L -> 20.0, 4L -> 4.0)
    state(tgt) shouldBe state(src)
    // at-least-once replay: re-applying the final delete batch and the
    // final upsert batch moves nothing
    tgt.deleteByKeys(rows(3L -> 3.0).select("id"), Seq("id"))
    tgt.upsert(rows(2L -> 20.0, 4L -> 4.0), Seq("id"))
    state(tgt) shouldBe Map(1L -> 1.0, 2L -> 20.0, 4L -> 4.0)
    // the source keeps moving: a second drain from the SAME checkpoint
    // picks up only the new commits
    src.append(rows(9L -> 9.0))                                  // v5
    val q2 = graft.streaming.EventStream.applyChangesToSnapshotTable(
      spark.readStream.format("graft").option("changesFrom", "1")
        .option("maxVersionsPerTrigger", "1").load(srcRoot),
      tgtRoot, Seq("id"), base.resolve("ckpt").toString)
    try q2.processAllAvailable() finally q2.stop()
    state(SnapshotTable.load(spark, tgtRoot)) shouldBe
      Map(1L -> 1.0, 2L -> 20.0, 4L -> 4.0, 9L -> 9.0)
  }

  test("writeStream.format(graft): exactly-once append, restart skips committed batches") {
    val base = java.nio.file.Files.createTempDirectory("graft-sink")
    val root = base.resolve("t").toString
    val srcDir = base.resolve("src").toString
    val ckpt = base.resolve("ckpt").toString
    SnapshotTable.create(spark, root, schema, None)
    rows((1L, 1.0), (2L, 2.0)).coalesce(1).write.parquet(s"$srcDir/f1")
    rows((3L, 3.0)).coalesce(1).write.parquet(s"$srcDir/f2")
    def start() = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$srcDir/*")
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .start(root)
    val q = start()
    try q.processAllAvailable() finally q.stop()
    val t = SnapshotTable.load(spark, root)
    assert(t.read().count() == 3L)
    assert(t.history().count(_.operation.startsWith("stream-append")) == 2,
      t.history().map(_.operation))
    // restart from the same checkpoint: committed batches do not
    // re-trigger; a NEW file commits exactly one more batch
    rows((4L, 4.0)).coalesce(1).write.parquet(s"$srcDir/f3")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val t2 = SnapshotTable.load(spark, root)
    assert(t2.read().count() == 4L)
    assert(t2.history().count(_.operation.startsWith("stream-append")) == 3)
  }

  test("writeStream.format(graft) with keys: CDC update mode routes MoR per table property") {
    val base = java.nio.file.Files.createTempDirectory("graft-sink-keys")
    val root = base.resolve("t").toString
    val srcDir = base.resolve("src").toString
    val ckpt = base.resolve("ckpt").toString
    val t0 = SnapshotTable.create(spark, root, schema, None,
      properties = Map("graft.merge.mode" -> "merge-on-read"))
    t0.append(rows((1L, 1.0), (2L, 2.0)))
    val preFiles = t0.currentSnapshot().files.map(_.path).toSet
    rows((1L, 10.0), (5L, 5.0)).coalesce(1).write.parquet(s"$srcDir/f1")
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$srcDir/*")
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .option("keys", "id")
      .outputMode("update")
      .start(root)
    try q.processAllAvailable() finally q.stop()
    val t = SnapshotTable.load(spark, root)
    import spark.implicits._
    assert(t.read().select("id", "v").as[(Long, Double)].collect().toMap ==
      Map(1L -> 10.0, 2L -> 2.0, 5L -> 5.0))
    val cur = t.currentSnapshot()
    assert(cur.operation == "merge-pos", cur.operation)
    assert(preFiles.subsetOf(cur.files.map(_.path).toSet) &&
      cur.dvFiles.nonEmpty, "keyed sink on a MoR table must not rewrite")
  }

  test("graft sink rejects Complete mode, keyless Update, and partitionBy") {
    val base = java.nio.file.Files.createTempDirectory("graft-sink-rej")
    val root = base.resolve("t").toString
    SnapshotTable.create(spark, root, schema, None)
    val emptyDir = base.resolve("empty-src").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(emptyDir))
    val src = spark.readStream.schema(schema).parquet(emptyDir)
    def fails(b: => org.apache.spark.sql.streaming.StreamingQuery,
        frag: String): Unit = {
      val e = intercept[Exception](b)
      val msg = Option(e.getMessage).getOrElse("") +
        Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
      assert(msg.contains(frag), s"wanted '$frag' in: $msg")
    }
    fails(src.groupBy().count().writeStream.format("graft")
      .option("checkpointLocation", base.resolve("c1").toString)
      .outputMode("complete").start(root), "Complete mode")
    fails(src.writeStream.format("graft")
      .option("checkpointLocation", base.resolve("c2").toString)
      .outputMode("update").start(root), "keys")
    fails(src.writeStream.format("graft")
      .option("checkpointLocation", base.resolve("c3").toString)
      .partitionBy("id").start(root), "partition")
    // keys under Append must refuse, not silently upsert (ADVICE r14):
    // Append's batch-id exactly-once dedup and append-only contract
    // would be lost for a user who forgot outputMode("update")
    fails(src.writeStream.format("graft")
      .option("checkpointLocation", base.resolve("c4").toString)
      .option("keys", "id").start(root), "Update mode")
  }

  test("Trigger.AvailableNow drains the backlog in bounded batches and stops") {
    val base = Files.createTempDirectory("graft-stream-an")
    val root = base.resolve("t").toString
    val tbl = SnapshotTable.create(spark, root, schema, None)
    (1 to 6).foreach(i => tbl.append(rows(i.toLong -> i.toDouble)))

    // batch-mode CDC catch-up (the production shape: a cron'd job that
    // drains everything committed so far, then EXITS): replay from v1,
    // admission-capped to 2 versions per batch — AvailableNow must
    // still deliver the WHOLE backlog across multiple batches, then
    // terminate on its own
    val sink = ArrayBuffer.empty[(String, Long, Double)]
    var batches = 0
    val q = spark.readStream.format("graft")
      .option("changesFrom", "1")
      .option("maxVersionsPerTrigger", "2")
      .load(root)
      .writeStream
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = df.select(col("_change_type"), col("id"), col("v"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        sink.synchronized { sink ++= got; batches += 1 }
        ()
      }
      .start()
    assert(q.awaitTermination(120000), "AvailableNow query must stop itself")
    assert(sink.sortBy(_._2).toSeq ==
      (1 to 6).map(i => ("insert", i.toLong, i.toDouble)))
    assert(batches >= 3, s"2-version cap over 6 commits needs >= 3 " +
      s"batches, got $batches")

    // a commit AFTER the drain is NOT seen by the finished run, but a
    // RESTARTED AvailableNow run picks up exactly the remainder
    tbl.append(rows(7L -> 7.0))
    val sink2 = ArrayBuffer.empty[(String, Long, Double)]
    val q2 = spark.readStream.format("graft")
      .option("changesFrom", "1")
      .load(root)
      .writeStream
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = df.select(col("_change_type"), col("id"), col("v"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        sink2.synchronized { sink2 ++= got }
        ()
      }
      .start()
    assert(q2.awaitTermination(120000))
    assert(sink2.toSeq == Seq(("insert", 7L, 7.0)),
      s"restart must deliver exactly the post-drain commit: $sink2")
  }
}
