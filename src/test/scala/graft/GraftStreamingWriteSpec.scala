package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.catalog.SnapshotTable

/** `df.writeStream.toTable("graft.db.t")` — the DSv2 streaming write
  * (GraftStreamingWrite): executors stage partition-routed parquet,
  * each epoch commits one atomic snapshot adopting exactly its commit
  * messages' files, exactly-once under a per-query property.
  */
class GraftStreamingWriteSpec extends AnyFunSuite with Matchers {

  private lazy val spark = TestSparkSession.spark

  private def mk(name: String, extra: String = ""): String = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.probe")
    spark.sql(s"DROP TABLE IF EXISTS graft.probe.$name")
    spark.sql(s"CREATE TABLE graft.probe.$name (id BIGINT, v DOUBLE)$extra")
    s"graft.probe.$name"
  }

  private def insert(t: String, ids: Range): Unit =
    spark.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(1) */ id, " +
      s"CAST(id AS DOUBLE) FROM range(${ids.start}, ${ids.end})")

  private def ids(t: String): Seq[Long] =
    spark.table(t).select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("table-to-table streaming pipeline: tail source, toTable sink, exactly-once restart") {
    val src = mk("sw_src")
    val dst = mk("sw_dst")
    insert(src, 0 until 10)
    val ckpt = Files.createTempDirectory("sw-ckpt").toString
    def run(): Unit = {
      val q = spark.readStream
        .option("streamFrom", "earliest")
        .table(src)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable(dst)
      assert(q.awaitTermination(120000))
    }
    run()
    ids(dst) shouldBe (0L until 10L)
    // restart with the same checkpoint: nothing re-delivers, new
    // source commits flow once
    insert(src, 10 until 20)
    run()
    ids(dst) shouldBe (0L until 20L)
    // each drained version committed as its own stream-append epoch
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val st = SnapshotTable.load(spark, s"$wh/probe/sw_dst")
    val ops = st.history().map(_.operation)
    assert(ops.count(_.startsWith("stream-append[")) >= 2, ops.mkString(", "))
  }

  test("streaming into a hidden-partitioned table records partition values") {
    val src = mk("sw_psrc")
    spark.sql("DROP TABLE IF EXISTS graft.probe.sw_pdst")
    spark.sql("CREATE TABLE graft.probe.sw_pdst (id BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(4, id))")
    insert(src, 0 until 40)
    val q = spark.readStream
      .option("streamFrom", "earliest")
      .table(src)
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("sw-p-ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable("graft.probe.sw_pdst")
    assert(q.awaitTermination(120000))
    ids("graft.probe.sw_pdst") shouldBe (0L until 40L)
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val st = SnapshotTable.load(spark, s"$wh/probe/sw_pdst")
    val parts = st.currentSnapshot().files.flatMap(_.partition).toSet
    assert(parts.size > 1 && parts.forall(p => (0 until 4).map(_.toString)
      .contains(p)), s"bucket values recorded per file, got $parts")
    // bucket-pruned point lookup works on the streamed table
    assert(spark.sql("SELECT v FROM graft.probe.sw_pdst WHERE id = 17")
      .collect().map(_.getDouble(0)).toSeq == Seq(17.0))
  }

  test("two queries into one table never swallow each other's epochs") {
    // the V1 sink's single shared batch-id key CANNOT make this
    // promise: query B's epoch 0 would read as already-committed after
    // query A recorded epoch 4. The DSv2 write keys exactly-once state
    // per QUERY, so both deliveries land.
    val a = mk("sw_qa")
    val b = mk("sw_qb")
    val dst = mk("sw_qdst")
    (0 until 5).foreach(i => insert(a, i * 10 until (i + 1) * 10))
    insert(b, 100 until 110)
    def drain(src: String): Unit = {
      val q = spark.readStream.option("streamFrom", "earliest").table(src)
        .writeStream
        .option("checkpointLocation",
          Files.createTempDirectory("sw-q-ckpt").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable(dst)
      assert(q.awaitTermination(120000))
    }
    drain(a) // records epochs up to ~5 under query A's key
    drain(b) // a FRESH query: its epoch 0 must still commit
    ids(dst) shouldBe ((0L until 50L) ++ (100L until 110L))
  }

  test("spec evolution mid-query: later epochs replan and partition correctly") {
    // Spark constructs the StreamingWrite PER EPOCH, so an evolveSpec
    // landing between epochs is picked up by the next one — its files
    // lay out and label under the NEW spec (the adoptStreamBatch guard
    // still covers the within-epoch plan→commit window: a mismatch
    // there conflicts instead of mislabeling).
    val src = mk("sw_esrc")
    val dst = mk("sw_edst")
    val sinkQ = spark.readStream.table(src)
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("sw-e-ckpt").toString)
      .toTable(dst)
    try {
      sinkQ.processAllAvailable()
      insert(src, 0 until 10)
      sinkQ.processAllAvailable()
      ids(dst) shouldBe (0L until 10L)
      val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
      val st = graft.catalog.SnapshotTable.load(spark, s"$wh/probe/sw_edst")
      st.evolveSpec(Some(graft.catalog.PartitionSpec("id", "identity")))
      insert(src, 10 until 20)
      sinkQ.processAllAvailable()
      ids(dst) shouldBe (0L until 20L)
      val cur = st.currentSnapshot()
      val newFiles = cur.files.filter(_.seq >= cur.specSince)
      assert(newFiles.nonEmpty && newFiles.forall(_.partition.isDefined),
        "post-evolution epochs must record identity partition values")
      // after the scoped migration rewrite, the whole table is
      // partition-addressable — streamed epochs included
      st.migrateSpec()
      assert(st.readPartitions(_.contains("17"))
        .select("id").collect().map(_.getLong(0)).toSeq == Seq(17L))
    } finally sinkQ.stop()
  }

  test("maintainEvery compacts the small files streaming ingest accretes") {
    val src = mk("sw_msrc")
    spark.sql("DROP TABLE IF EXISTS graft.probe.sw_mdst")
    spark.sql("CREATE TABLE graft.probe.sw_mdst (id BIGINT, v DOUBLE) " +
      "TBLPROPERTIES ('optimize_rewrite_data_file_threshold' = '4')")
    (0 until 9).foreach(i => insert(src, i * 10 until (i + 1) * 10))
    val q = spark.readStream
      .option("streamFrom", "earliest")
      .option("maxVersionsPerTrigger", "1")
      .table(src)
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("sw-m-ckpt").toString)
      .option("maintainEvery", "3")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable("graft.probe.sw_mdst")
    assert(q.awaitTermination(180000))
    ids("graft.probe.sw_mdst") shouldBe (0L until 90L)
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val st = SnapshotTable.load(spark, s"$wh/probe/sw_mdst")
    // maintenance runs on a background thread now: give the last
    // in-flight cycle a bounded window to land its compaction commit
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    def ops = st.history().map(_.operation)
    while (!ops.exists(_.startsWith("compact")) &&
        System.nanoTime() < deadline)
      Thread.sleep(100)
    assert(ops.exists(_.startsWith("compact")),
      s"maintenance must have compacted, ops: ${ops.mkString(", ")}")
    assert(st.currentSnapshot().files.size < 9,
      s"file count must stay bounded, got ${st.currentSnapshot().files.size}")
  }

  test("update output mode is rejected") {
    val src = mk("sw_usrc")
    val dst = mk("sw_udst")
    insert(src, 0 until 5)
    val err = intercept[Exception] {
      val q = spark.readStream.option("streamFrom", "earliest").table(src)
        .writeStream
        .option("checkpointLocation",
          Files.createTempDirectory("sw-u-ckpt").toString)
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable(dst)
      q.awaitTermination(120000)
      ()
    }
    assert(err.getMessage != null)
  }

  test("construction refuses a stale writeSchema (evolution between analysis and construction)") {
    val t = mk("sw_stale")
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val st = SnapshotTable.load(spark, s"$wh/probe/sw_stale")
    // a schema captured at analysis time that no longer matches the
    // planned snapshot's shape: staged files would be mislabeled
    val stale = new org.apache.spark.sql.types.StructType()
      .add("id", "bigint").add("v", "double").add("gone", "string")
    val err = intercept[graft.catalog.SnapshotConflictException] {
      new graft.catalog.GraftStreamingWrite(st, stale, "q-stale-test")
    }
    assert(err.getMessage.contains(
      "between query analysis and write construction"), err.getMessage)
  }

  test("a slow maintenance cycle never delays the next epoch's commit") {
    mk("sw_bg")
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val st = SnapshotTable.load(spark, s"$wh/probe/sw_bg")
    val w = new graft.catalog.GraftStreamingWrite(st, st.schema, "q-bg",
      maintainEvery = Some(1))
    val entered = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val cycles = new java.util.concurrent.atomic.AtomicInteger(0)
    w.maintenanceRunner = () => {
      cycles.incrementAndGet(); entered.countDown()
      release.await(60, java.util.concurrent.TimeUnit.SECONDS); ()
    }
    try {
      w.commit(1L, Array.empty) // kicks off the (blocked) cycle
      assert(entered.await(30, java.util.concurrent.TimeUnit.SECONDS))
      // next epochs commit while maintenance is still running...
      val t0 = System.nanoTime()
      w.commit(2L, Array.empty)
      w.commit(3L, Array.empty)
      assert((System.nanoTime() - t0) / 1e9 < 20.0,
        "epoch commits must not wait on the running maintenance")
      // ...and single-flight means no second cycle piled up behind it
      assert(cycles.get() == 1, s"expected one in-flight cycle, got $cycles")
      val props = st.currentSnapshot().properties
      assert(props.get("graft.stream.last_batch_id.q-bg")
        .exists(v => SnapshotTable.epochOf(v) == 3L), props.toString)
    } finally release.countDown()
  }

  test("a failed maintenance cycle surfaces on the next commit, conflicts stay expendable") {
    mk("sw_bgf")
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val st = SnapshotTable.load(spark, s"$wh/probe/sw_bgf")
    val w = new graft.catalog.GraftStreamingWrite(st, st.schema, "q-bgf",
      maintainEvery = Some(1))
    w.maintenanceRunner = () => sys.error("disk on fire")
    w.commit(1L, Array.empty)
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (w.pendingMaintenanceFailure.isEmpty && System.nanoTime() < deadline)
      Thread.sleep(20)
    val err = intercept[IllegalStateException] { w.commit(2L, Array.empty) }
    assert(err.getMessage.contains("streaming maintenance"), err.getMessage)
    assert(Option(err.getCause).exists(_.getMessage.contains("disk on fire")))
    // the failure is consumed: with the configuration "fixed" (runner
    // healthy again) the replayed epoch commits normally
    w.maintenanceRunner = () => ()
    w.commit(2L, Array.empty)
    // a conflict-failing cycle is expendable and surfaces nothing
    w.maintenanceRunner =
      () => throw new graft.catalog.SnapshotConflictException("lost race")
    w.commit(3L, Array.empty)
    Thread.sleep(200)
    assert(w.pendingMaintenanceFailure.isEmpty)
    w.commit(4L, Array.empty)
  }

  test("maintenance retires epoch keys whose queries predate retained history") {
    val t = mk("sw_gc")
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val st = SnapshotTable.load(spark, s"$wh/probe/sw_gc")
    new graft.catalog.GraftStreamingWrite(st, st.schema, "q-old")
      .commit(0L, Array.empty)
    // push q-old's commit out of the retained window (default keep=5)
    (0 until 8).foreach(i => insert(t, i * 10 until i * 10 + 10))
    new graft.catalog.GraftStreamingWrite(st, st.schema, "q-new")
      .commit(0L, Array.empty)
    st.maintain()
    val props = st.currentSnapshot().properties
    assert(!props.contains("graft.stream.last_batch_id.q-old"),
      s"stale per-query epoch key must be GC'd: $props")
    assert(props.contains("graft.stream.last_batch_id.q-new"),
      s"recent per-query epoch key must survive: $props")
  }
}
