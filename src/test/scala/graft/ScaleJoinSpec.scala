package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Scale-structure evidence: salting preserves join semantics, and
  * co-bucketed tables join without any exchange (the pre-partitioning
  * story a 100 TB deployment relies on instead of reshuffling the fact
  * table for every join).
  */
class ScaleJoinSpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark
  import spark.implicits._

  test("saltedInnerJoin equals the plain inner join, including dup keys") {
    val fact = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d"), (3L, "e"))
      .toDF("k", "v")
    // duplicate build keys: every copy must still match every fact row
    val build = Seq((1L, "X"), (1L, "Y"), (2L, "Z"))
      .toDF("k", "w")
    val plain = fact.join(build, Seq("k"))
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val salted = Skew.saltedInnerJoin(fact, build, "k", salts = 4)
      .select("k", "v", "w")
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(salted == plain)
  }

  test("joinAsOf: latest at-or-before right row, nulls before any right row") {
    import graft.operators.AsOf
    val left = Seq((1L, 10L, "e1"), (1L, 25L, "e2"), (1L, 20L, "e3"),
      (2L, 5L, "e4")).toDF("k", "ts", "tag")
    val right = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 50L, "z"))
      .toDF("k", "ts", "v")
    val out = AsOf.joinAsOf(left, right, "k", "ts", Seq("v"))
      .collect().map(r => r.getAs[String]("tag") -> r.getAs[String]("v")).toMap
    assert(out == Map(
      "e1" -> "a",  // equal ts matches
      "e3" -> "b",  // equal ts at 20 matches the newer right row
      "e2" -> "b",  // latest at-or-before 25 is ts=20
      "e4" -> null)) // right row is in the future -> null
  }

  test("pointInInterval: half-open containment, buckets spanned correctly") {
    import graft.operators.RangeJoin
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val points = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")),  // == start -> in
      (1L, 11L, ts("2024-01-01 00:29:59")),  // just inside
      (1L, 12L, ts("2024-01-01 00:30:00")),  // == end -> out (half-open)
      (1L, 13L, ts("2024-01-01 02:15:00")),  // inside the long interval
      (2L, 14L, ts("2024-01-01 00:05:00"))   // wrong key -> out
    ).toDF("k", "event_id", "t")
    val intervals = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:30:00")),
      // long interval spanning many buckets
      (1L, ts("2024-01-01 01:00:00"), ts("2024-01-01 03:00:00"))
    ).toDF("k", "s", "e")
    val got = RangeJoin.pointInInterval(points, intervals, "k", "t", "s", "e",
      bucketUs = 30L * 60 * 1000000)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(10L, 11L, 13L))
  }

  test("joinAsOf: a matched right row with NULL value yields NULL, not an older value") {
    import graft.operators.AsOf
    val left = Seq((1L, 30L, "e1")).toDF("k", "ts", "tag")
    val right = Seq((1L, 10L, Some("old")), (1L, 20L, None))
      .toDF("k", "ts", "v")
    // ASOF semantics: latest at-or-before 30 is ts=20 whose v IS null;
    // threading the bare column with ignoreNulls would leak "old"
    val out = AsOf.joinAsOf(left, right, "k", "ts", Seq("v")).collect()
    assert(out.length == 1 && out.head.getAs[String]("v") == null)
  }

  test("pointInInterval drops empty and inverted intervals before the bucket explode") {
    import graft.operators.RangeJoin
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val points = Seq((1L, 10L, ts("2024-01-01 00:10:00"))).toDF("k", "pid", "t")
    val intervals = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:30:00")), // valid
      (1L, ts("2024-01-01 00:15:00"), ts("2024-01-01 00:15:00")), // empty
      (1L, ts("2024-02-01 00:00:00"), ts("2024-01-01 00:00:00"))  // inverted
    ).toDF("k", "s", "e")
    val got = RangeJoin.pointInInterval(points, intervals, "k", "t", "s", "e",
      bucketUs = 30L * 60 * 1000000)
      .select("pid").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(10L)) // only the valid interval matches
  }

  test("joinAsOf == naive latest-at-or-before on random data") {
    import graft.operators.AsOf
    val r = new scala.util.Random(17)
    val left = (1 to 400).map(i =>
      (r.nextInt(5).toLong, r.nextInt(1000).toLong, i.toLong))
      .toDF("k", "ts", "lid")
    val right = (1 to 150).map(i =>
      (r.nextInt(5).toLong, r.nextInt(1000).toLong, s"v$i"))
      .distinct.toDF("k", "ts", "v")
      // contract: unique (k, ts) on the right
      .dropDuplicates("k", "ts")
    val rightRows = right.collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2)))
    val expected = left.collect().map { row =>
      val (k, ts, lid) = (row.getLong(0), row.getLong(1), row.getLong(2))
      val best = rightRows.filter(x => x._1 == k && x._2 <= ts)
        .sortBy(_._2).lastOption.map(_._3).orNull
      lid -> best
    }.toMap
    val got = AsOf.joinAsOf(left, right, "k", "ts", Seq("v"))
      .collect().map(x => x.getAs[Long]("lid") -> x.getAs[String]("v")).toMap
    assert(got == expected)
  }

  test("pointInInterval == naive inequality join on random data") {
    import graft.operators.RangeJoin
    import java.sql.Timestamp
    val r = new scala.util.Random(23)
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def t(min: Long) = new Timestamp(base + min * 60000)
    val points = (1 to 300).map(i =>
      (r.nextInt(4).toLong, i.toLong, t(r.nextInt(600).toLong)))
      .toDF("k", "pid", "ts")
    val intervals = (1 to 60).map { i =>
      val s = r.nextInt(600).toLong
      (r.nextInt(4).toLong, i.toLong, t(s), t(s + 1 + r.nextInt(90).toLong))
    }.toDF("k", "iid", "s", "e")
    val naive = points.join(intervals, Seq("k"))
      .filter(col("ts") >= col("s") && col("ts") < col("e"))
      .select("pid", "iid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val got = RangeJoin.pointInInterval(points, intervals, "k", "ts", "s", "e",
        bucketUs = 45L * 60 * 1000000)
      .select("pid", "iid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == naive)
  }

  test("packSequences: budget crossings open new packs, per shard, deterministic") {
    import graft.operators.Pack
    val docs = Seq((0L, 300L), (8L, 300L), (16L, 300L), (24L, 100L),
      (1L, 600L), (9L, 10L)).toDF("doc_id", "n_tokens")
    val out = Pack.packSequences(docs, capacity = 512, shards = 8)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("shard"), r.getAs[Long]("pack_id"))).toMap
    // shard 0: prefixes 0,300,600,900 -> packs 0,0,1,1
    assert(out(0L)._1 == 0 && out(8L)._1 == 0)
    assert(out(0L)._2 == out(8L)._2)       // 300+300 crosses after doc 8
    assert(out(16L)._2 == out(24L)._2)     // both in shard-0 pack 1
    assert(out(0L)._2 != out(16L)._2)
    // shard 1: oversized doc (600 > 512) owns pack 0, next doc starts pack 1
    assert(out(1L)._1 == 1 && out(9L)._1 == 1)
    assert(out(1L)._2 != out(9L)._2)
    // pack ids globally unique across shards
    assert(out(0L)._2 != out(1L)._2)
  }

  test("chunkDocuments: overlapping windows cover every token exactly") {
    import graft.operators.Pack
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 toks: 4 chunks
      (2L, "a b c"),                                  // short: 1 chunk
      (3L, (1 to 11).map(i => s"u$i").mkString(" "))) // 11 toks: 5 chunks
      .toDF("doc_id", "text")
    val out = Pack.chunkDocuments(docs, window = 4, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getString(3)))
    val byDoc = out.groupBy(_._1)
    assert(byDoc(2L).toSeq == Seq((2L, 0L, 3L, "a b c")))
    // starts advance by stride 2: [1..4],[3..6],[5..8],[7..10]
    assert(byDoc(1L).sortBy(_._2).map(_._4).toSeq == Seq(
      "t1 t2 t3 t4", "t3 t4 t5 t6", "t5 t6 t7 t8", "t7 t8 t9 t10"))
    // 11 tokens: final chunk is the short tail [9..11]
    assert(byDoc(3L).sortBy(_._2).map(x => (x._3, x._4)).last ==
      (3L, "u9 u10 u11"))
    assert(byDoc(3L).length == 5)
    // every original token appears in some chunk (coverage)
    for ((id, n) <- Seq(1L -> 10, 3L -> 11)) {
      val prefix = if (id == 1L) "t" else "u"
      val covered = byDoc(id).flatMap(_._4.split(" ")).toSet
      assert((1 to n).forall(i => covered.contains(s"$prefix$i")))
    }
    // invalid parameters are refused
    intercept[IllegalArgumentException](
      Pack.chunkDocuments(docs, window = 4, overlap = 4))
    // empty, whitespace-only, and NULL text: one zero-token chunk each
    val edge = Seq((10L, ""), (11L, "   "), (12L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val edgeOut = Pack.chunkDocuments(edge, window = 4, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(edgeOut.toSet == Set((10L, 0L, 0L, ""), (11L, 0L, 0L, ""),
      (12L, 0L, 0L, "")))
  }

  test("writeSorted yields near-disjoint file ranges and file-pruned range scans") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-layout").toString + "/ev"
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("ts"), col("value"))
    graft.sources.Layout.writeSorted(ev, dir, Seq("event_id"), nFiles = 8)
    val back = spark.read.parquet(dir)
    assert(back.count() == ev.count())
    // per-file event_id ranges must not overlap (range clustering worked;
    // sorting on a bigint because parquet INT96 timestamps carry no
    // pushdown-usable statistics)
    val ranges = back.groupBy(input_file_name().as("f"))
      .agg(min("event_id").as("lo"), max("event_id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(ranges.length == 8)
    for (Seq((_, hi), (lo, _)) <- ranges.toSeq.sliding(2))
      assert(hi <= lo, s"overlapping file ranges: $hi vs $lo")
    // a narrow predicate: the pushed filter + per-row-group min/max
    // statistics let the parquet reader SKIP the 7 non-matching files'
    // row groups entirely — the scan's output rows stay near the first
    // file's row count instead of the full dataset (this skipping only
    // happens because the layout clustered event_id; on an unsorted
    // layout every row group spans the whole range, nothing is skipped)
    val probe = ranges.head._2 // inside the first file's range only
    val scan = back.filter(col("event_id") <= probe)
    scan.collect()
    val scanNode = scan.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .get
    val scannedRows = scanNode.metrics("numOutputRows").value
    val total = back.count()
    assert(scannedRows < total,
      s"expected row-group skipping: scanned $scannedRows of $total")
  }

  test("mortonZ interleaves bits; writeZOrdered localizes files in BOTH dimensions") {
    import org.apache.spark.sql.functions._
    // bit-level check against a direct Scala interleave
    def spreadRef(x: Long): Long = {
      var v = x & 0xFFFFFFFFL
      v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
      v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
      v = (v | (v << 2)) & 0x3333333333333333L
      v = (v | (v << 1)) & 0x5555555555555555L
      v
    }
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (255L, 1023L),
      (0xFFFFFFFFL, 0x12345678L))
    val got = samples.toDF("a", "b")
      .select(graft.sources.Layout.mortonZ(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    val want = samples.map { case (a, b) => spreadRef(a) | (spreadRef(b) << 1) }
    assert(got.toSeq == want)

    // layout property: files cover small rectangles of (a, b) space
    val r = new scala.util.Random(29)
    val grid = (1 to 4096).map(_ => (r.nextInt(1024).toLong, r.nextInt(1024).toLong))
      .toDF("a", "b")
    val dir = java.nio.file.Files.createTempDirectory("graft-z").toString + "/g"
    graft.sources.Layout.writeZOrdered(grid, dir, "a", "b", nFiles = 16)
    val spans = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"))
      .collect().map(x => (x.getLong(1), x.getLong(2)))
    assert(spans.length == 16)
    // Z-order: every file's span in EACH dim is a fraction of the 1024
    // domain (a 1-D sort on `a` would leave sb ~ full domain in every file)
    val avgA = spans.map(_._1).sum.toDouble / spans.length
    val avgB = spans.map(_._2).sum.toDouble / spans.length
    assert(avgA < 600 && avgB < 600, s"avg spans: $avgA x $avgB")
  }

  test("co-bucketed tables sort-merge join with zero exchanges") {
    val db = "graft_bucket_db"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spark.sql(s"DROP TABLE IF EXISTS $db.fact_b")
    spark.sql(s"DROP TABLE IF EXISTS $db.dim_b")
    val n = 10000
    spark.range(n).select(col("id"), (col("id") % 97).as("payload"))
      .write.bucketBy(8, "id").sortBy("id").saveAsTable(s"$db.fact_b")
    spark.range(n / 10).select(col("id"), (col("id") % 7).as("attr"))
      .write.bucketBy(8, "id").sortBy("id").saveAsTable(s"$db.dim_b")
    // force sort-merge so bucketing (not broadcast) carries the join
    val smj = spark.table(s"$db.fact_b")
      .join(spark.table(s"$db.dim_b").hint("merge"), "id")
    val plan = smj.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"),
      s"bucketed join must not reshuffle either side:\n$plan")
    assert(smj.count() == n / 10)
    spark.sql(s"DROP TABLE IF EXISTS $db.fact_b")
    spark.sql(s"DROP TABLE IF EXISTS $db.dim_b")
    spark.sql(s"DROP DATABASE $db")
  }
}
