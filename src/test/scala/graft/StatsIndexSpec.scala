package graft

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{ColStats, DataFileEntry, Snapshot, StatsPruner}

/** Parity gate for the columnar prune fast path ([[graft.catalog
  * .StatsIndex]]): over randomized synthetic manifests — missing
  * stats, all-null files, unparseable bounds, renamed columns, legacy
  * (id-less) entries, Bloom-bearing equality columns — the composed
  * decision `fastMask && generic(residual)` must equal the all-generic
  * walk for every file and every filter shape. This is the exactness
  * contract prunedFiles relies on to skip the boxed walk.
  */
class StatsIndexSpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("score", DoubleType),
    StructField("w", FloatType),
    StructField("ts", TimestampType),
    StructField("day", DateType),
    StructField("name", StringType)))

  // field ids: id→0, score→1, w→2, ts→3, day→4, name→5; one manifest
  // variant renames the write-time names so translation must go
  // through the ids
  private val ids = schema.fieldNames.toIndexedSeq.zipWithIndex

  /** One valid Bloom payload holding xxhash64(42L, seed 42) — built by
    * the real aggregator so the generic probe path executes for real.
    */
  private lazy val bloomB64: String = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val row = Seq(42L).toDF("v")
      .agg(graft.functions.BloomAgg.bloomAgg(xxhash64(col("v")), 1024, 3))
      .head()
    java.util.Base64.getEncoder.encodeToString(row.getAs[Array[Byte]](0))
  }

  private def mkFiles(rnd: scala.util.Random, n: Int, renamed: Boolean,
      withBloom: Boolean): Seq[DataFileEntry] = {
    val wn = if (renamed)
      Map("id" -> "id_w", "score" -> "score_w", "w" -> "w", "ts" -> "ts_w",
        "day" -> "day", "name" -> "name_w")
    else schema.fieldNames.map(x => x -> x).toMap
    val cols =
      if (renamed) ids.map { case (cn, i) => (wn(cn), i) }
      else Seq.empty[(String, Int)] // legacy: stats key on current names
    (0 until n).map { i =>
      val rows = 10L + rnd.nextInt(100)
      def colStats(lo: String, hi: String): ColStats = {
        val nulls = rnd.nextInt(4) match {
          case 0 => 0L
          case 1 => rows // all-null file
          case _ => 1L + rnd.nextInt(3)
        }
        ColStats(
          if (rnd.nextInt(10) == 0) None else Some(lo),
          if (rnd.nextInt(10) == 0) None else Some(hi),
          nulls,
          bloom = if (withBloom && rnd.nextBoolean()) Some(bloomB64) else None)
      }
      val base = rnd.nextInt(1000)
      val stats = scala.collection.mutable.Map.empty[String, ColStats]
      if (rnd.nextInt(8) != 0) { // some files miss the id stats entirely
        val lo = base.toLong
        val hi = lo + rnd.nextInt(200)
        stats(wn("id")) = colStats(lo.toString, hi.toString)
      }
      if (rnd.nextInt(8) != 0) {
        val lo = base / 100.0
        val hi = lo + rnd.nextInt(50) / 10.0
        // occasionally an unparseable bound
        val loS = if (rnd.nextInt(12) == 0) "NaN" else lo.toString
        stats(wn("score")) = colStats(loS, hi.toString)
      }
      if (rnd.nextInt(8) != 0) {
        val lo = (base / 10.0).toFloat
        stats(wn("w")) = colStats(lo.toString,
          (lo + rnd.nextInt(20)).toString)
      }
      if (rnd.nextInt(8) != 0) {
        val lo = 1700000000000000L + base * 1000000L
        stats(wn("ts")) = colStats(lo.toString,
          (lo + rnd.nextInt(1000000)).toString)
      }
      if (rnd.nextInt(8) != 0)
        stats(wn("day")) = colStats("2024-01-01", "2024-06-01")
      if (rnd.nextInt(8) != 0)
        stats(wn("name")) = colStats("aaa", "mmm")
      DataFileEntry(f"data/f$i%05d.parquet", None, rows,
        stats = stats.toMap, cols = cols, seq = 1L)
    }
  }

  private def mkSnapshot(files: Seq[DataFileEntry]): Snapshot =
    Snapshot(1L, Some(0L), "append", 0L, schema, None, Map.empty, files,
      fieldIds = ids)

  /** The pre-columnar reference: effectiveStats + the generic walk. */
  private def genericKeep(s: Snapshot, f: DataFileEntry,
      filters: Seq[Filter]): Boolean = {
    val currentById = s.ids.map { case (n, id) => id -> n }.toMap
    val eff =
      if (f.cols.isEmpty) f
      else f.copy(stats = f.cols.flatMap { case (wn, id) =>
        for { cn <- currentById.get(id); st <- f.stats.get(wn) }
          yield cn -> st
      }.toMap)
    StatsPruner.mayMatchAll(eff, s.schema, filters)
  }

  private val filterCases: Seq[Seq[Filter]] = {
    val ts = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(1700000500L))
    Seq(
      Seq(GreaterThan("id", 500L)),
      Seq(GreaterThanOrEqual("id", 500L)),
      Seq(LessThan("id", 300L)),
      Seq(LessThanOrEqual("id", 300L)),
      Seq(EqualTo("id", 42L)),
      Seq(EqualTo("id", 1200L)), // outside every range
      Seq(IsNull("id")), Seq(IsNotNull("id")),
      Seq(GreaterThan("score", 5.0), LessThan("score", 8.0)),
      Seq(EqualTo("score", 6.25)),
      Seq(GreaterThan("w", 30.0f), IsNotNull("id")),
      Seq(LessThanOrEqual("w", 10.0f)),
      Seq(GreaterThan("ts", ts)),
      Seq(LessThan("ts", ts), GreaterThan("id", 100L)),
      // value type mismatching the column kind → must go generic
      Seq(GreaterThan("id", 500.5)),
      Seq(EqualTo("w", 30.0)), // double value on float column
      // non-fast shapes and columns → residual
      Seq(GreaterThan("day", java.sql.Date.valueOf("2024-03-01"))),
      Seq(StringStartsWith("name", "b")),
      Seq(In("id", Array(10L, 500L, 900L))),
      Seq(Or(LessThan("id", 100L), GreaterThan("id", 900L))),
      // mixed fast + generic conjuncts
      Seq(GreaterThan("id", 200L), StringStartsWith("name", "c"),
        LessThan("score", 9.0)),
      // unknown column
      Seq(GreaterThan("nope", 1L)))
  }

  test("columnar fast path composed with its residual equals the generic walk") {
    val rnd = new scala.util.Random(20260816L)
    for {
      renamed <- Seq(false, true)
      withBloom <- Seq(false, true)
      trial <- 0 until 3
    } {
      val files = mkFiles(rnd, 200, renamed, withBloom)
      val s = mkSnapshot(files)
      for (filters <- filterCases) {
        val (mask, residual) = s.statsIndex.evaluate(s.schema, filters)
        files.zipWithIndex.foreach { case (f, i) =>
          val fastKeep = (mask == null || mask(i)) &&
            (residual.isEmpty || genericKeep(s, f, residual))
          val refKeep = genericKeep(s, f, filters)
          assert(fastKeep == refKeep,
            s"divergence on file $i (renamed=$renamed bloom=$withBloom " +
              s"trial=$trial) filters=$filters stats=${f.stats}")
        }
      }
    }
  }

  test("columnar MUST-match composed with its residual equals the generic proof") {
    def genericMust(s: Snapshot, f: DataFileEntry,
        filters: Seq[Filter]): Boolean = {
      val currentById = s.ids.map { case (n, id) => id -> n }.toMap
      val eff =
        if (f.cols.isEmpty) f
        else f.copy(stats = f.cols.flatMap { case (wn, id) =>
          for { cn <- currentById.get(id); st <- f.stats.get(wn) }
            yield cn -> st
        }.toMap)
      StatsPruner.mustMatchAll(eff, s.schema, filters)
    }
    val rnd = new scala.util.Random(20260817L)
    for {
      renamed <- Seq(false, true)
      trial <- 0 until 3
    } {
      val files = mkFiles(rnd, 200, renamed, withBloom = false)
      val s = mkSnapshot(files)
      for (filters <- filterCases) {
        val (mask, residual) = s.statsIndex.evaluateMust(s.schema, filters)
        files.zipWithIndex.foreach { case (f, i) =>
          val fastMust = filters.nonEmpty &&
            (mask == null || mask(i)) &&
            (residual.isEmpty || genericMust(s, f, residual))
          val refMust = genericMust(s, f, filters)
          assert(fastMust == refMust,
            s"MUST divergence on file $i (renamed=$renamed trial=$trial) " +
              s"filters=$filters stats=${f.stats}")
        }
      }
    }
  }

  test("bloom-bearing equality keeps the conjunct in the residual; bloom-free settles exactly") {
    val rnd = new scala.util.Random(7L)
    val noBloom = mkSnapshot(mkFiles(rnd, 50, renamed = false,
      withBloom = false))
    val (m1, r1) = noBloom.statsIndex.evaluate(schema,
      Seq(EqualTo("id", 42L)))
    assert(m1 != null && r1.isEmpty,
      "bloom-free numeric equality must settle in the fast pass")
    // force at least one bloom-bearing id entry
    val rnd2 = new scala.util.Random(8L)
    val withB = mkSnapshot(mkFiles(rnd2, 50, renamed = false,
      withBloom = true).map(f =>
        f.copy(stats = f.stats.map { case (k, v) =>
          k -> (if (k == "id") v.copy(bloom = Some(bloomB64)) else v)
        })))
    val (m2, r2) = withB.statsIndex.evaluate(schema,
      Seq(EqualTo("id", 42L)))
    assert(m2 != null && r2 == Seq(EqualTo("id", 42L)),
      "a recorded Bloom must send the equality through the generic probe")
  }

  test("statsIndexOf shares one index across reloads of the same version") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-sidx-cache")
      .resolve("t").toString
    val df = (1L to 100L).map(i => (i, i.toDouble)).toDF("id", "v")
    val t = graft.catalog.SnapshotTable.create(spark, root, df.schema, None)
    t.append(df)
    // two independent reloads assemble fresh Snapshot instances; the
    // log hands both the SAME columnar index (build once per version)
    val s1 = t.log.read(t.currentVersion())
    val s2 = t.log.read(t.currentVersion())
    assert(!(s1 eq s2))
    assert(t.log.statsIndexOf(s1) eq t.log.statsIndexOf(s2))
    // a new version gets its own index, and pruning through the cached
    // one stays correct
    t.append(df.select((col("id") + 1000L).as("id"), col("v")))
    val s3 = t.log.read(t.currentVersion())
    assert(!(t.log.statsIndexOf(s3) eq t.log.statsIndexOf(s1)))
    val kept = t.prunedFiles(s3,
      Seq(org.apache.spark.sql.sources.GreaterThan("id", 1000L)))
    assert(kept.nonEmpty && kept.size < s3.files.size,
      s"prune through the cached index must still skip files: " +
        s"${kept.size} of ${s3.files.size}")
  }

  test("memory budget: least-recently-pruned columns evict; exactness survives eviction") {
    val rnd = new scala.util.Random(424242L)
    val files = mkFiles(rnd, 400, renamed = false, withBloom = false)
    // one numeric column costs 400 × 17 B ≈ 6.8 KB; budget for ~2
    val budget = 15000L
    val s = mkSnapshot(files)
      .copy(properties = Map(graft.catalog.StatsIndex.BudgetProp ->
        budget.toString))
    val idx = s.statsIndex
    val probes = Seq(
      Seq[Filter](GreaterThan("id", 500L)),
      Seq[Filter](LessThan("score", 8.0)),
      Seq[Filter](GreaterThan("w", 30.0f)),
      Seq[Filter](GreaterThan("ts",
        java.time.Instant.ofEpochSecond(1700000500L))))
    // cycle the columns twice: every build beyond the budget evicts the
    // LRU column, and every prune stays exactly equal to the generic
    // walk whether it hit a resident column or rebuilt an evicted one
    for (_ <- 0 until 2; filters <- probes) {
      val (mask, residual) = idx.evaluate(s.schema, filters)
      files.zipWithIndex.foreach { case (f, i) =>
        val fastKeep = (mask == null || mask(i)) &&
          (residual.isEmpty || genericKeep(s, f, residual))
        assert(fastKeep == genericKeep(s, f, filters),
          s"post-eviction divergence on file $i filters=$filters")
      }
      assert(idx.residentBytes <= budget,
        s"budget exceeded: ${idx.residentBytes} > $budget")
    }
    // an unbudgeted index keeps everything resident (default 1 GiB)
    val free = mkSnapshot(files).statsIndex
    probes.foreach(f => free.evaluate(s.schema, f))
    assert(free.residentBytes > budget,
      "all four columns should stay resident under the default budget")
  }
}
