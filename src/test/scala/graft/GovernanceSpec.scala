package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Governance

class GovernanceSpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "alpha beta gamma delta other words here"), // shares 4-gram prefix with 1
    (10L, "alpha beta gamma delta epsilon zeta"), // eval twin of 1
    (20L, "totally novel eval content nothing shared anywhere"),
    (3L, "unrelated train text about engines")
  ).toDF("doc_id", "text")

  test("splitAssign partitions every doc into exactly one split, deterministically") {
    val docs = spark.range(0, 2000).toDF("doc_id")
    val a = Governance.splitAssign(docs).groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a.keySet.subsetOf(Set("train", "valid", "test")))
    assert(a.values.sum == 2000)
    // ~13/256 each for test/valid; allow wide tolerance, assert shape
    assert(a("train") > a("valid") && a("train") > a("test"))
    // determinism: same assignment on rerun
    val b = Governance.splitAssign(docs).groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("splitAssign is stable under corpus growth (subset keeps its assignment)") {
    val big = Governance.splitAssign(spark.range(0, 1000).toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val small = Governance.splitAssign(spark.range(0, 100).toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    small.foreach { case (id, s) => assert(big(id) == s) }
  }

  test("splitAssign 256-slot boundary puts every doc in the named splits") {
    import graft.operators.Governance
    val docs = spark.range(0, 500).toDF("doc_id")
    val a = Governance.splitAssign(docs, testSlots = 128, validSlots = 128)
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!a.contains("train")) // 128+128 = 256 slots: nothing left over
    assert(a.values.sum == 500)
  }

  test("splitAssign salt changes the assignment") {
    val docs = spark.range(0, 500).toDF("doc_id")
    val a = Governance.splitAssign(docs, salt = "graft")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Governance.splitAssign(docs, salt = "other")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a != b)
  }

  test("temperatureMix flattens dominant strata and keeps rare ones whole") {
    // 900 'en' docs vs 60 'fr' vs 40 'de': with alpha=0.5 and a 30%
    // target, en's keep-rate drops well below the rare strata's
    val docs = spark.range(0, 1000).toDF("doc_id")
      .withColumn("lang", when(col("doc_id") < 900, "en")
        .when(col("doc_id") < 960, "fr").otherwise("de"))
    val kept = Governance.temperatureMix(docs, "lang", alpha = 0.5,
        fraction = 0.3)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rateEn = kept("en") / 900.0
    val rateFr = kept.getOrElse("fr", 0L) / 60.0
    val rateDe = kept.getOrElse("de", 0L) / 40.0
    assert(rateEn < rateFr && rateEn < rateDe,
      s"dominant stratum must flatten hardest: $kept")
    // expected keep-rates: q ∝ sqrt(n), Z = 30 + 7.746 + 6.325 = 44.07;
    // r_l = min(1, 0.3·1000·q_l/n_l) → en ≈ 0.227, fr ≈ 0.879,
    // de ≈ 1.076 → clamped to 1.0 (the rarest stratum keeps everything)
    assert(rateDe == 1.0, s"rarest stratum clamps at keep-all: $kept")
    assert(math.abs(rateEn - 0.227) < 0.05, s"en rate $rateEn")
    assert(math.abs(rateFr - 0.879) < 0.08, s"fr rate $rateFr")
    // determinism
    val again = Governance.temperatureMix(docs, "lang", alpha = 0.5,
        fraction = 0.3)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == kept)
    // stability: a doc's fate is independent of the other strata
    val enOnly = Governance.temperatureMix(docs, "lang", alpha = 0.5,
        fraction = 0.3)
      .filter(col("lang") === "en").select("doc_id").as[Long].collect().toSet
    assert(enOnly.size == kept("en"))
  }

  test("temperatureMix keeps a NULL stratum in the mixture") {
    // 400 'en' docs + 100 NULL-lang docs: the NULL stratum is a real
    // group and must be sampled, not silently dropped by the join
    val docs = spark.range(0, 500).toDF("doc_id")
      .withColumn("lang",
        when(col("doc_id") < 400, "en").otherwise(lit(null).cast("string")))
    val kept = Governance.temperatureMix(docs, "lang", alpha = 0.5,
        fraction = 0.5)
      .groupBy("lang").count()
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(kept.contains(None), s"NULL stratum vanished: $kept")
    // and its keep-rate exceeds the dominant stratum's (rarer → flatter)
    assert(kept(None) / 100.0 > kept(Some("en")) / 400.0, s"$kept")
    // the output schema carries no helper columns
    val out = Governance.temperatureMix(docs, "lang")
    assert(out.columns.toSeq == Seq("doc_id", "lang"), out.columns.toSeq)
  }

  test("contamination finds the fully-contaminated eval twin and the clean doc") {
    val out = Governance.contamination(corpus,
      isEval = col("doc_id") >= 10, n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_contaminated"),
          r.getAs[Double]("contamination"))).toMap
    // doc 10 is an exact copy of train doc 1: every 3-gram contaminated
    assert(out(10L)._1 == 4 && out(10L)._2 == 4 && out(10L)._3 == 1.0)
    // doc 20 shares nothing: emitted with contamination 0
    assert(out(20L)._2 == 0 && out(20L)._3 == 0.0)
    assert(out.size == 2) // only eval docs appear
  }

  test("sampleStratified downsamples only the named strata, deterministically") {
    import graft.operators.Governance
    val docs = spark.range(0, 3000).toDF("doc_id")
      .withColumn("lang", when(col("doc_id") % 3 === 0, "en")
        .when(col("doc_id") % 3 === 1, "es").otherwise("de"))
    val kept = Governance.sampleStratified(docs, "lang",
      Map("en" -> 0.5, "es" -> 0.0))
    val counts = kept.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.getOrElse("es", 0L) == 0L) // rate 0 drops everything
    assert(counts("de") == 1000L) // unnamed stratum untouched
    val en = counts("en").toDouble / 1000.0
    assert(en > 0.4 && en < 0.6) // ~50%
    // determinism + subset stability: kept ids at rate 0.5 are kept
    // regardless of what other docs exist
    val keptIds = kept.filter(col("lang") === "en")
      .collect().map(_.getLong(0)).toSet
    val keptAgain = Governance.sampleStratified(docs.limit(300), "lang",
      Map("en" -> 0.5, "es" -> 0.0)).filter(col("lang") === "en")
      .collect().map(_.getLong(0)).toSet
    assert(keptAgain.subsetOf(keptIds))
  }

  test("contamination treats docs shorter than n as one whole-text shingle") {
    import graft.operators.Governance
    val docs = Seq(
      (1L, "tiny doc"),        // train: 2 tokens < n=3 -> whole-text shingle
      (10L, "tiny doc"),       // eval twin: same whole-text shingle
      (20L, "other short")     // eval: clean
    ).toDF("doc_id", "text")
    val out = Governance.contamination(docs, isEval = col("doc_id") >= 10, n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_contaminated"))).toMap
    assert(out(10L) == ((1L, 1L))) // whole-text match counts
    assert(out(20L) == ((1L, 0L)))
  }

  test("rareTokenRatio counts occurrences against corpus-wide counts") {
    import graft.operators.Governance
    val docs = Seq(
      (1L, "common common zebra"),   // 'common' appears 4x in corpus
      (2L, "common common yak yak")  // 'yak' appears twice -> rare at max 2
    ).toDF("doc_id", "text")
    val out = Governance.rareTokenRatio(docs, rareMax = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_rare"),
          r.getAs[Double]("rare_ratio"))).toMap
    assert(out(1L) == ((3L, 1L, 1.0 / 3)))  // zebra (1 occurrence) rare
    assert(out(2L) == ((4L, 2L, 0.5)))      // both yak occurrences rare
  }

  test("bestPerGroup keeps k best per group with (score desc, id asc) tie-break") {
    import graft.operators.Governance
    val rows = Seq(
      ("s1", 1L, 0.9), ("s1", 2L, 0.9), ("s1", 3L, 0.5), ("s1", 4L, 0.7),
      ("s2", 5L, 0.1)
    ).toDF("source", "doc_id", "sc")
    val out = Governance.bestPerGroup(rows, "source", col("sc"), k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
      .sortBy(x => (x._1, x._3))
    // tie at 0.9 broken by id asc; 0.7 beats 0.5; singleton group kept
    assert(out.toSeq == Seq(("s1", 1L, 1L), ("s1", 2L, 2L), ("s2", 5L, 1L)))
  }

  test("topNgrams counts document frequency with strict (df desc, ngram asc) order") {
    val out = Governance.topNgrams(corpus, n = 2, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // 'alpha beta' and 'beta gamma' and 'gamma delta' appear in docs 1,2,10
    assert(out.toSeq == Seq(("alpha beta", 3L), ("beta gamma", 3L),
      ("gamma delta", 3L)))
  }

  test("splitAssignByGroup keeps every group member in one split; NULL groups refused") {
    val docs = Seq((1L, "cluster_a"), (2L, "cluster_a"), (3L, "cluster_b"),
      (4L, "cluster_b"), (5L, "cluster_c")).toDF("doc_id", "grp")
    val out = Governance.splitAssignByGroup(docs, "grp")
      .select("grp", "split").collect()
      .map(r => r.getString(0) -> r.getString(1))
    // same group => same split, and it equals splitAssign on the key
    assert(out.groupBy(_._1).forall(_._2.map(_._2).distinct.length == 1))
    val direct = Governance.splitAssign(
      Seq("cluster_a").toDF("grp"), idCol = "grp")
      .select("split").as[String].collect().head
    assert(out.toMap.apply("cluster_a") == direct)
    val withNull = Seq((1L, "g"), (2L, null: String)).toDF("doc_id", "grp")
    val e = intercept[Exception](
      Governance.splitAssignByGroup(withNull, "grp").collect())
    assert(e.getMessage.contains("NULL"), e.getMessage)
  }

  test("unigramLogProb: typical vocabulary scores higher than rare; exact token accounting") {
    val docs = Seq(
      (1L, "common common common common"),   // only frequent tokens
      (2L, "common rareword"),               // mixed
      (3L, "onlyonceever")                    // all-rare
    ).toDF("doc_id", "text")
    val r = Governance.unigramLogProb(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r(1L)._1 == 4L && r(2L)._1 == 2L && r(3L)._1 == 1L)
    // corpus: common x5, rareword x1, onlyonceever x1; total 7
    val ln = (x: Double) => math.log(x)
    def approx(a: Double, b: Double) = math.abs(a - b) < 1e-5
    assert(approx(r(1L)._2, ln(5.0 / 7)), r(1L).toString)
    assert(approx(r(2L)._2, (ln(5) + ln(1)) / 2 - ln(7)), r(2L).toString)
    assert(approx(r(3L)._2, ln(1.0 / 7)), r(3L).toString)
    assert(r(1L)._2 > r(2L)._2 && r(2L)._2 > r(3L)._2)
    // fully lazy: the corpus-total scalar rides the SAME plan as a
    // broadcast 1-row frame (TermWeights pattern) — building the frame
    // must launch ZERO jobs (the old code collected the total, running
    // tokenize+count once extra per call)
    docs.count() // materialize the local relation outside the window
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val lazyDf = Governance.unigramLogProb(docs)
      Thread.sleep(500) // listener events are async
      assert(jobs == 0, s"expected fully lazy definition, saw $jobs jobs")
      assert(lazyDf.count() == 3L)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("shuffleShards: deterministic seeded permutation; written shards hold the order") {
    val docs = spark.range(0, 2000).toDF("doc_id")
    val a = Governance.shuffleShards(docs, nShards = 8).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    // total, deterministic, balanced-ish
    assert(a.size == 2000)
    val sizes = a.values.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes.keySet == (0 until 8).toSet)
    assert(sizes.values.min > 2000 / 8 / 2, s"skewed: $sizes")
    val b = Governance.shuffleShards(docs, nShards = 8).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(a == b)
    // a different salt is an independent permutation (epoch re-order)
    val c = Governance.shuffleShards(docs, nShards = 8, salt = "epoch2")
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(c.count { case (id, sh) => a(id)._2 == sh } < 1000,
      "salt change must reassign a substantial fraction")
    // the written layout: one dir per shard, rows internally in
    // seeded-key order (the training order IS the file order)
    val out = java.nio.file.Files
      .createTempDirectory("graft-shuffle").resolve("shards").toString
    Governance.writeShuffledShards(docs, out, nShards = 8)
    val shard0 = spark.read.parquet(s"$out/shard=0")
    val keys = shard0.select("sort_key").collect().map(_.getString(0))
    assert(keys.nonEmpty && keys.sameElements(keys.sorted),
      "shard file must be internally ordered by the seeded key")
    val expected0 = a.collect { case (id, (_, 0)) => id }.toSet
    assert(shard0.select("doc_id").collect().map(_.getLong(0)).toSet
      == expected0)
  }

  test("contaminationAgainstIndex matches the direct operator and prunes index files") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-ngram-idx").resolve("idx").toString
    val isEval = col("doc_id") >= 10L
    val idx = Governance.buildNgramIndex(spark,
      corpus.filter(!isEval), root, n = 4, files = 4)
    val direct = Governance.contamination(corpus, isEval, n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val indexed = Governance.contaminationAgainstIndex(idx,
      corpus.filter(isEval), n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(indexed == direct, s"indexed=$indexed direct=$direct")
    // the fully-contaminated eval twin and the clean doc both appear
    val byId = Governance.contaminationAgainstIndex(idx,
      corpus.filter(isEval), n = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(byId(10L) == 1.0 && byId(20L) == 0.0)
    // file pruning: a probe whose grams all hash/range outside most
    // files opens fewer than all of them (range-sorted + Bloom)
    val probeOne = idx.read().limit(1).collect().head.getString(0)
    assert(idx.pruneFiles(col("sh") === probeOne).size <
      idx.currentSnapshot().files.size)
    // the large-probe fallback (maxProbe = 0 forces it) stays exact
    val fallback = Governance.contaminationAgainstIndex(idx,
      corpus.filter(isEval), n = 4, maxProbe = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(fallback == direct)
  }
}
