package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions._

class TextFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("t").select(c.as("v")).collect().head.get(0)

  test("wsTokenCount / bpeishTokenCount") {
    assert(one("hello  world", wsTokenCount(col("t"))) == 2L)
    assert(one("it's 42 ok", bpeishTokenCount(col("t"))) == 5L) // it ' s 42 ok
  }

  test("langId picks marker-dominant language, und when none") {
    assert(one("der Hund ist gut und brav", langId(col("t"))) == "de")
    assert(one("the cat is one of a kind and big", langId(col("t"))) == "en")
    assert(one("el la de que y", langId(col("t"))) == "es")
    assert(one("这是了的中文文本", langId(col("t"))) == "zh")
    assert(one("xyzzy plugh", langId(col("t"))) == "und")
  }

  test("quality score in [0,1], penalizes punct-heavy text") {
    val clean = one("a sentence with plenty of ordinary words here", qualityScore(col("t"))).asInstanceOf[Double]
    val noisy = one("!!! ??? ### $$$ %%%", qualityScore(col("t"))).asInstanceOf[Double]
    assert(clean > 0 && clean <= 1.0)
    assert(noisy < clean)
  }

  test("TextStats expression matches the regex/HOF formulation exactly") {
    import org.apache.spark.sql.functions._
    // the formulation each stat replaced (the oracle-mirrored semantics)
    def refWs(c: org.apache.spark.sql.Column) =
      size(split(trim(c), "\\s+")).cast("long")
    def refBpe(c: org.apache.spark.sql.Column) =
      size(regexp_extract_all(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long")
    def refPunct(c: org.apache.spark.sql.Column) =
      length(regexp_replace(lower(c), "[a-z0-9 ]", "")).cast("long")
    def refStop(c: org.apache.spark.sql.Column) =
      size(filter(split(trim(lower(c)), "\\s+"),
        t => t.isin(Stopwords.map(lit): _*))).cast("long")
    def refQuality(c: org.apache.spark.sql.Column) = {
      val nTok = refWs(c).cast("double")
      val punctRatio = refPunct(c).cast("double") / length(c).cast("double")
      val stopRatio = refStop(c).cast("double") / nTok
      least(nTok / lit(50.0), lit(1.0)) * lit(0.4) +
        (lit(1.0) - least(punctRatio * lit(5.0), lit(1.0))) * lit(0.3) +
        (lit(1.0) - stopRatio) * lit(0.3)
    }
    val adversarial = Seq("", " ", "  \t ", "\tleading tab", "trailing tab\t",
      "the The THE", "a", " a ", "mixedCASE And 42 !!", "于 中文 the 文本",
      "emoji 😀 mid", "double  space", "crlf\r\nline", "xy")
      .toDF("text")
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text")).unionByName(adversarial)
      // ANSI Spark 4 makes the reference quality formulation THROW on
      // empty text (x/0); TextStats deliberately yields NaN instead —
      // compare on non-empty inputs, check the divergence separately
      .filter(length(col("text")) > 0)
    val mismatches = corpus.select(
        wsTokenCount(col("text")).as("ws"), refWs(col("text")).as("ws_r"),
        bpeishTokenCount(col("text")).as("bpe"), refBpe(col("text")).as("bpe_r"),
        punctCount(col("text")).as("p"), refPunct(col("text")).as("p_r"),
        stopwordCount(col("text")).as("s"), refStop(col("text")).as("s_r"),
        qualityScore(col("text")).as("q"), refQuality(col("text")).as("q_r"))
      .filter(col("ws") =!= col("ws_r") || col("bpe") =!= col("bpe_r") ||
        col("p") =!= col("p_r") || col("s") =!= col("s_r") ||
        // NaN-safe double equality
        !(col("q") <=> col("q_r")))
    assert(mismatches.count() == 0, mismatches.collect().take(3).mkString("; "))
    // empty text: finite stats and a finite score (the 0/0 NaN is
    // clamped by the least() term) instead of the ANSI divide error
    val empty = Seq("").toDF("text").select(
      wsTokenCount(col("text")).as("ws"), qualityScore(col("text")).as("q"))
      .collect().head
    assert(empty.getLong(0) == 1L)
    assert(empty.getDouble(1) == 1.0 / 50.0 * 0.4 + 0.3)
  }

  test("repetition fractions: repetitive text scores high, varied text low") {
    val looped = "spam ham spam ham spam ham spam ham"
    // bigrams: 7 total, distinct {spam ham, ham spam} = 2 -> 1 - 2/7
    assert(one(looped, dupBigramFraction(col("t"))) == 1.0 - 2.0 / 7.0)
    assert(one("all words here are different", dupBigramFraction(col("t"))) == 0.0)
    assert(one("line\nline\nother", dupLineFraction(col("t"))) == 1.0 - 2.0 / 3.0)
    assert(one("single line only", dupLineFraction(col("t"))) == 0.0)
  }

  test("fingerprintKey is stable under token reorder/duplication, exact is not") {
    val a = "alpha beta gamma"
    val b = "gamma beta  alpha beta"
    assert(one(a, fingerprintKey(col("t"))) == one(b, fingerprintKey(col("t"))))
    assert(one(a, fingerprintExact(col("t"))) != one(b, fingerprintExact(col("t"))))
  }

  test("topTerms ranks by df-discounted weight, ties by term") {
    import graft.operators.TermWeights
    // N=3; tf: d1(a:2,b:1) d2(b:1,c:1) d3(c:1,d:2); df: a1 b2 c2 d1
    val docs = Seq((1L, "A a b"), (2L, "b  c"), (3L, "c d D"))
      .toDF("doc_id", "text")
    val got = TermWeights.topTerms(docs, k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getDouble(2), r.getLong(3))).toSet
    // w = tf * (3 - df + 0.5) / (df + 0.5)
    val wA = 2.0 * (3.0 - 1 + 0.5) / 1.5   // 10/3
    val wB1 = 1.0 * (3.0 - 2 + 0.5) / 2.5  // 0.6
    assert(got == Set(
      (1L, "a", wA, 1L), (1L, "b", wB1, 2L),
      (2L, "b", wB1, 1L), (2L, "c", wB1, 2L), // tie → term asc
      (3L, "d", wA, 1L), (3L, "c", wB1, 2L)))
  }

  test("topTerms N counts only docs with >=1 token (empty-text docs excluded)") {
    import graft.operators.TermWeights
    // Pins the N definition INDEPENDENTLY of the DuckDB oracle (ADVICE
    // r6: impl and oracle were edited in lockstep, so an oracle-only
    // check could not catch a regression here). Doc 3 tokenizes to
    // zero tokens — punctuation only — and must not inflate N: the
    // collection size is the docs in the index, the same definition
    // bm25 uses. Tokenization is whitespace over normalText, so the
    // zero-token doc is whitespace-only. With N=2 (not 3),
    // w(a in d1) = 1*(2-1+0.5)/1.5 = 1.0.
    val docs = Seq((1L, "a b"), (2L, "b c"), (3L, "   \t ")).toDF("doc_id", "text")
    val got = TermWeights.topTerms(docs, k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(!got.exists(_._1 == 3L), "zero-token doc emits no terms")
    val wUnique = 1.0 * (2.0 - 1 + 0.5) / 1.5 // N=2: empty doc excluded
    val wShared = 1.0 * (2.0 - 2 + 0.5) / 2.5
    assert(got == Set((1L, "a", wUnique), (1L, "b", wShared),
      (2L, "c", wUnique), (2L, "b", wShared)))
  }

  test("bm25 matches the direct formula") {
    import graft.operators.TermWeights
    val docs = Seq((1L, "a a b"), (2L, "b c"), (3L, "c d d"))
      .toDF("doc_id", "text")
    val got = TermWeights.bm25(docs, Seq("c", "d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val (n, avgdl, k1, b) = (3.0, 8.0 / 3.0, 1.2, 0.75)
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def term(tf: Double, df: Double, dl: Double) =
      idf(df) * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
    assert(got.keySet == Set(2L, 3L), "only docs containing c or d")
    assert(math.abs(got(2L) - term(1, 2, 2)) < 1e-12)          // c in d2
    assert(math.abs(got(3L) - (term(1, 2, 3) + term(2, 1, 3))) < 1e-12)
  }

  test("topTerms and bm25 are single-pipeline: zero jobs until an action") {
    import graft.operators.TermWeights
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    docs.count() // materialize the local relation outside the window
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val tt = TermWeights.topTerms(docs, k = 2)
      val bm = TermWeights.bm25(docs, Seq("b"))
      Thread.sleep(500) // listener events are async; give any job time to surface
      // building the frames runs NO corpus pass (the old code ran a
      // distinct().count() / stats collect per call — a full extra
      // scan per invocation at 100 TB)
      assert(jobs == 0, s"expected fully lazy definition, saw $jobs jobs")
      assert(tt.count() > 0 && bm.count() > 0)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("bm25 query-term hygiene: Locale.ROOT lowercase, no multi-word terms") {
    import graft.operators.TermWeights
    val docs = Seq((1L, "If it is")).toDF("doc_id", "text")
    val dflt = java.util.Locale.getDefault
    try {
      // Turkish locale: default toLowerCase("I") is 'ı' (dotless), which
      // would silently match nothing against the locale-free corpus tokens
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      assert(TermWeights.bm25(docs, Seq("If")).count() == 1L)
    } finally java.util.Locale.setDefault(dflt)
    val e = intercept[IllegalArgumentException] {
      TermWeights.bm25(docs, Seq("two words"))
    }
    assert(e.getMessage.contains("single words"))
  }

  test("bm25 over an empty corpus returns empty with the right schema") {
    import graft.operators.TermWeights
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val got = TermWeights.bm25(docs, Seq("a"))
    assert(got.columns.toSeq == Seq("doc_id", "score"))
    assert(got.count() == 0L)
  }

  test("bm25AgainstIndex: frozen stats, unseen terms drop, index prunes by term") {
    import graft.operators.TermWeights
    val corpus = Seq((1L, "a a b"), (2L, "b c"), (3L, "c d d"))
      .toDF("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("termstats")
      .resolve("idx").toString
    val idx = TermWeights.buildTermStatsIndex(spark, corpus, root)
    // batch doc lengths come from the batch; df/N/avgdl stay frozen
    val batch = Seq((100L, "c d zz")).toDF("doc_id", "text")
    val got = TermWeights.bm25AgainstIndex(idx, batch, Seq("c", "d", "zz"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val (n, avgdl, k1, b) = (3.0, 8.0 / 3.0, 1.2, 0.75)
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def term(tf: Double, df: Double, dl: Double) =
      idf(df) * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
    // 'zz' is unseen in the reference corpus: contributes nothing
    assert(math.abs(got(100L) - (term(1, 2, 3) + term(1, 1, 3))) < 1e-12)
    // the same batch through the non-incremental scorer over the same
    // corpus agrees where the batch doc's own length matches
    val full = TermWeights.bm25(corpus, Seq("c", "d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(full(3L) - (term(1, 2, 3) + term(2, 1, 3))) < 1e-12)
    // term-sorted files: a one-term probe opens a strict file subset
    val all = idx.currentSnapshot().files.size
    assert(all > 1)
    assert(idx.pruneFiles(col("term") === "a").size < all)
    // a non-index table refuses up front
    val plain = graft.catalog.SnapshotTable.create(spark,
      java.nio.file.Files.createTempDirectory("plain").resolve("t").toString,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("term",
          org.apache.spark.sql.types.StringType))), None)
    val e = intercept[Exception](
      TermWeights.bm25AgainstIndex(plain, batch, Seq("c")))
    assert(e.getMessage.contains("term-stats"), e.getMessage)
  }
}
