package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftExtensions

/** SQL surface of the native expressions: every function registered by
  * [[GraftExtensions]] must be callable from `spark.sql` and agree with
  * its Column API twin.
  */
class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = {
    val s = TestSparkSession.spark
    GraftExtensions.register(s)
    s
  }
  import spark.implicits._

  test("SQL functions agree with the Column API") {
    Seq(("the quick brown fox", Array(0.5f, -1.0f, 2.0f), Array(1.0f, 0.5f, -0.25f)))
      .toDF("t", "a", "b").createOrReplaceTempView("g_ext")
    val viaSql = spark.sql(
      """SELECT simhash64(t) AS sh, word_shingles(t, 2) AS ws,
        |       minhash_bands(word_shingles(t, 3), 64, 16, 42) AS mh,
        |       lsh_sign_bits(a, 16, 42) AS lsh,
        |       cosine_sim(a, b) AS cos,
        |       text_stats(t).n_ws_tokens AS n_tok,
        |       text_stats(t).quality AS q
        |FROM g_ext""".stripMargin).collect().head
    val viaCol = spark.table("g_ext").select(
      graft.functions.SimHash64.simhash64(col("t")).as("sh"),
      graft.functions.WordShingles.wordShingles(col("t"), 2).as("ws"),
      graft.functions.MinHash.minhashBands(
        graft.functions.WordShingles.wordShingles(col("t"), 3), 64, 16).as("mh"),
      graft.functions.LshSign.lshSignBits(col("a"), 16).as("lsh"),
      graft.functions.CosineSim.cosineSim(col("a"), col("b")).as("cos"),
      graft.functions.TextFunctions.wsTokenCount(col("t")).as("n_tok"),
      graft.functions.TextFunctions.qualityScore(col("t")).as("q"))
      .collect().head
    assert(viaSql.getLong(0) == viaCol.getLong(0))
    assert(viaSql.getSeq[String](1) == viaCol.getSeq[String](1))
    assert(viaSql.getSeq[Long](2) == viaCol.getSeq[Long](2))
    assert(viaSql.getLong(3) == viaCol.getLong(3))
    assert(viaSql.getDouble(4) == viaCol.getDouble(4))
    assert(viaSql.getLong(5) == viaCol.getLong(5))
    assert(viaSql.getDouble(6) == viaCol.getDouble(6))
  }

  test("non-literal size arguments fail at analysis, not at runtime") {
    val e = intercept[Exception] {
      spark.sql("SELECT word_shingles('a b c', CAST(rand() * 3 AS INT))").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("functions are visible to SHOW FUNCTIONS") {
    val names = spark.sql("SHOW USER FUNCTIONS").collect().map(_.getString(0)).toSet ++
      spark.sql("SHOW SYSTEM FUNCTIONS").collect().map(_.getString(0)).toSet
    for (f <- Seq("simhash64", "word_shingles", "minhash_bands",
        "lsh_sign_bits", "cosine_sim", "text_stats"))
      assert(names.exists(_.endsWith(f)), s"$f missing from SHOW FUNCTIONS")
  }
}
