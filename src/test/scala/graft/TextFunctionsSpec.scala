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

  test("fingerprintKey is stable under token reorder/duplication, exact is not") {
    val a = "alpha beta gamma"
    val b = "gamma beta  alpha beta"
    assert(one(a, fingerprintKey(col("t"))) == one(b, fingerprintKey(col("t"))))
    assert(one(a, fingerprintExact(col("t"))) != one(b, fingerprintExact(col("t"))))
  }
}
