package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Governance

/** Property tests for the governance operators against NAIVE in-memory
  * reference implementations (an oracle independent of both Spark and
  * DuckDB): seeded random corpora, exact equality of results.
  * Hand-rolled generators, same pattern as SchemaOpsPropSpec.
  */
class GovernancePropSpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("splitAssign equals the direct md5-prefix computation for random ids/salts") {
    val r = new Random(11)
    for (_ <- 1 to 5) {
      val salt = "s" + r.nextInt(1000)
      val ids = Vector.fill(300)(r.nextLong().abs)
      val got = Governance.splitAssign(ids.toDF("doc_id"), salt = salt)
        .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
      ids.foreach { id =>
        val p = md5hex(s"$salt:$id").substring(0, 2)
        val want = if (p < "0d") "test" else if (p < "1a") "valid" else "train"
        assert(got(id) == want, s"id=$id prefix=$p")
      }
    }
  }

  test("shuffleShards equals the direct md5-derived shard/key computation") {
    val r = new Random(17)
    for (_ <- 1 to 5) {
      val salt = "sh" + r.nextInt(1000)
      val n = 1 + r.nextInt(255)
      val ids = Vector.fill(300)(r.nextLong().abs)
      val got = Governance.shuffleShards(ids.toDF("doc_id"),
        nShards = n, salt = salt)
        .collect().map(x => x.getLong(0) -> (x.getString(1), x.getInt(2)))
        .toMap
      ids.foreach { id =>
        val h = md5hex(s"$salt:$id")
        val shard = Integer.parseInt(h.substring(0, 2), 16) % n
        assert(got(id) == ((h, shard)), s"id=$id n=$n")
      }
      // stability under growth: a subset keeps its shard and key
      val sub = ids.take(50)
      val gotSub = Governance.shuffleShards(sub.toDF("doc_id"),
        nShards = n, salt = salt)
        .collect().map(x => x.getLong(0) -> (x.getString(1), x.getInt(2)))
        .toMap
      sub.foreach(id => assert(gotSub(id) == got(id)))
    }
  }

  test("sampleStratified equals the direct hex-threshold computation") {
    val r = new Random(13)
    val rates = Map("a" -> 0.3, "b" -> 1.0, "c" -> 0.0)
    val rows = Vector.fill(400)((r.nextLong().abs, Seq("a", "b", "c", "d")(r.nextInt(4))))
    val kept = Governance.sampleStratified(
      rows.toDF("doc_id", "lang"), "lang", rates)
      .collect().map(x => (x.getLong(0), x.getString(1))).toSet
    val want = rows.filter { case (id, lang) =>
      val slots = rates.get(lang).map(x => (x * 65536).toLong)
      slots match {
        case None        => true
        case Some(65536L) => true
        case Some(n)     => md5hex(s"graft-sample:$id").substring(0, 4) < f"$n%04x"
      }
    }.toSet
    assert(kept == want)
  }

  private def canonTokens(text: String): Vector[String] =
    text.toLowerCase.replaceAll("\\s+", " ").trim.split(" ").toVector

  test("rareTokenRatio equals the naive corpus-count computation on random corpora") {
    val r = new Random(17)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    for (_ <- 1 to 3) {
      val docs = (0L until 40L).map { id =>
        id -> Vector.fill(3 + r.nextInt(12))(vocab(r.nextInt(vocab.length))).mkString(" ")
      }
      val counts = docs.flatMap(d => canonTokens(d._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val got = Governance.rareTokenRatio(docs.toDF("doc_id", "text"), rareMax = 3)
        .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
      docs.foreach { case (id, text) =>
        val toks = canonTokens(text)
        val rare = toks.count(t => counts(t) <= 3)
        assert(got(id) == ((toks.size.toLong, rare.toLong)), s"doc $id")
      }
    }
  }

  test("contamination equals the naive shingle-overlap computation on random corpora") {
    val r = new Random(19)
    val vocab = Vector("w1", "w2", "w3", "w4", "w5", "w6")
    val docs = (0L until 30L).map { id =>
      id -> Vector.fill(4 + r.nextInt(8))(vocab(r.nextInt(vocab.length))).mkString(" ")
    }
    def shingles(text: String, n: Int): Set[String] = {
      val t = canonTokens(text)
      if (t.length < n) Set(t.mkString(" "))
      else t.sliding(n).map(_.mkString(" ")).toSet
    }
    val trainSh = docs.filter(_._1 % 3 != 0).flatMap(d => shingles(d._2, 2)).toSet
    val got = Governance.contamination(docs.toDF("doc_id", "text"),
      isEval = col("doc_id") % 3 === 0, n = 2)
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    docs.filter(_._1 % 3 == 0).foreach { case (id, text) =>
      val sh = shingles(text, 2)
      val hits = sh.count(trainSh.contains)
      assert(got(id) == ((sh.size.toLong, hits.toLong)), s"doc $id")
    }
  }

  test("crossDocNgrams equals the naive inverted-index computation on random corpora") {
    import graft.operators.Dedup
    def canon(text: String): Vector[String] =
      text.toLowerCase.split("\\s+").filter(_.nonEmpty).toVector
    def shingles(text: String, n: Int): Set[String] = {
      val t = canon(text)
      if (t.isEmpty) Set("")
      else if (t.length < n) Set(t.mkString(" "))
      else t.sliding(n).map(_.mkString(" ")).toSet
    }
    val r = new Random(23)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    for (trial <- 1 to 3) {
      val n = 2 + trial % 2 // shingle lengths 3, 2, 3
      val docs = (1L to 60L).map(i =>
        i -> Vector.fill(2 + r.nextInt(8))(vocab(r.nextInt(vocab.size)))
          .mkString(" "))
      // naive df over distinct-per-doc shingles
      val df = docs.flatMap { case (_, t) => shingles(t, n) }
        .groupBy(identity).map { case (k, v) => k -> v.size }
      val expected = docs.map { case (id, t) =>
        val sh = shingles(t, n)
        id -> ((sh.size.toLong, sh.count(g => df(g) >= 2).toLong))
      }.toMap
      val got = Dedup.crossDocNgrams(docs.toDF("doc_id", "text"),
        shingleLen = n, minDocs = 2)
        .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2)))
        .toMap
      assert(got == expected, s"trial $trial n=$n")
    }
  }
}
