package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.SnapshotTable

/** Metadata-only DELETE: a file whose manifest bounds PROVE every live
  * row matches the predicate is dropped from the manifest without
  * being opened — the 100 TB retention shape (`DELETE WHERE ts <
  * cutoff` over a time-clustered table commits in O(files) bound
  * checks, zero data I/O). Each case pins the file-set algebra (what
  * dropped, what rewrote, what was staged) AND the surviving rows.
  */
class MetadataDeleteSpec extends AnyFunSuite {

  private lazy val spark = TestSparkSession.spark
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("metadel").resolve("t").toString

  private val schema = StructType(Seq(StructField("id", LongType)))

  /** Four single-file commits: ids [0,100), [100,200), [200,300), [300,400). */
  private def idTable(props: Map[String, String] = Map.empty): SnapshotTable = {
    val t = SnapshotTable.create(spark, freshRoot(), schema, None,
      properties = props)
    (0 until 4).foreach { i =>
      t.append(spark.range(i * 100, i * 100 + 100).toDF("id").repartition(1))
    }
    t
  }

  test("boundary-aligned COW delete drops files without opening them") {
    val t = idTable()
    val base = t.currentSnapshot()
    assert(base.files.size == 4)
    val cur = t.delete(col("id") < 200L)
    assert(cur.operation == "delete")
    // nothing was staged: the survivors are a subset of the old files
    assert(cur.files.map(_.path).toSet.subsetOf(base.files.map(_.path).toSet))
    assert(cur.files.size == 2)
    assert(t.read().select("id").as[Long].collect().sorted.toSeq ==
      (200L until 400L))
  }

  test("partial coverage rewrites ONLY the boundary file") {
    val t = idTable()
    val base = t.currentSnapshot().files.map(_.path).toSet
    val cur = t.delete(col("id") < 250L)
    val keptOld = cur.files.map(_.path).toSet.intersect(base)
    val staged = cur.files.map(_.path).toSet -- base
    // [0,100) and [100,200) dropped metadata-only; [200,300) rewrote to
    // its survivors; [300,400) untouched
    assert(keptOld.size == 1 && staged.size == 1,
      s"kept=$keptOld staged=$staged")
    assert(t.read().select("id").as[Long].collect().sorted.toSeq ==
      (250L until 400L))
  }

  test("timestamp retention delete is metadata-only") {
    val s2 = StructType(Seq(StructField("id", LongType),
      StructField("ts", TimestampType)))
    val t = SnapshotTable.create(spark, freshRoot(), s2, None)
    Seq("2024-01", "2024-02", "2024-03").zipWithIndex.foreach { case (m, i) =>
      t.append((0 until 50).map(j =>
          (i * 50L + j, Timestamp.valueOf(s"$m-10 00:00:00")))
        .toDF("id", "ts").repartition(1))
    }
    val base = t.currentSnapshot()
    val cur = t.delete(col("ts") < lit(Timestamp.valueOf("2024-03-01 00:00:00")))
    assert(cur.files.map(_.path).toSet.subsetOf(base.files.map(_.path).toSet))
    assert(cur.files.size == 1)
    assert(t.read().count() == 50)
  }

  test("a NULL in the predicate column blocks the wholesale drop") {
    val t = SnapshotTable.create(spark, freshRoot(), schema, None)
    t.append((Seq[java.lang.Long](1L, 2L, null))
      .toDF("id").repartition(1))
    val base = t.currentSnapshot().files.map(_.path).toSet
    val cur = t.delete(col("id") < 100L)
    // pred is NULL for the null row: it must SURVIVE, so the file
    // rewrites instead of dropping
    assert((cur.files.map(_.path).toSet -- base).size == 1)
    val left = t.read().select("id").collect()
    assert(left.length == 1 && left.head.isNullAt(0))
  }

  test("an untranslatable conjunct disables the proof, not correctness") {
    val t = idTable()
    val base = t.currentSnapshot().files.map(_.path).toSet
    // id % 2 has no source-filter form: translateExact refuses, the
    // delete scans normally, and rows where the FULL predicate holds go
    val cur = t.delete(col("id") % 2 === 0 && col("id") < 200L)
    assert((cur.files.map(_.path).toSet -- base).nonEmpty)
    assert(t.read().count() == 300)
    assert(t.read().filter(col("id") < 200L && col("id") % 2 === 0).count() == 0)
  }

  test("merge-on-read: covered files drop outright, no vector written for them") {
    val t = idTable(Map("graft.delete.mode" -> "merge-on-read"))
    val base = t.currentSnapshot()
    val aligned = t.deleteWithVectors(col("id") < 200L)
    assert(aligned.operation == "delete-pos")
    assert(aligned.files.size == 2 && aligned.dvFiles.isEmpty,
      "aligned MoR delete must be pure metadata — no vectors")
    val partial = t.deleteWithVectors(col("id") < 250L)
    assert(partial.files.size == 2 && partial.dvFiles.size == 1,
      "only the boundary file gets a vector")
    assert(t.read().select("id").as[Long].collect().sorted.toSeq ==
      (250L until 400L))
  }

  test("REPLACE WHERE drops covered files without opening them") {
    val t = idTable()
    val base = t.currentSnapshot().files.map(_.path).toSet
    val cur = t.overwriteWhere(col("id") < 200L,
      spark.range(9000, 9010).toDF("id"))
    val keptOld = cur.files.map(_.path).toSet.intersect(base)
    // two covered files dropped unopened, two untouched, incoming added
    assert(keptOld.size == 2)
    assert(t.read().select("id").as[Long].collect().sorted.toSeq ==
      ((200L until 400L) ++ (9000L until 9010L)))
  }

  test("LIKE 'prefix%' deletes drop fully-prefixed files unopened") {
    val s2 = StructType(Seq(StructField("uri", StringType)))
    val t = SnapshotTable.create(spark, freshRoot(), s2, None)
    t.append((0 until 50).map(i => s"s3://old-bucket/part-$i")
      .toDF("uri").repartition(1))
    t.append((0 until 50).map(i => s"s3://live-bucket/part-$i")
      .toDF("uri").repartition(1))
    val base = t.currentSnapshot().files.map(_.path).toSet
    val cur = t.delete(col("uri").startsWith("s3://old-bucket/"))
    assert(cur.files.map(_.path).toSet.subsetOf(base) && cur.files.size == 1,
      "the fully-prefixed file must drop without a rewrite")
    assert(t.read().count() == 50)
  }

  test("string bounds prove ASCII ranges; non-ASCII falls back to the scan") {
    val s2 = StructType(Seq(StructField("s", StringType)))
    val t = SnapshotTable.create(spark, freshRoot(), s2, None)
    t.append(Seq("apple", "banana").toDF("s").repartition(1))
    t.append(Seq("melon", "peach").toDF("s").repartition(1))
    val base = t.currentSnapshot().files.map(_.path).toSet
    val cur = t.delete(col("s") < "m")
    assert(cur.files.map(_.path).toSet.subsetOf(base))
    assert(t.read().as[String].collect().sorted.toSeq == Seq("melon", "peach"))
  }
}
