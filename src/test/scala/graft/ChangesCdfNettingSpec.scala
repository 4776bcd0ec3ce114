package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.SnapshotTable

/** Cross-path invariant for the labeled change feed (r18): for ANY
  * window, collapsing [[SnapshotTable.changesCdf]]'s per-commit labels
  * (`update_preimage → delete`, `update_postimage → insert`) and
  * NETTING the result as a multiset must equal the netted two-label
  * diff [[SnapshotTable.changes]] serves — both views describe the
  * same pair of endpoint snapshots, so they may differ only in HOW
  * they tell the story, never in the net story itself. A labeling bug
  * (a pre-image read at the wrong snapshot, an update image counted
  * twice, a dropped delete vector) breaks the equality.
  *
  * The DML sequence deliberately mixes every commit class the router
  * distinguishes: blind appends, MoR UPDATE (`update-pos`, flagged
  * provenance), native-SQL-equivalent MoR MERGE via the Scala API
  * (`merge-pos`, split lanes), CoW update (relabeled netted diff),
  * MoR positional delete, equality delete, and a no-op maintenance
  * commit.
  */
class ChangesCdfNettingSpec extends AnyFunSuite {

  private lazy val spark = TestSparkSession.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", DoubleType, nullable = true)))

  private def rows(ids: Seq[(Long, Double)]): DataFrame = {
    val data = ids.map { case (i, v) => Row(i, v) }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
  }

  /** Collapse CDF labels to the two-label alphabet. */
  private def collapsed(df: DataFrame): DataFrame =
    df.withColumn("_change_type",
      when(col("_change_type") === "update_preimage", "delete")
        .when(col("_change_type") === "update_postimage", "insert")
        .otherwise(col("_change_type")))

  /** Net a two-label change frame as a signed multiset:
    * (+1 insert / −1 delete) summed per row image.
    */
  private def netted(df: DataFrame): Seq[(Long, Double, Long)] =
    df.groupBy(col("id"), col("v"))
      .agg(sum(when(col("_change_type") === "insert", 1L)
        .otherwise(-1L)).as("w"))
      .filter(col("w") =!= 0L)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) Double.NaN else r.getDouble(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))

  test("netted changesCdf equals netted changes across every commit class") {
    val root = java.nio.file.Files.createTempDirectory("graft-cdf-net")
      .resolve("t").toString
    val t = SnapshotTable.create(spark, root, schema, None,
      properties = Map(
        "graft.update.mode" -> "merge-on-read",
        "graft.merge.mode" -> "merge-on-read",
        "graft.delete.mode" -> "merge-on-read"))
    t.append(rows((0L until 40L).map(i => i -> i.toDouble)))      // v2
    t.updateRouted(Seq("v" -> (col("v") + lit(100.0d))),
      col("id") % 5 === 0)                                        // v3 update-pos
    t.append(rows((40L until 50L).map(i => i -> i.toDouble)))     // v4
    t.mergeConditional(
      rows((30L until 60L by 3).map(i => i -> (i + 0.5))),
      Seq("id"),
      Seq(
        graft.catalog.MergeClause(Some(col("s.id") % 2 === 0),
          graft.catalog.MergeAction.Delete),
        graft.catalog.MergeClause(None, graft.catalog.MergeAction.UpdateAll)),
      Seq(graft.catalog.InsertClause(None)), Nil)                 // v5 merge-pos
    t.deleteRouted(col("id") === 7L)                              // v6 delete-pos
    t.deleteByKeys(Seq(Tuple1(11L)).toDF("id"), Seq("id"))        // v7 delete-eq
    t.setProperties(Map("probe" -> "1"))                          // v8 netzero
    t.upsert(rows(Seq(1L -> 500.0, 999L -> 9.0)), Seq("id"))      // v9 CoW upsert
    val head = t.currentVersion()

    // the CoW upsert serves LABELED (r19 two-lane staging + key ids
    // in the op): matched key 1 becomes an update pair, fresh key 999
    // a plain insert — not the netted two-label fallback
    val ups = t.changesCdf(8, 9)
      .select(col("_change_type"), col("id"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(ups == Set(
      ("update_preimage", 1L, 1.0),
      ("update_postimage", 1L, 500.0),
      ("insert", 999L, 9.0)), ups.toString)

    // every window shape: single versions, multi-version runs, the
    // full history, and windows starting mid-history
    val windows = (1L until head).flatMap(a =>
      Seq((a, a + 1), (a, head))).distinct
    windows.foreach { case (from, to) =>
      val viaCdf = netted(collapsed(t.changesCdf(from, to)))
      val viaNet = netted(t.changes(from, to))
      assert(viaCdf == viaNet,
        s"window ($from, $to]: labeled-feed net ${viaCdf.take(5)}... != " +
          s"netted-diff ${viaNet.take(5)}...")
    }

    // and the labels themselves are present where promised: the
    // update-pos window must carry only update pairs
    val lbl = t.changesCdf(2, 3).select("_change_type").distinct()
      .as[String].collect().toSet
    assert(lbl == Set("update_preimage", "update_postimage"), lbl.toString)
  }

  test("labeled windows CROSSING schema evolution render under the endpoint schema") {
    val root = java.nio.file.Files.createTempDirectory("graft-cdf-evo")
      .resolve("t").toString
    val t = SnapshotTable.create(spark, root, schema, None,
      properties = Map("graft.update.mode" -> "merge-on-read"))
    t.append(rows((0L until 10L).map(i => i -> i.toDouble)))      // v2
    t.updateRouted(Seq("v" -> (col("v") + lit(100.0d))),
      col("id") === 3L)                                           // v3 update-pos
    t.addColumnWithDefault(
      StructField("src", org.apache.spark.sql.types.StringType),
      "legacy")                                                   // v4 ADD DEFAULT
    t.renameColumn("v", "score")                                  // v5 RENAME
    t.append(Seq((20L, 20.0, "live")).toDF("id", "score", "src")) // v6
    t.updateRouted(Seq("score" -> (col("score") + lit(7.0d))),
      col("id") === 20L)                                          // v7 update-pos
    val head = t.currentVersion()

    // the full window serves LABELED (no netted fallback): the v3
    // update pair renders under the END schema — `v` surfaces as
    // `score`, `src` carries the recorded initial default
    val cdf = t.changesCdf(1, head)
      .select(col("_change_type"), col("id"), col("score"), col("src"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getString(3)))
    val expected =
      (0L until 10L).map(i => ("insert", i, i.toDouble, "legacy")) ++
        Seq(
          ("update_preimage", 3L, 3.0, "legacy"),
          ("update_postimage", 3L, 103.0, "legacy"),
          ("insert", 20L, 20.0, "live"),
          ("update_preimage", 20L, 20.0, "live"),
          ("update_postimage", 20L, 27.0, "live"))
    assert(cdf.sorted.toSeq == expected.sorted,
      s"evolution-crossing labels: ${cdf.sorted.take(6).mkString("; ")}")

    // netting invariant holds across the evolution too (changes()
    // renders under the same endpoint schema)
    val viaCdf = nettedEvo(collapsed(t.changesCdf(1, head)))
    val viaNet = nettedEvo(t.changes(1, head))
    assert(viaCdf == viaNet, s"$viaCdf != $viaNet")
  }

  private def nettedEvo(df: DataFrame): Seq[(Long, Double, String, Long)] =
    df.groupBy(col("id"), col("score"), col("src"))
      .agg(sum(when(col("_change_type") === "insert", 1L)
        .otherwise(-1L)).as("w"))
      .filter(col("w") =!= 0L)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) Double.NaN else r.getDouble(1),
        r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
}
