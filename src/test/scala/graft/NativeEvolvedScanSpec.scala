package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, sum}
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.SnapshotTable

/** Schema-DRIFT files read natively: after ADD/RENAME/DROP/widen, old
  * files carry different (write-name, field-id) pairs than the
  * snapshot and previously forced the WHOLE table onto the V1 row
  * bridge forever (until a rewrite) — the steady state of an evolving
  * table, this engine's headline feature. The scan now groups files by
  * shape and reads each through a per-shape physical schema resolved
  * by field id ([[graft.catalog.GraftBatchScan]] `shapeSchema`):
  * write-time names, current types, absent columns null-filled under a
  * reserved name.
  *
  * The reserved-name detail is load-bearing: a dropped-and-re-added
  * column's old file still holds a DEAD physical column under the
  * current name, whose stale values must never surface — pinned below.
  */
class NativeEvolvedScanSpec extends AnyFunSuite {

  private lazy val spark = TestSparkSession.spark
  import spark.implicits._

  private def sql(q: String): DataFrame = spark.sql(q)

  private def warehouse = spark.conf.get("spark.sql.catalog.graft.warehouse")

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("ADD COLUMN drift: native columnar read, old rows null-filled") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.evo")
    sql("DROP TABLE IF EXISTS graft.evo.a")
    sql("CREATE TABLE graft.evo.a (id BIGINT, v DOUBLE)")
    sql("INSERT INTO graft.evo.a SELECT id, cast(id as double) " +
      "FROM range(0, 5000)")
    sql("ALTER TABLE graft.evo.a ADD COLUMN w BIGINT")
    sql("INSERT INTO graft.evo.a SELECT id, cast(id as double), id * 2 " +
      "FROM range(5000, 8000)")
    val df = spark.table("graft.evo.a")
    val plan = finalPlan(df)
    assert(plan.contains("GraftBatchScan"),
      s"drifted table must stay on the native scan:\n${plan.take(2000)}")
    assert(plan.contains("ColumnarToRow"),
      s"drifted read must stay columnar:\n${plan.take(2000)}")
    assert(df.count() == 8000)
    assert(df.filter("w IS NULL").count() == 5000, "old files null-fill w")
    assert(df.agg(sum("w")).as[Long].head ==
      (5000L until 8000L).map(_ * 2).sum)
  }

  test("RENAME drift: old files resolve through the field id; filters exact") {
    sql("DROP TABLE IF EXISTS graft.evo.r")
    sql("CREATE TABLE graft.evo.r (id BIGINT, score DOUBLE)")
    sql("INSERT INTO graft.evo.r SELECT id, cast(id as double) " +
      "FROM range(0, 4000)")
    sql("ALTER TABLE graft.evo.r RENAME COLUMN score TO points")
    sql("INSERT INTO graft.evo.r SELECT id, cast(id as double) " +
      "FROM range(4000, 6000)")
    val df = spark.table("graft.evo.r").filter("points >= 1000")
    assert(finalPlan(df).contains("GraftBatchScan"))
    // rows from BOTH shapes must pass the filter on the current name
    assert(df.count() == 5000)
    assert(df.agg(sum("points")).as[Double].head ==
      (1000L until 6000L).map(_.toDouble).sum)
  }

  test("dropped-and-re-added column: stale physical values never surface") {
    sql("DROP TABLE IF EXISTS graft.evo.d")
    sql("CREATE TABLE graft.evo.d (id BIGINT, v BIGINT)")
    sql("INSERT INTO graft.evo.d SELECT id, 999 FROM range(0, 100)")
    sql("ALTER TABLE graft.evo.d DROP COLUMN v")
    sql("ALTER TABLE graft.evo.d ADD COLUMN v BIGINT")
    sql("INSERT INTO graft.evo.d SELECT id, 1 FROM range(100, 200)")
    val df = spark.table("graft.evo.d")
    assert(finalPlan(df).contains("GraftBatchScan"))
    // the old file still HOLDS a parquet column named `v` (= 999); the
    // re-added field id differs, so those values are dead
    assert(df.filter("v = 999").count() == 0,
      "stale values of the dropped column leaked through the re-added name")
    assert(df.filter("v IS NULL").count() == 100)
    assert(df.filter("v = 1").count() == 100)
  }

  test("widen + drift + delete vectors compose on the native scan") {
    sql("DROP TABLE IF EXISTS graft.evo.w")
    sql("CREATE TABLE graft.evo.w (id BIGINT, n INT)")
    sql("INSERT INTO graft.evo.w SELECT id, cast(id as int) " +
      "FROM range(0, 3000)")
    sql("ALTER TABLE graft.evo.w ALTER COLUMN n TYPE BIGINT")
    sql("ALTER TABLE graft.evo.w ADD COLUMN tag STRING")
    sql("INSERT INTO graft.evo.w SELECT id, id, 'new' " +
      "FROM range(3000, 5000)")
    val t = SnapshotTable.load(spark, s"$warehouse/evo/w")
    t.deleteWithVectors(col("id") % 10 === 0)
    val df = spark.table("graft.evo.w")
    val plan = finalPlan(df)
    assert(plan.contains("GraftBatchScan"),
      s"drift+dv must stay native:\n${plan.take(2000)}")
    val survivors = (0L until 5000L).filterNot(_ % 10 == 0)
    assert(df.count() == survivors.size.toLong)
    assert(df.agg(sum("n")).as[Long].head == survivors.sum,
      "old int32 pages must upcast to the widened type, dv-masked")
    assert(df.filter("tag IS NULL").count() ==
      survivors.count(_ < 3000).toLong)
  }

  test("initial-defaults: old shapes substitute the default constant, native") {
    sql("DROP TABLE IF EXISTS graft.evo.f")
    sql("CREATE TABLE graft.evo.f (id BIGINT)")
    sql("INSERT INTO graft.evo.f SELECT id FROM range(0, 1000)")
    sql("ALTER TABLE graft.evo.f ADD COLUMNS " +
      "(tier STRING DEFAULT 'bronze', credits BIGINT DEFAULT 7)")
    sql("INSERT INTO graft.evo.f SELECT id, 'gold', 1 " +
      "FROM range(1000, 1500)")
    val df = spark.table("graft.evo.f")
    val plan = finalPlan(df)
    assert(plan.contains("GraftBatchScan"),
      s"a defaulted table must keep the native scan:\n${plan.take(2000)}")
    assert(plan.contains("ColumnarToRow"),
      s"default substitution must stay columnar:\n${plan.take(2000)}")
    assert(df.filter("tier = 'bronze'").count() == 1000,
      "files predating the column surface the initial-default")
    assert(df.filter("tier = 'gold'").count() == 500)
    assert(df.agg(sum("credits")).as[Long].head == 1000L * 7 + 500L)
    // explicit NULL written after the add stays NULL (only ABSENT
    // columns default)
    sql("INSERT INTO graft.evo.f VALUES (9999, NULL, NULL)")
    assert(spark.table("graft.evo.f")
      .filter("id = 9999 AND tier IS NULL AND credits IS NULL")
      .count() == 1)
  }

  test("NESTED drift: add/rename/drop-readd remap natively one level down") {
    sql("DROP TABLE IF EXISTS graft.evo.n")
    sql("CREATE TABLE graft.evo.n " +
      "(id BIGINT, meta STRUCT<kind: STRING, score: BIGINT>)")
    sql("INSERT INTO graft.evo.n SELECT id, " +
      "named_struct('kind', 'a', 'score', id) FROM range(0, 1000)")
    // grow the struct; old files read NULL for the new field
    sql("ALTER TABLE graft.evo.n ADD COLUMNS (meta.boost DOUBLE)")
    sql("INSERT INTO graft.evo.n SELECT id, " +
      "named_struct('kind', 'b', 'score', id, 'boost', 0.5) " +
      "FROM range(1000, 1500)")
    // rename: old files keep serving values through the nested id
    sql("ALTER TABLE graft.evo.n RENAME COLUMN meta.score TO points")
    val df = spark.table("graft.evo.n")
    val plan = finalPlan(df.select("id", "meta.points", "meta.boost"))
    assert(plan.contains("GraftBatchScan"),
      s"nested drift must stay native:\n${plan.take(2000)}")
    assert(df.agg(sum("meta.points")).as[Long].head ==
      (0L until 1500L).sum, "renamed nested field reads both shapes")
    assert(df.filter("meta.boost IS NULL").count() == 1000)
    // filter on the renamed nested field: dropped for old shapes at
    // the parquet level, re-applied above — counts stay exact
    assert(df.filter("meta.points < 100").count() == 100)
    // drop-readd: fresh nested id, NO resurrection from old files
    sql("ALTER TABLE graft.evo.n DROP COLUMN meta.points")
    sql("ALTER TABLE graft.evo.n ADD COLUMNS (meta.points BIGINT)")
    val df2 = spark.table("graft.evo.n")
    assert(finalPlan(df2).contains("GraftBatchScan"))
    assert(df2.filter("meta.points IS NOT NULL").count() == 0,
      "stale nested values leaked through the re-added name")
    sql("INSERT INTO graft.evo.n SELECT id, " +
      "named_struct('kind', 'c', 'boost', 1.0, 'points', id) " +
      "FROM range(1500, 1600)")
    assert(spark.table("graft.evo.n").agg(sum("meta.points"))
      .as[Long].head == (1500L until 1600L).sum)
  }

  test("row-level UPDATE on a drifted table: shapes + synthesized positions") {
    sql("DROP TABLE IF EXISTS graft.evo.u")
    sql("CREATE TABLE graft.evo.u (id BIGINT, v DOUBLE)")
    sql("INSERT INTO graft.evo.u SELECT id, cast(id as double) " +
      "FROM range(0, 3000)")
    sql("ALTER TABLE graft.evo.u ADD COLUMN bonus DOUBLE")
    sql("INSERT INTO graft.evo.u SELECT id, cast(id as double), 0.5 " +
      "FROM range(3000, 5000)")
    sql("UPDATE graft.evo.u SET v = v + 1 WHERE id % 2 = 0")
    val df = spark.table("graft.evo.u")
    assert(df.count() == 5000)
    val expect = (0L until 5000L).map(id =>
      id.toDouble + (if (id % 2 == 0) 1.0 else 0.0)).sum
    assert(df.agg(sum("v")).as[Double].head == expect,
      "positions synthesized per shape must stay file-absolute")
    assert(df.filter("bonus IS NULL").count() == 3000)
  }

  test("equality delete on an initial-DEFAULTED key masks natively against logical rows") {
    sql("DROP TABLE IF EXISTS graft.evo.eqd")
    sql("CREATE TABLE graft.evo.eqd (id BIGINT) " +
      "TBLPROPERTIES ('graft.delete.mode' = 'equality')")
    sql("INSERT INTO graft.evo.eqd SELECT id FROM range(0, 3)")
    sql("ALTER TABLE graft.evo.eqd ADD COLUMN k STRING DEFAULT 'd'")
    sql("INSERT INTO graft.evo.eqd " +
      "SELECT id, CASE WHEN id = 4 THEN 'd' ELSE 'x' END FROM range(4, 6)")
    sql("DELETE FROM graft.evo.eqd WHERE k = 'd'")
    val st = SnapshotTable.load(spark, s"$warehouse/evo/eqd")
    assert(st.currentSnapshot().deleteFiles.nonEmpty,
      "the key-predicate DELETE must commit an equality-delete file")
    val df = spark.table("graft.evo.eqd")
    val plan = finalPlan(df)
    assert(plan.contains("GraftBatchScan"),
      s"a defaulted key no longer forces the V1 bridge:\n${plan.take(2000)}")
    // the predating file's rows carry k = 'd' LOGICALLY (the initial
    // default the read substitutes) — the mask must kill them too,
    // exactly like the V1 anti-join over projected values did
    assert(df.select("id").as[Long].collect().sorted.toSeq == Seq(5L),
      "only the explicit k='x' row survives")
  }

  test("BINARY equality-delete keys mask natively by content") {
    sql("DROP TABLE IF EXISTS graft.evo.eqb")
    sql("CREATE TABLE graft.evo.eqb (id BIGINT, b BINARY)")
    sql("INSERT INTO graft.evo.eqb " +
      "SELECT id, cast(concat('k', id) as binary) FROM range(0, 100)")
    val st = SnapshotTable.load(spark, s"$warehouse/evo/eqb")
    st.deleteByKeys(Seq("k7", "k13").map(_.getBytes("UTF-8")).toDF("b"),
      Seq("b"))
    assert(st.currentSnapshot().deleteFiles.nonEmpty)
    val df = spark.table("graft.evo.eqb")
    val plan = finalPlan(df)
    assert(plan.contains("GraftBatchScan"),
      s"binary keys no longer force the V1 bridge:\n${plan.take(2000)}")
    // content equality, not array reference: exactly the two keyed
    // rows die (a reference-equality key set would delete nothing)
    assert(df.count() == 98)
    assert(df.filter("id IN (7, 13)").count() == 0)
  }
}
