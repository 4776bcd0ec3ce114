package graft

import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.SchemaOps

/** The query inventory behind `SparkEntry.queries` / `oracleSql`
  * (SURVEY §7.1 `graft.Queries`). Each entry is a named operator
  * demonstration over the driver's read-only parquet testdata; each
  * SQL-expressible one carries a DuckDB oracle with IDENTICAL column
  * names and deterministic ordering.
  *
  * Numeric discipline for oracle parity: aggregates over doubles are
  * computed in exact decimal arithmetic on both sides and cast to double
  * at the end — decimal sums are order-independent and engine-exact,
  * so Spark and DuckDB produce bit-identical doubles.
  */
object Queries {

  /** Fixed ingestion clock (SURVEY §7.4 risk 3: the reference stamps
    * driver-side `now()`; determinism requires an injected instant).
    */
  val FixedClock: Instant = Instant.parse("2026-01-01T00:00:00Z")

  private[graft] def t(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables.load(spark, dir, name)

  // ---------------------------------------------------------------------
  // TPC-H-ish parity-demonstration queries (SURVEY §2 absent-class note:
  // these demonstrate the engine's general query surface over the
  // driver's tables).
  // ---------------------------------------------------------------------

  /** Pricing-summary aggregation (TPC-H Q1 shape): map-side-combinable
    * hash aggregate over lineitem; one shuffle on the 2 grouping keys.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double").as("sum_base_price"),
        sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1) - col("l_discount").cast("decimal(12,2)"))).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------------
  // Registry
  // ---------------------------------------------------------------------

  /** name → ((spark, sfDir) => result). Grows with SURVEY §2 coverage. */
  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg(_, _))
  )

  /** name → DuckDB oracle SQL; keys ⊆ all.keys. */
  def oracles: Map[String, String] = Map(
    "q1_agg" -> q1AggSql
  )
}
