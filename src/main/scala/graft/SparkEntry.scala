package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001: the reference's
    * ingest-shaped pipeline (normalize names → stamp created_at →
    * conform; reference `src/jobs/job.py:64-81`) over the events table.
    * Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    graft.schema.SchemaOps.stampCreatedAt(
      graft.schema.SchemaOps.normalizeNames(ev), Queries.FixedClock)
  }
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracles
}
