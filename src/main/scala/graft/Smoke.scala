package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke main replaying the driver's t1 check: `SparkEntry.entry`
  * must return rows > 0 on sf0.001. Prints the count and the schema.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    println(s"[smoke] entry schema: ${df.schema.simpleString}")
    println(s"[smoke] entry rows: ${df.count()}")

    // Drive the reference-shaped pipeline end-to-end through the public
    // API: drift CSVs -> ingest -> evolving warehouse table -> re-read.
    val dir = java.nio.file.Files.createTempDirectory("graft-smoke").toString
    graft.gen.FakeData.generate(dir, start = 1, end = 4, records = 8,
      seed = 42L, maxOptional = 6)
    val batch = graft.ingest.CsvIngest.ingest(spark, dir, Queries.FixedClock)
    val table = "spark_catalog.default.smoke_customers"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    graft.catalog.EvolvingWriter.configure(spark)
    graft.catalog.EvolvingWriter.appendWithEvolution(spark, batch, table)
    val dir2 = java.nio.file.Files.createTempDirectory("graft-smoke2").toString
    graft.gen.FakeData.generate(dir2, start = 1, end = 4, records = 8,
      seed = 77L, maxOptional = 20)
    val batch2 = graft.ingest.CsvIngest.ingest(spark, dir2,
      java.time.Instant.parse("2026-02-01T00:00:00Z"))
    val added = graft.catalog.EvolvingWriter.appendWithEvolution(spark, batch2, table)
    val back = spark.table(table)
    println(s"[smoke] evolved table rows: ${back.count()} cols: ${back.columns.length} " +
      s"added-by-evolution: ${added.map(_.name).mkString(",")}")
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.stop()
  }
}
