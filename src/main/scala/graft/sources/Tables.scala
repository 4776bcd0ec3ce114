package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet source for the driver's testdata tables (A5 in SURVEY §2;
  * TESTDATA.md). One quirk: `events.ts` is written as parquet
  * TIMESTAMP(NANOS), which Spark's vectorized reader rejects
  * ([PARQUET_TYPE_ILLEGAL]). We read it via
  * `spark.sql.legacy.parquet.nanosAsLong` and convert nanos → a proper
  * TimestampType column with integer division (micros fit a long;
  * double division would lose precision above 2^53).
  * Verified lossless: the testdata carries microsecond precision only.
  */
object Tables {

  val All: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case _        => spark.read.parquet(s"$dir/$name.parquet")
    }

  /** events with `ts` restored to TimestampType (µs). The nanos-as-long
    * flag is set once per session (idempotent check rather than an
    * unconditional write — a library should not race on session conf
    * from concurrent loads).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    if (!spark.conf.getOption(key).contains("true"))
      spark.conf.set(key, "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }
}
