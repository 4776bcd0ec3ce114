package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Pins the r20 schema-cache behavior of [[Tables.load]]: the cached
  * (metadata-only) read path must serve the SAME schema and the SAME
  * rows as a bare `spark.read.parquet` — the cache removes the
  * per-construction inference job, never changes what a query reads.
  */
class TablesSchemaCacheSpec extends AnyFunSuite {

  private lazy val spark = TestSparkSession.spark

  private val dir = "/root/testdata/sf0.001"

  test("cached loads match bare reads on schema and row count") {
    for (name <- Tables.All) {
      val a = Tables.load(spark, dir, name) // fills the cache
      val b = Tables.load(spark, dir, name) // served from the cache
      assert(a.schema == b.schema, s"$name: schema drifted across loads")
      if (name != "events") {
        val bare = spark.read.parquet(s"$dir/$name.parquet")
        assert(b.schema == bare.schema,
          s"$name: cached schema != inferred schema")
        assert(b.count() == bare.count(), s"$name: row count mismatch")
      } else {
        // events goes through the nanos→micros restoration (when the
        // file reads as raw longs); either way no LongType ts survives
        assert(b.schema("ts").dataType !=
          org.apache.spark.sql.types.LongType)
        assert(b.count() == spark.read.parquet(s"$dir/events.parquet").count())
      }
    }
  }
}
