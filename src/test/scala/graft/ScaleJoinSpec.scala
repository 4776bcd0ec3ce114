package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Scale-structure evidence: salting preserves join semantics, and
  * co-bucketed tables join without any exchange (the pre-partitioning
  * story a 100 TB deployment relies on instead of reshuffling the fact
  * table for every join).
  */
class ScaleJoinSpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark
  import spark.implicits._

  test("saltedInnerJoin equals the plain inner join, including dup keys") {
    val fact = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d"), (3L, "e"))
      .toDF("k", "v")
    // duplicate build keys: every copy must still match every fact row
    val build = Seq((1L, "X"), (1L, "Y"), (2L, "Z"))
      .toDF("k", "w")
    val plain = fact.join(build, Seq("k"))
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val salted = Skew.saltedInnerJoin(fact, build, "k", salts = 4)
      .select("k", "v", "w")
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(salted == plain)
  }

  test("co-bucketed tables sort-merge join with zero exchanges") {
    val db = "graft_bucket_db"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spark.sql(s"DROP TABLE IF EXISTS $db.fact_b")
    spark.sql(s"DROP TABLE IF EXISTS $db.dim_b")
    val n = 10000
    spark.range(n).select(col("id"), (col("id") % 97).as("payload"))
      .write.bucketBy(8, "id").sortBy("id").saveAsTable(s"$db.fact_b")
    spark.range(n / 10).select(col("id"), (col("id") % 7).as("attr"))
      .write.bucketBy(8, "id").sortBy("id").saveAsTable(s"$db.dim_b")
    // force sort-merge so bucketing (not broadcast) carries the join
    val smj = spark.table(s"$db.fact_b")
      .join(spark.table(s"$db.dim_b").hint("merge"), "id")
    val plan = smj.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"),
      s"bucketed join must not reshuffle either side:\n$plan")
    assert(smj.count() == n / 10)
    spark.sql(s"DROP TABLE IF EXISTS $db.fact_b")
    spark.sql(s"DROP TABLE IF EXISTS $db.dim_b")
    spark.sql(s"DROP DATABASE $db")
  }
}
