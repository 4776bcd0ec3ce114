package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** `Dataset.ofRows` — wrap an analyzed logical plan back into a
  * DataFrame — is `private[sql]`. Graft's SQL row-level DML rule
  * ([[graft.plans.GraftSqlDml]]) needs exactly this to hand the parsed
  * MERGE source query to the Scala merge API. No Spark internals are
  * modified.
  */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
