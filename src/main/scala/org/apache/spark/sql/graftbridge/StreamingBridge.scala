package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SQLContext}

/** DSv1 streaming sources must hand `getBatch` a DataFrame whose
  * logical plan is marked `isStreaming = true` — the only public-ish
  * door is `SQLContext.internalCreateDataFrame`, which is
  * `private[sql]`. This bridge re-wraps an ordinary batch DataFrame's
  * InternalRow RDD as a streaming one for
  * [[graft.streaming.GraftChangesSource]]. No Spark internals are
  * modified.
  */
object StreamingBridge {
  def asStreaming(sqlContext: SQLContext, df: DataFrame): DataFrame = {
    val classic = sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    classic.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
