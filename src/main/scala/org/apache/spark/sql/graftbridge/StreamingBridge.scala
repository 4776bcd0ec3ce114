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

  /** The inverse door, for the DSv1 streaming SINK: `Sink.addBatch`
    * receives an incremental-execution DataFrame that must be consumed
    * through `toRdd` (running arbitrary new queries over the streaming
    * plan is unsupported — the same discipline Spark's own
    * ForeachBatchSink applies via `LogicalRDD.fromDataset`). This
    * re-wraps the batch's InternalRow RDD as an ordinary non-streaming
    * DataFrame the snapshot commit paths can consume.
    */
  def asBatch(df: DataFrame): DataFrame = {
    val classic = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession].sqlContext
    classic.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
