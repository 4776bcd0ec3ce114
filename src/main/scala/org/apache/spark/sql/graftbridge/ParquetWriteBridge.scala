package org.apache.spark.sql.graftbridge

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** EXECUTOR-side parquet writing for the native DSv2 delta write
  * ([[graft.catalog.GraftRowLevel]]): a `DeltaWriter` receives
  * `InternalRow`s inside a task, where `DataFrame.write` does not
  * exist. Rather than hand-rolling a parquet encoder, reuse Spark's
  * own [[ParquetFileFormat.prepareWrite]] — the factory it returns is
  * `Serializable` by contract (it ships to executors inside
  * `FileFormatWriter` on every normal write), and the files it
  * produces are byte-compatible with every graft read path because
  * they ARE Spark parquet files (same compression, timestamp
  * rendering, and schema conversion as [[SnapshotTable]]'s staged
  * batches).
  *
  * Private-API note: `ParquetFileFormat`/`OutputWriterFactory` are
  * `org.apache.spark.sql.execution` internals, hence this bridge in
  * the `org.apache.spark.sql` namespace — same discipline as the
  * sibling bridges in this package (smallest possible surface, no
  * behavior).
  */
object ParquetWriteBridge {

  /** Driver-side: a serializable (factory, conf) pair for `schema`.
    * The configuration carries the write-support class and the schema
    * JSON `prepareWrite` installs — each schema needs its OWN conf.
    */
  def writerFactory(spark: SparkSession, schema: StructType)
      : (OutputWriterFactory, SerializableConfiguration) = {
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val factory = new ParquetFileFormat()
      .prepareWrite(spark, job, Map.empty, schema)
    (factory, new SerializableConfiguration(job.getConfiguration))
  }

  /** Executor-side: open one parquet [[OutputWriter]] at `path`. The
    * synthetic task-attempt context exists only to satisfy the Hadoop
    * output-format plumbing — commit semantics live in the graft
    * snapshot log, never in Hadoop committers.
    */
  def newWriter(factory: OutputWriterFactory, conf: Configuration,
      path: String, schema: StructType): OutputWriter = {
    val attempt = new TaskAttemptID(
      new TaskID(new JobID("graft-delta", 0), TaskType.MAP, 0), 0)
    factory.newInstance(path, schema, new TaskAttemptContextImpl(conf, attempt))
  }

  /** The codec-bearing file extension (e.g. `.zstd.parquet`) the
    * factory's writers produce — same synthetic-context trick as
    * [[newWriter]].
    */
  def fileExtension(factory: OutputWriterFactory, conf: Configuration): String = {
    val attempt = new TaskAttemptID(
      new TaskID(new JobID("graft-delta", 0), TaskType.MAP, 0), 0)
    factory.getFileExtension(new TaskAttemptContextImpl(conf, attempt))
  }
}
