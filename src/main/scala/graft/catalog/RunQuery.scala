package graft.catalog

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL submission with the reference's status-string contract (G1:
  * `/root/reference/src/utils/run_query.py:5-68` submits to a query
  * service and reduces the outcome to `"SUCCEEDED"` or an error status
  * plus a printed message — its callers branch on the string rather
  * than handle exceptions).
  *
  * Spark-native translation: `spark.sql` replaces the remote submission
  * (DDL/DML commands execute eagerly; SELECT analysis also runs
  * eagerly, so syntax and resolution errors surface here), and the
  * polling loop disappears — Spark is the engine, not a remote API.
  */
object RunQuery {

  val Succeeded = "SUCCEEDED"

  /** Outcome of one statement: the status string contract, the error
    * message when failed, and the result frame when the statement
    * produces one.
    */
  final case class Outcome(status: String, message: Option[String],
      result: Option[DataFrame]) {
    def succeeded: Boolean = status == Succeeded
  }

  /** Run one SQL statement; never throws for analysis/execution errors. */
  def run(spark: SparkSession, sql: String): Outcome =
    try {
      val df = spark.sql(sql)
      Outcome(Succeeded, None, Some(df))
    } catch {
      case NonFatal(e) =>
        Outcome("ERROR", Some(Option(e.getMessage).getOrElse(e.toString)), None)
    }

  /** The reference's exact shape: just the status string
    * (`"SUCCEEDED"` or `"ERROR: <message>"`).
    */
  def runStatus(spark: SparkSession, sql: String): String = {
    val o = run(spark, sql)
    if (o.succeeded) Succeeded else s"ERROR: ${o.message.getOrElse("")}"
  }
}
