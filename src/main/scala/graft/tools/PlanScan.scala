package graft.tools
import graft.config.GraftConfig
object PlanScan {
  def main(args: Array[String]): Unit = {
    val cfg = GraftConfig.fromEnv(appName = "plan-scan")
    val spark = cfg.newSession()
    val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val plan = fn(spark, cfg.sfDir).queryExecution.executedPlan.toString
        val hits = bad.filter(plan.contains)
        if (hits.nonEmpty) println(s"[scan] $name: ${hits.mkString(",")}")
      } catch { case e: Throwable => println(s"[scan] $name: ERROR ${e.getClass.getSimpleName}") }
    }
    println("[scan] done")
    spark.stop()
  }
}
