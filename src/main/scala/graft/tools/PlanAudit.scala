package graft.tools

import graft.config.GraftConfig

/** Dev-only plan auditor: prints the formatted physical plan for
  * selected registry queries so scan pruning, pushed filters, join
  * strategies, and WholeStageCodegen spans can be reviewed (the
  * at-scale checklist; see SURVEY §8). Not part of the library surface.
  *
  * `--scan` mode sweeps EVERY registry plan for scale-hostile operators
  * (cartesian products, nested-loop joins) and prints only the hits —
  * the per-round red-flag check.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val cfg = GraftConfig.fromEnv(appName = "graft-plan-audit")
    val spark = cfg.newSession()
    if (args.headOption.contains("--scan")) {
      val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
      for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
        try {
          val plan = fn(spark, cfg.sfDir).queryExecution.executedPlan.toString
          val hits = bad.filter(plan.contains)
          if (hits.nonEmpty) println(s"[scan] $name: ${hits.mkString(",")}")
        } catch {
          case e: Throwable =>
            println(s"[scan] $name: ERROR ${e.getClass.getSimpleName}")
        }
      }
      println("[scan] done")
    } else {
      val names = if (args.nonEmpty) args.toSeq else Seq(
        "q2_filter_pushdown", "q5_region_revenue", "dedup_ngram",
        "dedup_minhash", "sim_topk_lsh", "dedup_embedding")
      for (n <- names) {
        println(s"\n================ $n ================")
        graft.SparkEntry.queries(n)(spark, cfg.sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
