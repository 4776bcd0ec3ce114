package graft.tools

import graft.config.GraftConfig

/** Dev-only plan auditor: prints the formatted physical plan for
  * selected registry queries so scan pruning, pushed filters, join
  * strategies, and WholeStageCodegen spans can be reviewed (the
  * at-scale checklist; see SURVEY §8). Not part of the library surface.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val cfg = GraftConfig.fromEnv(appName = "graft-plan-audit")
    val spark = cfg.newSession()
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q2_filter_pushdown", "q5_region_revenue", "dedup_ngram",
      "dedup_minhash", "sim_topk_lsh", "dedup_embedding")
    for (n <- names) {
      println(s"\n================ $n ================")
      graft.SparkEntry.queries(n)(spark, cfg.sfDir).explain("formatted")
    }
    spark.stop()
  }
}
