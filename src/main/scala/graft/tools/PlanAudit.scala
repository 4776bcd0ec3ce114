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

  /** Whole-tree expansion of a physical plan: `SparkPlan.collect`
    * stops at AQE / query-stage wrapper leaves (an AQE-enabled plan is
    * a single `AdaptiveSparkPlanExec` node to `collect`), so any scan
    * audit over the raw tree is vacuously empty — descend through
    * `AdaptiveSparkPlanExec.executedPlan` and `QueryStageExec.plan`
    * so scan/join nodes are actually visible. Shared by `--scan` mode,
    * the `snap_changes_netzero` registry gate, and the scan-free
    * assertions in the specs (ADVICE r16: the gate must be able to
    * FAIL).
    */
  def flattenPlan(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val next = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(q.plan)
      case other => other.children
    }
    p +: next.flatMap(flattenPlan)
  }

  /** Data-source scan nodes anywhere in the (AQE-expanded) plan — the
    * "did this read any files" probe behind the metadata-only gates.
    */
  def scanNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] =
    flattenPlan(p).collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
      case sc: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => sc
    }

  def main(args: Array[String]): Unit = {
    val cfg = GraftConfig.fromEnv(appName = "graft-plan-audit")
    val spark = cfg.newSession()
    if (args.headOption.contains("--scan")) {
      // A BroadcastNestedLoopJoin whose build side is a ZERO-KEY
      // aggregate carries exactly one row — a scalar attach (corpus
      // N / avgdl broadcast), per-row cost identical to a hash join.
      // Flag only nested loops where the build side can fan out.
      import org.apache.spark.sql.execution.SparkPlan
      // collect() stops at AQE / query-stage wrapper leaves — expand
      // them so the whole physical tree is visible to the audit
      def flatten(p: SparkPlan): Seq[SparkPlan] = flattenPlan(p)
      // ≤1-row proof for the BUILD side only: descend through
      // cardinality-non-increasing wrappers to a zero-key aggregate.
      // Anything that can fan out (joins, generate/explode, unions)
      // fails the proof — the audit stays sound.
      def oneRow(p: SparkPlan): Boolean = p match {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
          a.groupingExpressions.isEmpty
        case _: org.apache.spark.sql.execution.ProjectExec |
             _: org.apache.spark.sql.execution.FilterExec |
             _: org.apache.spark.sql.execution.WholeStageCodegenExec |
             _: org.apache.spark.sql.execution.InputAdapter |
             _: org.apache.spark.sql.execution.exchange.Exchange =>
          p.children.forall(oneRow)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          oneRow(r.child)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          oneRow(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          oneRow(q.plan)
        case _ => false
      }
      def scalarBuild(
          j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec): Boolean = {
        val build = j.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
          case _ => j.right
        }
        oneRow(build)
      }
      for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
        try {
          val exec = fn(spark, cfg.sfDir).queryExecution.executedPlan
          val hits =
            flatten(exec).collect {
              case _: org.apache.spark.sql.execution.joins.CartesianProductExec =>
                "CartesianProduct"
              case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
                  if !scalarBuild(j) => "BroadcastNestedLoopJoin"
            }.distinct
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
