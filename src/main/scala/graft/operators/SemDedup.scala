package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosine

/** SemDeDup — SEMANTIC near-duplicate removal over an embedding column
  * (Abbas et al. 2023, arXiv:2303.09540): k-means-cluster the corpus,
  * compare pairs only WITHIN clusters, and drop every vector that has
  * a sufficiently-similar lower-id neighbor. The web-scale result the
  * paper reports (LAION dedup at extreme compression) rests on exactly
  * this cost model: all-pairs cosine is O(N²) and impossible at 100 TB;
  * within-cluster pairs are O(Σ|cluster|²), bounded by choosing
  * k ∝ N / target-cluster-size so each inverted list stays
  * executor-sized. Reuses the [[Ivf]] spherical-k-means machinery
  * (bounded-sample training, model-sized collects only).
  *
  * Spark shape, 100 TB posture:
  *  - SOFT assignment: each vector lands in its `probes` nearest
  *    clusters ([[Ivf.probeExpr]]) — a near-identical pair straddling a
  *    cluster boundary still shares a list (their centroid-distance
  *    orders almost coincide), which single-assignment SemDeDup misses.
  *    Candidate inflation is ≤ probes².
  *  - Pair generation is ONE equality join on the cluster id — never a
  *    cross join; skewed clusters re-split under AQE.
  *  - The drop rule is deterministic and local to a pair: vector `b`
  *    is a duplicate iff SOME `a` with a smaller id has
  *    `cos(a, b) >= tau`. One pass, no transitive closure — matching
  *    the paper's greedy per-cluster filtering, and exactly
  *    SQL-expressible (the DuckDB oracle recomputes it globally).
  *  - Survivors come from one left-anti join against the dropped-id
  *    set; the embedding payload never re-shuffles.
  */
object SemDedup {

  /** Semantic duplicate pairs `(a_id, b_id, sim)` with `a_id < b_id`
    * and `sim >= tau`, generated within soft-assigned clusters. A pair
    * sharing several probed clusters is emitted once.
    */
  def semanticPairs(corpus: DataFrame, model: Ivf.Model, tau: Double,
      probes: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    semanticPairs(corpus, Ivf.FlatQuantizer(model), tau, probes, idCol,
      vecCol)

  /** [[semanticPairs]] under any [[Ivf.Quantizer]] — the k ∝ N scale
    * path (a [[Ivf.twoLevel]] hierarchy keeps soft assignment O(√k·d)
    * per row as the cluster count grows with the corpus).
    */
  def semanticPairs(corpus: DataFrame, q: Ivf.Quantizer, tau: Double,
      probes: Int, idCol: String, vecCol: String): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau=$tau must be in (0, 1]")
    require(probes >= 1 && probes <= q.k,
      s"probes=$probes must be in [1, k=${q.k}]")
    val assigned = corpus
      .select(col(idCol), col(vecCol))
      .select(col(idCol), col(vecCol),
        explode(q.probe(col(vecCol), probes)).as("cluster"))
    val left = assigned.select(col("cluster"), col(idCol).as("a_id"),
      col(vecCol).as("a_vec"))
    val right = assigned.select(col("cluster"), col(idCol).as("b_id"),
      col(vecCol).as("b_vec"))
    left.join(right, Seq("cluster"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        cosine(col("a_vec"), col("b_vec")).as("sim"))
      .where(col("sim") >= lit(tau))
      // soft assignment can emit a pair once per shared cluster; the
      // sim is identical, so (a_id, b_id) dedup is exact
      .dropDuplicates("a_id", "b_id")
  }

  /** The corpus minus semantic duplicates: for every τ-pair the
    * smaller id is the kept representative. Greedy, not transitive —
    * in a chain a–b–c with cos(a, c) < tau both b and c drop, which is
    * the paper's (and the oracle's) contract.
    */
  def survivors(corpus: DataFrame, model: Ivf.Model, tau: Double,
      probes: Int = 2, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    survivors(corpus, Ivf.FlatQuantizer(model), tau, probes, idCol, vecCol)

  /** [[survivors]] under any [[Ivf.Quantizer]]. */
  def survivors(corpus: DataFrame, q: Ivf.Quantizer, tau: Double,
      probes: Int, idCol: String, vecCol: String): DataFrame = {
    val dropped = semanticPairs(corpus, q, tau, probes, idCol, vecCol)
      .select(col("b_id").as(idCol)).distinct()
    corpus.join(dropped, Seq(idCol), "left_anti")
  }

  /** Soft assignment with the model as a DATAFRAME — the extreme-k
    * companion of [[Ivf.assignSharded]]: each row's `probes` nearest
    * fine clusters chosen from the candidates of its `nsuper` nearest
    * supers (O(√k·d) broadcast only; candidates arrive by equality
    * join on the probed super ids), ranked by the partial-aggregating
    * [[graft.functions.TopK]] — (sim desc, fine id asc), the same
    * total order [[Ivf.TwoLevelQuantizer.probe]] produces, so the
    * assignment sets coincide at equal `nsuper` (spec-pinned).
    * Returns (idCol, cluster) rows, `probes` per input row.
    */
  def softAssignSharded(corpus: DataFrame, supers: Ivf.Model,
      centroids: DataFrame, nsuper: Int, probes: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cand = Ivf.shardedCandidates(corpus, supers, centroids, nsuper,
        idCol, vecCol)
      .select(col(idCol).as("q_id"),
        col("fine_id").cast("long").as("n_id"), col("sim"))
    Similarity.rankTopK(cand, probes)
      .select(col("q_id").as(idCol), col("n_id").cast("int").as("cluster"))
  }

  /** [[semanticPairs]] with the model as a DATAFRAME: soft assignment
    * through [[softAssignSharded]], then the identical one-equality-
    * join pair generation — SemDeDup at k past the broadcast wall,
    * with nothing O(k·d) on the driver, in a plan, or in a broadcast.
    */
  def semanticPairsSharded(corpus: DataFrame, supers: Ivf.Model,
      centroids: DataFrame, tau: Double, probes: Int = 2, nsuper: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"tau=$tau must be in (0, 1]")
    require(probes >= 1, s"probes=$probes must be >= 1")
    val assigned = softAssignSharded(corpus, supers, centroids, nsuper,
        probes, idCol, vecCol)
      .join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
    val left = assigned.select(col("cluster"), col(idCol).as("a_id"),
      col(vecCol).as("a_vec"))
    val right = assigned.select(col("cluster"), col(idCol).as("b_id"),
      col(vecCol).as("b_vec"))
    left.join(right, Seq("cluster"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        cosine(col("a_vec"), col("b_vec")).as("sim"))
      .where(col("sim") >= lit(tau))
      .dropDuplicates("a_id", "b_id")
  }

  /** [[survivors]] with the model as a DATAFRAME. */
  def survivorsSharded(corpus: DataFrame, supers: Ivf.Model,
      centroids: DataFrame, tau: Double, probes: Int = 2, nsuper: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dropped = semanticPairsSharded(corpus, supers, centroids, tau,
        probes, nsuper, idCol, vecCol)
      .select(col("b_id").as(idCol)).distinct()
    corpus.join(dropped, Seq(idCol), "left_anti")
  }

  /** INCREMENTAL semantic dedup — the production steady state: a new
    * ingest batch deduplicates against a PERSISTED cluster-partitioned
    * index ([[Ivf.buildIndex]] — the same table the ANN queries probe)
    * plus against itself, without ever touching the accepted corpus
    * beyond the batch's probed clusters:
    *
    *  - the batch's probed cluster SET prunes the index at the
    *    MANIFEST ([[graft.catalog.SnapshotTable.readPartitions]]):
    *    unprobed clusters' files are never opened, so the cost is
    *    O(batch × cluster size), not O(index);
    *  - an indexed τ-neighbor always wins (it was accepted first) —
    *    every matching batch row drops;
    *  - batch-internal duplicates resolve by the [[survivors]] min-id
    *    rule.
    *
    * The batch side carries its probe choices through one
    * `localCheckpoint` so the pruning collect and the join see the
    * SAME clusters (the [[Ivf.topKWithIndex]] determinism discipline).
    */
  def survivorsAgainstIndex(index: graft.catalog.SnapshotTable,
      batch: DataFrame, model: Ivf.Model, tau: Double, probes: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    survivorsAgainstIndex(index, batch, Ivf.FlatQuantizer(model), tau,
      probes, idCol, vecCol)

  /** [[survivorsAgainstIndex]] under any [[Ivf.Quantizer]] — must be
    * the SAME hierarchy the index was built with.
    */
  /** [[survivorsAgainstIndex]] with the model as a DATAFRAME — the
    * extreme-k incremental steady state: the batch soft-assigns
    * through [[softAssignSharded]] (nothing O(k·d) materialized), its
    * probed cluster set (batch-sized) prunes the
    * [[Ivf.buildIndexSharded]] table at the manifest, and the
    * batch-internal pass reuses [[semanticPairsSharded]]. Must be the
    * SAME (supers, centroids) the index was built with.
    */
  def survivorsAgainstIndexSharded(index: graft.catalog.SnapshotTable,
      batch: DataFrame, supers: Ivf.Model, centroids: DataFrame,
      tau: Double, probes: Int = 2, nsuper: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // assignment choices pinned once: the pruning collect and the join
    // must see the SAME clusters (the topKWithIndex discipline)
    val assigned = softAssignSharded(batch, supers, centroids, nsuper,
        probes, idCol, vecCol)
      .localCheckpoint(true)
    val exploded = assigned
      .join(batch.select(col(idCol), col(vecCol)), Seq(idCol))
      .select(col(idCol).as("b_id"), col(vecCol).as("b_vec"), col("cluster"))
    val probed = assigned.select(col("cluster").cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    val idxRows = index.readPartitions(p => p.exists(probed.contains))
      .select(col("cluster"), col("n_id"), col("n_vec"))
    val vsIndex = exploded.join(idxRows, Seq("cluster"))
      .where(cosine(col("b_vec"), col("n_vec")) >= lit(tau))
      .select(col("b_id"))
    val withinBatch = semanticPairsSharded(
      batch.select(col(idCol), col(vecCol)), supers, centroids, tau,
      probes, nsuper, idCol, vecCol)
      .select(col("b_id"))
    val dropped = vsIndex.unionByName(withinBatch).distinct()
      .withColumnRenamed("b_id", idCol)
    batch.join(dropped, Seq(idCol), "left_anti")
  }

  def survivorsAgainstIndex(index: graft.catalog.SnapshotTable,
      batch: DataFrame, q: Ivf.Quantizer, tau: Double, probes: Int,
      idCol: String, vecCol: String): DataFrame = {
    val b = batch
      .select(col(idCol), col(vecCol),
        q.probe(col(vecCol), probes).as("probe_clusters"))
      .localCheckpoint(true)
    val exploded = b.select(col(idCol).as("b_id"), col(vecCol).as("b_vec"),
      explode(col("probe_clusters")).as("cluster"))
    val probed = exploded.select(col("cluster").cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    val idxRows = index.readPartitions(p => p.exists(probed.contains))
      .select(col("cluster"), col("n_id"), col("n_vec"))
    val vsIndex = exploded.join(idxRows, Seq("cluster"))
      .where(cosine(col("b_vec"), col("n_vec")) >= lit(tau))
      .select(col("b_id"))
    val withinBatch = semanticPairs(
      b.select(col(idCol), col(vecCol)), q, tau, probes, idCol, vecCol)
      .select(col("b_id"))
    val dropped = vsIndex.unionByName(withinBatch).distinct()
      .withColumnRenamed("b_id", idCol)
    batch.join(dropped, Seq(idCol), "left_anti")
  }
}
