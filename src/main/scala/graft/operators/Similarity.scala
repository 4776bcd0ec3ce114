package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Similarity search over embedding columns (`array<float>`) —
  * extension surface, SURVEY §7.3.
  *
  * Two paths:
  *  - brute-force cosine top-k: exact; the query set is broadcast so the
  *    corpus streams through once with no shuffle of the big side — the
  *    right baseline whenever |queries| ≪ |corpus|
  *  - LSH-bucketed (random hyperplane signs): approximate; candidates
  *    come from an equality join on sign-bit bands, so the corpus never
  *    cross-joins — the scale path for corpus×corpus workloads
  *
  * Shuffle discipline (round-2 plan fixes): banded candidate joins carry
  * ids only; vectors are re-joined for the surviving candidates. Default
  * self-join bands are 16 bits wide (65 536 buckets per band) — at 1 B
  * vectors that is ~15 k vectors per bucket (~10⁸ in-bucket pairs per
  * band, shuffle-partitioned across the cluster) instead of the
  * quadratic blowup an 8-bit/256-bucket parameterization hits.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector.
    *
    * @param corpus  (idCol, vecCol) table — arbitrarily large
    * @param queries (idCol, vecCol) table — small, broadcast
    * @return (q_id, n_id, sim, rank), rank 1..k by sim desc (ties by
    *         neighbor id), self-matches excluded
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec"))
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val scored = c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("sim", cosine(col("q_vec"), col("n_vec")))
    rankTopK(scored, k)
  }

  /** Per-vector cosine similarity to the CORPUS CENTROID — the
    * SemDeDup-family prototypicality signal: vectors far from the
    * centroid are outliers (noise, corrupted embeddings, off-domain
    * content); vectors extremely close to it in a dense cluster are
    * semantic near-duplicates worth downsampling. One partial-
    * aggregating pass computes the per-dimension mean (the centroid is
    * MODEL-sized — dims doubles on the driver, the same budget as the
    * k-means centroids), then a single codegen cosine per vector — no
    * joins, no shuffle of the corpus beyond the dim aggregation.
    */
  def centroidSimilarity(vectors: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val centroid = vectors
      .select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy("dim").agg(avg(col("x")).as("m"))
      .orderBy("dim").collect().map(_.getDouble(1))
    require(centroid.nonEmpty, "centroidSimilarity needs a non-empty corpus")
    val cLit = array(centroid.map(v => lit(v)): _*)
    vectors.select(col(idCol),
      cosine(col(vecCol), cLit).as("centroid_sim"))
  }

  /** Exact top-k ranking of scored (q_id, n_id, sim) candidates via the
    * partial-aggregating [[graft.functions.TopK]] UDAF: each map task
    * ships at most k candidates per query instead of sort-shuffling the
    * whole candidate set the way `row_number().over(Window)` would.
    * Output rows are identical to the window formulation (total order:
    * sim desc, n_id asc).
    */
  private[operators] def rankTopK(scored: DataFrame, k: Int,
      groupCol: String = "q_id", simCol: String = "sim",
      idCol: String = "n_id"): DataFrame =
    scored
      .groupBy(col(groupCol))
      .agg(graft.functions.TopK.topK(col(simCol), col(idCol), k).as("top"))
      .select(col(groupCol), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col(groupCol), col("s.id").as(idCol), col("s.sim").as(simCol),
        (col("pos") + 1).cast("long").as("rank"))

  /** (id, band_id, band_val) rows for `bands` independent sign-bit
    * bands of `bitsPerBand` each — the id-only blocking projection
    * shared by the LSH paths. Each band is its own seeded hyperplane
    * signature, so the band count is unlimited (recall knob) and the
    * total per-row work stays `bands × bitsPerBand × dims`
    * multiply-adds regardless of how the bits are grouped.
    */
  private def bandedIds(df: DataFrame, idCol: String, vecCol: String,
      outId: String, bitsPerBand: Int, bands: Int): DataFrame =
    df.select(col(idCol).as(outId),
      posexplode(array((0 until bands).map(j =>
        lshSignBits(col(vecCol), bitsPerBand, seed = 42 + j)): _*))
        .as(Seq("band_id", "band_val")))

  /** Approximate top-k via random-hyperplane LSH: query and corpus rows
    * joining on any shared sign band become candidates; exact cosine
    * ranks the candidates. Recall rises with `bands`, cost falls as
    * `bitsPerBand` shrinks buckets. The banded join is ids-only; both
    * vector sides are re-joined afterwards (queries broadcast).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      bitsPerBand: Int = 16, bands: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = bandedIds(corpus, idCol, vecCol, "n_id", bitsPerBand, bands)
    val q = bandedIds(queries, idCol, vecCol, "q_id", bitsPerBand, bands)
      .withColumnRenamed("band_id", "q_band_id")
      .withColumnRenamed("band_val", "q_band_val")
    val candidates = c.join(broadcast(q),
        col("band_id") === col("q_band_id") &&
        col("band_val") === col("q_band_val") &&
        col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"))
      .dropDuplicates("q_id", "n_id")
    val scored = candidates
      .join(corpus.select(col(idCol).as("n_id"), col(vecCol).as("n_vec")), "n_id")
      .join(broadcast(
        queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))), "q_id")
      .withColumn("sim", cosine(col("q_vec"), col("n_vec")))
    rankTopK(scored, k)
  }

  /** Embedding near-duplicate pairs: LSH sign-band blocking over the
    * corpus against itself, exact-cosine verification ≥ `threshold`.
    * Same id-only bucket-join shape as [[Dedup.minhashPairs]] — no cross
    * join, no vectors in the blocking shuffle.
    */
  def embeddingNearDupPairs(corpus: DataFrame, threshold: Double = 0.99,
      bitsPerBand: Int = 16, bands: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val banded = bandedIds(corpus, idCol, vecCol, "id", bitsPerBand, bands)
    val a = banded.alias("a")
    val b = banded.alias("b")
    val candidates = a.join(b,
        col("a.band_id") === col("b.band_id") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    candidates
      .join(corpus.select(col(idCol).as("id_a"), col(vecCol).as("va")), "id_a")
      .join(corpus.select(col(idCol).as("id_b"), col(vecCol).as("vb")), "id_b")
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }
}
