package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("sim", cosine(col("q_vec"), col("n_vec")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("sim"), col("rank"))
  }

  /** Approximate top-k via random-hyperplane LSH: vectors are bucketed
    * by `bands` b-bit sign bands; query and corpus rows joining on any
    * shared band become candidates; exact cosine ranks the candidates.
    * Recall rises with `bands`, cost with `bitsPerBand` shrinking
    * buckets.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      bitsPerBand: Int = 8, bands: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bits = bitsPerBand * bands
    def banded(df: DataFrame, id: String, vec: String) =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
        lshSignBits(col(vecCol), bits).as("sig"))
        .select(col(id), col(vec), explode(array((0 until bands).map(j =>
          struct(lit(j).as("band_id"),
            shiftrightunsigned(col("sig"), j * bitsPerBand)
              .bitwiseAND(lit((1L << bitsPerBand) - 1)).as("band_val"))): _*))
          .as("band"))
        .select(col(id), col(vec), col("band.band_id").as("band_id"),
          col("band.band_val").as("band_val"))
    val c = banded(corpus, "n_id", "n_vec")
    val q = banded(queries, "q_id", "q_vec").renameBands("q_")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id"))
    c.join(broadcast(q),
        col("band_id") === col("q_band_id") &&
        col("band_val") === col("q_band_val") &&
        col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("q_vec"), col("n_id"), col("n_vec"))
      .dropDuplicates("q_id", "n_id")
      .withColumn("sim", cosine(col("q_vec"), col("n_vec")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), col("sim"), col("rank"))
  }

  /** Embedding near-duplicate pairs: LSH sign-band blocking over the
    * corpus against itself, exact-cosine verification ≥ `threshold`.
    * Same bucket-join shape as [[Dedup.minhashPairs]] — no cross join.
    */
  def embeddingNearDupPairs(corpus: DataFrame, threshold: Double = 0.99,
      bitsPerBand: Int = 8, bands: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bits = bitsPerBand * bands
    val banded = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"),
      lshSignBits(col(vecCol), bits).as("sig"))
      .select(col("id"), col("vec"), explode(array((0 until bands).map(j =>
        struct(lit(j).as("band_id"),
          shiftrightunsigned(col("sig"), j * bitsPerBand)
            .bitwiseAND(lit((1L << bitsPerBand) - 1)).as("band_val"))): _*))
        .as("band"))
      .select(col("id"), col("vec"), col("band.band_id").as("band_id"),
        col("band.band_val").as("band_val"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b,
        col("a.band_id") === col("b.band_id") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.vec").as("va"), col("b.vec").as("vb"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Renaming helper for LSH band structs on the query side. */
  private implicit class BandRenames(df: DataFrame) {
    def renameBands(prefix: String): DataFrame =
      df.withColumnRenamed("band_id", s"${prefix}band_id")
        .withColumnRenamed("band_val", s"${prefix}band_val")
  }
}
