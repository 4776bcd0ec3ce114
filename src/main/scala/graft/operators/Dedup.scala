package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.functions.SimHash64

/** Document deduplication operators for LLM-training-data pipelines
  * (extension surface, SURVEY §7.3). Four families:
  *
  *  - exact: hash-groupBy on the canonical text fingerprint
  *  - MinHash + LSH banding: shingle → k-minhash signature → band
  *    buckets → bucket-local candidate pairs → exact Jaccard verify
  *  - SimHash: 64-bit fingerprint (custom codegen Expression) → bit-band
  *    blocking → Hamming filter
  *  - n-gram Jaccard: inverted-index candidate join → exact Jaccard
  *
  * Scale posture: every family avoids the O(n²) cross join. Candidates
  * come from equality joins on bucket keys (band hash / bit band /
  * shared shingle), which shuffle-partition by key and parallelize
  * across executors; frequent-key blowup is bounded by `maxDocFreq`
  * filters on posting lists. This is the standard web-scale dedup shape
  * (e.g. the C4/RefinedWeb pipelines).
  */
object Dedup {

  // -------------------------------------------------------------------
  // Exact
  // -------------------------------------------------------------------

  /** Exact dedup on canonical text: one row per distinct content, keeping
    * the smallest id; `n_dups` counts the group size.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.groupBy(fingerprintExact(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))

  // -------------------------------------------------------------------
  // Shingling + MinHash
  // -------------------------------------------------------------------

  /** Word n-gram shingles of the canonical text, de-duplicated. Documents
    * shorter than n words become a single whole-text shingle.
    */
  def wordShingles(c: Column, n: Int): Column = {
    val toks = split(normalText(c), " ")
    array_distinct(
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /** k-permutation MinHash signature: element i is
    * min over shingles of xxhash64(shingle, '#', i).
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(shingles,
        s => xxhash64(concat(s, lit("#"), i.cast("string"))))))

  /** LSH banding of a k-signature into `bands` buckets of `rowsPerBand`:
    * array of (band_id, band_hash) structs.
    */
  def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      j => struct(
        j.as("band_id"),
        xxhash64(concat_ws("_",
          transform(slice(sig, j * rowsPerBand + 1, lit(rowsPerBand)),
            h => h.cast("string")))).as("band_hash")))

  /** MinHash+LSH near-duplicate pairs with exact-Jaccard verification.
    *
    * @param threshold keep pairs with exact shingle-Jaccard ≥ threshold
    * @return (id_a, id_b, jaccard), id_a < id_b, one row per pair
    */
  def minhashPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", shingleLen: Int = 3, k: Int = 64,
      bands: Int = 16, threshold: Double = 0.7): DataFrame = {
    require(k % bands == 0, s"bands=$bands must divide k=$k")
    val r = k / bands
    val base = docs.select(col(idCol).as("id"),
      wordShingles(col(textCol), shingleLen).as("shingles"))
    val withBands = base
      .withColumn("sig", minhashSignature(col("shingles"), k))
      .select(col("id"), col("shingles"),
        explode(bandHashes(col("sig"), bands, r)).as("band"))
      .select(col("id"), col("shingles"),
        col("band.band_id").as("band_id"), col("band.band_hash").as("band_hash"))
    // bucket-local candidate pairs: equality join on (band_id, band_hash)
    val a = withBands.alias("a")
    val b = withBands.alias("b")
    val candidates = a.join(b,
        col("a.band_id") === col("b.band_id") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.shingles").as("sh_a"), col("b.shingles").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
    candidates
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // -------------------------------------------------------------------
  // SimHash
  // -------------------------------------------------------------------

  /** Per-document 64-bit SimHash fingerprints. */
  def simhashes(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("id"),
      SimHash64.simhash64(normalText(col(textCol))).as("simhash"))

  /** SimHash near-duplicate pairs: block on 4×16-bit bands (a pair
    * within Hamming distance ≤ 3 of a 64-bit hash must agree on at
    * least one of 4 bands — pigeonhole), then filter by exact Hamming
    * distance.
    */
  def simhashPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxHamming: Int = 3): DataFrame = {
    val fp = simhashes(docs, idCol, textCol)
    val banded = fp.select(col("id"), col("simhash"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("band_id"),
          shiftrightunsigned(col("simhash"), i * 16)
            .bitwiseAND(lit(0xffffL)).as("band_val"))): _*)).as("band"))
      .select(col("id"), col("simhash"),
        col("band.band_id").as("band_id"), col("band.band_val").as("band_val"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b,
        col("a.band_id") === col("b.band_id") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming",
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  // -------------------------------------------------------------------
  // n-gram Jaccard (inverted index)
  // -------------------------------------------------------------------

  /** Exact n-gram-Jaccard near-duplicate pairs via an inverted-index
    * candidate join: explode shingles → drop shingles appearing in more
    * than `maxDocFreq` docs (stopword-shingle blowup guard — the
    * standard trick; at 100 TB this bound is what keeps the self-join
    * from going quadratic) → count shared shingles per pair →
    * Jaccard = shared / (|A| + |B| − shared).
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", shingleLen: Int = 3,
      threshold: Double = 0.5, maxDocFreq: Int = 100): DataFrame = {
    val base = docs.select(col(idCol).as("id"),
      wordShingles(col(textCol), shingleLen).as("shingles"))
      .withColumn("n_sh", size(col("shingles")))
    val postings = base
      .select(col("id"), col("n_sh"), explode(col("shingles")).as("sh"))
    val rare = postings
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("sh"))))
      .filter(col("df") <= maxDocFreq)
      .drop("df")
    val a = rare.alias("a")
    val b = rare.alias("b")
    val shared = a.join(b,
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.n_sh").as("n_a"), col("b.n_sh").as("n_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .withColumn("jaccard", col("shared").cast("double") /
        (col("n_a") + col("n_b") - col("shared")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
