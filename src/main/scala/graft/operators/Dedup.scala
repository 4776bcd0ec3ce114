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
  *
  * Shuffle discipline (round-2 plan fixes): candidate joins carry IDS
  * ONLY — shingle arrays / payloads are recomputed or re-joined for the
  * surviving candidates instead of riding the wide shuffle; document
  * frequencies come from a partial-aggregating `groupBy().count()`
  * (map-side combine), never from a `Window.partitionBy` sort-shuffle
  * of the full postings table.
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
    * shorter than n words become a single whole-text shingle. Delegates
    * to the one-pass codegen'd [[graft.functions.WordShingles]]
    * expression (the HOF formulation was interpreted per element and
    * dominated both dedup families).
    */
  def wordShingles(c: Column, n: Int): Column =
    graft.functions.WordShingles.wordShingles(c, n)

  /** MinHash+LSH near-duplicate pairs with exact-Jaccard verification.
    *
    * Banding runs inside the one-pass codegen'd
    * [[graft.functions.MinHash]] expression (each shingle byte-hashed
    * once, k permutations derived arithmetically, band keys folded
    * without materializing the signature). The candidate self-join
    * carries `(band_id, band_hash, id)` only; shingle sets are re-joined
    * from the base projection for the (much smaller) surviving candidate
    * set, so the big shuffle payload is 3 longs per posting instead of
    * the whole corpus text twice. Recomputing shingles for the two
    * re-joins trades cheap, perfectly parallel CPU for shuffle bytes —
    * the right trade at 100 TB.
    *
    * @param threshold keep pairs with exact shingle-Jaccard ≥ threshold
    * @return (id_a, id_b, jaccard), id_a < id_b, one row per pair
    */
  def minhashPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", shingleLen: Int = 3, k: Int = 64,
      bands: Int = 16, threshold: Double = 0.7): DataFrame = {
    require(k % bands == 0, s"bands=$bands must divide k=$k")
    val base = docs.select(col(idCol).as("id"),
      wordShingles(col(textCol), shingleLen).as("shingles"))
    val banded = base
      .select(col("id"),
        posexplode(graft.functions.MinHash.minhashBands(col("shingles"), k, bands))
          .as(Seq("band_id", "band_hash")))
    // bucket-local candidate pairs: equality join on (band_id, band_hash),
    // ids only
    val a = banded.alias("a")
    val b = banded.alias("b")
    val candidates = a.join(b,
        col("a.band_id") === col("b.band_id") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    // exact-Jaccard verify: fetch shingles for survivors only
    candidates
      .join(base.select(col("id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(base.select(col("id").as("id_b"), col("shingles").as("sh_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** The persistable banded-MinHash signature rows of a corpus:
    * `(id, band_id, band_hash)` — one row per (document, band). Write
    * them once into a snapshot table and each incoming batch
    * fingerprints ONLY ITSELF ([[minhashAgainstIndex]]); the corpus is
    * never re-shingled. This is the index side of incremental ingest
    * dedup: at 100 TB, re-minhashing the whole corpus per arriving
    * batch is the dominant cost the index amortizes away.
    */
  def minhashSignatures(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", shingleLen: Int = 3, k: Int = 64,
      bands: Int = 16): DataFrame = {
    require(k % bands == 0, s"bands=$bands must divide k=$k")
    docs.select(col(idCol).as("id"),
      posexplode(graft.functions.MinHash.minhashBands(
        wordShingles(col(textCol), shingleLen), k, bands))
        .as(Seq("band_id", "band_hash")))
  }

  /** Near-duplicates of a NEW batch against an already-indexed corpus —
    * the incremental form of [[minhashPairs]]: candidates come from the
    * `(band_id, band_hash)` equi-join of the batch's (freshly computed)
    * signatures against the PERSISTED index rows, then exact-Jaccard
    * verification re-joins text for the surviving ids only. Band
    * parameters must match the ones the index was built with.
    *
    * Scale shape: the batch side is batch-sized everywhere; the index
    * side is a column-pruned scan of 3-long rows (at 100 TB, store the
    * index band_hash-clustered with a bloom on band_hash so a small
    * batch's probe prunes files before I/O); verification touches only
    * candidate corpus documents (`corpusDocs` can be
    * `table.readWhere(col(idCol).isin(candidateIds))` when the corpus
    * lives in a snapshot table — stats/bloom point fetch, not a scan).
    *
    * @return (corpus_id, new_id, jaccard), jaccard ≥ threshold
    */
  def minhashAgainstIndex(index: DataFrame, newDocs: DataFrame,
      corpusDocs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", shingleLen: Int = 3, k: Int = 64,
      bands: Int = 16, threshold: Double = 0.7): DataFrame = {
    val newSigs = minhashSignatures(newDocs, idCol, textCol, shingleLen,
      k, bands)
    val candidates = index.select(col("id").as("corpus_id"),
        col("band_id"), col("band_hash"))
      .join(newSigs.select(col("id").as("new_id"), col("band_id"),
        col("band_hash")), Seq("band_id", "band_hash"))
      .select(col("corpus_id"), col("new_id"))
      .dropDuplicates("corpus_id", "new_id")
    val shNew = newDocs.select(col(idCol).as("new_id"),
      wordShingles(col(textCol), shingleLen).as("sh_new"))
    val shOld = corpusDocs.select(col(idCol).as("corpus_id"),
      wordShingles(col(textCol), shingleLen).as("sh_old"))
    candidates
      .join(shNew, "new_id")
      .join(shOld, "corpus_id")
      .withColumn("jaccard",
        size(array_intersect(col("sh_old"), col("sh_new"))).cast("double") /
          size(array_union(col("sh_old"), col("sh_new"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("corpus_id"), col("new_id"), col("jaccard"))
  }

  // -------------------------------------------------------------------
  // Pair graph → clusters
  // -------------------------------------------------------------------

  /** Connected components over a near-duplicate pair graph: every node
    * gets the smallest id reachable from it as `cluster_rep` (the
    * canonical document its cluster keeps). Nodes absent from any pair
    * are their own representative.
    *
    * Distributed min-label propagation (Pregel-lite): each round joins
    * the current labels across the edge list and keeps the minimum of
    * a node's own label and its neighbors' — one shuffle per round,
    * converging in O(component diameter) rounds (near-dup clusters are
    * shallow; `maxIter` bounds pathological chains). The driver loop
    * carries only the CHANGED-row count per round; labels stay
    * distributed, `localCheckpoint` cuts the growing lineage. The
    * changed flag rides the propagation row itself (min-labels only
    * decrease, so `new < old` IS the change test), making the
    * convergence count a scan of the just-checkpointed partitions
    * rather than a second join per round.
    *
    * `reliableCheckpoints=false` (default) uses `localCheckpoint`:
    * round state lives on executors only — fastest, right for
    * `local[*]`, but an executor loss mid-job fails the query since
    * lineage is cut. On a multi-executor cluster pass `true` to stage
    * rounds through reliable `checkpoint()` (the caller must have set
    * `spark.sparkContext.setCheckpointDir` to HDFS/object storage).
    */
  def clusters(pairs: DataFrame, allIds: DataFrame,
      idCol: String = "id", maxIter: Int = 15,
      reliableCheckpoints: Boolean = false): DataFrame = {
    def materialize(df: DataFrame): DataFrame =
      if (reliableCheckpoints) df.checkpoint(true) else df.localCheckpoint(true)
    // materialize the (small) edge list once — the pair pipeline behind
    // it would otherwise recompute on BOTH union branches EVERY round
    val edges = materialize(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst"))))
    var labels = materialize(
      allIds.select(col(idCol).as("id"), col(idCol).as("rep")))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst")
          .withColumnRenamed("rep", "nbr_rep"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("nbr_rep")).as("nbr_rep"))
      val next0 = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("rep"), coalesce(col("nbr_rep"), col("rep"))).as("rep"),
          (coalesce(col("nbr_rep"), col("rep")) < col("rep")).as("chg"))
      // LAZY local checkpoint (r20, VERDICT r19 #5): the convergence
      // count below materializes the round's partitions AND cuts the
      // lineage in ONE job instead of the eager-checkpoint + count
      // pair — local checkpoints save partitions as the first action
      // computes them, no recompute. The reliable path stays EAGER: a
      // lazy reliable checkpoint re-runs the round to write HDFS.
      val next =
        if (reliableCheckpoints) next0.checkpoint(true)
        else next0.localCheckpoint(false)
      val changed = next.filter(col("chg")).count()
      labels = next.select(col("id"), col("rep"))
      converged = changed == 0
      iter += 1
    }
    // silent truncation would hand back labels that are not cluster
    // minima — multiple "representatives" per cluster downstream
    if (!converged)
      throw new IllegalStateException(
        s"clusters() did not converge in $maxIter rounds " +
          "(component diameter exceeds maxIter); raise maxIter")
    labels.select(col("id"), col("rep").as("cluster_rep"))
  }

  // -------------------------------------------------------------------
  // SimHash
  // -------------------------------------------------------------------

  /** Per-document 64-bit SimHash fingerprints. */
  def simhashes(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("id"),
      SimHash64.simhash64(normalText(col(textCol))).as("simhash"))

  /** Bit-band columns for a 64-bit fingerprint split into `bands`
    * near-equal contiguous bands (widths differ by at most one bit).
    */
  private def simhashBands(fp: Column, bands: Int): Column = {
    val baseW = 64 / bands
    val extra = 64 % bands
    val widths = Seq.tabulate(bands)(i => baseW + (if (i < extra) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    array((0 until bands).map { i =>
      // width 64 (bands=1): 1L<<64 wraps to 1, so mask explicitly
      val mask = if (widths(i) >= 64) -1L else (1L << widths(i)) - 1
      struct(lit(i).as("band_id"),
        shiftrightunsigned(fp, offsets(i))
          .bitwiseAND(lit(mask)).as("band_val"))
    }: _*)
  }

  /** SimHash near-duplicate pairs with a SOUND blocking guarantee:
    * the fingerprint is split into `maxHamming + 1` bands, so any pair
    * within Hamming distance ≤ maxHamming must agree exactly on at
    * least one band (pigeonhole — maxHamming flipped bits cannot touch
    * all maxHamming+1 bands). Candidates come from an equality join per
    * band; the exact `bit_count(xor)` filter then removes false
    * positives.
    *
    * Scale note: band width = 64/(maxHamming+1) bits. For maxHamming=3
    * that is 4×16-bit bands (65 536 buckets each — the Manku/Google
    * web-dedup parameterization). Larger radii shrink the bands and
    * grow the buckets quadratically, so keep maxHamming small at scale
    * (or move to the multi-table combined-block scheme).
    */
  def simhashPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 32,
      s"maxHamming=$maxHamming out of range [0, 31]")
    val bands = maxHamming + 1
    val fp = simhashes(docs, idCol, textCol)
    val banded = fp.select(col("id"), col("simhash"),
      explode(simhashBands(col("simhash"), bands)).as("band"))
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

  /** Near-duplicates of a NEW batch against an already-fingerprinted
    * corpus — the incremental form of [[simhashPairs]], completing the
    * index story next to [[minhashAgainstIndex]]: the index is just the
    * persisted `(id, simhash)` rows ([[simhashes]] — 8 bytes per doc),
    * the batch fingerprints only itself, candidates come from the
    * banded equality join (same pigeonhole guarantee: a pair within
    * `maxHamming` must agree on one of the `maxHamming+1` bands), and
    * verification is the exact `bit_count(xor)` on the fingerprints
    * alone — unlike MinHash, NO text re-join is needed, so the corpus
    * data files are never touched at all.
    *
    * @return (corpus_id, new_id, hamming), hamming ≤ maxHamming
    */
  def simhashAgainstIndex(index: DataFrame, newDocs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 32,
      s"maxHamming=$maxHamming out of range [0, 31]")
    val bands = maxHamming + 1
    def banded(fp: DataFrame, side: String) = fp
      .select(col("id").as(s"${side}_id"), col("simhash").as(s"${side}_sh"),
        explode(simhashBands(col("simhash"), bands)).as("band"))
      .select(col(s"${side}_id"), col(s"${side}_sh"),
        col("band.band_id").as("band_id"), col("band.band_val").as("band_val"))
    banded(index.select(col("id"), col("simhash")), "corpus")
      .join(banded(simhashes(newDocs, idCol, textCol), "new"),
        Seq("band_id", "band_val"))
      .select(col("corpus_id"), col("new_id"), col("corpus_sh"), col("new_sh"))
      .dropDuplicates("corpus_id", "new_id")
      .withColumn("hamming",
        bit_count(col("corpus_sh").bitwiseXOR(col("new_sh"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("corpus_id"), col("new_id"), col("hamming"))
  }

  // -------------------------------------------------------------------
  // n-gram Jaccard (inverted index)
  // -------------------------------------------------------------------

  /** Exact n-gram-Jaccard near-duplicate pairs via an inverted-index
    * candidate join.
    *
    * Plan: explode shingles into postings → document frequency per
    * shingle via `groupBy(sh).count()` (hash aggregate with map-side
    * partial combine — NOT a window sort-shuffle over every posting) →
    * keep postings whose shingle appears in ≤ `maxDocFreq` docs (the
    * stopword-shingle guard that keeps the candidate join from going
    * quadratic at 100 TB) → shingle-keyed posting SELF-JOIN emitting
    * ordered candidate pairs (fully codegen'd; Spark reuses one
    * exchange for both sides, and per-shingle fan-out is bounded by
    * maxDocFreq²) → shared-shingle counts per pair → Jaccard =
    * shared / (|A| + |B| − shared).
    *
    * Versus [[ngramJaccardPairsPrefix]] (PPJoin prefix filtering),
    * MEASURED at sf0.1 / t=0.5: the prefix cuts distinct candidates
    * 2.9× (1.37M → 478k) but its per-pair array verification costs
    * more than this plan's narrow count-aggregate saves (7.2 s vs
    * 2.9 s), because at t=0.5 the prefix is still ~half of each rare
    * list. This formulation is the default; the prefix variant wins at
    * HIGH thresholds where the prefix shrinks to (1−t)·r + 1.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", shingleLen: Int = 3,
      threshold: Double = 0.5, maxDocFreq: Int = 100): DataFrame = {
    val base = docs.select(col(idCol).as("id"),
      wordShingles(col(textCol), shingleLen).as("shingles"))
      .withColumn("n_sh", size(col("shingles")))
    val postings = base
      .select(col("id"), col("n_sh"), explode(col("shingles")).as("sh"))
    // document frequency: partial-aggregating count, then keep the rare
    // shingles (df ≥ 2 — a shingle in one doc yields no pair)
    val rare = postings.groupBy("sh").count()
      .filter(col("count") <= maxDocFreq && col("count") >= 2)
      .select(col("sh"))
    // merge-join hints on BOTH shingle-keyed joins (r19 optimization,
    // guide §3.1 "pick the join strategy deliberately"): the planner's
    // size estimate broadcasts `rare` and the b-side postings, which
    // builds each broadcast in its own serial job — re-scanning and
    // re-shingling the corpus per build — while the sort-merge shape
    // shares ONE sh-keyed exchange across the df-filter and both
    // self-join sides (ReusedExchange) and runs it in parallel.
    // Measured at sf0.1: 3.2 → 1.8 s, identical pairs. At 100 TB the
    // hint is also the only sound choice: the rare-shingle set is
    // corpus-scale, so a broadcast would OOM exactly where this
    // operator matters ([[dedupParagraphs]] makes the same argument).
    val rp = postings.join(rare.hint("merge"), "sh")
    val a = rp.select(col("sh"), col("id").as("id_a"), col("n_sh").as("n_a"))
    val b = rp.select(col("sh"), col("id").as("id_b"), col("n_sh").as("n_b"))
    val shared = a.join(b.hint("merge"), Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .withColumn("jaccard", col("shared").cast("double") /
        (col("n_a") + col("n_b") - col("shared")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** PPJoin-style prefix-filtered variant of [[ngramJaccardPairs]]
    * (Xiao et al., "Efficient Similarity Joins for Near Duplicate
    * Detection", WWW'08 — public algorithm), result-identical at any
    * threshold.
    *
    * Per doc, the surviving (df 2..maxDocFreq) shingles sort by the
    * GLOBAL (df, shingle) total order and only the PREFIX — the first
    * `r − ⌈t·n⌉ + 1` entries — feeds the candidate join: a pair with
    * Jaccard ≥ t must share ≥ ⌈t·n⌉ rare shingles (from
    * j = s/(n_a+n_b−s) and n_b ≥ s), and by pigeonhole + the shared
    * total order, the globally-smallest shared shingle lands inside
    * BOTH prefixes. Docs with r < ⌈t·n⌉ drop entirely. Each distinct
    * candidate then verifies EXACTLY via `array_intersect` of the two
    * full rare lists.
    *
    * MEASURED VERDICT on the harness corpus (sf0.1, 5.5k docs, ~52
    * rare shingles/doc): the prefix cuts distinct candidates 2.9×
    * (1.37M → 478k at t=0.5) but LOSES on wall clock at every
    * threshold (t=0.5: 6.8 s vs 3.6 s; t=0.8: 4.9 s vs 3.2 s) — the
    * per-doc sorted-list aggregation and the array-verify joins cost
    * more than the df-capped narrow self-join saves. Keep
    * [[ngramJaccardPairs]] as the default; reach for this variant only
    * when the candidate join itself is the bottleneck — long documents
    * (thousands of rare shingles each, where per-pair counting
    * dominates) combined with high thresholds that shrink the prefix
    * to the (1−t)-fraction.
    */
  def ngramJaccardPairsPrefix(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", shingleLen: Int = 3,
      threshold: Double = 0.5, maxDocFreq: Int = 100): DataFrame = {
    val base = docs.select(col(idCol).as("id"),
      wordShingles(col(textCol), shingleLen).as("shingles"))
      .withColumn("n_sh", size(col("shingles")))
    val postings = base
      .select(col("id"), col("n_sh"), explode(col("shingles")).as("sh"))
    val rare = postings.groupBy("sh").count()
      .filter(col("count") <= maxDocFreq && col("count") >= 2)
      .select(col("sh"), col("count").as("df"))
    val rp = postings.join(rare, "sh")
    // one row per doc: rare shingles sorted by (df, sh) — rarest first,
    // ties broken by the shingle itself, so the order is a total order
    // shared by every doc
    // materialized once (model-sized: one row per doc) — it feeds the
    // prefix explode AND both sides of the verification join, and
    // without the checkpoint each consumer would recompute the whole
    // postings→df→sort pipeline (measured 3× cost)
    val docSets = rp.groupBy(col("id"), col("n_sh"))
      .agg(sort_array(collect_list(struct(col("df"), col("sh"))))
        .getField("sh").as("rare"))
      .withColumn("smin", ceil(lit(threshold) * col("n_sh")).cast("int"))
      .withColumn("p", size(col("rare")) - col("smin") + 1)
      .filter(col("p") >= 1)
      .localCheckpoint(true)
    val prefixes = docSets.select(col("id"),
      explode(slice(col("rare"), lit(1), col("p"))).as("sh"))
    val cand = prefixes.select(col("sh"), col("id").as("id_a"))
      .join(prefixes.select(col("sh"), col("id").as("id_b")), Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .dropDuplicates("id_a", "id_b")
    cand
      .join(docSets.select(col("id").as("id_a"), col("n_sh").as("n_a"),
        col("rare").as("rare_a")), "id_a")
      .join(docSets.select(col("id").as("id_b"), col("n_sh").as("n_b"),
        col("rare").as("rare_b")), "id_b")
      .withColumn("shared", size(array_intersect(col("rare_a"), col("rare_b"))))
      .withColumn("jaccard", col("shared").cast("double") /
        (col("n_a") + col("n_b") - col("shared")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Per-document CROSS-corpus duplicated n-gram profile — the signal
    * behind exact-substring deduplication (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better") and
    * Gopher's duplicate-n-gram quality rule: for each document, how
    * many of its distinct word n-grams also occur in at least
    * `minDocs` documents corpus-wide (counting itself). Downstream
    * filters drop or trim documents whose `dup_grams / n_grams`
    * fraction is high — boilerplate, mirrored pages, templated spam.
    *
    * Output: `(idCol, n_grams, dup_grams)` — counts as BIGINT; the
    * ratio is left to the caller so the result stays engine-exact
    * (no double division to disagree on).
    *
    * Scale shape: shingling is the one-pass codegen'd
    * [[graft.functions.WordShingles]] expression (distinct n-grams per
    * doc, so a plain partial-aggregating `count` per gram IS the
    * document frequency — no count-distinct shuffle); the postings
    * explode shuffles `(id, gram)` once on the gram, the frequency
    * aggregate and the left-semi probe REUSE that exchange, and the
    * final per-doc aggregate shuffles ids only. Nothing is quadratic
    * and no driver pass exists; at 100 TB the gram-keyed exchange is
    * the standard inverted-index shape every web-scale dedup pipeline
    * carries.
    */
  def crossDocNgrams(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", shingleLen: Int = 5,
      minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs=$minDocs must be >= 2")
    val grams = docs.select(col(idCol).as("id"),
      explode(wordShingles(col(textCol), shingleLen)).as("gram"))
    // distinct-per-doc shingles make count == document frequency
    val sharedGrams = grams.groupBy("gram").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs)
      .select("gram")
    val dupPerDoc = grams.join(sharedGrams, Seq("gram"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("dup_grams"))
    docs.select(col(idCol).as("id"),
        size(wordShingles(col(textCol), shingleLen)).cast("long").as("n_grams"))
      .join(dupPerDoc, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_grams"),
        coalesce(col("dup_grams"), lit(0L)).as("dup_grams"))
  }

  /** PARAGRAPH-level exact dedup with reconstruction (RefinedWeb/C4
    * line-dedup): paragraphs (split on `sep`) repeated across ≥ `minDf`
    * DISTINCT documents — navigation chrome, subscribe boxes, license
    * footers — are removed from EVERY document, and each document is
    * reassembled from its surviving paragraphs in original order (a
    * doc whose every paragraph was boilerplate comes back as the empty
    * string, not a dropped row). Complements [[exact]] (whole-document)
    * and [[crossDocNgrams]] (n-gram signal): this one REWRITES the
    * corpus.
    *
    * Scale shape: paragraphs shuffle by an md5 FINGERPRINT for the
    * document-frequency count (ids-only — never the text); the
    * anti-join against the boilerplate set is left to AQE, which
    * broadcasts it when small but falls back to a shuffled anti-join
    * on `fp` when the duplicated-paragraph set is itself web-scale (on
    * a 100 TB crawl the repeated fraction is large — a forced
    * broadcast hint would OOM exactly where this operator matters).
    * No O(n²) stage anywhere.
    */
  def dedupParagraphs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minDf: Int = 2,
      sep: String = "\n\n"): DataFrame = {
    require(minDf >= 2, s"minDf=$minDf must be >= 2")
    val paras = docs.select(col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as(Seq("pos", "para")))
      .withColumn("fp", md5(col("para")))
    val boiler = paras.select(col("fp"), col(idCol))
      .groupBy("fp").agg(countDistinct(col(idCol)).as("df"))
      .filter(col("df") >= minDf)
      .select("fp")
    val kept = paras.join(boiler, Seq("fp"), "left_anti")
    val rebuilt = kept.groupBy(col(idCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("para")))),
        x => x.getField("para")), sep).as(textCol))
    docs.select(col(idCol)).join(rebuilt, Seq(idCol), "left")
      .select(col(idCol), coalesce(col(textCol), lit("")).as(textCol))
  }
}
