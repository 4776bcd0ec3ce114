package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-governance operators for LLM-training-data pipelines:
  * reproducible dataset splits, eval-set contamination detection, and
  * corpus-wide frequent-n-gram mining. These are the bookkeeping steps a
  * production pipeline runs around the cleaning/dedup stages (the
  * reference repo at /root/reference has no analog — this is extension
  * surface per SURVEY §7.3).
  *
  * Scale posture:
  *  - [[splitAssign]] is a pure map-side projection (hash of the id) —
  *    zero shuffles, deterministic across reruns/backfills, and stable
  *    under corpus growth (a doc's split never changes when other docs
  *    are added — the property train/test splits must have, and why
  *    random() splits are wrong).
  *  - [[contamination]] joins eval n-grams against the distinct train
  *    n-gram set: both sides shuffle-partition by the n-gram key, and
  *    the eval side of the join is tiny relative to train (eval sets
  *    are ~10³–10⁵ docs while train is the 100 TB corpus), so at scale
  *    the right physical plan is a shuffle join keyed by n-gram with
  *    map-side combine on the train distinct. A bloom filter on the
  *    (small) eval n-gram set pushed into the train scan cuts the
  *    shuffle further; Spark's AQE runtime filter does this when
  *    beneficial.
  *  - [[topNgrams]] is a partial-aggregating groupBy followed by a
  *    bounded top-k (`TakeOrderedAndProject` — each task ships only its
  *    local top k, never the full frequency table).
  */
object Governance {

  /** Deterministic train/valid/test assignment from a salted md5 of the
    * document id. The first two hex chars (256 slots) are compared
    * lexicographically against slot boundaries, so the assignment is a
    * pure expression reproducible in any engine with md5 — no RNG, no
    * shuffle, no dependence on row order or corpus size.
    *
    * `testSlots`/`validSlots` are counts out of 256 (13/256 ≈ 5.1%).
    */
  def splitAssign(docs: DataFrame, idCol: String = "doc_id",
      salt: String = "graft", testSlots: Int = 13,
      validSlots: Int = 13): DataFrame = {
    require(testSlots >= 0 && validSlots >= 0 &&
      testSlots + validSlots <= 256, "slot counts must fit in 256")
    val prefix = substring(
      md5(concat_ws(":", lit(salt), col(idCol).cast("string"))), 1, 2)
    // "g" sorts above every hex digit — the 256-slot boundary ("100")
    // would compare wrong lexicographically against 2-char prefixes
    def bound(slots: Int): String =
      if (slots >= 256) "g" else f"$slots%02x"
    docs.withColumn("split",
      when(prefix < lit(bound(testSlots)), lit("test"))
        .when(prefix < lit(bound(testSlots + validSlots)), lit("valid"))
        .otherwise(lit("train")))
  }

  /** Leakage-safe split assignment: hash a GROUP key (dedup-cluster
    * representative, source domain, URL host) instead of the document
    * id, so every correlated document lands in the SAME split — the
    * guard against near-duplicates straddling train/test and inflating
    * eval scores (the train-test contamination failure mode document
    * dedup exists to prevent). Same deterministic md5-slot projection
    * as [[splitAssign]]: no shuffle, no RNG state, and a group's fate
    * never changes as the corpus grows. NULL groups are refused —
    * silently hashing NULL would funnel every ungrouped doc into one
    * split bucket; pick an explicit fallback key first (e.g.
    * `coalesce(group, id)`).
    */
  def splitAssignByGroup(docs: DataFrame, groupCol: String,
      salt: String = "graft", testSlots: Int = 13,
      validSlots: Int = 13): DataFrame = {
    val checked = docs.withColumn(groupCol,
      when(col(groupCol).isNull, raise_error(lit(
        s"splitAssignByGroup: NULL in group column '$groupCol' — " +
          "coalesce to an explicit fallback key first")))
        .otherwise(col(groupCol)))
    splitAssign(checked, idCol = groupCol, salt = salt,
      testSlots = testSlots, validSlots = validSlots)
  }

  /** Deterministic per-stratum downsampling — the mixture-reweighting
    * step that rebalances over-represented languages/sources before
    * training. Each stratum gets a keep-rate in [0, 1]; a doc is kept
    * iff the first 4 hex chars of its salted md5 (65 536 slots) fall
    * under `rate * 65536`. Like [[splitAssign]] this is a pure
    * projection: no RNG state, no shuffle, reproducible everywhere, and
    * a doc's fate never changes when the corpus grows. Strata missing
    * from `rates` keep everything.
    */
  def sampleStratified(docs: DataFrame, strataCol: String,
      rates: Map[String, Double], idCol: String = "doc_id",
      salt: String = "graft-sample"): DataFrame = {
    require(rates.values.forall(r => r >= 0.0 && r <= 1.0),
      "rates must be in [0, 1]")
    val prefix = substring(
      md5(concat_ws(":", lit(salt), col(idCol).cast("string"))), 1, 4)
    // fixed-width lowercase hex compares lexicographically == numerically;
    // "g" sorts above every hex digit, so rate 1.0 keeps everything
    val bound = rates.foldLeft(lit("g")) { case (acc, (stratum, r)) =>
      val slots = (r * 65536).toLong
      val b = if (slots >= 65536L) "g" else f"$slots%04x"
      when(col(strataCol) === stratum, lit(b)).otherwise(acc)
    }
    docs.filter(prefix < bound)
  }

  /** Temperature-flattened mixture sampling — the multilingual/
    * multi-source rebalancing step (XLM-R / mT5 style): the target
    * mixture gives stratum l probability q_l ∝ p_l^alpha (p_l its
    * corpus share), so alpha < 1 flattens dominant strata toward the
    * rare ones. The output is the deterministic subsample whose
    * expected size is `fraction`·N and whose composition follows q:
    * per-stratum keep-rate r_l = min(1, fraction·N·q_l / n_l), applied
    * with the same salted-md5 slot test as [[sampleStratified]] — no
    * RNG, reproducible in any engine with md5, and a doc's fate never
    * changes as other strata grow. Rates clamp at 1 (pure subsampling;
    * true upsampling duplicates rows at batch time — a trainer-side
    * explode, not a corpus rewrite).
    *
    * Scale shape: one partial-aggregating count per stratum (model-
    * sized), scalars ride the lazy plan as a broadcast 1-row frame
    * (the bm25 pattern — zero driver passes), then a pure map-side
    * filter on the corpus. alpha = 0.5 routes through `sqrt`, which is
    * IEEE-correctly-rounded everywhere (exact cross-engine parity);
    * other alphas use `pow`.
    */
  def temperatureMix(docs: DataFrame, strataCol: String,
      alpha: Double = 0.5, fraction: Double = 0.25,
      idCol: String = "doc_id", salt: String = "graft-mix"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha=$alpha must be in (0, 1]")
    require(fraction > 0.0 && fraction <= 1.0,
      s"fraction=$fraction must be in (0, 1]")
    def w(c: Column): Column =
      if (alpha == 0.5) sqrt(c) else pow(c, lit(alpha))
    val counts = docs.groupBy(col(strataCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w", w(col("__n")))
    // corpus scalars ride as a 1-row cross join against the model-sized
    // counts frame (the bm25 scalar pattern) — no driver pass, and no
    // single-partition window (whose WindowExec warning reads like an
    // anti-pattern even on a 5-row frame). NOTE "__tot"/"__z", not
    // "__N"/"__Z": Spark resolves column names case-insensitively, so
    // a scalar named "__N" would collide with "__n".
    val scalars = counts.agg(sum(col("__n")).as("__tot"),
      sum(col("__w")).as("__z"))
    val slotted = counts.crossJoin(scalars)
      // slots out of 65536, floored: r_l·65536 = 65536·fraction·N·q_l/n_l
      // with q_l = w_l/Z
      .withColumn("__slots", least(lit(65536L),
        floor(lit(65536.0 * fraction) * col("__tot") *
          (col("__w") / col("__z")) / col("__n")).cast("long")))
      .withColumn("__bound",
        when(col("__slots") >= 65536L, lit("g"))
          .otherwise(format_string("%04x", col("__slots"))))
      .select(col(strataCol).as("__stratum"), col("__bound"))
    val prefix = substring(
      md5(concat_ws(":", lit(salt), col(idCol).cast("string"))), 1, 4)
    // null-safe equality: a NULL stratum is a real group in `counts`
    // and must participate in the mixture, not silently vanish (an
    // equi-join on the stratum column would never match it)
    docs.join(slotted, docs(strataCol) <=> col("__stratum"))
      .filter(prefix < col("__bound"))
      .drop("__stratum", "__bound")
  }

  /** Per-eval-document n-gram contamination against the training split:
    * for each eval doc, the fraction of its distinct word n-grams that
    * also appear anywhere in the train split. This is the standard
    * train/test-overlap audit (GPT-3/PaLM-style n-gram collision check;
    * those pipelines use n = 8–13 — n is a parameter here because the
    * testdata docs are short).
    *
    * Output: one row per eval doc — `n_shingles` (distinct n-grams),
    * `n_contaminated` (those present in train), `contamination` (the
    * ratio; 0.0 for clean docs, which ARE emitted).
    */
  def contamination(corpus: DataFrame, isEval: Column,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 8): DataFrame = {
    val shingled = corpus.select(col(idCol), isEval.as("is_eval"),
      Dedup.wordShingles(col(textCol), n).as("shingles"))
    val evalSh = shingled.filter(col("is_eval"))
      .select(col(idCol), explode(col("shingles")).as("sh"))
    val trainSh = shingled.filter(!col("is_eval"))
      .select(explode(col("shingles")).as("sh")).distinct()
    val totals = evalSh.groupBy(idCol)
      .agg(count(lit(1)).as("n_shingles"))
    // merge hint (r19, guide §3.1/§2.4): the estimate broadcasts the
    // TRAIN n-gram set — the corpus-scale side — building the
    // relation in a serial side job; sort-merge lets the semi join
    // REUSE the sh-keyed exchange trainSh's distinct() already
    // created. Measured 1.18 -> 0.97 s at sf0.1, identical rows; at
    // 100 TB the train-side broadcast would OOM outright.
    val hits = evalSh.join(trainSh.hint("merge"), Seq("sh"), "left_semi")
      .groupBy(idCol).agg(count(lit(1)).as("n_contaminated"))
    totals.join(hits, Seq(idCol), "left")
      .na.fill(0L, Seq("n_contaminated"))
      .withColumn("contamination",
        col("n_contaminated").cast("double") / col("n_shingles"))
  }

  /** Deterministic GLOBAL corpus shuffle into training shards — the
    * canonical pre-training step that decorrelates document order from
    * crawl/source order (training-order bias). Every doc gets a seeded
    * content-independent sort key (md5 of the salted id — the same
    * deterministic primitive as [[splitAssign]], reproducible in any
    * engine) and a shard from the key's leading byte: a PURE STATELESS
    * PROJECTION — no window, no global sort, no driver state. The
    * physical shuffle happens once, at write time
    * ([[writeShuffledShards]]): repartition by shard + sort within by
    * the key, so each shard file holds its documents in the seeded
    * pseudo-random order. At 100 TB that is ONE exchange; the
    * `ntile`-over-global-`orderBy` formulation this replaces would
    * funnel the corpus through a single window partition.
    *
    * Same salt → same shuffle, different salt → an independent
    * permutation (new epoch orderings without touching the data).
    */
  def shuffleShards(docs: DataFrame, nShards: Int,
      salt: String = "graft-shuffle", idCol: String = "doc_id"): DataFrame = {
    require(nShards >= 1 && nShards <= 256,
      s"nShards must be 1..256 (the key's leading byte): $nShards")
    val key = md5(concat(lit(salt + ":"), col(idCol).cast("string")))
    docs.withColumn("sort_key", key)
      .withColumn("shard",
        (conv(substring(col("sort_key"), 1, 2), 16, 10).cast("int")
          % lit(nShards)).cast("int"))
  }

  /** Materialize the shuffle: one exchange clustering rows by shard,
    * each written internally ordered by the seeded key — shard files
    * ARE the training order.
    */
  def writeShuffledShards(docs: DataFrame, path: String, nShards: Int,
      salt: String = "graft-shuffle", idCol: String = "doc_id"): Unit =
    shuffleShards(docs, nShards, salt, idCol)
      .repartition(nShards, col("shard"))
      // shard LEADS the sort: partitionBy requires partition-column
      // ordering and would otherwise inject its own NON-STABLE sort by
      // (shard) alone, destroying the seeded order the shards exist
      // for; with the prefix satisfied the writer keeps our order
      .sortWithinPartitions(col("shard"), col("sort_key"), col(idCol))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Build-once TRAIN n-gram index for [[contaminationAgainstIndex]]:
    * the train split's DISTINCT word n-grams committed as a snapshot
    * table range-sorted on `sh` (disjoint per-file [min,max] bounds in
    * the manifest) with Bloom sidecars on `sh` — at 100 TB the train
    * corpus is tokenized ONCE here, and every later eval probe opens
    * only the files whose range or Bloom may hold its grams.
    */
  def buildNgramIndex(spark: org.apache.spark.sql.SparkSession,
      train: DataFrame, root: String, n: Int = 8,
      textCol: String = "text", files: Int = 16): graft.catalog.SnapshotTable = {
    val grams = train
      .select(explode(Dedup.wordShingles(col(textCol), n)).as("sh"))
      .distinct()
    val tbl = graft.catalog.SnapshotTable.create(spark, root,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("sh",
          org.apache.spark.sql.types.StringType, nullable = false))),
      None,
      properties = graft.catalog.EvolvingWriter.DefaultTableProps +
        ("graft.bloom.columns" -> "sh"))
    tbl.append(grams.repartitionByRange(files, col("sh"))
      .sortWithinPartitions("sh"))
    tbl
  }

  /** [[contamination]] probed against a PERSISTED train n-gram index —
    * identical output, different cost model: the train side is never
    * re-tokenized, and when the eval probe set is small enough to ship
    * to the driver (`maxProbe`, the realistic shape: eval benchmarks
    * are tiny next to a 100 TB train corpus) the index read is
    * FILE-PRUNED — `sh IN (…)` consults each file's range bounds and
    * Bloom sidecar at the manifest, so only possibly-matching files
    * are opened. A larger eval side falls back to a distributed
    * semi-join against the full index (still amortizing the train
    * tokenization). Clean docs are emitted with contamination 0.0,
    * same as the direct operator.
    */
  def contaminationAgainstIndex(index: graft.catalog.SnapshotTable,
      eval: DataFrame, idCol: String = "doc_id", textCol: String = "text",
      n: Int = 8, maxProbe: Int = 200000): DataFrame = {
    // tokenized ONCE (eager local checkpoint): the eval side is tiny
    // next to the train corpus, and it feeds three consumers (probe
    // collect, per-doc totals, hit counts) — without the checkpoint
    // each would re-shingle the eval text
    val evalSh = eval.select(col(idCol),
      explode(Dedup.wordShingles(col(textCol), n)).as("sh"))
      .localCheckpoint(true)
    val totals = evalSh.groupBy(idCol).agg(count(lit(1)).as("n_shingles"))
    val probe = evalSh.select("sh").distinct().limit(maxProbe + 1)
      .collect().map(_.getString(0))
    val trainSh =
      if (probe.length <= maxProbe)
        // sorted multi-key manifest probe: per-file range binary
        // search + one Bloom resolve per file — O(|probe|) total Bloom
        // work against the range-clustered index, only matching files
        // open (SnapshotTable.readKeysIn)
        // residual=false: the semi-join below re-establishes exactness,
        // and a 10⁵-literal IN costs driver analysis time for nothing
        index.readKeysIn("sh", probe.toIndexedSeq, residual = false)
      else index.read()
    val hits = evalSh.join(trainSh, Seq("sh"), "left_semi")
      .groupBy(idCol).agg(count(lit(1)).as("n_contaminated"))
    totals.join(hits, Seq(idCol), "left")
      .na.fill(0L, Seq("n_contaminated"))
      .withColumn("contamination",
        col("n_contaminated").cast("double") / col("n_shingles"))
  }

  /** Per-document mean unigram log-probability under the CORPUS
    * unigram LM — the deterministic perplexity proxy (CCNet-style
    * pipelines gate on LM perplexity; a unigram model over exact
    * corpus counts gives the same "how typical is this document's
    * vocabulary" signal with bit-reproducible arithmetic and no model
    * binary): score = mean over token OCCURRENCES of
    * `ln(count(token) / total_tokens)`. Low scores flag gibberish /
    * OOV-heavy documents; high scores flag boilerplate-typical text.
    * Same two-pass shape as [[rareTokenRatio]]: global counts
    * (partial-aggregating groupBy) joined back per doc by token; the
    * ONE corpus scalar rides as a broadcast 1-row frame in the SAME
    * lazy plan (the [[TermWeights]] pattern) — a separate driver
    * collect would re-run the tokenize+count aggregation a second time
    * when the main plan executes. Rounded to 1e-6 — the engine-parity
    * discipline for transcendental math (ulp-level libm differences;
    * everything before the ln is integer-exact).
    */
  def unigramLogProb(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import graft.functions.TextFunctions.normalText
    val toks = docs.select(col(idCol),
      explode(split(normalText(col(textCol)), " ")).as("tok"))
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val totalDf = counts.agg(sum(col("c")).as("__total"))
    // merge hint: counts is VOCABULARY-sized (same argument as
    // TermWeights.topTerms — locally within noise, estimate-proof at
    // corpus scale where a vocabulary broadcast would not fit)
    toks.join(counts.hint("merge"), Seq("tok"))
      .crossJoin(broadcast(totalDf))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(log(col("c").cast("double"))) -
          log(max(col("__total")).cast("double")), 6).as("logprob"))
  }

  /** Best-k rows per group by (score desc, id asc) via the
    * partial-aggregating [[graft.functions.TopK]] UDAF — the curation
    * step that keeps the k highest-quality documents per source/domain.
    * Map tasks ship at most k candidates per group, never the full
    * group, unlike the `row_number().over(Window)` formulation which
    * sort-shuffles every row to its group's reducer. Output is
    * identical to the window version row for row (total order).
    */
  def bestPerGroup(docs: DataFrame, groupCol: String, scoreCol: Column,
      idCol: String = "doc_id", k: Int = 3): DataFrame =
    Similarity.rankTopK(
      docs.select(col(groupCol), scoreCol.as("score"), col(idCol)),
      k, groupCol = groupCol, simCol = "score", idCol = idCol)

  /** Per-document rare-token ratio: the fraction of a doc's token
    * OCCURRENCES whose corpus-wide count is ≤ `rareMax` — the
    * OOV/rare-vocabulary quality signal (CCNet-style pipelines filter
    * on corpus statistics like this; unlike perplexity it is exactly
    * reproducible, all-integer until one final division).
    *
    * The shape is the canonical two-pass corpus statistic: tokenize →
    * global counts (partial-aggregating groupBy) → join the (small)
    * rare-token set back per doc. At 100 TB the rare set is the long
    * tail — large — so the join shuffles by token; the frequent set is
    * what broadcast would want but rare-set membership is the signal.
    */
  def rareTokenRatio(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", rareMax: Long = 2): DataFrame = {
    import graft.functions.TextFunctions.normalText
    val toks = docs.select(col(idCol),
      explode(split(normalText(col(textCol)), " ")).as("tok"))
    val rare = toks.groupBy("tok").count()
      .filter(col("count") <= rareMax).select("tok")
    val perDoc = toks.groupBy(idCol).agg(count(lit(1)).as("n_tokens"))
    // merge pins on BOTH joins were A/B-measured in r20 (the planner
    // broadcasts rare and rareHits at harness scale) and REJECTED:
    // pinning the rare semi join forces an extra full shuffle of raw
    // token occurrences (~1.25× worse), and pinning the outer join
    // alone still measured ~1.10× worse control-normalized. At corpus
    // scale both sides' estimates exceed the broadcast threshold and
    // the planner picks the shuffle itself — the cliff only bites on
    // wrong estimates, which the r19/r20 pins reserve for sides the
    // planner PROVABLY mis-sizes (see OPTIMIZATION_r20.md sweep).
    val rareHits = toks.join(rare, Seq("tok"), "left_semi")
      .groupBy(idCol).agg(count(lit(1)).as("n_rare"))
    perDoc.join(rareHits, Seq(idCol), "left")
      .na.fill(0L, Seq("n_rare"))
      .withColumn("rare_ratio",
        col("n_rare").cast("double") / col("n_tokens"))
  }

  /** Corpus-wide frequent word n-grams by document frequency (each doc
    * counts an n-gram once — [[Dedup.wordShingles]] emits distinct
    * shingles per doc). Total order is (df desc, ngram asc), so the
    * top-k set is unique and engine-independent.
    */
  def topNgrams(docs: DataFrame, textCol: String = "text", n: Int = 2,
      k: Int = 50): DataFrame =
    docs.select(explode(Dedup.wordShingles(col(textCol), n)).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("ngram").asc)
      .limit(k)
}
