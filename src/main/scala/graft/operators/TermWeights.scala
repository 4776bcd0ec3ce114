package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-statistical term weighting for training-data curation:
  * salient-term extraction per document ([[topTerms]]) and BM25
  * relevance scoring ([[bm25]]) — the classic retrieval primitives a
  * data pipeline uses for topic labeling, near-topic filtering, and
  * query-based corpus subselection.
  *
  * Scale shape: everything is hash aggregation on (doc, term) / (term)
  * plus one equality join on term — partial-combined, no windows, no
  * cross joins except the 1-row scalar attaches; per-doc top-k ships
  * ≤ k rows per group per task ([[graft.functions.TopK.topKTerms]]).
  * Corpus-level scalars (N, avgdl) ride the same lazy plan as
  * broadcast 1-row frames — one corpus scan per call, no driver-side
  * action.
  */
object TermWeights {

  /** Whitespace tokenization over the ONE canonical normal form
    * ([[graft.functions.TextFunctions.normalText]]) — the pipeline the
    * oracle-matched shingle queries use, so cross-engine parity is
    * already proven on this corpus and a normalization change has a
    * single home.
    */
  private def tokens(c: Column): Column =
    split(graft.functions.TextFunctions.normalText(c), " ")

  private def tokenRows(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")

  /** Top-k salient terms per document by df-discounted weight
    *
    *   w(t, d) = tf(t, d) * (N - df(t) + 0.5) / (df(t) + 0.5)
    *
    * — term frequency times the BM25 idf ARGUMENT, deliberately
    * log-free: `ln` is not exactly specified by IEEE 754 (engines may
    * differ in the last ulp), while +, −, ×, ÷ are correctly-rounded
    * everywhere, so these weights — and therefore the ranking — are
    * bit-identical across engines (DuckDB-oracle-checkable with no
    * tolerance). The log is monotone, so per-term the discount orders
    * documents identically to textbook idf.
    *
    * N = number of documents with at least one token (the documents in
    * the index — same collection-size definition [[bm25]] uses),
    * computed from the SAME (doc, term) aggregate that feeds tf — one
    * corpus scan, one lazy plan, no driver-side action: at 100 TB a
    * separate `docs.distinct.count` pass would cost a full extra scan
    * per call.
    *
    * Output: (doc_id, term, weight, rank), rank 1..k by
    * (weight desc, term asc).
    */
  def topTerms(docs: DataFrame, k: Int, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val tf = tokenRows(docs, idCol, textCol)
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // 1-row corpus scalar rides the tf subtree (exchange reuse) and is
    // broadcast to every partition — never collected to the driver.
    // This plans as a BroadcastNestedLoopJoin over a ONE-ROW build
    // side (a zero-key aggregate), i.e. a scalar attach — PlanAudit
    // recognizes the shape structurally and does not flag it.
    val nDf = tf.agg(count_distinct(col("doc_id")).cast("double").as("n"))
    // merge hint (r19, guide §3.1): the planner's estimate broadcasts
    // the dft aggregate, building it in a serial side job that re-runs
    // the tokenize+tf pipeline; the sort-merge shape reuses tf's
    // term-keyed exchange for both sides instead. Interleaved A/B at
    // sf0.1 measures the two within noise of each other (the codegen
    // tokenizer makes the duplicated build cheap at harness scale),
    // but dft is VOCABULARY-sized — at corpus scale it is not
    // broadcast material, so the merge join is the only sound plan
    // and pinning it removes an estimate-driven cliff.
    tf.join(dft.hint("merge"), "term")
      .crossJoin(broadcast(nDf))
      .withColumn("weight",
        col("tf") * (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
      .groupBy(col("doc_id"))
      .agg(graft.functions.TopK.topKTerms(col("weight"), col("term"), k).as("top"))
      .select(col("doc_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("doc_id"), col("s.term").as("term"), col("s.w").as("weight"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** BM25 score of every document containing at least one query term:
    *
    *   score(d) = Σ_t ln(1 + (N − df + 0.5)/(df + 0.5))
    *              · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * (Robertson/Sparck-Jones idf in the ln(1+x) form — never negative —
    * with the standard k1/b length normalization.) Output:
    * (doc_id, score), one row per matched document.
    */
  def bm25(docs: DataFrame, queryTerms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val toks = tokenRows(docs, idCol, textCol)
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    // corpus scalars (N, avgdl) as a broadcast 1-row frame riding the
    // dl subtree — fully lazy, no driver collect. Zero tokenized
    // documents need no special case: tf below is empty, so the joins
    // produce the empty result with the right schema.
    val stats = dl.agg(count(lit(1)).cast("double").as("n"),
      avg(col("dl")).as("avgdl"))
    // locale-independent lowercase (Locale.ROOT): corpus tokens go
    // through normalText's locale-free `lower`, so a JVM-default-locale
    // lowercase here (e.g. Turkish 'I'→'ı') would silently match
    // nothing. Multi-word "terms" can never match single-word tokens —
    // reject them loudly instead.
    require(queryTerms.forall(t => !t.exists(_.isWhitespace)),
      "bm25 query terms must be single words (split multi-word queries " +
        s"into terms): ${queryTerms.filter(_.exists(_.isWhitespace)).mkString("'", "', '", "'")}")
    val qt = queryTerms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    val tf = toks.filter(col("term").isInCollection(qt))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // dft stays broadcast: it is bounded by |queryTerms| at ANY corpus
    // size — broadcast is the sound plan there. dl is ONE ROW PER
    // DOCUMENT: the planner's estimate was broadcasting it (r20 plan
    // audit), a corpus-scale broadcast built in a serial side job that
    // re-runs the tokenize pipeline — the same estimate cliff as the
    // r19 contamination pin (guide §3.1). merge reuses the doc-keyed
    // shuffle; measured within noise locally, sound at 100 TB.
    tf.join(dft, "term").join(dl.hint("merge"), "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("contrib",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(sum(col("contrib")).as("score"))
  }

  /** Table properties carrying the corpus scalars on a term-stats
    * index (exact round-trips: N is a long; avgdl's
    * `Double.toString` parses back bit-identical).
    */
  private[graft] val NDocsProp = "graft.termstats.n_docs"
  private[graft] val AvgdlProp = "graft.termstats.avgdl"

  /** Build-once corpus term-statistics index for INCREMENTAL BM25
    * ([[bm25AgainstIndex]]): one row per vocabulary term with its
    * document frequency, committed as a snapshot table with
    * term-range-sorted files (so a query's terms prune at the
    * manifest) and the corpus scalars (N, avgdl) as table properties.
    * The per-batch ingest shape the incremental MinHash/SimHash/IVF
    * indexes already certify, applied to retrieval scoring: the
    * reference corpus is tokenized ONCE; every arriving batch scores
    * against the frozen statistics without re-reading a single corpus
    * document.
    */
  def buildTermStatsIndex(spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame, root: String, idCol: String = "doc_id",
      textCol: String = "text"): graft.catalog.SnapshotTable = {
    val toks = tokenRows(docs, idCol, textCol)
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    // two corpus scalars — model-sized driver collect, same budget as
    // the IVF centroids
    val st = dl.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))
      .collect()(0)
    val dft = toks.select(col("doc_id"), col("term")).distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val tbl = graft.catalog.SnapshotTable.create(spark, root,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("term",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("df",
          org.apache.spark.sql.types.LongType, nullable = false))),
      None,
      properties = graft.catalog.EvolvingWriter.DefaultTableProps ++ Map(
        NDocsProp -> st.getAs[Long]("n").toString,
        AvgdlProp -> st.getAs[Double]("avgdl").toString))
    tbl.append(dft.repartitionByRange(8, col("term"))
      .sortWithinPartitions("term"))
    tbl
  }

  /** BM25-score an incoming batch against a FROZEN term-stats index:
    * df/N/avgdl come from the index (the batch does not shift the
    * reference statistics); document lengths come from the batch
    * itself. Only the query terms' index rows are read —
    * `readWhere(term IN …)` opens O(query terms) term-sorted files at
    * the manifest, never the vocabulary. Terms unseen in the reference
    * corpus contribute nothing (no df row — same inner-join semantics
    * as [[bm25]], where df ≥ 1 by construction).
    */
  def bm25AgainstIndex(index: graft.catalog.SnapshotTable,
      batch: DataFrame, queryTerms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    require(queryTerms.forall(t => !t.exists(_.isWhitespace)),
      "bm25 query terms must be single words: " +
        queryTerms.filter(_.exists(_.isWhitespace)).mkString("'", "', '", "'"))
    // published, not current: with an audit (WAP) window open on the
    // index, readWhere resolves the published snapshot — the corpus
    // scalars must come from the SAME snapshot or scores would mix
    // staged-head N/avgdl with base-snapshot df rows
    val props = index.publishedSnapshot().properties
    val n = props.getOrElse(NDocsProp, sys.error(
      s"not a term-stats index (missing $NDocsProp): ${index.root}")).toLong
    val avgdl = props(AvgdlProp).toDouble
    val qt = queryTerms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    val dft = index.readWhere(col("term").isInCollection(qt))
    val toks = tokenRows(batch, idCol, textCol)
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val tf = toks.filter(col("term").isInCollection(qt))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // same pin as [[bm25]]: dl is one row per BATCH document — a
    // backfill-sized batch must not be broadcast on an estimate
    tf.join(dft, "term").join(dl.hint("merge"), "doc_id")
      .withColumn("idf",
        log(lit(1.0) +
          (lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("contrib",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl))))
      .groupBy("doc_id")
      .agg(sum(col("contrib")).as("score"))
  }
}
