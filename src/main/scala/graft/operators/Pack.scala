package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch assembly: assign documents to
  * capacity-aligned packs of the per-shard token stream.
  *
  * A single global greedy pack is inherently sequential (every
  * assignment depends on the full prefix), so the scalable form packs
  * PER SHARD: documents hash into `shards` deterministic shards, each
  * shard packs independently by running token total — exactly how
  * multi-worker training-data loaders shard-and-pack in practice. Each
  * shard's window is a narrow sort over its own rows (shuffle by shard
  * key, sort within partition); no global ordering bottleneck.
  *
  * Capacity semantics (chunked-concatenation, SOFT capacity): a pack is
  * the window `[k*capacity, (k+1)*capacity)` of the shard's
  * concatenated token stream, and a document belongs to the pack
  * containing its FIRST token. A document straddling a boundary is NOT
  * split, so a pack can run over `capacity` by up to its last
  * document's length − 1 tokens; callers needing hard caps split or
  * truncate that tail downstream (as concat-and-chunk loaders do).
  * This is the prefix-sum-parallel formulation — a strict
  * first-fit/no-overflow pack would reintroduce the sequential scan.
  *
  * `pack_id` is `(shard, seq)` flattened as `shard * 2^32 + seq` so
  * packs are globally unique and reproducible.
  */
object Pack {

  /** Split each document into overlapping fixed-size TOKEN windows —
    * the standard context-window chunking step before packing/training
    * (long documents become `window`-token chunks whose starts advance
    * by `window − overlap` tokens; the final chunk may be shorter;
    * documents at most `window` tokens pass through as one chunk).
    *
    * Pure per-row computation — tokenize, slice, explode — so it
    * partitions embarrassingly: no shuffle, no state, runs at scan
    * parallelism at any corpus size. Chunk ids are (doc, ordinal), so
    * output is deterministic and re-chunking is reproducible.
    *
    * Empty, whitespace-only, and NULL text all yield ONE zero-token
    * chunk (`n_chunk_tokens = 0`, `chunk_text = ""`) — every input doc
    * appears in the output exactly `nChunks ≥ 1` times and token
    * budgets downstream never overcount phantom tokens.
    *
    * Output: (doc_id, chunk_id, n_chunk_tokens, chunk_text).
    */
  def chunkDocuments(docs: DataFrame, window: Int, overlap: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window >= 1, s"window must be >= 1: $window")
    require(overlap >= 0 && overlap < window,
      s"overlap must be in [0, window): $overlap vs $window")
    val stride = window - overlap
    // canonical normalization (TextFunctions.normalText — one home for
    // the cross-engine parity form); split("") yields [""], which would
    // count one phantom token for an empty doc, so empties are filtered
    val toks = filter(
      split(graft.functions.TextFunctions.normalText(
        coalesce(col(textCol), lit(""))), " "),
      t => t =!= lit(""))
    val n = size(col("__toks"))
    // number of stride steps whose window still contains an unseen
    // token: 1 + ceil((n - window) / stride) for n > window, else 1
    val nChunks = when(n <= window, lit(1))
      .otherwise(lit(1) + ceil((n - lit(window)).cast("double") / lit(stride)).cast("int"))
    docs
      .select(col(idCol).as("doc_id"), toks.as("__toks"))
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => slice(col("__toks"), i * stride + 1, lit(window))))
          .as(Seq("chunk_id", "__chunk")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        size(col("__chunk")).cast("long").as("n_chunk_tokens"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }

  def packSequences(docs: DataFrame, capacity: Long, shards: Int,
      idCol: String = "doc_id", tokenCol: String = "n_tokens"): DataFrame = {
    require(capacity >= 1 && shards >= 1)
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("shard", pmod(col(idCol), lit(shards.toLong)).cast("int"))
      .withColumn("cum_tokens", sum(col(tokenCol)).over(w))
      // the pack a doc CLOSES: ceil(cum/capacity) - 1 would split a doc
      // across packs; instead a doc belongs to the pack its PREFIX
      // (cum - n) opens: floor((cum - n) / capacity)
      .withColumn("seq",
        floor((col("cum_tokens") - col(tokenCol)) / capacity).cast("long"))
      .withColumn("pack_id",
        col("shard").cast("long") * lit(4294967296L) + col("seq"))
      .drop("seq")
  }
}
