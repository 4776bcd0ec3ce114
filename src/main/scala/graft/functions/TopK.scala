package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Partial top-k aggregation for similarity ranking.
  *
  * The `row_number().over(Window.partitionBy(q_id))` formulation
  * sort-shuffles EVERY candidate pair to the reducer that owns the
  * query — at 100 TB, the full corpus×queries candidate set crosses the
  * network to be mostly discarded. This typed aggregator keeps a
  * bounded buffer of the k best (sim DESC, id ASC) per query per map
  * task, so the shuffle payload is ≤ k rows per (query, partition) —
  * the standard scalable top-k-per-key shape (partial combine, exact
  * merge).
  *
  * Ordering is total and deterministic — (sim descending, id ascending)
  * — so the result is IDENTICAL to the window formulation row for row.
  */
object TopK {

  /** One scored candidate. */
  final case class Scored(sim: Double, id: Long)

  // NaN ranks GREATEST, matching Spark's descending sort order — so the
  // UDAF stays row-for-row identical to the row_number window
  // formulation even when a zero-norm vector makes cosine return NaN
  // (naive `>` / `==` are both false for NaN, which would silently drop
  // such candidates once the buffer fills)
  private def simGt(a: Double, b: Double): Boolean =
    (a.isNaN && !b.isNaN) || a > b
  private def simEq(a: Double, b: Double): Boolean =
    (a.isNaN && b.isNaN) || a == b

  private def better(a: Scored, b: Scored): Boolean =
    simGt(a.sim, b.sim) || (simEq(a.sim, b.sim) && a.id < b.id)

  /** Exact top-k merge of two sorted-desc sequences, bounded by k. */
  private def mergeSorted(k: Int, a: Seq[Scored], b: Seq[Scored]): Seq[Scored] = {
    val out = new scala.collection.mutable.ArrayBuffer[Scored](k)
    var i = 0
    var j = 0
    while (out.length < k && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && better(a(i), b(j)))) {
        out += a(i); i += 1
      } else {
        out += b(j); j += 1
      }
    }
    out.toSeq
  }

  /** Aggregator: rows (sim, id) → the k best, sorted (sim desc, id asc).
    * The running buffer is always sorted and bounded by k: a row that
    * cannot beat the current k-th is rejected in O(1); an accepted row
    * merges in O(k) (single [[mergeSorted]] pass) — no per-row full
    * sort, and merge() between partial buffers is one O(k) merge.
    */
  final class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    override def zero: Seq[Scored] = Seq.empty

    override def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] =
      if (buf.length >= k && !better(x, buf.last)) buf
      else mergeSorted(k, buf, Seq(x))

    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
      mergeSorted(k, a, b)

    override def finish(buf: Seq[Scored]): Seq[Scored] = buf

    override def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Column API: `topK(sim, id, k)` → `array<struct<sim,id>>`, sorted
    * (sim desc, id asc), length ≤ k.
    */
  def topK(sim: Column, id: Column, k: Int): Column =
    udaf(new TopKAgg(k), Encoders.product[Scored]).apply(sim, id)

  // ------------------------------------------------------------------
  // String-keyed variant (top-k TERMS per document — TermWeights):
  // same bounded-buffer shape, ordering (weight desc, term asc).
  // ------------------------------------------------------------------

  /** One scored term. */
  final case class ScoredTerm(w: Double, term: String)

  /** Binary UTF-8 order — what Spark's UTF8String sort and DuckDB's
    * default collation both use. Java's String `<` compares UTF-16
    * code units, which ranks supplementary-plane characters (surrogate
    * pairs, 0xD800-) BELOW U+E000..U+FFFF — a tie at the k boundary
    * would then disagree with the engines' own ORDER BY.
    */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xFF) - (y(i) & 0xFF)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  private def betterTerm(a: ScoredTerm, b: ScoredTerm): Boolean =
    simGt(a.w, b.w) || (simEq(a.w, b.w) && utf8Lt(a.term, b.term))

  private def mergeSortedTerms(k: Int, a: Seq[ScoredTerm],
      b: Seq[ScoredTerm]): Seq[ScoredTerm] = {
    val out = new scala.collection.mutable.ArrayBuffer[ScoredTerm](k)
    var i = 0
    var j = 0
    while (out.length < k && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && betterTerm(a(i), b(j)))) {
        out += a(i); i += 1
      } else {
        out += b(j); j += 1
      }
    }
    out.toSeq
  }

  final class TopKTermsAgg(k: Int)
      extends Aggregator[ScoredTerm, Seq[ScoredTerm], Seq[ScoredTerm]] {
    override def zero: Seq[ScoredTerm] = Seq.empty
    override def reduce(buf: Seq[ScoredTerm], x: ScoredTerm): Seq[ScoredTerm] =
      if (buf.length >= k && !betterTerm(x, buf.last)) buf
      else mergeSortedTerms(k, buf, Seq(x))
    override def merge(a: Seq[ScoredTerm], b: Seq[ScoredTerm]): Seq[ScoredTerm] =
      mergeSortedTerms(k, a, b)
    override def finish(buf: Seq[ScoredTerm]): Seq[ScoredTerm] = buf
    override def bufferEncoder: Encoder[Seq[ScoredTerm]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredTerm]]()
    override def outputEncoder: Encoder[Seq[ScoredTerm]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredTerm]]()
  }

  /** Column API: `topKTerms(w, term, k)` → `array<struct<w,term>>`,
    * sorted (w desc, term asc), length ≤ k — ships ≤ k rows per group
    * per task, never a per-key window sort.
    */
  def topKTerms(w: Column, term: Column, k: Int): Column =
    udaf(new TopKTermsAgg(k), Encoders.product[ScoredTerm]).apply(w, term)
}
