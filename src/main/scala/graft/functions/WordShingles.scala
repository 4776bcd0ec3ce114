package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of the canonical text form as a native
  * Catalyst expression: raw string in, `array<string>` out, one pass.
  *
  * Semantics are EXACTLY `array_distinct(ngrams(split(normalText(c))))`
  * where normalText = lower → collapse `\s+` → trim (the TextFunctions
  * canonical form mirrored by every DuckDB oracle): lowercasing uses
  * Spark's own `UTF8String.toLowerCase`, and tokens split on Java's
  * regex-`\s` set — all ASCII bytes, so byte-level scanning is exact for
  * any UTF-8 input. Documents shorter than n tokens collapse to one
  * whole-text shingle.
  *
  * Round-2 performance fix: the HOF formulation
  * (`transform(sequence(...), i -> concat_ws(' ', slice(toks, i, n)))`)
  * is interpreted per element — Spark's higher-order functions have no
  * doGenCode — and profiling showed it dominating BOTH dedup families
  * (~1 ms/doc, recomputed on every branch of the postings diamond).
  * This expression is a static call inside WholeStageCodegen and makes
  * shingle recomputation cheap enough that candidate joins can carry
  * ids only and re-derive shingles instead of shuffling them.
  */
case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"shingle length n=$n must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)
}

object WordShingles {

  /** Java regex `\s`: space, tab, LF, VT, FF, CR — all single-byte in
    * UTF-8, so scanning bytes is exact.
    */
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  def compute(raw: UTF8String, n: Int): GenericArrayData = {
    val s = raw.toLowerCase // Spark's own lower() semantics
    val bytes = s.getBytes
    // token byte ranges [start, end)
    val starts = new mutable.ArrayBuffer[Int]()
    val ends = new mutable.ArrayBuffer[Int]()
    var i = 0
    while (i < bytes.length) {
      while (i < bytes.length && isWs(bytes(i))) i += 1
      if (i < bytes.length) {
        starts += i
        while (i < bytes.length && !isWs(bytes(i))) i += 1
        ends += i
      }
    }
    val nTok = starts.length
    def joined(from: Int, until: Int): UTF8String = {
      // tokens joined by single spaces == the normalized-text slice
      var len = 0
      var t = from
      while (t < until) { len += ends(t) - starts(t); t += 1 }
      len += (until - from - 1).max(0)
      val out = new Array[Byte](len)
      var pos = 0
      t = from
      while (t < until) {
        if (t > from) { out(pos) = ' '; pos += 1 }
        val w = ends(t) - starts(t)
        System.arraycopy(bytes, starts(t), out, pos, w)
        pos += w
        t += 1
      }
      UTF8String.fromBytes(out)
    }
    if (nTok < n) {
      // short doc: one whole-text shingle (empty string for blank docs,
      // matching split("") == [""] in the HOF formulation)
      new GenericArrayData(Array[Any](joined(0, nTok)))
    } else {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var j = 0
      while (j + n <= nTok) {
        seen.add(joined(j, j + n))
        j += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      new GenericArrayData(out)
    }
  }

  /** Column API: `wordShingles(text, n)` over raw (un-normalized) text. */
  def wordShingles(c: Column, n: Int): Column =
    ColumnBridge.column(WordShinglesExpr(ColumnBridge.expression(c), n))
}
