package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a whitespace-tokenized string as a native Catalyst
  * expression (extension operator, SURVEY §7.3 preference order (b):
  * custom `Expression` beats UDF). Codegen emits a static call to
  * [[SimHash64.compute]], so the operator stays inside WholeStageCodegen
  * — no serialization boundary, no UDF black box for the optimizer.
  *
  * Algorithm (Charikar 2002, standard form): per token compute a 64-bit
  * FNV-1a hash; for each bit position sum +1/−1 across tokens by bit
  * value; the sign vector is the fingerprint. Near-duplicate documents
  * differ in few bits (small Hamming distance).
  */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHash64.compute($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHash64 {

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  /** FNV-1a 64-bit over UTF-16 code units — deterministic, allocation-free. */
  def fnv1a64(s: String, from: Int, until: Int): Long = {
    var h = FnvOffset
    var i = from
    while (i < until) {
      val ch = s.charAt(i)
      h ^= (ch & 0xff); h *= FnvPrime
      h ^= (ch >>> 8); h *= FnvPrime
      i += 1
    }
    h
  }

  /** SimHash over whitespace tokens. Empty/blank input hashes to 0. */
  def compute(text: String): Long = {
    val counts = new Array[Int](64)
    val n = text.length
    var i = 0
    var sawToken = false
    while (i < n) {
      while (i < n && Character.isWhitespace(text.charAt(i))) i += 1
      val start = i
      while (i < n && !Character.isWhitespace(text.charAt(i))) i += 1
      if (i > start) {
        sawToken = true
        val h = fnv1a64(text, start, i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    if (!sawToken) 0L
    else {
      var out = 0L
      var b = 0
      while (b < 64) {
        if (counts(b) > 0) out |= (1L << b)
        b += 1
      }
      out
    }
  }

  /** Hamming distance between two fingerprints. */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Column API: `simhash64(normalizedText)`. */
  def simhash64(c: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(c)))
}
