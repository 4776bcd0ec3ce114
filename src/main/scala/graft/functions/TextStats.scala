package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All scalar text statistics in ONE pass as a native Catalyst
  * expression: struct<n_ws_tokens, n_bpe_tokens, n_punct, n_stop,
  * quality>.
  *
  * Exact-parity contract (each field is bit-identical to the
  * regex/HOF formulation the DuckDB oracles mirror):
  *  - n_ws_tokens  = size(split(trim(c), "\\s+")): space-only trim,
  *    then segments between `\s`-runs — a leading run contributes an
  *    empty first segment and a trailing run an empty last segment
  *    (Spark split keeps both with its default limit -1); blank input
  *    counts 1 (the [""] array).
  *  - n_bpe_tokens = count of [a-z]+ | [0-9]+ | [^a-z0-9\s] matches
  *    over the lowercased text (code-point-wise; any non-ASCII
  *    character is its own token, as in the regex).
  *  - n_punct      = length(regexp_replace(lower(c), "[a-z0-9 ]", "")):
  *    code points of the lowercase form outside {a-z, 0-9, space}.
  *  - n_stop       = whitespace tokens of the lowercase form equal to a
  *    TextFunctions.Stopwords entry.
  *  - quality      = the TextFunctions.qualityScore formula evaluated
  *    with the same double operations in the same order. One deliberate
  *    divergence: for EMPTY text the column formulation throws under
  *    Spark 4 ANSI (0/0 in punctRatio); here the 0/0 yields NaN, which
  *    the least() term clamps to a finite score — a 100 TB pipeline
  *    must not die on one blank document.
  *
  * Lowercasing uses `UTF8String.toLowerCase` — Spark's own `lower()` —
  * so multi-code-point case mappings behave exactly as the column
  * formulation. Spark's whole-stage codegen subexpression elimination
  * collapses the several field extracts a query makes into a single
  * evaluation, so a five-metric projection costs one pass over the
  * bytes instead of six regex traversals.
  */
case class TextStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextStats.Schema
  override def prettyName: String = "text_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TextStatsExpr =
    copy(child = newChild)
}

object TextStats {

  val Schema: StructType = StructType(Seq(
    StructField("n_ws_tokens", LongType, nullable = false),
    StructField("n_bpe_tokens", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("quality", DoubleType, nullable = false)))

  /** Java regex `\s`. */
  private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0b || cp == '\f' || cp == '\r'

  private def isLowerAlpha(cp: Int): Boolean = cp >= 'a' && cp <= 'z'
  private def isDigit(cp: Int): Boolean = cp >= '0' && cp <= '9'

  private val stopwords: Array[String] = TextFunctions.Stopwords.toArray

  def compute(raw: UTF8String): InternalRow = {
    val orig = raw.toString
    val lower = raw.toLowerCase.toString

    // ----- n_ws_tokens over space-trimmed ORIGINAL text --------------
    var a = 0
    var b = orig.length
    while (a < b && orig.charAt(a) == ' ') a += 1
    while (b > a && orig.charAt(b - 1) == ' ') b -= 1
    var nWs = 1L // segments = runs + 1; empty string -> [""]
    var i = a
    var inRun = false
    while (i < b) {
      val ws = isWs(orig.charAt(i))
      if (ws && !inRun) { nWs += 1; inRun = true }
      else if (!ws) inRun = false
      i += 1
    }

    // ----- single pass over the LOWERCASED text ----------------------
    var nBpe = 0L
    var nPunct = 0L
    var nStop = 0L
    var runType = 0 // 0 none, 1 alpha, 2 digit
    // stopword matching over \s-tokens of the space-trimmed lower text
    var la = 0
    var lb = lower.length
    while (la < lb && lower.charAt(la) == ' ') la += 1
    while (lb > la && lower.charAt(lb - 1) == ' ') lb -= 1
    var tokStart = -1
    def closeToken(endExclusive: Int): Unit = {
      if (tokStart >= 0) {
        val len = endExclusive - tokStart
        var s = 0
        while (s < stopwords.length) {
          val w = stopwords(s)
          if (w.length == len && lower.regionMatches(tokStart, w, 0, len)) {
            nStop += 1
            s = stopwords.length
          } else s += 1
        }
        tokStart = -1
      }
    }
    var j = 0
    while (j < lower.length) {
      val cp = lower.codePointAt(j)
      val charCount = Character.charCount(cp)
      val ws = charCount == 1 && isWs(cp)
      // bpe tokens: alpha runs, digit runs, any other non-ws cp alone
      if (isLowerAlpha(cp)) { if (runType != 1) nBpe += 1; runType = 1 }
      else if (isDigit(cp)) { if (runType != 2) nBpe += 1; runType = 2 }
      else { runType = 0; if (!ws) nBpe += 1 }
      // punct: outside {a-z, 0-9, ' '}
      if (!(isLowerAlpha(cp) || isDigit(cp) || cp == ' ')) nPunct += 1
      // stopword tokens within the trimmed window
      if (j >= la && j < lb) {
        if (ws) closeToken(j)
        else if (tokStart < 0) tokStart = j
      }
      j += charCount
    }
    closeToken(lb)

    // ----- quality: same double ops, same order ----------------------
    // NOTE: the formulation divides by length(c) of the ORIGINAL text.
    // Spark's least() treats NaN as larger than any value (x < y ? x : y
    // — NOT math.min, which propagates NaN differently).
    def sparkLeast(x: Double, y: Double): Double = if (x < y) x else y
    val origLen = orig.codePointCount(0, orig.length).toDouble
    val nTok = nWs.toDouble
    val punctRatio = nPunct.toDouble / origLen
    val stopRatio = nStop.toDouble / nTok
    val quality =
      sparkLeast(nTok / 50.0, 1.0) * 0.4 +
        (1.0 - sparkLeast(punctRatio * 5.0, 1.0)) * 0.3 +
        (1.0 - stopRatio) * 0.3

    new GenericInternalRow(Array[Any](nWs, nBpe, nPunct, nStop, quality))
  }

  /** Column API: the full stats struct. */
  def textStats(c: Column): Column =
    ColumnBridge.column(TextStatsExpr(ColumnBridge.expression(c)))
}
