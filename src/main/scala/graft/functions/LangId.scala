package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Marker-word language identification as a native expression —
  * IDENTICAL semantics to the TextFunctions.langId column formulation
  * (and therefore to the DuckDB oracle's CASE over `contains` flags):
  * pad the canonical text form with spaces, count how many of each
  * language's marker substrings occur, pick the max with ties broken by
  * the fixed [[TextFunctions.LangMarkers]] order, "und" when every
  * score is zero. The canonical form (lower → collapse `\s+` → trim)
  * and the containment checks happen in one pass over one string
  * instead of 23 separately-normalized `contains` columns.
  */
case class LangIdExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override protected def nullSafeEval(input: Any): Any =
    LangId.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangId.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

object LangId {

  private val markers: Array[(UTF8String, Array[String])] =
    TextFunctions.LangMarkers.map { case (lang, ms) =>
      (UTF8String.fromString(lang), ms.toArray)
    }.toArray

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0b || c == '\f' || c == '\r'

  /** ` normalText(c) ` — the padded canonical form the markers match
    * against (single String build, same bytes as
    * `concat(' ', trim(regexp_replace(lower(c), "\s+", " ")), ' ')`).
    */
  private def paddedCanonical(raw: UTF8String): String = {
    val s = raw.toLowerCase.toString
    val sb = new java.lang.StringBuilder(s.length + 2)
    sb.append(' ')
    var i = 0
    var pendingWs = false
    var started = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (isWs(c)) { if (started) pendingWs = true }
      else {
        if (pendingWs) { sb.append(' '); pendingWs = false }
        sb.append(c)
        started = true
      }
      i += 1
    }
    sb.append(' ')
    sb.toString
  }

  def compute(raw: UTF8String): UTF8String = {
    val padded = paddedCanonical(raw)
    val scores = new Array[Int](markers.length)
    var best = 0
    var i = 0
    while (i < markers.length) {
      val ms = markers(i)._2
      var s = 0
      var j = 0
      while (j < ms.length) {
        if (padded.contains(ms(j))) s += 1
        j += 1
      }
      scores(i) = s
      if (s > best) best = s
      i += 1
    }
    if (best == 0) LangId.Und
    else {
      var k = 0
      while (scores(k) != best) k += 1
      markers(k)._1
    }
  }

  private val Und = UTF8String.fromString("und")

  /** Column API. */
  def langId(c: Column): Column =
    ColumnBridge.column(LangIdExpr(ColumnBridge.expression(c)))
}
