package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Decoded filesystem path of a file URI, as a native codegen
  * expression (VERDICT r17 #5 — this replaces the last interpreted
  * per-row Scala UDF in the engine, which sat on the MoR delete-vector
  * anti-join read path normalizing `_metadata.file_path` for every
  * scanned row of a DV-covered file).
  *
  * Semantics are EXACTLY [[graft.catalog.SnapshotTable.uriPath]]
  * (spec-pinned parity): percent-encoding rides on top of Hive's own
  * %XX dir-name escaping, so decode exactly once via `URI.getPath`;
  * strings that don't parse as a URI, or whose path component is null
  * or empty, pass through raw. Every delete-vector / manifest path
  * comparison must share this one rendering or deleted rows resurrect
  * whenever a partition value carries ':', '%' or a space.
  *
  * The per-row work stays a JVM static call on the codegen path — no
  * UDF closure, no catalyst↔Scala converter pair, no null-wrapping
  * boundary — so the anti-join probe side remains inside
  * WholeStageCodegen.
  */
case class UriPathExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "uri_path"

  override protected def nullSafeEval(input: Any): Any =
    UriPath.decode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UriPath.decode($c)")

  override protected def withNewChildInternal(newChild: Expression): UriPathExpr =
    copy(child = newChild)
}

object UriPath {

  /** Static body shared by interpreted eval and generated code. A
    * `file:`-scheme URI with a plain absolute path (the overwhelmingly
    * common rendering of `_metadata.file_path`) is sliced without the
    * `java.net.URI` parse when it provably contains no escapes or
    * authority — the parse (and its exception path) is reserved for
    * the rare general case.
    */
  def decode(uri: UTF8String): UTF8String = {
    val s = uri.toString
    if (s.startsWith("file:///")) {
      // no authority; path starts at offset 7 ("file://" + "/...")
      val p = s.substring(7)
      if (plainPath(p)) return UTF8String.fromString(p)
    }
    UTF8String.fromString(decode(s))
  }

  /** The canonical String form — the single normalization every
    * delete-vector / manifest path comparison shares
    * ([[graft.catalog.SnapshotTable.uriPath]] delegates here).
    */
  def decode(uri: String): String =
    try {
      val p = new java.net.URI(uri).getPath
      if (p == null || p.isEmpty) uri else p
    } catch { case _: java.net.URISyntaxException => uri }

  /** True when `p` round-trips `new URI(s).getPath` unchanged: no
    * percent-escapes to decode, no query/fragment delimiters, no
    * characters a URI parse would reject or reinterpret.
    */
  private def plainPath(p: String): Boolean = {
    var i = 0
    while (i < p.length) {
      val c = p.charAt(i)
      val ok = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '/' || c == '.' || c == '-' ||
        c == '_' || c == '~' || c == '='
      if (!ok) return false
      i += 1
    }
    true
  }

  /** [[UriPathExpr]] over a column. */
  def uriPath(c: Column): Column =
    ColumnBridge.column(UriPathExpr(ColumnBridge.expression(c)))
}
