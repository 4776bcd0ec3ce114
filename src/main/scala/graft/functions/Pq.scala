package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Product quantization (PQ) — the memory-bandwidth half of IVF-PQ
  * ANN (Jégou, Douze, Schmid, "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011; the FAISS IndexIVFPQ design): each
  * vector splits into `m` subvectors, each quantized to one of `ksub`
  * per-subspace centroids, so a d-dim float vector (4d bytes) scores
  * from an m-BYTE code. At 100 TB that is the difference between
  * streaming the full embedding column and streaming a ~64× smaller
  * code column; candidate scoring becomes `m` table lookups
  * (asymmetric distance computation, ADC) instead of a d-element dot
  * product. Exactness comes back in a final re-rank of the short list
  * against the true vectors.
  *
  * Three codegen'd expressions carry the hot path:
  *   - [[Pq.encode]] (build-time): vector → m-byte code;
  *   - [[Pq.lut]] (once per QUERY row): query vector → flattened
  *     m×ksub table of exact squared subdistances to every centroid;
  *   - [[Pq.adc]] (once per CANDIDATE pair): code + LUT → approximate
  *     squared L2, a pure m-lookup sum.
  *
  * All arithmetic is double, element order fixed, ties toward the
  * smaller centroid index — deterministic end to end.
  */
object Pq {

  /** Trained codebook: `flat(s * ksub * dsub + j * dsub + i)` is
    * dimension `i` of centroid `j` in subspace `s`.
    */
  final case class Codebook(m: Int, ksub: Int, dsub: Int,
      flat: IndexedSeq[Double]) {
    require(flat.length == m * ksub * dsub, "codebook shape mismatch")
    require(ksub <= 256, s"ksub=$ksub exceeds one byte per subspace")
    private[graft] def centroid(s: Int, j: Int): Array[Double] =
      Array.tabulate(dsub)(i => flat(s * ksub * dsub + j * dsub + i))
  }

  /** Runtime helper referenced from generated code (one instance per
    * expression, shipped via `addReferenceObj`).
    */
  final class Coder(m: Int, ksub: Int, dsub: Int, flat: Array[Double],
      isDouble: Boolean) extends Serializable {

    private def dim(v: ArrayData, i: Int): Double =
      if (isDouble) v.getDouble(i) else v.getFloat(i).toDouble

    /** Nearest centroid per subspace (ties -> smaller index). */
    def encode(v: ArrayData): Array[Byte] = {
      require(v.numElements() == m * dsub,
        s"pq_encode: expected ${m * dsub} dims, got ${v.numElements()}")
      val code = new Array[Byte](m)
      var s = 0
      while (s < m) {
        var best = 0
        var bestD = Double.MaxValue
        var j = 0
        while (j < ksub) {
          var d = 0.0
          var i = 0
          while (i < dsub) {
            val diff = dim(v, s * dsub + i) - flat(s * ksub * dsub + j * dsub + i)
            d += diff * diff
            i += 1
          }
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        code(s) = best.toByte
        s += 1
      }
      code
    }

    /** Exact squared distance from the query to EVERY centroid, as one
      * flattened m×ksub double array.
      */
    def lut(v: ArrayData): ArrayData = {
      require(v.numElements() == m * dsub,
        s"pq_lut: expected ${m * dsub} dims, got ${v.numElements()}")
      val out = new Array[Double](m * ksub)
      var s = 0
      while (s < m) {
        var j = 0
        while (j < ksub) {
          var d = 0.0
          var i = 0
          while (i < dsub) {
            val diff = dim(v, s * dsub + i) - flat(s * ksub * dsub + j * dsub + i)
            d += diff * diff
            i += 1
          }
          out(s * ksub + j) = d
          j += 1
        }
        s += 1
      }
      ArrayData.toArrayData(out)
    }
  }

  /** ADC: sum the code's m entries out of the LUT. Static — generated
    * code calls it directly.
    */
  def adcCompute(code: Array[Byte], lut: ArrayData, ksub: Int): Double = {
    var d = 0.0
    var s = 0
    while (s < code.length) {
      d += lut.getDouble(s * ksub + (code(s) & 0xff))
      s += 1
    }
    d
  }

  private def elemIsDouble(dt: DataType, what: String): Boolean = dt match {
    case ArrayType(FloatType, _) => false
    case ArrayType(DoubleType, _) => true
    case other => throw new IllegalArgumentException(
      s"$what expects array<float|double>, got $other")
  }

  case class PqEncodeExpr(child: Expression, m: Int, ksub: Int, dsub: Int,
      flat: IndexedSeq[Double]) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "pq_encode"
    @transient private lazy val coder = new Coder(m, ksub, dsub,
      flat.toArray, elemIsDouble(child.dataType, prettyName))

    override protected def nullSafeEval(v: Any): Any =
      coder.encode(v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqCoder", coder, classOf[Coder].getName)
      defineCodeGen(ctx, ev, v => s"$ref.encode($v)")
    }

    override protected def withNewChildInternal(c: Expression): PqEncodeExpr =
      copy(child = c)
  }

  case class PqLutExpr(child: Expression, m: Int, ksub: Int, dsub: Int,
      flat: IndexedSeq[Double]) extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "pq_lut"
    @transient private lazy val coder = new Coder(m, ksub, dsub,
      flat.toArray, elemIsDouble(child.dataType, prettyName))

    override protected def nullSafeEval(v: Any): Any =
      coder.lut(v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pqCoder", coder, classOf[Coder].getName)
      defineCodeGen(ctx, ev, v => s"$ref.lut($v)")
    }

    override protected def withNewChildInternal(c: Expression): PqLutExpr =
      copy(child = c)
  }

  case class PqAdcExpr(left: Expression, right: Expression, ksub: Int)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "pq_adc"

    override protected def nullSafeEval(code: Any, lut: Any): Any =
      adcCompute(code.asInstanceOf[Array[Byte]],
        lut.asInstanceOf[ArrayData], ksub)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (code, lut) =>
        s"graft.functions.Pq.adcCompute($code, $lut, $ksub)")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): PqAdcExpr =
      copy(left = newLeft, right = newRight)
  }

  /** Column API. `code`/`lut` pair with [[adc]]'s `ksub`. */
  def encode(vec: Column, cb: Codebook): Column =
    ColumnBridge.column(PqEncodeExpr(ColumnBridge.expression(vec),
      cb.m, cb.ksub, cb.dsub, cb.flat))

  def lut(vec: Column, cb: Codebook): Column =
    ColumnBridge.column(PqLutExpr(ColumnBridge.expression(vec),
      cb.m, cb.ksub, cb.dsub, cb.flat))

  def adc(code: Column, lutCol: Column, cb: Codebook): Column =
    ColumnBridge.column(PqAdcExpr(ColumnBridge.expression(code),
      ColumnBridge.expression(lutCol), cb.ksub))
}
