package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity of two `array<float>` embeddings as a native
  * Catalyst expression — one pass accumulating dot product and both
  * norms together.
  *
  * Bit-compatibility contract: the result is IDENTICAL to the
  * higher-order-function formulation
  * `dot(a,b) / (sqrt(dot(a,a)) · sqrt(dot(b,b)))` with sequential
  * left-folds in element order and double accumulation — the same
  * arithmetic the DuckDB oracles mirror with `list_reduce` — because
  * this loop performs the exact same double operations in the exact
  * same order. Only the interpretation overhead is removed (Spark HOFs
  * have no codegen; profiling showed the fold dominating every
  * similarity query).
  */
case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  // lazy: operand types resolve only after analysis
  private lazy val leftIsDouble = left.dataType match {
    case ArrayType(FloatType, _)  => false
    case ArrayType(DoubleType, _) => true
    case other => throw new IllegalArgumentException(
      s"cosine_sim expects array<float|double>, got $other")
  }
  private lazy val rightIsDouble = right.dataType match {
    case ArrayType(FloatType, _)  => false
    case ArrayType(DoubleType, _) => true
    case other => throw new IllegalArgumentException(
      s"cosine_sim expects array<float|double>, got $other")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], leftIsDouble,
      b.asInstanceOf[ArrayData], rightIsDouble)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CosineSim.compute($a, $leftIsDouble, $b, $rightIsDouble)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimExpr =
    copy(left = newLeft, right = newRight)
}

object CosineSim {

  def compute(a: ArrayData, aIsDouble: Boolean,
      b: ArrayData, bIsDouble: Boolean): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"cosine_sim: dimension mismatch ($n vs ${b.numElements()})")
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aIsDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bIsDouble) b.getDouble(i) else b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Column API: `cosineSim(a, b)`. */
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
