package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Two-level coarse-quantizer descent as native Catalyst expressions —
  * the large-k replacement for the higher-order-function formulation in
  * [[graft.operators.Ivf.TwoLevelQuantizer]]:
  *
  *  - the centroid model rides in ONE explicit `Broadcast` referenced
  *    from the expression (`ctx.addReferenceObj`), so the PLAN carries
  *    a handle, not O(k·d) literal bytes — at k = 10⁵ × d = 512 the
  *    literal form serializes ~400 MB per stage and its Catalyst
  *    ArrayData conversion sits on the driver; the broadcast ships the
  *    raw primitive arrays once per executor;
  *  - the descent (score g supers → select `nsuper` → score their
  *    children → select `nprobe`) runs as compiled loops over
  *    `Array[Double]` inside WholeStageCodegen via a static call,
  *    where the HOF form interprets per element.
  *
  * Bit-compatibility contract with the HOF form (spec-pinned through
  * the flat-quantizer equality): cosines accumulate in the exact
  * [[CosineSim.compute]] order, super selection ties break toward the
  * smaller super index, candidate selection toward the smaller fine
  * id — the same total order `array_sort` over struct(−sim, id)
  * produced. NaN sims rank last (Spark's double ordering).
  */
object TwoLevelQuantize {

  /** Broadcast payload: `supers(s)` is a super-centroid;
    * `childIds(s)`/`childVecs(s)` its fine clusters (parallel arrays).
    */
  final class Model(
      val supers: Array[Array[Double]],
      val childIds: Array[Array[Int]],
      val childVecs: Array[Array[Array[Double]]]) extends Serializable

  private def cos(v: ArrayData, isDouble: Boolean, c: Array[Double]): Double = {
    val n = c.length
    if (v.numElements() != n)
      throw new IllegalArgumentException(
        s"two-level quantize: dimension mismatch (${v.numElements()} vs $n)")
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (isDouble) v.getDouble(i) else v.getFloat(i).toDouble
      val y = c(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** True when `(sim, id)` ranks strictly better than slot `(s, sid)`
    * under (sim desc, id asc) with NaN-last — the displacement test of
    * the insertion selections below.
    */
  private def beats(sim: Double, id: Int, s: Double, sid: Int): Boolean =
    if (s.isNaN) !sim.isNaN
    else sim > s || (sim == s && id < sid)

  /** Indexes of the `take` best supers by (sim desc, index asc). */
  private def topSupers(v: ArrayData, isDouble: Boolean, m: Model,
      take: Int): Array[Int] = {
    val g = m.supers.length
    val k = math.min(take, g)
    val selIdx = new Array[Int](k)
    val selSim = new Array[Double](k)
    var filled = 0
    var s = 0
    while (s < g) {
      val sim = cos(v, isDouble, m.supers(s))
      // ascending s: on ties the earlier super is NOT displaced
      var pos = filled
      while (pos > 0 && beats(sim, s, selSim(pos - 1), selIdx(pos - 1)))
        pos -= 1
      if (pos < k) {
        val last = math.min(filled, k - 1)
        var j = last
        while (j > pos) { selIdx(j) = selIdx(j - 1); selSim(j) = selSim(j - 1); j -= 1 }
        selIdx(pos) = s
        selSim(pos) = sim
        if (filled < k) filled += 1
      }
      s += 1
    }
    if (filled == k) selIdx else java.util.Arrays.copyOf(selIdx, filled)
  }

  /** The `nprobe` best fine ids among the `nsuper` nearest supers'
    * children, best first.
    */
  def probe(v: ArrayData, isDouble: Boolean, bc: Broadcast[Model],
      nsuper: Int, nprobe: Int): ArrayData = {
    val m = bc.value
    val sups = topSupers(v, isDouble, m, nsuper)
    val k = math.min(nprobe, sups.iterator.map(m.childIds(_).length).sum)
    val selId = new Array[Int](k)
    val selSim = new Array[Double](k)
    var filled = 0
    var si = 0
    while (si < sups.length) {
      val s = sups(si)
      val ids = m.childIds(s)
      val vecs = m.childVecs(s)
      var c = 0
      while (c < ids.length) {
        val sim = cos(v, isDouble, vecs(c))
        val id = ids(c)
        var pos = filled
        while (pos > 0 && beats(sim, id, selSim(pos - 1), selId(pos - 1)))
          pos -= 1
        if (pos < k) {
          val last = math.min(filled, k - 1)
          var j = last
          while (j > pos) { selId(j) = selId(j - 1); selSim(j) = selSim(j - 1); j -= 1 }
          selId(pos) = id
          selSim(pos) = sim
          if (filled < k) filled += 1
        }
        c += 1
      }
      si += 1
    }
    new GenericArrayData(
      if (filled == k) selId else java.util.Arrays.copyOf(selId, filled))
  }

  /** Similarity of the best reachable candidate (the assignment-
    * quality statistic).
    */
  def bestSim(v: ArrayData, isDouble: Boolean, bc: Broadcast[Model],
      nsuper: Int): Double = {
    val m = bc.value
    val sups = topSupers(v, isDouble, m, nsuper)
    var best = Double.NaN
    var bestId = Int.MaxValue
    var si = 0
    while (si < sups.length) {
      val s = sups(si)
      val vecs = m.childVecs(s)
      val ids = m.childIds(s)
      var c = 0
      while (c < vecs.length) {
        val sim = cos(v, isDouble, vecs(c))
        if (best.isNaN && !sim.isNaN) { best = sim; bestId = ids(c) }
        else if (beats(sim, ids(c), best, bestId)) { best = sim; bestId = ids(c) }
        c += 1
      }
      si += 1
    }
    best
  }

  /** Column API: the `nprobe` nearest fine-cluster ids via the
    * broadcast two-level model.
    */
  def probeCol(vec: Column, bc: Broadcast[Model], nsuper: Int,
      nprobe: Int): Column =
    ColumnBridge.column(TwoLevelProbeExpr(
      ColumnBridge.expression(vec), bc, nsuper, nprobe))

  /** Column API: best reachable similarity. */
  def bestSimCol(vec: Column, bc: Broadcast[Model], nsuper: Int): Column =
    ColumnBridge.column(TwoLevelBestSimExpr(
      ColumnBridge.expression(vec), bc, nsuper))
}

case class TwoLevelProbeExpr(child: Expression,
    bc: Broadcast[TwoLevelQuantize.Model], nsuper: Int, nprobe: Int)
    extends UnaryExpression {

  require(nsuper >= 1 && nprobe >= 1, s"nsuper=$nsuper nprobe=$nprobe")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "two_level_probe"

  private lazy val elemIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case ArrayType(FloatType, _)  => false
    case other => throw new IllegalArgumentException(
      s"two_level_probe expects array<float|double>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    TwoLevelQuantize.probe(input.asInstanceOf[ArrayData], elemIsDouble,
      bc, nsuper, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tlModel", bc,
      classOf[Broadcast[TwoLevelQuantize.Model]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TwoLevelQuantize.probe($c, $elemIsDouble, " +
        s"(org.apache.spark.broadcast.Broadcast) $ref, $nsuper, $nprobe)")
  }

  override protected def withNewChildInternal(newChild: Expression): TwoLevelProbeExpr =
    copy(child = newChild)
}

case class TwoLevelBestSimExpr(child: Expression,
    bc: Broadcast[TwoLevelQuantize.Model], nsuper: Int)
    extends UnaryExpression {

  require(nsuper >= 1, s"nsuper=$nsuper")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "two_level_best_sim"

  private lazy val elemIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case ArrayType(FloatType, _)  => false
    case other => throw new IllegalArgumentException(
      s"two_level_best_sim expects array<float|double>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    TwoLevelQuantize.bestSim(input.asInstanceOf[ArrayData], elemIsDouble,
      bc, nsuper)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tlModel", bc,
      classOf[Broadcast[TwoLevelQuantize.Model]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TwoLevelQuantize.bestSim($c, $elemIsDouble, " +
        s"(org.apache.spark.broadcast.Broadcast) $ref, $nsuper)")
  }

  override protected def withNewChildInternal(newChild: Expression): TwoLevelBestSimExpr =
    copy(child = newChild)
}
