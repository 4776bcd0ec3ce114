package graft.catalog

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Columnar view of a snapshot's per-file manifest stats (VERDICT r16
  * #4): the prune walk over boxed `Map[String, ColStats]` entries is
  * cache-hostile and re-parses every bound with `BigDecimal` on every
  * prune — at 10⁶ files the last 10× of the manifest probe cost ≈32×.
  * This index stores, per (snapshot, column), primitive arrays (longs
  * or doubles for the bounds, one flag byte per file) built in ONE
  * pass and reused by every subsequent prune of the same snapshot, so
  * the walk is a branch-light loop over flat arrays.
  *
  * Exactness contract: a conjunct is evaluated here ONLY when the
  * primitive evaluation provably equals [[StatsPruner.mayMatch]] for
  * it on every file — integral/double/float/timestamp columns with a
  * matching-typed filter value, bounds parsed with the same
  * conservative rules (absent or unparseable ⇒ that side passes,
  * all-null file ⇒ no comparison matches). Equality conjuncts stay
  * exact only when NO file records a Bloom filter for the column
  * (otherwise the bounds mask still applies but the conjunct ALSO
  * rides the residual, where the generic pruner replays the Bloom
  * probe). Everything else — strings, dates, decimals, Or/In/
  * StartsWith, mixed value types — returns to the generic walk via the
  * residual, applied only to fast-pass survivors. The one deliberate
  * divergence is conservative: a bound string outside the primitive
  * range (impossible for bounds written from real column values) keeps
  * the file here where BigDecimal could still compare — skip-only
  * semantics make keeping extra always sound.
  */
final class StatsIndex(snapshot: Snapshot) {

  import StatsIndex._

  private val files: IndexedSeq[DataFileEntry] = snapshot.files.toIndexedSeq

  /** current field id per current name (None for legacy schemas). */
  private val idByName: Map[String, Int] = snapshot.ids.toMap

  /** Per-column primitive arrays, LRU-ordered under a driver MEMORY
    * BUDGET (VERDICT r17 #4): each numeric column costs ~17 B/file
    * (one flag byte + two 8-byte bounds), so at 10⁷ files an
    * unbounded map could pin ~170 MB PER PRUNED COLUMN on the driver.
    * `graft.stats.index.budget-bytes` (table property, default 1 GiB)
    * caps the total; exceeding it evicts the least-recently-pruned
    * columns (never the one just built). Eviction is a cache miss, not
    * a correctness event — the column rebuilds on its next prune.
    */
  private val budgetBytes: Long = snapshot.properties
    .get(StatsIndex.BudgetProp).flatMap(v =>
      scala.util.Try(v.toLong).toOption).getOrElse(1L << 30)

  private val cols =
    new java.util.LinkedHashMap[String, AnyRef](16, 0.75f,
      /*accessOrder=*/ true)

  /** Bytes currently pinned by built columns (spec hook — the budget
    * contract is `residentBytes ≤ budget` after any prune sequence).
    */
  private[graft] def residentBytes: Long = cols.synchronized {
    var t = 0L
    val it = cols.values().iterator()
    while (it.hasNext) t += bytesOf(it.next())
    t
  }

  private def bytesOf(v: AnyRef): Long = v match {
    case c: NumCol =>
      val bounds =
        if (c.minL != null) (c.minL.length + c.maxL.length) * 8L else 0L
      val boundsD =
        if (c.minD != null) (c.minD.length + c.maxD.length) * 8L else 0L
      c.flags.length.toLong + bounds + boundsD
    case _ => 0L
  }

  private def kindOf(dt: DataType): Int = dt match {
    case ByteType | ShortType | IntegerType | LongType => KindLong
    case DoubleType => KindDouble
    case FloatType => KindFloat
    case TimestampType => KindMicros
    case _ => KindNone
  }

  /** The column's primitive arrays, built once; [[NotEligible]] when
    * the type is outside the fast set.
    */
  private def colArrays(name: String, dt: DataType): AnyRef = {
    cols.synchronized {
      val cached = cols.get(name)
      if (cached != null) return cached
    }
    val built = build(name, dt) // outside the lock: can be a large pass
    cols.synchronized {
      val raced = cols.get(name)
      if (raced != null) return raced
      cols.put(name, built)
      // enforce the budget LRU-first, sparing the entry just built
      var total = 0L
      val it0 = cols.values().iterator()
      while (it0.hasNext) total += bytesOf(it0.next())
      if (total > budgetBytes) {
        val it = cols.entrySet().iterator()
        while (total > budgetBytes && it.hasNext) {
          val e = it.next()
          if (e.getKey != name) {
            total -= bytesOf(e.getValue)
            it.remove()
          }
        }
      }
      built
    }
  }

  private def build(name: String, dt: DataType): AnyRef = {
    val kind = kindOf(dt)
    if (kind == KindNone) return NotEligible
    val n = files.length
    val flags = new Array[Byte](n)
    val minL = if (kind == KindDouble || kind == KindFloat) null
      else new Array[Long](n)
    val maxL = if (kind == KindDouble || kind == KindFloat) null
      else new Array[Long](n)
    val minD = if (minL == null) new Array[Double](n) else null
    val maxD = if (minL == null) new Array[Double](n) else null
    val anyBloom = new java.util.concurrent.atomic.AtomicBoolean(false)
    val id = idByName.get(name)
    // per-file work is independent (disjoint array slots); at manifest
    // scale (10⁵-10⁶ entries) the parse-and-flag pass fans out over
    // driver cores — the same discipline as the shard loads
    val body: java.util.function.IntConsumer = { (i: Int) =>
      val f = files(i)
      // the same name translation [[SnapshotTable.effectiveStats]]
      // applies per prune: stats key on WRITE-TIME names; files with
      // recorded cols resolve the current name through the field id,
      // legacy entries match by name directly
      val st: ColStats =
        if (f.cols.isEmpty) f.stats.getOrElse(name, null)
        else id match {
          case Some(fid) =>
            var j = 0
            var wn: String = null
            val fc = f.cols
            while (wn == null && j < fc.length) {
              if (fc(j)._2 == fid) wn = fc(j)._1
              j += 1
            }
            if (wn == null) null else f.stats.getOrElse(wn, null)
          case None => null
        }
      if (st != null) {
        var fl = HasStats
        if (st.nullCount == f.rows) fl |= AllNull
        if (st.nullCount > 0) fl |= SomeNull
        if (st.bloom.isDefined) anyBloom.set(true)
        st.min match {
          case Some(b) => kind match {
            case KindLong | KindMicros =>
              try { minL(i) = java.lang.Long.parseLong(b); fl |= MinOk }
              catch { case _: NumberFormatException => () }
            case KindDouble =>
              parseFinite(b).foreach { v => minD(i) = v; fl |= MinOk }
            case KindFloat =>
              parseFiniteFloat(b).foreach { v => minD(i) = v; fl |= MinOk }
          }
          case None => ()
        }
        st.max match {
          case Some(b) => kind match {
            case KindLong | KindMicros =>
              try { maxL(i) = java.lang.Long.parseLong(b); fl |= MaxOk }
              catch { case _: NumberFormatException => () }
            case KindDouble =>
              parseFinite(b).foreach { v => maxD(i) = v; fl |= MaxOk }
            case KindFloat =>
              parseFiniteFloat(b).foreach { v => maxD(i) = v; fl |= MaxOk }
          }
          case None => ()
        }
        flags(i) = fl.toByte
      }
    }
    if (n > (1 << 15))
      java.util.stream.IntStream.range(0, n).parallel().forEach(body)
    else java.util.stream.IntStream.range(0, n).forEach(body)
    NumCol(kind, flags, minL, maxL, minD, maxD, anyBloom.get())
  }

  /** Evaluate the fast-eligible conjuncts of `filters` into a keep
    * mask. Returns the mask (null when NO conjunct was eligible — the
    * caller walks everything generically) and the residual conjuncts
    * the generic pruner must still apply to fast-pass survivors.
    */
  def evaluate(schema: StructType,
      filters: Seq[Filter]): (Array[Boolean], Seq[Filter]) = {
    var mask: Array[Boolean] = null
    def m(): Array[Boolean] = {
      if (mask == null) mask = Array.fill(files.length)(true)
      mask
    }
    val residual = Seq.newBuilder[Filter]
    filters.foreach { flt =>
      val handled = flt match {
        case GreaterThan(a, v) => cmp(schema, a, v, OpGt, m)
        case GreaterThanOrEqual(a, v) => cmp(schema, a, v, OpGe, m)
        case LessThan(a, v) => cmp(schema, a, v, OpLt, m)
        case LessThanOrEqual(a, v) => cmp(schema, a, v, OpLe, m)
        case EqualTo(a, v) => eq(schema, a, v, m)
        case IsNull(a) => nullness(schema, a, wantNull = true, m)
        case IsNotNull(a) => nullness(schema, a, wantNull = false, m)
        case _ => Exactness.No
      }
      // a conjunct the fast path could not evaluate exactly rides the
      // residual; Partial = mask applied but generic must re-check
      // (the bloom-bearing equality case)
      if (handled != Exactness.Exact) residual += flt
    }
    (mask, residual.result())
  }

  /** The MUST-match dual ([[StatsPruner.mustMatch]]): a mask where
    * true means every fast-eligible conjunct is PROVEN true for all
    * live rows of the file; residual conjuncts still need the generic
    * proof. Same exactness discipline as [[evaluate]] — a conjunct is
    * settled here only when the primitive proof equals the generic one
    * (numeric kinds, matching value type; value proofs require the
    * no-nulls flag exactly as `provablyNoNulls` does; a missing or
    * unparseable bound proves nothing). The caller must still refuse
    * when `filters` is empty (mustMatchAll's contract).
    */
  def evaluateMust(schema: StructType,
      filters: Seq[Filter]): (Array[Boolean], Seq[Filter]) = {
    var mask: Array[Boolean] = null
    def m(): Array[Boolean] = {
      if (mask == null) mask = Array.fill(files.length)(true)
      mask
    }
    val residual = Seq.newBuilder[Filter]
    filters.foreach { flt =>
      val handled = flt match {
        case GreaterThan(a, v) => mustCmp(schema, a, v, OpGt, m)
        case GreaterThanOrEqual(a, v) => mustCmp(schema, a, v, OpGe, m)
        case LessThan(a, v) => mustCmp(schema, a, v, OpLt, m)
        case LessThanOrEqual(a, v) => mustCmp(schema, a, v, OpLe, m)
        case EqualTo(a, v) if v != null => mustCmp(schema, a, v, OpEq, m)
        case IsNull(a) => mustNullness(schema, a, wantNull = true, m)
        case IsNotNull(a) => mustNullness(schema, a, wantNull = false, m)
        case _ => Exactness.No
      }
      if (handled != Exactness.Exact) residual += flt
    }
    (mask, residual.result())
  }

  private def mustCmp(schema: StructType, a: String, v: Any, op: Int,
      m: () => Array[Boolean]): Exactness.Value = {
    val dt = fieldType(schema, a)
    if (dt == null) return Exactness.No
    colArrays(a, dt) match {
      case c: NumCol =>
        val isLong = c.kind == KindLong || c.kind == KindMicros
        val vl = if (isLong) longValue(c.kind, v) else None
        val vd = if (isLong) None else doubleValue(c.kind, v)
        if (vl.isEmpty && vd.isEmpty) return Exactness.No
        val mask = m()
        val n = files.length
        var i = 0
        if (isLong) {
          val x = vl.get
          while (i < n) {
            if (mask(i)) mask(i) = mustCmpLong(c, i, x, op)
            i += 1
          }
        } else {
          val x = vd.get
          while (i < n) {
            if (mask(i)) mask(i) = mustCmpDouble(c, i, x, op)
            i += 1
          }
        }
        Exactness.Exact
      case _ => Exactness.No
    }
  }

  // proof per file, replicating StatsPruner.mustCompare/mustEqual: a
  // value proof needs provably-no-nulls (a NULL makes the predicate
  // NULL, which DELETE must keep) plus the DECISIVE bound — GT proves
  // off min > v, GE min >= v, LT max < v, LE max <= v, EQ needs
  // min == v == max. No stats / missing bound / unparsed bound ⇒ no
  // proof (false), exactly the generic getOrElse(false).
  private def mustCmpLong(c: NumCol, i: Int, v: Long, op: Int): Boolean = {
    val fl = c.flags(i)
    if ((fl & HasStats) == 0 || (fl & SomeNull) != 0) return false
    op match {
      case OpGt => (fl & MinOk) != 0 && c.minL(i) > v
      case OpGe => (fl & MinOk) != 0 && c.minL(i) >= v
      case OpLt => (fl & MaxOk) != 0 && c.maxL(i) < v
      case OpLe => (fl & MaxOk) != 0 && c.maxL(i) <= v
      case _ => (fl & MinOk) != 0 && (fl & MaxOk) != 0 &&
        c.minL(i) == v && c.maxL(i) == v
    }
  }

  private def mustCmpDouble(c: NumCol, i: Int, v: Double, op: Int): Boolean = {
    val fl = c.flags(i)
    if ((fl & HasStats) == 0 || (fl & SomeNull) != 0) return false
    op match {
      case OpGt => (fl & MinOk) != 0 && c.minD(i) > v
      case OpGe => (fl & MinOk) != 0 && c.minD(i) >= v
      case OpLt => (fl & MaxOk) != 0 && c.maxD(i) < v
      case OpLe => (fl & MaxOk) != 0 && c.maxD(i) <= v
      case _ => (fl & MinOk) != 0 && (fl & MaxOk) != 0 &&
        c.minD(i) == v && c.maxD(i) == v
    }
  }

  private def mustNullness(schema: StructType, a: String,
      wantNull: Boolean, m: () => Array[Boolean]): Exactness.Value = {
    val dt = fieldType(schema, a)
    if (dt == null) return Exactness.No
    colArrays(a, dt) match {
      case c: NumCol =>
        val mask = m()
        val n = files.length
        var i = 0
        while (i < n) {
          if (mask(i)) {
            val fl = c.flags(i)
            mask(i) =
              if ((fl & HasStats) == 0) false // no stats: no proof
              else if (wantNull) (fl & AllNull) != 0
              else (fl & SomeNull) == 0
          }
          i += 1
        }
        Exactness.Exact
      case _ => Exactness.No
    }
  }

  private def fieldType(schema: StructType, a: String): DataType =
    schema.fields.find(_.name == a).map(_.dataType).orNull

  /** Filter value → primitive, None when the runtime type does not
    * match the column kind exactly (those go generic: BigDecimal
    * cross-type compares are not provably identical to primitive
    * ones).
    */
  private def longValue(kind: Int, v: Any): Option[Long] =
    if (kind == KindLong) v match {
      case x: java.lang.Byte => Some(x.longValue())
      case x: java.lang.Short => Some(x.longValue())
      case x: java.lang.Integer => Some(x.longValue())
      case x: java.lang.Long => Some(x.longValue())
      case _ => None
    } else v match { // KindMicros — same conversion as StatsPruner
      case t: java.sql.Timestamp =>
        micros(t.toInstant)
      case i: java.time.Instant => micros(i)
      case _ => None
    }

  private def micros(i: java.time.Instant): Option[Long] =
    try Some(Math.addExact(
      Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L))
    catch { case _: ArithmeticException => None }

  private def doubleValue(kind: Int, v: Any): Option[Double] = kind match {
    case KindDouble => v match {
      case x: java.lang.Double if !x.isNaN && !x.isInfinite =>
        Some(x.doubleValue())
      case _ => None
    }
    case KindFloat => v match {
      case x: java.lang.Float if !x.isNaN && !x.isInfinite =>
        Some(x.doubleValue()) // float→double embedding is exact
      case _ => None
    }
    case _ => None
  }

  private def cmp(schema: StructType, a: String, v: Any, op: Int,
      m: () => Array[Boolean]): Exactness.Value = {
    val dt = fieldType(schema, a)
    if (dt == null) return Exactness.No
    colArrays(a, dt) match {
      case c: NumCol =>
        val isLong = c.kind == KindLong || c.kind == KindMicros
        val vl = if (isLong) longValue(c.kind, v) else None
        val vd = if (isLong) None else doubleValue(c.kind, v)
        if (vl.isEmpty && vd.isEmpty) return Exactness.No
        val mask = m()
        val n = files.length
        var i = 0
        if (isLong) {
          val x = vl.get
          while (i < n) {
            if (mask(i)) mask(i) = keepCmpLong(c, i, x, op)
            i += 1
          }
        } else {
          val x = vd.get
          while (i < n) {
            if (mask(i)) mask(i) = keepCmpDouble(c, i, x, op)
            i += 1
          }
        }
        Exactness.Exact
      case _ => Exactness.No
    }
  }

  // keep-decision per file, replicating StatsPruner.mayCompare: no
  // stats ⇒ keep; all-null ⇒ prune; a missing/unparsed bound passes
  // its side. loOk/hiOk per op: GT needs max > v, GE max >= v,
  // LT min < v, LE min <= v (the other side is always true).
  private def keepCmpLong(c: NumCol, i: Int, v: Long, op: Int): Boolean = {
    val fl = c.flags(i)
    if ((fl & HasStats) == 0) return true
    if ((fl & AllNull) != 0) return false
    op match {
      case OpGt => (fl & MaxOk) == 0 || c.maxL(i) > v
      case OpGe => (fl & MaxOk) == 0 || c.maxL(i) >= v
      case OpLt => (fl & MinOk) == 0 || c.minL(i) < v
      case OpLe => (fl & MinOk) == 0 || c.minL(i) <= v
      case _ => // OpEq: min <= v <= max, each side passing when unknown
        ((fl & MinOk) == 0 || c.minL(i) <= v) &&
        ((fl & MaxOk) == 0 || c.maxL(i) >= v)
    }
  }

  private def keepCmpDouble(c: NumCol, i: Int, v: Double, op: Int): Boolean = {
    val fl = c.flags(i)
    if ((fl & HasStats) == 0) return true
    if ((fl & AllNull) != 0) return false
    op match {
      case OpGt => (fl & MaxOk) == 0 || c.maxD(i) > v
      case OpGe => (fl & MaxOk) == 0 || c.maxD(i) >= v
      case OpLt => (fl & MinOk) == 0 || c.minD(i) < v
      case OpLe => (fl & MinOk) == 0 || c.minD(i) <= v
      case _ =>
        ((fl & MinOk) == 0 || c.minD(i) <= v) &&
        ((fl & MaxOk) == 0 || c.maxD(i) >= v)
    }
  }

  private def eq(schema: StructType, a: String, v: Any,
      m: () => Array[Boolean]): Exactness.Value = {
    if (v == null) return Exactness.No
    val dt = fieldType(schema, a)
    if (dt == null) return Exactness.No
    colArrays(a, dt) match {
      case c: NumCol =>
        val r = cmp(schema, a, v, OpEq, m)
        if (r != Exactness.Exact) r
        // with any Bloom recorded the generic walk must replay the
        // probe on survivors — bounds alone under-prune, never over
        else if (c.anyBloom) Exactness.Partial
        else Exactness.Exact
      case _ => Exactness.No
    }
  }

  private def nullness(schema: StructType, a: String, wantNull: Boolean,
      m: () => Array[Boolean]): Exactness.Value = {
    val dt = fieldType(schema, a)
    if (dt == null) return Exactness.No
    colArrays(a, dt) match {
      case c: NumCol =>
        val mask = m()
        val n = files.length
        var i = 0
        while (i < n) {
          if (mask(i)) {
            val fl = c.flags(i)
            mask(i) =
              if ((fl & HasStats) == 0) true
              else if (wantNull) (fl & SomeNull) != 0
              else (fl & AllNull) == 0
          }
          i += 1
        }
        Exactness.Exact
      case _ => Exactness.No
    }
  }
}

object StatsIndex {

  /** Table property capping the driver bytes one snapshot's columnar
    * stats index may pin (default 1 GiB); least-recently-pruned
    * columns evict first. ~17 B/file/column, so the default holds ~6
    * pruned columns of a 10⁷-file table.
    */
  val BudgetProp = "graft.stats.index.budget-bytes"

  private[catalog] object Exactness extends Enumeration {
    val Exact, Partial, No = Value
  }

  private val KindNone = 0
  private val KindLong = 1
  private val KindDouble = 2
  private val KindFloat = 3
  private val KindMicros = 4

  private val OpGt = 0
  private val OpGe = 1
  private val OpLt = 2
  private val OpLe = 3
  private val OpEq = 4

  private val HasStats = 1
  private val AllNull = 2
  private val SomeNull = 4
  private val MinOk = 8
  private val MaxOk = 16

  private case object NotEligible

  /** One column's primitive stats: flag byte per file plus the parsed
    * bounds in the kind's array family (long kinds use minL/maxL,
    * double kinds minD/maxD; the unused family is null).
    */
  private final case class NumCol(kind: Int, flags: Array[Byte],
      minL: Array[Long], maxL: Array[Long],
      minD: Array[Double], maxD: Array[Double], anyBloom: Boolean)

  private def parseFinite(b: String): Option[Double] =
    try {
      val d = java.lang.Double.parseDouble(b)
      if (d.isNaN || d.isInfinite) None else Some(d)
    } catch { case _: NumberFormatException => None }

  private def parseFiniteFloat(b: String): Option[Double] =
    try {
      val f = java.lang.Float.parseFloat(b)
      if (f.isNaN || f.isInfinite) None else Some(f.toDouble)
    } catch { case _: NumberFormatException => None }
}
