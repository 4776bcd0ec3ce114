package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash + LSH band hashes of a shingle set as a native
  * Catalyst expression: `array<string>` in, `bands` 64-bit bucket keys
  * out.
  *
  * Round-2 performance fix: the HOF formulation
  * (`transform(sequence(0,k-1), i -> array_min(transform(shingles,
  * s -> xxhash64(concat(s,'#',i)))))`) re-hashed every shingle STRING k
  * times and allocated k intermediate arrays per row — and, inlined into
  * the 16 band structs, could be evaluated once per band. Here each
  * shingle is byte-hashed ONCE (FNV-1a) and the k permutations are
  * derived arithmetically (splitmix64 of `h ⊕ seedᵢ` — the standard
  * universal-hashing approximation of k independent permutations;
  * min-collision probability equals the Jaccard similarity). Band keys
  * are a splitmix64 fold of each signature row-group, so the full
  * signature never materializes in the plan.
  *
  * Everything is a static call inside WholeStageCodegen; the k seed
  * longs are cached per JVM — deterministic on every executor with no
  * broadcast (same design as [[LshSign]]).
  */
case class MinHashBandsExpr(child: Expression, k: Int, bands: Int, seed: Int)
    extends UnaryExpression {

  require(k % bands == 0, s"bands=$bands must divide k=$k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override protected def nullSafeEval(input: Any): Any =
    MinHash.computeBands(input.asInstanceOf[ArrayData], k, bands, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHash.computeBands($c, $k, $bands, $seed)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBandsExpr =
    copy(child = newChild)
}

object MinHash {

  private val seedCache = new ConcurrentHashMap[(Int, Int), Array[Long]]()

  private def splitmix64(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def seedsFor(k: Int, seed: Int): Array[Long] =
    seedCache.computeIfAbsent((k, seed), { key =>
      val (kk, s) = key
      Array.tabulate(kk)(i => splitmix64((s.toLong << 32) ^ (i + 1).toLong))
    })

  /** FNV-1a 64-bit over UTF-8 bytes. */
  private def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xff)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** `bands` bucket keys for the k-permutation MinHash signature of the
    * shingle array (rows-per-band = k / bands).
    */
  def computeBands(shingles: ArrayData, k: Int, bands: Int, seed: Int): ArrayData = {
    val seeds = seedsFor(k, seed)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = shingles.numElements()
    var s = 0
    while (s < n) {
      val h0 = fnv1a64(shingles.getUTF8String(s).getBytes)
      var i = 0
      while (i < k) {
        val v = splitmix64(h0 ^ seeds(i))
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      s += 1
    }
    val r = k / bands
    val out = new Array[Long](bands)
    var j = 0
    while (j < bands) {
      var acc = 0x9e3779b97f4a7c15L ^ j.toLong
      var i = j * r
      val end = i + r
      while (i < end) { acc = splitmix64(acc ^ mins(i)); i += 1 }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: `minhashBands(shingles, k, bands)` — element j is the
    * bucket key of band j.
    */
  def minhashBands(c: Column, k: Int, bands: Int, seed: Int = 42): Column =
    ColumnBridge.column(
      MinHashBandsExpr(ColumnBridge.expression(c), k, bands, seed))

  /** Hash-collision helper for tests: UTF-8 FNV of a string. */
  def shingleHash(s: String): Long = fnv1a64(UTF8String.fromString(s).getBytes)
}
