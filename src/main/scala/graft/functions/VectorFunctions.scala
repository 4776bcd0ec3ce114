package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns via Spark's
  * higher-order functions (codegen'd; SURVEY §7.3: built-in HOFs first,
  * custom Expression only if the bench demands). All folds are sequential
  * left-folds in element order with double accumulation, which makes
  * results deterministic and exactly reproducible by an engine that
  * folds the same way (the DuckDB oracles mirror this with
  * `list_reduce`).
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ with each element widened to double before multiply. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** ‖a‖₂ */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cos(a,b) = a·b / (‖a‖·‖b‖); NaN-safe only insofar as inputs are
    * non-zero vectors (testdata embeddings are). Delegates to the
    * one-pass codegen'd [[CosineSim]] expression — bit-identical to the
    * fold formulation (same double ops, same order), minus the HOF
    * interpretation overhead.
    */
  def cosine(a: Column, b: Column): Column = CosineSim.cosineSim(a, b)

  /** Random-hyperplane LSH signature: `bits` sign bits packed into a
    * long. Sign bit i is sgn(Σ_d v_d · r_{i,d}) with r ∈ {−1,+1}
    * derived deterministically from (seed, i, d).
    *
    * Delegates to the codegen'd [[LshSign]] expression, which hoists the
    * hyperplane sign matrix into a per-JVM static (VERDICT r1 item 4:
    * the per-row hash formulation made LSH slower than brute force).
    *
    * At scale this buckets near-parallel vectors together: candidate
    * pairs share a signature band instead of requiring the O(n²) cross
    * join.
    */
  def lshSignBits(v: Column, bits: Int, seed: Int = 42): Column =
    LshSign.lshSignBits(v, bits, seed)
}
