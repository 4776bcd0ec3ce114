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
    * non-zero vectors (testdata embeddings are).
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane LSH signature: `bits` sign bits packed into a
    * long. Hyperplane h_i is pseudo-random from the seeded hash of
    * (i, dim index) — deterministic, no stored model. Sign bit i is
    * sgn(Σ_d v_d · r_{i,d}) where r ∈ {−1,+1} derived from xxhash64.
    *
    * At scale this buckets near-parallel vectors together: candidate
    * pairs share a signature prefix/band instead of requiring the O(n²)
    * cross join.
    */
  def lshSignBits(v: Column, bits: Int, seed: Int = 42): Column = {
    val dims = size(v)
    val bitCols: Seq[Column] = (0 until bits).map { i =>
      // fold over dimensions: acc + v[d] * (+1|-1 from hash(seed,i,d))
      val proj = aggregate(
        zip_with(v, sequence(lit(0), dims - 1),
          (x, d) => x.cast("double") *
            when(xxhash64(lit(seed), lit(i), d) % 2 === 0, lit(1.0))
              .otherwise(lit(-1.0))),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bitCols.reduce(_ + _)
  }
}
