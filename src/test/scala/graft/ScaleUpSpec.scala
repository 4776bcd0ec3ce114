package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the embedding replica transforms of [[graft.tools.ScaleUp]]
  * (the sf1 corpus builder): every replica transform must be
  * ORTHOGONAL (intra-replica geometry — planted-mutant margins —
  * survives exactly) and DISTINCT across replicas (no replica may
  * reintroduce the exact-duplicate decoys the r18 rewrite removed).
  * ADVICE r18 found the old sign pattern `(i·odd + r·odd) mod 2`
  * collapsed to `(i + r) mod 2` — two patterns total — so replicas 64
  * apart (same cyclic rotation, same low-bit parity) applied the
  * IDENTICAL transform at factor > 64. The sign now comes from high
  * hash bits; this spec fails on the old formulation.
  */
class ScaleUpSpec extends AnyFunSuite {

  private lazy val spark = TestSparkSession.spark

  test("embedding replicas are orthogonal transforms, distinct for every pair up to factor 66") {
    val factor = 66 // crosses the 64-replica rotation period: r=1 vs r=65
    val emb = graft.tools.ScaleUp
      .scaledTables(spark, "/root/testdata/sf0.001", factor)
      .toMap.apply("embeddings")
    val baseId = 7L
    val reps = emb
      .filter(pmod(col("vec_id"), lit(3000L)) === baseId &&
        col("vec_id") < 3000L * factor)
      .orderBy(col("vec_id"))
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toVector)
    assert(reps.length == factor, s"expected $factor replicas, got ${reps.length}")

    // orthogonality: every replica preserves the norm (float-sum
    // reorder tolerance only)
    def norm(v: Vector[Float]): Double =
      math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
    val n0 = norm(reps.head._2)
    reps.foreach { case (id, v) =>
      assert(math.abs(norm(v) - n0) < 1e-3 * math.max(1.0, n0),
        s"replica $id norm ${norm(v)} != base $n0")
    }

    // distinctness: no two replicas of the same base vector may be
    // equal — replicas 64 apart share the rotation, so this is
    // exactly the sign-pattern degeneracy probe
    val vecs = reps.map(_._2)
    for (a <- vecs.indices; b <- (a + 1) until vecs.length)
      assert(vecs(a) != vecs(b),
        s"replicas ${reps(a)._1} and ${reps(b)._1} are identical — " +
          "sign pattern degenerated (ADVICE r18)")
  }
}
