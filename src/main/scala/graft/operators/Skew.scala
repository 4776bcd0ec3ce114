package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling join utilities.
  *
  * AQE's skew-join split handles most runtime skew, but it only fires
  * when partition statistics reveal it and the join is sort-merge.
  * Salting is the explicit, planner-independent fallback for hot keys:
  * the fact side gets a deterministic per-row salt in [0, salts), the
  * (smaller) build side is replicated once per salt value, and the join
  * key becomes (key, salt) — a hot key's rows now spread across `salts`
  * reducers instead of one straggler.
  *
  * Correctness: each fact row matches exactly the build-side copies
  * carrying its own salt, so the result multiset is IDENTICAL to the
  * unsalted join (the registry query `q_salted_join` pins this with a
  * plain-SQL oracle). Cost: the build side shuffles `salts`× its size —
  * use only when a key is hot enough to straggle, and keep `salts`
  * small (8–32).
  */
object Skew {

  /** Inner join on a shared key column, salted `salts` ways. The salt
    * is a hash of the whole fact row (deterministic; identical rows
    * share a salt, which is harmless — distribution only needs rows of
    * one KEY to differ).
    */
  def saltedInnerJoin(fact: DataFrame, build: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts >= 1, s"salts=$salts must be >= 1")
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col): _*), lit(salts.toLong)).cast("int"))
    val replicatedBuild = build.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(replicatedBuild, Seq(key, "__salt")).drop("__salt")
  }
}
