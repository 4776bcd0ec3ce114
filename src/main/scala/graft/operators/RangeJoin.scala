package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join — the second classic operator Spark
  * has no efficient native form of (a plain inequality join plans as a
  * broadcast-nested-loop or cartesian product).
  *
  * Scale shape: time is cut into fixed `bucketUs` buckets; every
  * interval is exploded onto each bucket it overlaps, points carry
  * their single bucket, and the join becomes an EQUI-join on
  * (key, bucket) followed by the exact `start <= t < end` filter. With
  * `bucketUs` chosen near the typical interval length, each interval
  * lands on O(1) buckets, so the join cost is O(|P| + |I|) shuffled by
  * (key, bucket) — no quadratic blowup, and a point meets a matching
  * interval in exactly one bucket (its own), so no dedup pass is
  * needed.
  *
  * Timestamps are compared at microsecond precision (`unix_micros`),
  * matching the parquet events precision. Point/interval columns may be
  * TIMESTAMP or TIMESTAMP_NTZ (the testdata has shipped as both): the
  * bucket key casts to TIMESTAMP first — `unix_micros` rejects NTZ —
  * which under the library's UTC sessions is value-preserving, and the
  * exact containment filter compares the ORIGINAL columns, so the cast
  * only ever routes candidate pairs, never decides membership.
  */
object RangeJoin {

  private def micros(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Inner-join `points` to every interval containing them
    * (half-open: start <= t < end), sharing `keyCol`.
    *
    * Empty or inverted intervals (end <= start) are dropped BEFORE the
    * bucket explode: they can match nothing under half-open semantics,
    * and `sequence` counts DOWN when its bounds invert, so one bad
    * upstream row (e.g. swapped columns) would otherwise explode onto
    * every bucket between end and start.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keyCol: String, ptCol: String, startCol: String, endCol: String,
      bucketUs: Long): DataFrame = {
    require(bucketUs >= 1, s"bucketUs=$bucketUs must be >= 1")
    val p = points
      .withColumn("__bucket", floor(micros(col(ptCol)) / bucketUs))
    val i = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bucket", explode(sequence(
        floor(micros(col(startCol)) / bucketUs),
        // half-open end: the bucket of the last contained microsecond
        floor((micros(col(endCol)) - 1) / bucketUs))))
    p.join(i, Seq(keyCol, "__bucket"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__bucket")
  }
}
