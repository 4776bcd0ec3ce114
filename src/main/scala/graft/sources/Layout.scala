package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit, shiftleft}

/** Data-layout control for scan pruning (extension surface; the
  * reference writes unsorted partitions and leaves layout to Athena).
  *
  * Parquet keeps min/max statistics per row group and per file; Spark's
  * scan skips files (and row groups) whose range cannot match a pushed
  * predicate — but only if the writer actually clustered the data.
  * [[writeSorted]] range-partitions rows across `nFiles` output files
  * and sorts within each, so every file covers a near-disjoint range of
  * `sortCols`: a range predicate then reads only the overlapping files
  * instead of the whole dataset. At 100 TB this is the difference
  * between touching 2 files and touching 20 000 — the same layout
  * lever as Iceberg's sort orders / z-ordering for the 1-D case.
  *
  * `repartitionByRange` samples the data to build balanced range
  * bounds (one pass), so files come out evenly sized — no manual
  * splits maintenance.
  */
object Layout {

  /** Write `df` as range-clustered, internally-sorted parquet. */
  def writeSorted(df: DataFrame, path: String, sortCols: Seq[String],
      nFiles: Int): Unit = {
    require(sortCols.nonEmpty && nFiles > 0)
    df.repartitionByRange(nFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** 2-D Morton (Z-order) key over NORMALIZED coordinates: each column
    * is first min-max-scaled to a 16-bit integer, then the two 16-bit
    * ranks interleave into a 32-bit key. The normalization is the part
    * that makes Z-ordering work on real columns: interleaving RAW bits
    * lets whichever column has the wider domain dominate every split
    * (a 14-bit id column vs an 8-bit enum column → all range-partition
    * boundaries land on id bits and the narrow column gets no
    * clustering at all, measured in the r9 `snap_zorder_scan` gate).
    * Equal-width ranks give both dimensions the same number of split
    * levels regardless of their value ranges — the same reason Delta's
    * OPTIMIZE ZORDER interleaves range-partition ids, not values.
    * Linear min-max scaling (not quantile ranks) keeps the key a pure
    * codegen expression; heavy per-column skew degrades balance but
    * never correctness, and the z-range file split that follows is
    * quantile-based anyway (`repartitionByRange` samples the KEY).
    *
    * Sorting by the key clusters rows close in EITHER dimension, so
    * each output file covers a small rectangle of (a, b) space and
    * carries tight min/max stats on BOTH columns, where a plain 1-D
    * sort gives pruning on the leading column only.
    */
  def mortonZNorm(a: org.apache.spark.sql.Column, aMin: Double, aMax: Double,
      b: org.apache.spark.sql.Column, bMin: Double, bMax: Double)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{greatest, least}
    def rank16(x: org.apache.spark.sql.Column, mn: Double, mx: Double) = {
      val span = math.max(mx - mn, java.lang.Double.MIN_NORMAL)
      least(lit(65535L), greatest(lit(0L),
        ((x.cast("double") - lit(mn)) / lit(span) * lit(65535.0))
          .cast("long")))
    }
    mortonZ(rank16(a, aMin, aMax), rank16(b, bMin, bMax))
  }

  /** Raw-bit 2-D Morton interleave (low 32 bits of each input). Use
    * [[mortonZNorm]] unless the two columns already share a bit width —
    * see the normalization note there. Pure built-in bitwise ops (the
    * classic bit-spread), so the whole key computes inside
    * WholeStageCodegen.
    */
  def mortonZ(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def spread(x: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      // 32 -> 64 bit spread: insert a zero between every bit
      val s0 = x.bitwiseAND(lit(0xFFFFFFFFL))
      val s1 = (s0.bitwiseOR(shiftleft(s0, 16))).bitwiseAND(lit(0x0000FFFF0000FFFFL))
      val s2 = (s1.bitwiseOR(shiftleft(s1, 8))).bitwiseAND(lit(0x00FF00FF00FF00FFL))
      val s3 = (s2.bitwiseOR(shiftleft(s2, 4))).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
      val s4 = (s3.bitwiseOR(shiftleft(s3, 2))).bitwiseAND(lit(0x3333333333333333L))
      (s4.bitwiseOR(shiftleft(s4, 1))).bitwiseAND(lit(0x5555555555555555L))
    }
    spread(a.cast("long")).bitwiseOR(shiftleft(spread(b.cast("long")), 1))
  }

  /** N-dimensional Morton key over NORMALIZED coordinates (2 ≤ N ≤ 8)
    * — the general form of [[mortonZNorm]] for real layout tuning,
    * where 3–4 uncorrelated scan dimensions are common. Each column
    * min-max-scales to a b-bit rank with b = min(16, 63/N) (every
    * dimension gets the SAME number of split levels — the property
    * that makes the interleave fair; a 63-bit budget keeps the key a
    * positive long), then rank bits interleave round-robin: bit j of
    * dimension i lands at position j·N + i. N = 2 delegates to the
    * magic-number spread; larger N uses an explicit per-bit
    * shift/mask/or tree — bigger codegen, still pure built-in bitwise
    * ops inside WholeStageCodegen.
    */
  def mortonZNormN(dims: Seq[(org.apache.spark.sql.Column, Double, Double)])
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{greatest, least, shiftright}
    val n = dims.size
    require(n >= 2 && n <= 8, s"z-order takes 2..8 columns, got $n")
    if (n == 2)
      return mortonZNorm(dims(0)._1, dims(0)._2, dims(0)._3,
        dims(1)._1, dims(1)._2, dims(1)._3)
    val bits = math.min(16, 63 / n)
    val maxRank = (1L << bits) - 1
    def rank(x: org.apache.spark.sql.Column, mn: Double, mx: Double) = {
      val span = math.max(mx - mn, java.lang.Double.MIN_NORMAL)
      least(lit(maxRank), greatest(lit(0L),
        ((x.cast("double") - lit(mn)) / lit(span) * lit(maxRank.toDouble))
          .cast("long")))
    }
    val terms = for {
      (d, i) <- dims.zipWithIndex
      r = rank(d._1, d._2, d._3)
      j <- 0 until bits
    } yield shiftleft(shiftright(r, j).bitwiseAND(lit(1L)), j * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Per-column (min, max) normalization bounds for [[mortonZNormN]]
    * when no metadata source already has them — ONE 2·N-scalar
    * aggregate.
    */
  def boundsOfN(df: DataFrame, cols: Seq[String]): Seq[(Double, Double)] = {
    import org.apache.spark.sql.functions.{max, min}
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.map { i =>
      (if (r.isNullAt(2 * i)) 0.0 else r.getDouble(2 * i),
        if (r.isNullAt(2 * i + 1)) 0.0 else r.getDouble(2 * i + 1))
    }
  }

  /** Write `df` Z-order-clustered on two columns: range-partition and
    * sort by the Morton key, then drop it — the 2-D analog of
    * [[writeSorted]] (Iceberg/Delta's Z-ORDER for the two-column case).
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String,
      colB: String, nFiles: Int): Unit = {
    require(nFiles > 0)
    val b = boundsOf(df, colA, colB)
    df.withColumn("__z",
        mortonZNorm(col(colA), b(0), b(1), col(colB), b(2), b(3)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** (aMin, aMax, bMin, bMax) of two numeric columns — the
    * normalization bounds for [[mortonZNorm]] when no metadata source
    * (manifest stats) already has them. One small 4-scalar aggregate.
    */
  def boundsOf(df: DataFrame, colA: String, colB: String): Array[Double] = {
    import org.apache.spark.sql.functions.{max, min}
    val r = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double"))
      .head()
    Array.tabulate(4)(i => if (r.isNullAt(i)) 0.0 else r.getDouble(i))
  }
}
