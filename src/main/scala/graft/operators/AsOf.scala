package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark has no native form
  * of, composed Spark-first instead of via a custom physical plan:
  *
  * each left row picks up the value columns of the LATEST right row
  * with the same key and `right.ts <= left.ts` (ties included), or
  * nulls when no right row precedes it — the semantics of DuckDB's
  * `ASOF LEFT JOIN`, which the registry oracle uses verbatim.
  *
  * Plan shape: tag and union both inputs, one shuffle by key, one
  * in-partition sort by (ts, side) with right rows first at equal
  * timestamps, then `last(value, ignoreNulls)` over the unbounded
  * preceding window threads the newest right value onto every left
  * row. That is exactly the merge phase of a sort-merge as-of join:
  * no range cross-product, no per-row probe, scales as one
  * shuffle+sort of |L| + |R|.
  *
  * Contract: `right` must be unique per (key, ts) — duplicate right
  * rows at the same instant make "the latest" ambiguous in any as-of
  * engine. Left/right must not share value-column names.
  */
object AsOf {

  def joinAsOf(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val taggedLeft = valueCols.foldLeft(left.withColumn("__side", lit(1))) {
      (df, v) => df.withColumn(v, lit(null).cast(
        right.schema(v).dataType))
    }
    val taggedRight = right.select(
      (Seq(col(keyCol), col(tsCol)) ++ valueCols.map(col)): _*)
      .withColumn("__side", lit(0))
    // missing left-only columns on the right side -> typed nulls
    val rightAligned = leftCols.filterNot(
      c => c == keyCol || c == tsCol || valueCols.contains(c))
      .foldLeft(taggedRight) { (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    val unioned = taggedLeft.unionByName(rightAligned)
    // right rows sort BEFORE left rows at equal ts, so `<=` holds
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val threaded = valueCols.foldLeft(unioned) { (df, v) =>
      df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
    threaded.filter(col("__side") === 1)
      .select((leftCols ++ valueCols).map(col): _*)
  }
}
