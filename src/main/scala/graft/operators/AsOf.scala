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
  * timestamps, then ONE `last(struct, ignoreNulls)` over the unbounded
  * preceding window threads the newest right row's values onto every
  * left row. That is exactly the merge phase of a sort-merge as-of
  * join: no range cross-product, no per-row probe, scales as one
  * shuffle+sort of |L| + |R|.
  *
  * The window carries a PRESENCE struct (non-null for every right row,
  * even when the right row's value columns are all null), so a matched
  * right row whose value is NULL yields NULL — identical to ASOF LEFT
  * JOIN — instead of looking through to an older right row, which is
  * what threading the bare value column with `ignoreNulls` would do.
  *
  * Contract: `right` must be unique per (key, ts) — duplicate right
  * rows at the same instant make "the latest" ambiguous in any as-of
  * engine. Left/right must not share value-column names.
  */
object AsOf {

  def joinAsOf(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val taggedRight = right.select(col(keyCol), col(tsCol),
        struct(valueCols.map(col): _*).as("__vals"))
      .withColumn("__side", lit(0))
    val valsType = taggedRight.schema("__vals").dataType
    val taggedLeft = left.withColumn("__side", lit(1))
      .withColumn("__vals", lit(null).cast(valsType))
    // missing left-only columns on the right side -> typed nulls
    val rightAligned = leftCols.filterNot(c => c == keyCol || c == tsCol)
      .foldLeft(taggedRight) { (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    val unioned = taggedLeft.unionByName(rightAligned)
    // right rows sort BEFORE left rows at equal ts, so `<=` holds
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__vals", last(col("__vals"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        valueCols.map(v => col("__vals").getField(v).as(v))): _*)
  }
}
