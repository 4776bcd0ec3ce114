package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.DataSourceStrategy
import org.apache.spark.sql.sources.Filter

/** Re-export of `DataSourceStrategy.translateFilter` — the exact
  * Catalyst→`sources.Filter` translation Spark's own file sources use
  * for parquet pushdown, reachable only inside `org.apache.spark.sql`.
  * Graft's snapshot tables reuse it so manifest-level file skipping
  * ([[graft.catalog.StatsPruner]]) prunes on the SAME predicate forms
  * parquet row-group pruning understands. No Spark internals are
  * modified.
  */
object FilterBridge {

  /** Translate a resolved, constant-folded predicate; None when the
    * expression has no source-filter form (caller simply doesn't prune
    * on it).
    */
  def translate(e: Expression): Option[Filter] =
    DataSourceStrategy.translateFilter(e, supportNestedPredicatePushdown = true)
}
