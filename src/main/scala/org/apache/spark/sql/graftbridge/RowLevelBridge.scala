package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.connector.catalog.Table
import org.apache.spark.sql.connector.write.{RowLevelOperation, RowLevelOperationTable}

/** `RowLevelOperationTable` is `private[sql]` — the analyzer wraps a
  * table in it when rewriting DELETE/UPDATE/MERGE, and an optimizer
  * rule that wants to recognize "this scan relation is the row-level
  * scan of MY operation" needs to look inside. One total function, no
  * behavior.
  */
object RowLevelBridge {

  /** The row-level operation wrapped by `table`, if it is the
    * analyzer's `RowLevelOperationTable` wrapper.
    */
  def operationOf(table: Table): Option[RowLevelOperation] = table match {
    case t: RowLevelOperationTable => Some(t.operation)
    case _ => None
  }
}
