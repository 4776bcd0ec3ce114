package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.types.StructType

/** `SessionCatalog.alterTableDataSchema` — the metadata-only schema
  * update Spark's own `ALTER TABLE ADD COLUMNS` command uses — is
  * reachable only through the `private[sql]` session state. This bridge
  * re-exports exactly that one mutation for graft's type-widening
  * schema evolution (Iceberg-style int→long / float→double promotion,
  * which Spark 4's parquet reader supports at read time but v1 `ALTER
  * COLUMN TYPE` refuses to express). No Spark internals are modified.
  */
object CatalogBridge {

  /** Replace the DATA schema (non-partition columns) of a v1
    * session-catalog table; purely a catalog metadata update, no data
    * files touched.
    */
  def alterTableDataSchema(spark: SparkSession, table: String,
      newDataSchema: StructType): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val catalog = classic.sessionState.catalog
    // accept 1/2/3-part names; SessionCatalog identifiers are 2-part,
    // so a leading session-catalog name is dropped
    val parts = classic.sessionState.sqlParser.parseMultipartIdentifier(table)
    val ident = parts match {
      case Seq(t) => TableIdentifier(t)
      case Seq(db, t) => TableIdentifier(t, Some(db))
      case Seq(cat, db, t) if cat == "spark_catalog" =>
        TableIdentifier(t, Some(db), Some(cat))
      case _ => throw new IllegalArgumentException(
        s"not a session-catalog table name: $table")
    }
    catalog.alterTableDataSchema(ident, newDataSchema)
    // v1 reads go through a cached relation; without this the session
    // keeps serving the pre-promotion schema
    catalog.refreshTable(ident)
  }
}
