package graft.streaming

import org.apache.spark.sql.types.{DataType, StructField, StructType}

import graft.catalog.{Snapshot, SnapshotTable}

/** ONE home for streaming evolved-shape resolution (r17 — the tail and
  * the change feed previously carried near-verbatim copies whose
  * nested-id or default-cast semantics could silently drift apart):
  * given the query's PINNED field-id state and a historical snapshot's
  * shape, build the physical parquet read schema positionally aligned
  * with `required` — each pinned column resolves to its write-time
  * name through the field id (renames follow the id; nested struct
  * fields resolve through nested ids one level down), a column the
  * shape predates lands on a reserved absent name the parquet reader
  * null-fills, and absent columns with a recorded INITIAL DEFAULT
  * return the constant to substitute per row (Iceberg v3 semantics,
  * evaluated once driver-side with `lit(s).cast(dt)` semantics).
  *
  * `Left(reason)` when the pinned state cannot represent the shape —
  * the tail raises its boundary error from it, the change feed falls
  * back to staging.
  */
private[streaming] object EvolvedShapes {

  def resolve(session: org.apache.spark.sql.SparkSession,
      required: StructType, tableSchema: StructType,
      idByName: Map[String, Int], pinnedNested: Seq[(String, Int)],
      vSnap: Snapshot)
      : Either[String, (StructType, Seq[(Int, DataType, Any)])] = {
    val missing = required.fields.find(f => !idByName.contains(f.name))
    if (missing.isDefined)
      return Left(s"pinned column ${missing.get.name} has no field id")
    val tnMap = pinnedNested.toMap
    val wnById = vSnap.ids.map { case (wn, id) => id -> wn }.toMap
    val fileNestedById: Map[Int, (Int, String)] =
      vSnap.nestedIds.flatMap { case (k, nid) =>
        val dot = k.indexOf('.')
        if (dot <= 0) None
        else k.substring(0, dot).toIntOption
          .map(pid => nid -> (pid, k.substring(dot + 1)))
      }.toMap
    val defaults = Seq.newBuilder[(Int, DataType, Any)]
    val phys = StructType(required.fields.zipWithIndex.map {
      case (f, reqOrd) =>
        val i = tableSchema.fieldIndex(f.name)
        val id = idByName(f.name)
        wnById.get(id) match {
          case Some(wn) =>
            // pinned types are kept (legal evolutions are
            // reader-upcastable); nested struct fields resolve through
            // nested ids one level down
            val physType = f.dataType match {
              case st: StructType =>
                StructType(st.fields.zipWithIndex.map { case (nf, j) =>
                  val nname = tnMap.get(s"$id.${nf.name}") match {
                    case Some(nid) => fileNestedById.get(nid) match {
                      case Some((p, fwn)) if p == id => fwn
                      case Some(_) => s"__graft_absent_${i}_$j"
                      case None =>
                        if (vSnap.nestedIds.isEmpty) nf.name
                        else s"__graft_absent_${i}_$j"
                    }
                    case None => nf.name
                  }
                  nf.copy(name = nname, nullable = true)
                })
              case dt => dt
            }
            StructField(wn, physType, nullable = true)
          case None =>
            // a column the shape predates null-fills — unless it
            // recorded an INITIAL DEFAULT, whose constant the reader
            // substitutes per row (Iceberg v3; the batch scan's
            // shapeDefaults, stream edition)
            if (f.metadata.contains(SnapshotTable.InitialDefaultKey)) {
              val value = org.apache.spark.sql.catalyst.expressions.Cast(
                org.apache.spark.sql.catalyst.expressions.Literal(
                  org.apache.spark.unsafe.types.UTF8String.fromString(
                    f.metadata.getString(SnapshotTable.InitialDefaultKey)),
                  org.apache.spark.sql.types.StringType),
                f.dataType,
                Some(SnapshotTable.sessionZone(session)))
                .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
              defaults += ((reqOrd, f.dataType, value))
            }
            StructField(s"__graft_absent_$i", f.dataType, nullable = true)
        }
    })
    Right((phys, defaults.result()))
  }
}
