package graft.catalog

import java.util.{Iterator => JIterator}

import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native DSv2 stored procedures for the graft catalog — the Iceberg
  * maintenance surface (`CALL graft.system.expire_snapshots(...)`)
  * through Spark 4's own `ProcedureCatalog` seam, so `CALL` parses,
  * binds, coerces and executes entirely inside Spark: no parser
  * interception, named/positional args and defaults handled by the
  * analyzer, results returned as ordinary rows.
  *
  * {{{
  *   CALL graft.system.compact(table => 'db.events', sort_by => 'v')
  *   CALL graft.system.expire_snapshots(table => 'db.events', keep => 3)
  *   CALL graft.system.rollback(table => 'db.events', version => 2)
  *   CALL graft.system.tag(table => 'db.events', name => 'corpus_v1')
  * }}}
  *
  * `table` addresses a catalog table (`'db.events'`) or an absolute
  * path (`'/warehouse/events'`) — the same duality Iceberg procedures
  * give. Each procedure returns one row describing what it did, so a
  * SQL console shows the outcome instead of silence.
  */
object GraftCatalogProcedures {

  private val S = StringType
  private val L = LongType

  private def in(n: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(n, dt).build()
  private def opt(n: String, dt: DataType,
      dflt: String): ProcedureParameter =
    ProcedureParameter.in(n, dt).defaultValue(dflt).build()

  /** One procedure: params beyond the leading `table`, output schema,
    * and the body (already-resolved table + raw arg values by name).
    */
  private final case class Proc(
      params: Seq[ProcedureParameter],
      out: StructType,
      body: (SnapshotTable, Map[String, Any]) => Seq[Any])

  private def outS(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, dt) =>
      StructField(n, dt, nullable = false) })

  private def str(args: Map[String, Any], k: String): String =
    args(k) match {
      case null => ""
      case u: UTF8String => u.toString
      case s: String => s
      case other => other.toString
    }
  private def lng(args: Map[String, Any], k: String): Long =
    args(k) match {
      case l: Long => l
      case i: Int => i.toLong
      case other => sys.error(s"argument $k must be an integer, got $other")
    }
  private def cols(args: Map[String, Any], k: String): Seq[String] =
    str(args, k).split(",").map(_.trim).filter(_.nonEmpty).toIndexedSeq

  private val procs: Map[String, Proc] = Map(
    "expire_snapshots" -> Proc(
      Seq(opt("keep", L, "-1"), opt("older_than_ms", L, "-1")),
      outS("expired_snapshots" -> L, "deleted_files" -> L),
      (t, a) => {
        val older = lng(a, "older_than_ms")
        val keep = lng(a, "keep")
        val (snaps, files) =
          if (older >= 0) {
            require(keep < 0, "pass keep OR older_than_ms, not both")
            t.expireOlderThan(older)
          } else t.expireSnapshots(keep.toInt)
        Seq(snaps.toLong, files.toLong)
      }),
    "compact" -> Proc(
      // partition scoping carries NO in-band sentinels: `partition` is
      // always a literal partition VALUE, "omitted" is SQL NULL (not
      // '' — a default of '' would turn an explicit empty string into
      // a silent whole-table compaction), and the null partition is
      // its own boolean flag. The empty STRING is refused loudly: the
      // storage layer folds '' into __HIVE_DEFAULT_PARTITION__ (Spark/
      // Hive path semantics), so rows with an empty identity value
      // live in the null partition — null_partition => true reaches
      // them.
      Seq(opt("target_rows", L, "1000000"), opt("min_files", L, "2"),
        opt("sort_by", S, "''"), opt("zorder_by", S, "''"),
        opt("partition", S, "null"),
        opt("null_partition", BooleanType, "false")),
      outS("partitions_rewritten" -> L, "files_before" -> L,
        "files_after" -> L),
      (t, a) => {
        val p: Option[String] = a("partition") match {
          case null => None // parameter omitted → all partitions
          case u: UTF8String => Some(u.toString)
          case v => Some(v.toString)
        }
        val nullPart = a("null_partition") match {
          case b: Boolean => b
          case other => sys.error(
            s"null_partition must be a boolean, got $other")
        }
        require(!(nullPart && p.nonEmpty),
          "pass partition => '<value>' OR null_partition => true, not both")
        require(!p.contains(""),
          "partition => '' is not a partition value (the storage layer " +
            "folds empty strings into the null partition) — pass " +
            "null_partition => true to scope there, or omit the " +
            "parameter for all partitions")
        val scope =
          if (nullPart) Some(Seq(None))
          else p.map(v => Seq(Option(v)))
        val res = t.compact(targetRowsPerFile = lng(a, "target_rows"),
          partitions = scope, minFiles = lng(a, "min_files").toInt,
          sortBy = cols(a, "sort_by"), zOrderBy = cols(a, "zorder_by"))
        Seq(res.size.toLong, res.map(_._2).sum.toLong,
          res.map(_._3).sum.toLong)
      }),
    "remove_orphan_files" -> Proc(
      Seq(opt("older_than_ms", L, (24L * 3600 * 1000).toString)),
      outS("deleted_files" -> L),
      (t, a) => Seq(t.removeOrphanFiles(lng(a, "older_than_ms")).toLong)),
    "rollback" -> Proc(
      Seq(in("version", L)),
      outS("current_version" -> L),
      (t, a) => Seq(t.rollback(lng(a, "version")).version)),
    "tag" -> Proc(
      Seq(in("name", S), opt("version", L, "-1")),
      outS("tag_name" -> S, "version" -> L),
      (t, a) => {
        val name = str(a, "name")
        t.tag(name, lng(a, "version"))
        Seq(name, t.tags()(name))
      }),
    "drop_tag" -> Proc(
      Seq(in("name", S)),
      outS("tag_name" -> S),
      (t, a) => { t.dropTag(str(a, "name")); Seq(str(a, "name")) }),
    "clone" -> Proc(
      Seq(in("target", S), opt("version", L, "-1")),
      outS("target" -> S, "rows" -> L),
      (t, a) => {
        val tgt = str(a, "target")
        val cloned = t.cloneTo(tgt, lng(a, "version"))
        Seq(tgt, cloned.currentSnapshot().files.map(_.rows).sum)
      }),
    "maintain" -> Proc(
      Seq(opt("target_rows", L, "1000000")),
      outS("files" -> L, "snapshots" -> L),
      (t, a) => {
        t.maintain(lng(a, "target_rows"))
        Seq(t.currentSnapshot().files.size.toLong, t.history().size.toLong)
      }),
    "rewrite_dvs" -> Proc(
      // Iceberg's rewrite_position_delete_files: coalesce accumulated
      // delete vectors into one generation (bitmap union per data
      // file) so reads stop unioning N tiny vector scans per file
      Seq(opt("min_vectors", L, "2")),
      outS("vector_files_before" -> L, "vector_files_after" -> L,
        "hidden_rows" -> L),
      (t, a) => {
        val before = t.currentSnapshot().dvFiles.size.toLong
        val s = t.rewriteDeleteVectors(lng(a, "min_vectors").toInt)
        Seq(before, s.dvFiles.size.toLong, s.dvFiles.map(_.rows).sum)
      }),
    "import_files" -> Proc(
      Seq(in("source", S)),
      outS("imported_files" -> L, "imported_rows" -> L),
      (t, a) => {
        val before = t.currentSnapshot().files.map(_.path).toSet
        val s2 = t.importParquet(str(a, "source"))
        val added = s2.files.filterNot(f => before.contains(f.path))
        Seq(added.size.toLong, added.map(_.rows).sum)
      }),
    "create_branch" -> Proc(
      Seq(in("name", S), opt("version", L, "-1")),
      outS("branch" -> S, "base_version" -> L),
      (t, a) => {
        val b = t.createBranch(str(a, "name"), lng(a, "version"))
        Seq(str(a, "name"), b.currentVersion())
      }),
    "fast_forward" -> Proc(
      Seq(in("name", S)),
      outS("branch" -> S, "current_version" -> L),
      (t, a) => Seq(str(a, "name"), t.fastForward(str(a, "name")).version)),
    "drop_branch" -> Proc(
      Seq(in("name", S)),
      outS("branch" -> S),
      (t, a) => { t.dropBranch(str(a, "name")); Seq(str(a, "name")) }),
    "begin_audit" -> Proc(Nil, outS("audit_base" -> L),
      (t, _) => Seq(t.beginAudit()
        .properties(SnapshotTable.WapBaseProp).toLong)),
    "publish" -> Proc(Nil, outS("current_version" -> L),
      (t, _) => Seq(t.publish().version)),
    "abort_audit" -> Proc(Nil, outS("current_version" -> L),
      (t, _) => Seq(t.abortAudit().version)))

  def names: Seq[String] = procs.keys.toSeq.sorted

  def load(catalog: GraftCatalog, name: String): Option[UnboundProcedure] =
    procs.get(name.toLowerCase).map(p => unbound(catalog, name.toLowerCase, p))

  private def unbound(catalog: GraftCatalog, procName: String,
      p: Proc): UnboundProcedure = new UnboundProcedure {
    override def name(): String = procName
    override def description(): String =
      s"graft snapshot-table maintenance: $procName"

    override def bind(inputType: StructType): BoundProcedure =
      new BoundProcedure {
        override def name(): String = procName
        override def description(): String =
          s"graft snapshot-table maintenance: $procName"
        override def parameters(): Array[ProcedureParameter] =
          (in("table", S) +: p.params).toArray
        override def isDeterministic: Boolean = false

        override def call(input: InternalRow): JIterator[Scan] = {
          val all = parameters()
          require(input.numFields == all.length,
            s"$procName: expected ${all.length} arguments, got " +
              input.numFields)
          val args = all.zipWithIndex.map { case (param, i) =>
            // an explicit NULL must error, not silently read as 0/""
            // (getLong on a null slot returns 0 — keep => NULL would
            // otherwise expire everything instead of using the default)
            // — EXCEPT for params whose declared default IS NULL
            // ("omitted" marker: compact's partition), where the body
            // receives null and distinguishes omitted from supplied
            val nullDefault = Option(param.defaultValue())
              .exists(_.getSql == "null")
            if (input.isNullAt(i) && nullDefault)
              param.name -> null
            else {
            require(!input.isNullAt(i),
              s"$procName: argument ${param.name} must not be NULL — " +
                "omit it to take the default")
            param.name -> (param.dataType match {
              case StringType => input.getUTF8String(i)
              case LongType => input.getLong(i)
              case IntegerType => input.getInt(i).toLong
              case BooleanType => input.getBoolean(i)
              case other => sys.error(s"unsupported param type $other")
            })
            }
          }.toMap
          val tableRef = str(args, "table")
          require(tableRef.nonEmpty, s"$procName: table => '...' required")
          val t = catalog.resolveTableArg(tableRef)
          val values = p.body(t, args)
          val converter =
            CatalystTypeConverters.createToCatalystConverter(p.out)
          val row = converter(org.apache.spark.sql.Row.fromSeq(values))
            .asInstanceOf[InternalRow]
          java.util.Collections.singletonList[Scan](new LocalScan {
            override def readSchema(): StructType = p.out
            override def rows(): Array[InternalRow] = Array(row)
          }).iterator()
        }
      }
  }
}
