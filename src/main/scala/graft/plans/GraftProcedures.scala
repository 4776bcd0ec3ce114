package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._

import graft.sources.GraftRelation

/** SQL maintenance procedures on graft snapshot tables — the Iceberg
  * stored-procedure surface (`CALL catalog.system.expire_snapshots`,
  * `rewrite_data_files`, `remove_orphan_files`, `rollback_to_snapshot`,
  * Athena `VACUUM`), which the reference leaves to Athena's table
  * maintenance. SQL-only operators get the full ops toolkit:
  *
  * {{{
  *   CALL graft.expire_snapshots('events_snap', keep => 3)
  *   CALL graft.compact('events_snap', target_rows => 1000000,
  *                      sort_by => 'event_id')
  *   CALL graft.compact('events_snap', zorder_by => 'event_id,user_id')
  *   CALL graft.remove_orphan_files('events_snap', older_than_ms => 0)
  *   CALL graft.rollback('events_snap', version => 2)
  *   CALL graft.tag('events_snap', name => 'corpus_v1', version => 3)
  * }}}
  *
  * The first (positional) argument is a graft-backed TEMP VIEW — the
  * same addressing every other SQL seam here uses (DML, time travel,
  * snapshot source). Named arguments follow Iceberg's `k => v` call
  * syntax; integers are bare, strings quoted. Each procedure returns a
  * one-row result describing what it did (counts / versions), so a SQL
  * console shows the outcome instead of silence.
  *
  * Parsed at the PARSER seam (the delegating
  * [[GraftTimeTravelParser]] tries [[parse]] before Spark's parser):
  * Spark 4 reserves `CALL` for DSv2 catalog procedures, which a
  * path-based table never gets; intercepting the raw text keeps every
  * non-`CALL graft.…` statement byte-identical for Spark. Time-travel
  * pinned views are refused — maintenance mutates the live table.
  */
object GraftProcedures {

  import GraftSqlDml.fail

  private val CallRe =
    """(?is)\s*CALL\s+graft\s*\.\s*([A-Za-z_]+)\s*\((.*)\)\s*;?\s*""".r

  val Known: Seq[String] = Seq("expire_snapshots", "compact",
    "remove_orphan_files", "rollback", "tag", "begin_audit", "publish",
    "abort_audit", "clone", "maintain", "drop_tag")

  private val AllowedArgs: Map[String, Set[String]] = Map(
    "expire_snapshots" -> Set("keep", "older_than_ms"),
    "compact" -> Set("target_rows", "min_files", "sort_by", "zorder_by",
      "partition"),
    "remove_orphan_files" -> Set("older_than_ms"),
    "rollback" -> Set("version"),
    "tag" -> Set("name", "version"),
    "clone" -> Set("target", "version"),
    "maintain" -> Set("target_rows"),
    "drop_tag" -> Set("name"),
    "begin_audit" -> Set.empty[String],
    "publish" -> Set.empty[String],
    "abort_audit" -> Set.empty[String])

  /** Some(command) when `sqlText` is `CALL graft.<proc>(…)`; None =
    * not ours, let Spark parse it (including other catalogs' CALLs).
    */
  def parse(session: SparkSession, sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case CallRe(proc0, argStr) =>
        val proc = proc0.toLowerCase
        if (!Known.contains(proc)) fail(
          s"unknown graft procedure '$proc' — available: ${Known.mkString(", ")}")
        val (pos, named) = parseArgs(argStr)
        if (pos.length != 1) fail(
          s"CALL graft.$proc takes exactly one positional argument " +
            "(the graft temp view name, quoted)")
        named.keys.find(!AllowedArgs(proc)(_)).foreach(k => fail(
          s"CALL graft.$proc: unknown argument '$k' — allowed: " +
            AllowedArgs(proc).toSeq.sorted.mkString(", ")))
        val view = pos.head
        val gr = session.sessionState.catalog.getTempView(view)
          .flatMap(GraftSqlDml.targetOf)
          .getOrElse(fail(
            s"CALL graft.$proc: '$view' is not a temp view over a graft " +
              "snapshot table"))
        Some(GraftCallCommand(proc, view,
          GraftSqlDml.writable(gr, s"CALL graft.$proc on"), named))
      case _ => None
    }

  /** Split `'events', keep => 3, sort_by => 'a,b'` into positionals and
    * named args. Commas inside single-quoted strings do not split;
    * `''` inside a quoted string is an escaped quote (SQL style).
    * Named-vs-positional is decided WHILE scanning: only a `=>` seen
    * OUTSIDE quotes makes an argument named, so a quoted value that
    * itself contains `=>` (`name => 'a=>b'`, a clone target with an
    * arrow in its path) neither splits at the wrong arrow nor turns a
    * quoted positional into a bogus named arg.
    */
  private def parseArgs(s: String): (Seq[String], Map[String, String]) = {
    // (dequoted text, index in that text where the first unquoted "=>"
    // ended — None = positional)
    val parts = mutable.ArrayBuffer.empty[(String, Option[Int])]
    val cur = new StringBuilder
    var arrowAt: Option[Int] = None
    var inQ = false
    var i = 0
    def flush(): Unit = {
      parts += ((cur.result(), arrowAt)); cur.clear(); arrowAt = None
    }
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) {
        if (c == '\'' && i + 1 < s.length && s.charAt(i + 1) == '\'') {
          cur += '\''; i += 1
        } else if (c == '\'') inQ = false
        else cur += c
      } else c match {
        case '\'' => inQ = true
        case ',' => flush()
        case '=' if arrowAt.isEmpty && i + 1 < s.length &&
            s.charAt(i + 1) == '>' =>
          arrowAt = Some(cur.length); i += 1
        case _ => cur += c
      }
      i += 1
    }
    if (inQ) fail(s"unterminated string literal in CALL arguments: $s")
    if (cur.nonEmpty || parts.nonEmpty) flush()
    val trimmed = parts.collect {
      case (t, a) if t.trim.nonEmpty || a.isDefined => (t, a)
    }
    val pos = trimmed.collect { case (t, None) => t.trim }
    val namedMap = trimmed.collect { case (t, Some(idx)) =>
      t.take(idx).trim.toLowerCase -> t.drop(idx).trim
    }.toMap
    (pos.toSeq, namedMap)
  }
}

/** One `CALL graft.<proc>(…)` lowered to the [[graft.catalog
  * .SnapshotTable]] maintenance API; `run` returns the outcome row.
  */
final case class GraftCallCommand(proc: String, view: String,
    gr: GraftRelation, args: Map[String, String])
    extends LeafRunnableCommand {

  import GraftSqlDml.fail

  private def attr(n: String, dt: DataType): Attribute =
    AttributeReference(n, dt, nullable = false)()

  override val output: Seq[Attribute] = proc match {
    case "expire_snapshots" =>
      Seq(attr("expired_snapshots", IntegerType),
        attr("deleted_files", IntegerType))
    case "remove_orphan_files" => Seq(attr("deleted_files", IntegerType))
    case "compact" =>
      Seq(attr("partitions_rewritten", IntegerType),
        attr("files_before", IntegerType), attr("files_after", IntegerType))
    case "rollback" => Seq(attr("current_version", LongType))
    case "tag" => Seq(attr("tag_name", StringType), attr("version", LongType))
    case "clone" =>
      Seq(attr("target", StringType), attr("rows", LongType))
    case "maintain" =>
      Seq(attr("files", LongType), attr("snapshots", LongType))
    case "drop_tag" => Seq(attr("tag_name", StringType))
    case "begin_audit" => Seq(attr("audit_base", LongType))
    case "publish" | "abort_audit" => Seq(attr("current_version", LongType))
    case other => fail(s"unknown graft procedure '$other'")
  }

  private def long(k: String, dflt: => Long): Long =
    args.get(k).map(v => scala.util.Try(v.toLong).getOrElse(
      fail(s"CALL graft.$proc: argument $k must be an integer, got '$v'")))
      .getOrElse(dflt)

  private def cols(k: String): Seq[String] =
    args.get(k).toSeq.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

  override def run(session: SparkSession): Seq[Row] = {
    val t = gr.table
    proc match {
      case "expire_snapshots" =>
        val (snaps, files) = args.get("older_than_ms") match {
          case Some(_) =>
            if (args.contains("keep")) fail(
              "CALL graft.expire_snapshots: pass keep OR older_than_ms")
            t.expireOlderThan(long("older_than_ms", 0L))
          case None => t.expireSnapshots(long("keep", -1L).toInt)
        }
        Seq(Row(snaps, files))
      case "remove_orphan_files" =>
        Seq(Row(t.removeOrphanFiles(long("older_than_ms",
          24L * 3600 * 1000))))
      case "compact" =>
        // partition => 'value' scopes the rewrite to one hidden
        // partition ('null' = the null partition) — at scale you
        // compact the hot partition, not the table
        val scope = args.get("partition").map {
          case "null" => Seq(None)
          case v => Seq(Some(v))
        }
        val res = t.compact(
          targetRowsPerFile = long("target_rows", 1000000L),
          partitions = scope,
          minFiles = long("min_files", 2L).toInt,
          sortBy = cols("sort_by"), zOrderBy = cols("zorder_by"))
        Seq(Row(res.size, res.map(_._2).sum, res.map(_._3).sum))
      case "rollback" =>
        Seq(Row(t.rollback(long("version",
          fail(s"CALL graft.rollback requires version => N"))).version))
      case "tag" =>
        val name = args.getOrElse("name",
          fail("CALL graft.tag requires name => 'tag_name'"))
        t.tag(name, long("version", -1L))
        Seq(Row(name, t.tags()(name)))
      case "clone" =>
        val tgt = args.getOrElse("target",
          fail("CALL graft.clone requires target => '/path'"))
        val cloned = t.cloneTo(tgt, long("version", -1L))
        Seq(Row(tgt, cloned.currentSnapshot().files.map(_.rows).sum))
      case "maintain" =>
        // compact + spec self-heal + expiry, driven by table properties
        t.maintain(long("target_rows", 1000000L))
        val cur = t.currentSnapshot()
        Seq(Row(cur.files.size.toLong, t.history().size.toLong))
      case "drop_tag" =>
        val name = args.getOrElse("name",
          fail("CALL graft.drop_tag requires name => 'tag_name'"))
        t.dropTag(name)
        Seq(Row(name))
      case "begin_audit" =>
        val s = t.beginAudit()
        Seq(Row(s.properties(
          graft.catalog.SnapshotTable.WapBaseProp).toLong))
      case "publish" => Seq(Row(t.publish().version))
      case "abort_audit" => Seq(Row(t.abortAudit().version))
      case other => fail(s"unknown graft procedure '$other'")
    }
  }
}
