package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StructType}

import graft.sources.GraftRelation

/** SQL time travel on graft temp views:
  *
  * {{{
  *   SELECT … FROM events_snap FOR VERSION AS OF 3
  *   SELECT … FROM events_snap FOR VERSION AS OF corpus_v1   -- a tag
  *   SELECT … FROM events_snap FOR TIMESTAMP AS OF '2024-01-02 00:00:00'
  * }}}
  *
  * Spark 4 parses the clause for any relation but only DSv2 catalog
  * tables resolve it — `ResolveRelations` throws on a temp view BEFORE
  * injected resolution rules run, so the interception has to happen at
  * the PARSER seam: this delegating parser rewrites
  * `RelationTimeTravel(UnresolvedRelation(name), …)` into a pinned
  * [[GraftRelation]] when `name` is a temp view over a graft table,
  * reusing the exact option semantics of the DataFrame reader
  * (`versionAsOf` / `tag` / `timestampAsOf`). A non-numeric VERSION
  * resolves as a TAG — the ref surface SQL has no other syntax for.
  * Anything that is not a graft-backed temp view is left untouched for
  * Spark's own resolution (and its own error message).
  */
final class GraftTimeTravelParser(session: SparkSession,
    delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    // maintenance procedures first: `CALL graft.…` is not Spark SQL
    // (Spark reserves CALL for DSv2 catalog procedures); everything
    // else reaches Spark's parser byte-identical
    GraftProcedures.parse(session, sqlText).getOrElse(
      delegate.parsePlan(sqlText).transformUp {
        case tt @ RelationTimeTravel(ur: UnresolvedRelation, ts, version) =>
          rewrite(ur, ts, version).getOrElse(tt)
      })

  /** The pinned relation, or None = not ours (leave the node alone). */
  private def rewrite(ur: UnresolvedRelation, ts: Option[Expression],
      version: Option[String]): Option[LogicalPlan] =
    for {
      name <- ur.multipartIdentifier match {
        case Seq(n) => Some(n)
        case _ => None // qualified names are never temp views of ours
      }
      viewPlan <- session.sessionState.catalog.getTempView(name)
      gr <- GraftSqlDml.targetOf(viewPlan)
    } yield {
      if (gr.pinned.nonEmpty) throw new UnsupportedOperationException(
        s"temp view $name is already pinned (versionAsOf/tag/timestampAsOf " +
          "in its OPTIONS) — FOR VERSION/TIMESTAMP AS OF cannot re-pin it")
      // digits → version, else tag; a digit string too long for Long
      // (20+ digits) cannot be a version, and all-digit tag names are
      // refused at tag() — fall through to tag resolution for its
      // clear "no tag" error rather than NumberFormatException here
      val (verOpt, tagOpt) = version match {
        case Some(v) if v.nonEmpty && v.forall(_.isDigit) =>
          scala.util.Try(v.toLong).toOption match {
            case Some(l) => (Some(l), None)
            case None => (None, Some(v))
          }
        case Some(v) => (None, Some(v))
        case None => (None, None)
      }
      val tsMillis = ts.map(evalTimestampMillis)
      val pinned = new GraftRelation(gr.sqlContext, gr.table.root.toString,
        verOpt, tagOpt, tsMillis)
      SubqueryAlias(name,
        session.baseRelationToDataFrame(pinned).queryExecution.logical)
    }

  /** Evaluate the parsed `FOR TIMESTAMP AS OF` expression to epoch
    * millis: cast through the session (string literals, arithmetic,
    * `current_timestamp() - INTERVAL …` all work), then read the one
    * value back under either datetime Java API.
    */
  private def evalTimestampMillis(e: Expression): Long = {
    val row = session.range(1)
      .select(ColumnBridge.column(e).cast("timestamp").as("ts"))
      .collect()(0)
    row.get(0) match {
      case t: java.sql.Timestamp => t.getTime
      case i: java.time.Instant => i.toEpochMilli
      case null => sys.error(s"FOR TIMESTAMP AS OF evaluated to NULL: ${e.sql}")
      case other => sys.error(
        s"FOR TIMESTAMP AS OF evaluated to unexpected ${other.getClass}: $other")
    }
  }

  // everything else delegates verbatim
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
