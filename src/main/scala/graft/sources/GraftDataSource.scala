package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{StructField, StructType}

import graft.catalog.SnapshotTable

/** Spark SQL data source for [[graft.catalog.SnapshotTable]] — the
  * integration that makes the snapshot layer consumable WITHOUT the
  * Scala API, exactly how a SQL-only user reaches an Iceberg table:
  *
  * {{{
  *   spark.read.format("graft").load("/warehouse/events")
  *   spark.read.format("graft")
  *     .option("versionAsOf", 3).load("/warehouse/events")   // time travel
  *   spark.read.format("graft")
  *     .option("tag", "corpus-v1.0").load("/warehouse/events")
  *
  *   CREATE TEMPORARY VIEW events_snap
  *   USING graft OPTIONS (path '/warehouse/events')
  * }}}
  *
  * Implemented as a DSv1 `PrunedFilteredScan`: Catalyst pushes the
  * query's source filters down, the relation prunes data FILES at the
  * manifest (min/max stats + Bloom sidecars — [[graft.catalog
  * .StatsPruner]], the same path `readWhere` uses), and every filter is
  * declared unhandled so Catalyst re-applies them exactly — manifest
  * pruning stays skip-only and can never change results. Merge-on-read
  * equality deletes and field-id schema evolution apply as on every
  * other read path.
  */
final class GraftDataSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister
    with StreamSourceProvider with StreamSinkProvider {

  override def shortName(): String = "graft"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      sys.error("the graft data source requires a path: " +
        ".load(root) / .save(root) or OPTIONS (path '...')"))

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = pathOf(parameters)
    def longOpt(key: String, label: String): Option[Long] =
      parameters.get(key).map { v =>
        try v.toLong
        catch {
          case _: NumberFormatException =>
            sys.error(s"$label must be a version number, got '$v'")
        }
      }
    // metadata tables (Iceberg `table.files` / `partitions` / `history`
    // / `refs`): OPTIONS (path '…', metadata 'partitions') reads the
    // manifest-derived introspection DataFrames — SQL-only users get
    // the same ops views the Scala API exposes, zero data-file I/O
    parameters.get("metadata") match {
      case Some(kind) =>
        require(parameters.size <= 2 ||
          parameters.keys.forall(k => k == "path" || k == "metadata" ||
            k == "paths"),
          "metadata tables take no other options (they describe the " +
            "CURRENT snapshot; time travel does not apply)")
        return new GraftMetadataRelation(sqlContext, path, kind.toLowerCase)
      case None => ()
    }
    // CDC changelog surface: changesFrom/changesTo expose
    // SnapshotTable.changes(from, to) to SQL-only consumers. Bounds
    // are version numbers or TAG NAMES ("changes since the corpus the
    // model trained on") — digits always mean a version; all-digit tag
    // names are refused at tag() creation, so the routing is total.
    def boundOpt(key: String): Option[Long] = parameters.get(key).map { v =>
      scala.util.Try(v.toLong).getOrElse {
        val tbl = SnapshotTable.load(sqlContext.sparkSession, path)
        tbl.tags().getOrElse(v, sys.error(
          s"$key: '$v' is neither a version number nor a tag at $path; " +
            s"tags: ${tbl.tags().keys.mkString(", ")}"))
      }
    }
    // Delta startingTimestamp analog: <bound>Timestamp resolves to the
    // latest version committed at or before it (readAsOf semantics —
    // "changes SINCE the corpus as of T"). Epoch millis or ISO-8601.
    def tsBoundOpt(key: String, versionKey: String): Option[Long] = {
      require(!(parameters.contains(key) && parameters.contains(versionKey)),
        s"pass $versionKey OR $key, not both")
      parameters.get(key).map { v =>
        val ms = scala.util.Try(v.toLong).getOrElse(
          scala.util.Try(java.time.Instant.parse(v).toEpochMilli).getOrElse(
            sys.error(s"$key must be epoch millis or ISO-8601, got '$v'")))
        SnapshotTable.load(sqlContext.sparkSession, path).versionAsOf(ms)
      }
    }
    // evaluate both variants eagerly: the conflict check must fire
    // even when the version-keyed option would win an orElse
    val fromTs = tsBoundOpt("changesfromtimestamp", "changesfrom")
    val toTs = tsBoundOpt("changestotimestamp", "changesto")
    (boundOpt("changesfrom").orElse(fromTs),
      boundOpt("changesto").orElse(toTs)) match {
      case (Some(f), Some(t)) =>
        require(Seq("versionasof", "tag", "timestampasof")
          .forall(k => !parameters.contains(k)),
          "changesFrom/changesTo cannot combine with versionAsOf/tag/timestampAsOf")
        return new GraftChangesRelation(sqlContext, path, f, t,
          updateImages = parameters.get("updateimages")
            .exists(_.equalsIgnoreCase("true")))
      case (None, None) => ()
      case _ => sys.error("pass BOTH changesFrom and changesTo (or neither)")
    }
    val version = longOpt("versionasof", "versionAsOf")
    val tag = parameters.get("tag")
    // branch 'name': the view IS the branch — reads see the branch
    // head, INSERT/DML through the view land on the branch line
    val branch = parameters.get("branch")
    // timestampAsOf: epoch millis or ISO-8601 instant, resolved to the
    // latest snapshot committed at or before it (readAsOf semantics)
    val ts = parameters.get("timestampasof").map { v =>
      try v.toLong
      catch {
        case _: NumberFormatException =>
          try java.time.Instant.parse(v).toEpochMilli
          catch {
            case _: java.time.format.DateTimeParseException => sys.error(
              s"timestampAsOf must be epoch millis or ISO-8601, got '$v'")
          }
      }
    }
    require(Seq(version, tag, ts).count(_.isDefined) <= 1,
      "pass at most one of versionAsOf, tag, timestampAsOf")
    require(branch.isEmpty || Seq(version, tag, ts).forall(_.isEmpty),
      "branch cannot combine with versionAsOf/tag/timestampAsOf " +
        "(time travel WITHIN a branch: read the branch handle's history)")
    new GraftRelation(sqlContext, path, version, tag, ts, branch)
  }

  /** Write side: `df.write.format("graft").mode(...).save(root)`.
    * Append and Overwrite map to the table's atomic commits (schema
    * evolution applies); a missing table is created first, with an
    * optional hidden-partition spec from `partition` — `'month(ts)'`
    * or `'identity(col)'` — honored only at creation.
    * ErrorIfExists/Ignore follow their SaveMode contracts against
    * table EXISTENCE.
    */
  override def createRelation(sqlContext: SQLContext,
      mode: org.apache.spark.sql.SaveMode,
      parameters: Map[String, String],
      data: org.apache.spark.sql.DataFrame): BaseRelation = {
    import org.apache.spark.sql.SaveMode._
    val spark = sqlContext.sparkSession
    val path = pathOf(parameters)
    // branch 'name' on the WRITE side too: the commit lands on the
    // branch line (a silently-ignored option here would publish
    // staged-for-review data straight to main readers)
    val branch = parameters.get("branch")
    val exists = SnapshotTable.exists(spark, path)
    require(branch.isEmpty || exists,
      s"cannot write to branch '${branch.getOrElse("")}' of a table " +
        s"that does not exist yet at $path — create the table and the " +
        "branch first")
    if (exists && mode == ErrorIfExists)
      sys.error(s"graft table already exists at $path (SaveMode.ErrorIfExists)")
    if (!exists || mode != Ignore) {
      val base =
        if (exists) SnapshotTable.load(spark, path)
        else SnapshotTable.create(spark, path, data.schema,
          spec = parameters.get("partition").map(parseSpec))
      val table = branch.map(base.branch).getOrElse(base)
      mode match {
        case Overwrite => table.overwrite(data)
        case _ if !exists => table.append(data) // fresh table: content
        case Append => table.append(data)
        case _ => () // Ignore / ErrorIfExists on existing: no write
      }
    }
    new GraftRelation(sqlContext, path, None, None, None, branch)
  }

  /** Streaming read: `spark.readStream.format("graft")
    * .option("changesFrom", v).load(root)` — the CDC changelog as a
    * micro-batch stream, one offset per table version
    * ([[graft.streaming.GraftChangesSource]]). `changesFrom` omitted =
    * stream only commits after the query starts.
    */
  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    require(schema.isEmpty,
      "the graft streaming source derives its schema from the table — " +
        "drop .schema(...)")
    val table = SnapshotTable.load(sqlContext.sparkSession, pathOf(parameters))
    (shortName(),
      graft.streaming.GraftChangesSource.changeSchema(table.schemaAt(None)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): org.apache.spark.sql.execution.streaming.Source = {
    // version number or tag name — a stream resuming "since the tagged
    // corpus vintage" is the natural consumer shape; the timestamp
    // variant resolves via readAsOf semantics
    require(!(parameters.contains("changesfrom") &&
        parameters.contains("changesfromtimestamp")),
      "pass changesFrom OR changesFromTimestamp, not both")
    val from = parameters.get("changesfrom").map { v =>
      scala.util.Try(v.toLong).getOrElse {
        val tbl = SnapshotTable.load(sqlContext.sparkSession,
          pathOf(parameters))
        tbl.tags().getOrElse(v, sys.error(
          s"changesFrom: '$v' is neither a version number nor a tag; " +
            s"tags: ${tbl.tags().keys.mkString(", ")}"))
      }
    }.orElse(parameters.get("changesfromtimestamp").map { v =>
      val ms = scala.util.Try(v.toLong).getOrElse(
        scala.util.Try(java.time.Instant.parse(v).toEpochMilli).getOrElse(
          sys.error("changesFromTimestamp must be epoch millis or " +
            s"ISO-8601, got '$v'")))
      SnapshotTable.load(sqlContext.sparkSession, pathOf(parameters))
        .versionAsOf(ms)
    })
    require(!parameters.contains("changesto"),
      "a streaming changelog read is unbounded — changesTo only applies " +
        "to batch reads (spark.read)")
    val maxPerTrigger = parameters.get("maxversionspertrigger").map { v =>
      val n = try v.toLong catch {
        case _: NumberFormatException =>
          sys.error(s"maxVersionsPerTrigger must be a positive number, got '$v'")
      }
      require(n >= 1, s"maxVersionsPerTrigger must be >= 1, got $n")
      n
    }
    new graft.streaming.GraftChangesSource(sqlContext, pathOf(parameters),
      from, metadataPath, maxPerTrigger)
  }

  /** `writeStream.format("graft").start(root)` — exactly-once append
    * into an existing snapshot table (batch id recorded in the commit;
    * replays skip), or keyed CDC upsert with `.option("keys",
    * "k1,k2")` + `outputMode("update")`, routed MoR/COW by the table's
    * `graft.merge.mode`. Partitioning comes from the table's own spec.
    */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    require(partitionColumns.isEmpty,
      "the graft sink takes partitioning from the table's own spec — " +
        "drop partitionBy(...)")
    val keys = parameters.get("keys").map(
      _.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    require(keys.forall(_.nonEmpty), "keys must name at least one column")
    import org.apache.spark.sql.streaming.OutputMode
    if (outputMode == OutputMode.Complete()) sys.error(
      "the graft sink does not support Complete mode — a snapshot " +
        "table is the accumulated state; use Append or keyed Update")
    if (outputMode == OutputMode.Update() && keys.isEmpty) sys.error(
      "Update mode needs .option(\"keys\", ...) — without keys an " +
        "updated row cannot replace its previous image")
    // the converse too (ADVICE r14, low): keys under Append would
    // silently switch the sink to keyed upsert — dropping Append's
    // batch-id exactly-once dedup and its append-only contract — for
    // a user who set keys but forgot outputMode("update"). Refuse.
    if (outputMode != OutputMode.Update() && keys.nonEmpty) sys.error(
      "the keys option is a keyed-upsert contract and is only honored " +
        "in Update mode — add .outputMode(\"update\") or drop " +
        ".option(\"keys\", ...)")
    // the table must exist: schema/spec/properties govern the write
    SnapshotTable.load(sqlContext.sparkSession, pathOf(parameters))
    new graft.streaming.GraftSink(pathOf(parameters), keys)
  }

  /** `month(col)` / `identity(col)` / `bucket(N, col)` / bare `col`
    * (= identity). The bare form refuses parentheses so a malformed
    * transform (unclosed paren, stray text) fails HERE with the real
    * problem rather than creating a table partitioned on a garbage
    * column name.
    */
  private def parseSpec(s: String): graft.catalog.PartitionSpec = {
    val Xform = raw"(\w+)\(([^)]+)\)".r
    val BucketArgs = raw"\s*(\d+)\s*,\s*([^,\s]+)\s*".r
    s.trim match {
      case Xform("bucket", args) => args match {
        case BucketArgs(n, c) =>
          require(n.toLong >= 1, s"bucket count must be >= 1, got $n")
          graft.catalog.PartitionSpec(c, s"bucket[$n]")
        case other => sys.error(s"unparseable bucket transform args " +
          s"'$other' (expected 'bucket(N, col)')")
      }
      case Xform(t, c) =>
        // validate the transform BEFORE the table is created: an
        // unknown transform would otherwise persist a spec that only
        // fails (MatchError in partitionExpr) on the first append —
        // after the bad table already exists on disk
        require(t == "month" || t == "identity",
          s"unsupported partition transform '$t' " +
            "(supported: month, identity, bucket)")
        graft.catalog.PartitionSpec(c.trim, t)
      case bare if bare.nonEmpty && !bare.exists("()".contains(_)) =>
        graft.catalog.PartitionSpec(bare, "identity")
      case other => sys.error(s"unparseable partition option: '$other' " +
        "(expected 'month(col)', 'identity(col)', 'bucket(N, col)', " +
        "or a bare column name)")
    }
  }
}

final class GraftRelation(
    override val sqlContext: SQLContext,
    root: String,
    versionAsOf: Option[Long],
    tag: Option[String],
    timestampAsOf: Option[Long] = None,
    branch: Option[String] = None) extends BaseRelation
    with PrunedFilteredScan with InsertableRelation {

  /** The addressed line: the table's main log, or a named branch's —
    * every read AND write through this relation follows it.
    */
  private[graft] val table = {
    val base = SnapshotTable.load(sqlContext.sparkSession, root)
    branch.map(base.branch).getOrElse(base)
  }

  /** Resolved once at relation creation: the version this relation
    * reads (a tag resolves through the ref, a timestamp to the latest
    * snapshot at or before it; None = follow current).
    */
  private[graft] val pinned: Option[Long] = (tag, timestampAsOf) match {
    case (Some(t), _) => Some(table.tags().getOrElse(t,
      sys.error(s"no tag '$t' at $root; tags: ${table.tags().keys.mkString(", ")}")))
    case (None, Some(ms)) => Some(table.versionAsOf(ms))
    case _ => versionAsOf
  }

  override val schema: StructType = table.schemaAt(pinned)

  /** Manifest-exact table size estimate (row count × the schema's
    * default width): without it `BaseRelation` reports
    * `spark.sql.defaultSizeInBytes` (= effectively infinite) and a
    * snapshot-table side of a join can NEVER auto-broadcast, however
    * small. Row counts come from the manifests (zero data I/O), minus
    * committed delete-vector cardinalities — the estimate only rounds
    * up (equality deletes are not subtracted), so an oversized table
    * never broadcasts by accident.
    */
  override def sizeInBytes: Long = {
    val rows = table.scanEstimate(pinned, Nil)
    rows * math.max(1, schema.defaultSize)
  }

  /** All filters stay Catalyst's responsibility — this relation uses
    * them ONLY to skip files, so its row output may over-approximate
    * and the exact semantics (incl. NULL handling) remain with the
    * engine's own FilterExec.
    */
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  /** A current-reading relation (no pin) follows the table, so new
    * commits ARE visible — but a schema-evolving commit after the
    * relation was analyzed would make rows disagree with the declared
    * schema (silent corruption or a cast crash). Detect it and fail
    * with the remedy instead. Shared by [[buildScan]] (DSv1 fallback)
    * and [[graft.plans.GraftScanStrategy]] (the native plan path).
    */
  private[graft] def guardSchemaDrift(): Unit = {
    def shape(s: StructType) = s.fields.toSeq.map(f => (f.name, f.dataType))
    require(pinned.nonEmpty || shape(table.schemaAt(None)) == shape(schema),
      s"snapshot table at $root evolved its schema since this relation " +
        "was created — re-create the view (or re-run spark.read) to " +
        "pick up the new schema")
  }

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] = {
    guardSchemaDrift()
    val df = table.scanFor(pinned, filters.toIndexedSeq)
    // empty projection (e.g. COUNT(*)) still needs the row multiset
    val projected =
      if (requiredColumns.isEmpty) df.select()
      else df.select(requiredColumns.toIndexedSeq.map(c =>
        org.apache.spark.sql.functions.col(
          graft.catalog.SnapshotTable.quoted(c))): _*)
    projected.rdd
  }

  /** SQL `INSERT INTO` / `INSERT OVERWRITE` on a graft temp view:
    * atomic append or full-table overwrite (DSv1 overwrite contract).
    */
  override def insert(data: org.apache.spark.sql.DataFrame,
      overwrite: Boolean): Unit = {
    require(pinned.isEmpty, "cannot INSERT into a time-travel " +
      "(versionAsOf / tag / timestampAsOf) relation")
    if (overwrite) table.overwrite(data) else table.append(data)
    ()
  }
}

/** CDC changelog as a SQL relation: `spark.read.format("graft")
  * .option("changesFrom", 2).option("changesTo", 4).load(root)` (or
  * the OPTIONS form of CREATE TEMPORARY VIEW) surfaces
  * [[graft.catalog.SnapshotTable.changes]] — `_change_type ∈ {insert,
  * delete}` plus the table columns at `changesTo`'s schema — to
  * SQL-only incremental consumers. Versions are pinned at relation
  * creation, so repeated queries over one view read one consistent
  * window. [[graft.plans.GraftScanStrategy]] plans it natively; this
  * DSv1 `buildScan` is the fallback for subquery shapes. With
  * `updateImages 'true'` the window is served per-commit with
  * Delta-CDF labels ([[graft.catalog.SnapshotTable.changesCdf]]) —
  * V2 `#changes` option parity for SQL-only consumers.
  */
final class GraftChangesRelation(
    override val sqlContext: SQLContext,
    root: String,
    fromVersion: Long,
    toVersion: Long,
    updateImages: Boolean = false) extends BaseRelation with TableScan {

  private[graft] val table = SnapshotTable.load(sqlContext.sparkSession, root)

  private[graft] def changesDf: org.apache.spark.sql.DataFrame =
    if (updateImages) table.changesCdf(fromVersion, toVersion)
    else table.changes(fromVersion, toVersion)

  override val schema: StructType = StructType(
    StructField("_change_type", org.apache.spark.sql.types.StringType,
      nullable = false) +: table.schemaAt(Some(toVersion)).fields)

  override def buildScan(): RDD[Row] = changesDf.rdd
}

/** One metadata table (`history` / `partitions` / `files` / `tags`)
  * of a graft snapshot table as a relation — resolved fresh on every
  * scan so a long-lived temp view always describes the CURRENT
  * snapshot. Metadata-sized by construction (rows ≈ commits, files, or
  * partitions — never data rows).
  */
final class GraftMetadataRelation(
    override val sqlContext: SQLContext,
    root: String,
    kind: String) extends BaseRelation with TableScan {

  private def df: org.apache.spark.sql.DataFrame = {
    val t = SnapshotTable.load(sqlContext.sparkSession, root)
    kind match {
      case "history" => t.historyDf()
      case "partitions" => t.partitionsDf()
      case "files" => t.filesDf()
      case "tags" => t.tagsDf()
      case "branches" => t.branchesDf()
      case other => sys.error(s"unknown graft metadata table '$other' — " +
        "one of: history, partitions, files, tags, branches")
    }
  }

  override def schema: StructType = df.schema
  override def buildScan(): RDD[Row] = df.rdd
}
