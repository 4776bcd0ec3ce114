package graft.catalog

import java.util.{Set => JSet}

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsDelete, SupportsMetadataColumns, SupportsRead, SupportsRowLevelOperations, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, SupportsDynamicOverwrite, SupportsOverwrite, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{AlwaysTrue, BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The DSv2 `Table` for one graft snapshot table — what
  * [[GraftCatalog.loadTable]] hands Spark, making `graft.db.t` a
  * native catalog table: scans plan through Spark's own v2 pushdown
  * (manifest pruning via the same skip-only translation as every
  * other read path), `INSERT INTO` / `INSERT OVERWRITE` /
  * `df.writeTo(...)` route to the table's atomic commits, `DELETE
  * FROM` with pushable predicates runs as a native v2 metadata/COW
  * delete, and `TRUNCATE TABLE` is an atomic overwrite-to-empty.
  * Time travel (`VERSION AS OF` / `TIMESTAMP AS OF`) arrives as a
  * `pinned` version resolved by the catalog — a pinned table refuses
  * writes, mirroring [[graft.sources.GraftRelation]].
  *
  * The scan and write surfaces bridge through `V1Scan` / `V1Write` to
  * the battle-tested [[SnapshotTable]] read/commit machinery: the
  * physical plan below the bridge is Spark's own vectorized parquet
  * scan over manifest-pruned files (the DataFrame returned by
  * `scanFor`), so the v2 seam adds catalog-native addressing without
  * forking the execution path the DSv1 relation already certifies.
  */
final class GraftV2Table(
    val table: SnapshotTable,
    ident: String,
    val pinned: Option[Long]) extends Table
    with SupportsRead with SupportsWrite with SupportsDelete
    with SupportsRowLevelOperations with SupportsMetadataColumns {

  override def name(): String = ident

  override val schema: StructType = table.schemaAt(pinned)

  override def partitioning(): Array[Transform] =
    table.publishedSnapshot().spec.toArray.map { ps =>
      ps.transform match {
        case "identity" => Expressions.identity(ps.source)
        case "month" => Expressions.months(ps.source)
        case SnapshotTable.BucketXform(n) =>
          Expressions.bucket(n.toInt, ps.source)
        case other => sys.error(s"unknown partition transform $other")
      }
    }

  override def properties(): java.util.Map[String, String] =
    table.publishedSnapshot().properties.asJava

  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.OVERWRITE_DYNAMIC,
      TableCapability.TRUNCATE,
      // `spark.readStream.table("graft.db.t")` — appends-only
      // micro-batch tail of the table ([[graft.streaming
      // .GraftTableStream]]); the CDC source stays the
      // retraction-aware surface
      TableCapability.MICRO_BATCH_READ,
      // `df.writeStream.toTable("graft.db.t")` — executor-parallel
      // exactly-once epoch appends ([[GraftStreamingWrite]])
      TableCapability.STREAMING_WRITE,
      // MERGE INTO … WITH SCHEMA EVOLUTION: Spark's
      // ResolveMergeIntoSchemaEvolution diffs the source schema
      // against ours, applies the AddColumn/UpdateColumnType changes
      // through GraftCatalog.alterTable (the same diff+evolve commit
      // the Scala merge path performs), and re-resolves the target —
      // so the native SQL MERGE grows the schema in-statement exactly
      // like SnapshotTable.merge does
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION).asJava

  /** Same drift guard as the DSv1 relation: an unpinned table loaded
    * before a schema-evolving commit must not serve rows disagreeing
    * with the analyzed schema.
    */
  private[catalog] def guardSchemaDrift(): Unit = {
    def shape(s: StructType) = s.fields.toSeq.map(f => (f.name, f.dataType))
    require(pinned.nonEmpty || shape(table.schemaAt(None)) == shape(schema),
      s"snapshot table ${table.root} evolved its schema since this " +
        "statement was analyzed — re-run the statement to pick up the " +
        "new schema")
  }

  private def requireWritable(op: String): Unit =
    require(pinned.isEmpty,
      s"cannot $op a time-travel (VERSION/TIMESTAMP AS OF) table")

  // ---------------------------------------------------------------- read

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    scanBuilderAt(pinned, options)

  /** Scan builder pinned to `version` (None = published head): the
    * default read path passes the table's own pin; a row-level
    * operation ([[GraftRowLevelOperation]]) passes ITS captured base
    * version so scan and commit can never observe different file sets.
    */
  private[catalog] def scanBuilderAt(version: Option[Long],
      options: CaseInsensitiveStringMap =
        CaseInsensitiveStringMap.empty()): ScanBuilder =
    new ScanBuilder with SupportsPushDownFilters
        with SupportsPushDownRequiredColumns
        with org.apache.spark.sql.connector.read.SupportsPushDownLimit
        with org.apache.spark.sql.connector.read.SupportsPushDownTopN {
      private var filters: Array[Filter] = Array.empty
      private var required: StructType = schema
      private var limit: Option[Int] = None
      private var topn: Option[GraftTopN] = None

      /** Skip-only pruning: every filter is also returned as residual
        * so Catalyst re-applies it exactly — manifest pruning can never
        * change results, only skip files.
        */
      override def pushFilters(fs: Array[Filter]): Array[Filter] = {
        filters = fs; fs
      }
      override def pushedFilters(): Array[Filter] = filters

      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema

      /** LIMIT reaches the scan as a planning hint: the native batch
        * scan keeps only a prefix of files guaranteed to hold `l` live
        * rows ([[GraftBatchScan]] — a 100 TB `LIMIT 100` plans one
        * split instead of the whole table). Partial contract
        * (`isPartiallyPushed` stays true): Spark re-applies the limit
        * above, so over-planning is the only allowed error direction.
        */
      override def pushLimit(l: Int): Boolean = { limit = Some(l); true }

      /** ORDER BY + LIMIT reaches the scan as a planning hint too: the
        * native batch scan drops files that cannot hold a top-k row by
        * a manifest min/max threshold argument
        * ([[GraftBatchScan.topnPrune]] — a 100 TB `ORDER BY ts DESC
        * LIMIT 100` over a time-clustered table plans one file).
        * Pruning keys on the FIRST sort key only, which is sound for
        * any suffix; accepted only when that key is a bare top-level
        * column of a threshold-orderable type. Partial contract:
        * Spark keeps its Sort+Limit above, so over-planning is the
        * only allowed error direction.
        */
      override def pushTopN(
          orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
          l: Int): Boolean = {
        import org.apache.spark.sql.connector.expressions.{NamedReference, NullOrdering, SortDirection}
        val t = orders.headOption.flatMap { o =>
          o.expression() match {
            case nr: NamedReference if nr.fieldNames().length == 1 =>
              val n = nr.fieldNames()(0)
              schema.fields.find(_.name == n)
                .filter(f => GraftBatchScan.topnOrderable(f.dataType))
                .map(f => GraftTopN(n, f.dataType,
                  o.direction() == SortDirection.DESCENDING,
                  o.nullOrdering() == NullOrdering.NULLS_FIRST, l))
            case _ => None
          }
        }
        t.foreach(v => topn = Some(v))
        t.isDefined
      }
      override def isPartiallyPushed(): Boolean = true

      override def build(): Scan = {
        // native batch path first: a bucket-partitioned snapshot with
        // no read-time resolution work reports KeyGroupedPartitioning
        // and joins co-bucketed tables WITHOUT a shuffle (SPJ) — see
        // GraftBatchScan for the eligibility contract and fallback
        val snap = version.map(table.snapshotAt)
          .getOrElse(table.publishedSnapshot())
        GraftBatchScan.eligible(table, snap, schema, required) match {
          case Some(bucket) =>
            return new GraftBatchScan(table, snap, required, filters,
              bucket, limit, topn, Some(() => microBatchStream()))
          case None => ()
        }
        v1Scan()
      }

      /** `spark.readStream.table(…)` lands here through either scan:
        * an appends-only micro-batch tail of the table, planned from
        * the manifests ([[graft.streaming.GraftTableStream]]). Batch
        * eligibility (MoR state, drift) is irrelevant to the tail —
        * it reads only files APPENDED after the stream starts.
        */
      private def microBatchStream()
          : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
        require(version.isEmpty,
          "cannot stream a time-travel (VERSION/TIMESTAMP AS OF) table")
        // the Delta-CDF option spelling, redirected: a scan option
        // cannot widen THIS table's analyzed schema with _change_type,
        // so the change feed lives on its own table ident
        require(!options.getBoolean("readChangeFeed", false),
          "readChangeFeed cannot add _change_type to this table's " +
            "analyzed schema — read the change-feed TABLE instead: " +
            s"spark.readStream.table(\"${GraftV2Table.changesName(ident)}\")")
        val from = Option(options.get("streamFrom")).map {
          case "earliest" => 1L
          case v => scala.util.Try(v.toLong).getOrElse(sys.error(
            s"streamFrom must be a version number or 'earliest', got '$v'"))
        }
        def posLong(key: String): Option[Long] =
          Option(options.get(key)).map { v =>
            val n = scala.util.Try(v.toLong).getOrElse(
              sys.error(s"$key must be a positive number, got '$v'"))
            require(n >= 1, s"$key must be >= 1, got $n")
            n
          }
        new graft.streaming.GraftTableStream(table, schema, required,
          filters.toIndexedSeq, from,
          options.getBoolean("skipNonAppends", false),
          posLong("maxVersionsPerTrigger"),
          posLong("maxFilesPerTrigger").map { n =>
            // .toInt on a > Int.MaxValue value would wrap negative and
            // silently degrade admission to one version per trigger
            require(n <= Int.MaxValue,
              s"maxFilesPerTrigger must fit in an Int, got $n")
            n.toInt
          })
      }

      private def v1Scan(): Scan = new V1Scan
          with org.apache.spark.sql.connector.read.SupportsReportStatistics
          with GraftExactRows {
        override def readSchema(): StructType = required

        /** Exact metadata row count for [[GraftExactRows]] consumers —
          * None under pushed limit/TopN (the scan returns a prefix) or
          * whenever [[SnapshotTable.exactRowCount]] cannot prove it.
          */
        override def exactRowCount: Option[Long] =
          if (limit.isDefined || topn.isDefined) None
          else table.exactRowCount(version, filters.toIndexedSeq)

        override def toMicroBatchStream(checkpointLocation: String)
            : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
          microBatchStream()

        /** Post-pushdown, manifest-pruned estimate: row count is exact
          * per surviving file (minus fully-covered delete vectors),
          * width is the REQUIRED projection's `defaultSize` — so a
          * filtered dimension read of a huge table reports the pruned
          * size and Catalyst auto-broadcasts it, the decision stock
          * Spark can never make when a relation defaults to
          * `defaultSizeInBytes` (= never broadcast). Estimates only
          * round up: partially-covered vectors and equality deletes
          * are not subtracted.
          */
        override def estimateStatistics()
            : org.apache.spark.sql.connector.read.Statistics = {
          val rows = table.scanEstimate(version, filters.toIndexedSeq)
          val width = math.max(1, required.defaultSize)
          new org.apache.spark.sql.connector.read.Statistics {
            override def sizeInBytes(): java.util.OptionalLong =
              java.util.OptionalLong.of(rows * width)
            override def numRows(): java.util.OptionalLong =
              java.util.OptionalLong.of(rows)
          }
        }

        override def toV1TableScan[T <: BaseRelation with TableScan](
            context: SQLContext): T =
          new GraftV2ScanRelation(context, GraftV2Table.this, version,
            filters, required).asInstanceOf[T]
      }
    }

  // ---------------------------------------------- row-level operations

  /** Row identity for the native delta operations: the data file URI
    * and row ordinal, served by the position-aware snapshot read (the
    * same `_metadata` plumbing the Scala-API vector paths use).
    * Non-nullable by construction — Spark refuses nullable row IDs.
    */
  override def metadataColumns(): Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name: String = GraftV2Table.MetaFileCol
      override def dataType: DataType = StringType
      override def isNullable: Boolean = false
      override def comment: String =
        "data file URI of the row (graft row-level operations)"
    },
    new MetadataColumn {
      override def name: String = GraftV2Table.MetaPosCol
      override def dataType: DataType = LongType
      override def isNullable: Boolean = false
      override def comment: String = "row ordinal within the data file"
    })

  /** Native `SupportsRowLevelOperations`: Spark's analyzer rewrites
    * DELETE/UPDATE/MERGE over this table onto the DELTA operation
    * ([[GraftRowLevelOperation]] — merge-on-read delete vectors plus
    * appended row images). Pushable DELETEs still shortcut through
    * [[deleteWhere]] (the optimizer's metadata-delete rule), keeping
    * the `graft.delete.mode` routing for the common predicate shapes.
    */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder = {
    requireWritable(s"${info.command} on")
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation =
        new GraftRowLevelOperation(GraftV2Table.this, info.command)
    }
  }

  // --------------------------------------------------------------- write

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate with SupportsOverwrite
        with SupportsDynamicOverwrite {
      requireWritable("write to")
      // append | overwrite | dynamic | where
      private var mode: String = "append"
      private var cond: Option[org.apache.spark.sql.Column] = None

      override def truncate(): WriteBuilder = { mode = "overwrite"; this }

      /** Filter overwrite (SQL `INSERT INTO … REPLACE WHERE pred` /
        * `df.writeTo(t).overwrite(cond)`): an empty/always-true filter
        * set is the whole-table overwrite; anything else becomes ONE
        * atomic delete-matching-plus-append commit
        * ([[SnapshotTable.overwriteWhere]]). Conditions must reference
        * top-level columns — v1 filters render nested struct fields as
        * dotted names that would bind to nonexistent flat columns.
        */
      override def overwrite(fs: Array[Filter]): WriteBuilder = {
        if (fs.isEmpty || fs.forall(_.isInstanceOf[AlwaysTrue])) {
          mode = "overwrite"
        } else {
          val cols = fs.toIndexedSeq.map { f =>
            require(f.references.forall(schema.fieldNames.contains),
              s"REPLACE WHERE condition $f must reference top-level " +
                "columns only")
            GraftV2Table.filterToColumn(f).getOrElse(sys.error(
              s"REPLACE WHERE condition $f has no column form"))
          }
          cond = Some(cols.reduce(_ && _))
          mode = "where"
        }
        this
      }

      override def overwriteDynamicPartitions(): WriteBuilder = {
        mode = "dynamic"; this
      }

      override def build(): Write = new V1Write {
        override def toInsertableRelation(): InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              mode match {
                case "overwrite" => table.overwrite(data)
                case "dynamic" => table.overwritePartitions(data)
                case "where" => table.overwriteWhere(cond.get, data)
                case _ => table.append(data)
              }
              ()
            }
          }

        /** `df.writeStream.toTable(…)` — executor-parallel exactly-
          * once epoch appends ([[GraftStreamingWrite]]); Append mode
          * only (keyed upserts are the format sink's `keys` option,
          * and Complete would be a per-epoch overwrite).
          */
        override def toStreaming: org.apache.spark.sql.connector.write
            .streaming.StreamingWrite = {
          require(mode == "append",
            "streaming writes into a graft table append — use " +
              "outputMode(Append); keyed CDC upserts go through " +
              "writeStream.format(\"graft\").option(\"keys\", …)")
          val maintainEvery = Option(info.options().get("maintainEvery"))
            .map { v =>
              val n = scala.util.Try(v.toInt).getOrElse(sys.error(
                s"maintainEvery must be a positive number, got '$v'"))
              require(n >= 1, s"maintainEvery must be >= 1, got $n")
              n
            }
          new GraftStreamingWrite(table, info.schema(), info.queryId(),
            maintainEvery)
        }
      }
    }

  // -------------------------------------------------------------- delete

  /** Native v2 `DELETE FROM`: any predicate whose v1-filter form
    * round-trips to a Column runs as the manifest-pruned COW delete.
    * `canDeleteWhere` is generous because [[SnapshotTable.delete]]
    * handles ARBITRARY predicates by rewriting matched files — the only
    * shapes refused are those with no `sources.Filter` column form at
    * all (those fall to the DML resolution rule instead).
    */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(f => GraftV2Table.filterToColumn(f).isDefined &&
      // v1 filters render nested struct fields as DOTTED names, which
      // filterToColumn would backtick into a (nonexistent) flat column
      // — refuse those here; the DML resolution rule lowers them with
      // real nested references instead
      f.references.forall(schema.fieldNames.contains))

  /** The Iceberg `write.delete.mode` knob: `copy-on-write` (default —
    * rewrite hit files), `merge-on-read` (commit positional delete
    * vectors; KB-sized commits, reads anti-join until compaction), or
    * `equality` (VERDICT r14 #7): a KEY-predicate DELETE commits an
    * Iceberg-v2 equality-delete file of the key tuples — O(keys)
    * bytes with ZERO scan of the target at any table size (positional
    * modes must at least open candidate files to find ordinals).
    * Non-key predicates under `equality` degrade to positional
    * vectors via [[SnapshotTable.deleteRouted]].
    */
  override def deleteWhere(filters: Array[Filter]): Unit = {
    requireWritable("DELETE FROM")
    if (table.publishedSnapshot().properties
        .get("graft.delete.mode").contains("equality")) {
      GraftV2Table.equalityDeleteKeys(schema, filters) match {
        case Some((cols, tuples)) =>
          val spark = table.session
          val keySchema = org.apache.spark.sql.types.StructType(
            cols.map(c => schema(c)))
          val rows = new java.util.ArrayList[Row](tuples.size)
          tuples.foreach(t => rows.add(Row.fromSeq(t)))
          table.deleteByKeys(spark.createDataFrame(rows, keySchema), cols)
          return
        case None => () // not key-shaped: positional fallback below
      }
    }
    val cond = filters.toIndexedSeq
      .flatMap(f => GraftV2Table.filterToColumn(f))
      .reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    table.deleteRouted(cond)
    ()
  }

  override def truncateTable(): Boolean = {
    requireWritable("TRUNCATE")
    table.overwrite(table.session.createDataFrame(
      new java.util.ArrayList[Row](), table.schemaAt(None)))
    true
  }
}

/** One metadata table (`graft.db.\`t#history\`` / `#partitions` /
  * `#files` / `#tags`) as a read-only v2 table — resolved fresh per
  * scan so it always describes the CURRENT snapshot; metadata-sized by
  * construction.
  */
final class GraftMetadataV2Table(
    table: SnapshotTable,
    ident: String,
    kind: String) extends Table with SupportsRead {

  // resolved ONCE per loadTable (i.e. per statement): schema() is
  // called repeatedly during analysis and each df build re-reads the
  // version log — freshness is per-statement either way, since the
  // catalog loads a new instance for every statement
  private lazy val frame: DataFrame = kind match {
    case "history" => table.historyDf()
    case "partitions" => table.partitionsDf()
    case "files" => table.filesDf()
    case "tags" | "refs" => table.tagsDf()
    case "branches" => table.branchesDf()
    case other => sys.error(s"unknown graft metadata table '$other' — " +
      "one of: history, partitions, files, tags, branches, changes")
  }

  override def name(): String = ident
  override def schema: StructType = frame.schema
  override def partitioning(): Array[Transform] = Array.empty
  override def properties(): java.util.Map[String, String] =
    java.util.Collections.emptyMap()
  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = schema
        override def toV1TableScan[T <: BaseRelation with TableScan](
            context: SQLContext): T =
          new BaseRelation with TableScan {
            override val sqlContext: SQLContext = context
            override def schema: StructType = frame.schema
            override def buildScan(): RDD[Row] = frame.rdd
          }.asInstanceOf[T]
      }
    }
}

/** The CDC change feed as a catalog table (`graft.db.\`t#changes\``):
  * `_change_type ∈ {insert, delete}` plus the table columns (updates
  * surface as delete+insert pairs — the Delta CDF shape the V1
  * `changesFrom` source serves). With `.option("updateImages",
  * "true")` — or table property `graft.cdc.update-images=true` for
  * SQL-only consumers — the feed is served PER-COMMIT with
  * UPDATE/MERGE-matched rewrites labeled `update_preimage` /
  * `update_postimage` ([[SnapshotTable.changesCdf]]). Readable BOTH
  * ways:
  *
  *  - batch: the net changelog over `(changesFrom, changesTo]` —
  *    defaults to the FULL history (earliest → current);
  *  - streaming (`spark.readStream.table`): a micro-batch change feed
  *    ([[graft.streaming.GraftChangesTableStream]]) — row-changing
  *    commits stream as change rows where the appends-only tail
  *    fails. Default streams changes committed AFTER query start;
  *    `.option("changesFrom", v | "earliest")` backfills.
  *
  * This is where the r15 tail's `skipNonAppends` dilemma resolves:
  * skip loses retractions, fail stops the pipeline — the change feed
  * represents them.
  */
final class GraftChangesV2Table(
    table: SnapshotTable,
    ident: String) extends Table with SupportsRead {

  override def name(): String = ident

  override val schema: StructType =
    graft.streaming.GraftChangesSource.changeSchema(table.schemaAt(None))

  override def partitioning(): Array[Transform] = Array.empty
  override def properties(): java.util.Map[String, String] =
    java.util.Collections.emptyMap()
  override def capabilities(): JSet[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  /** `changesFrom`/`changesTo` bound resolution, V1-source parity:
    * a version number, `earliest`, or a TAG name — plus the
    * `<bound>Timestamp` variants (epoch millis or ISO-8601, resolved
    * via `versionAsOf`).
    */
  private def versionOpt(options: CaseInsensitiveStringMap,
      key: String): Option[Long] = {
    require(!(options.containsKey(key) &&
        options.containsKey(key + "Timestamp")),
      s"pass $key OR ${key}Timestamp, not both")
    Option(options.get(key)).map {
      case "earliest" => table.log.versions().head
      case v => scala.util.Try(v.toLong).getOrElse(
        table.tags().getOrElse(v, sys.error(
          s"$key: '$v' is neither a version number, 'earliest', nor a " +
            s"tag; tags: ${table.tags().keys.mkString(", ")}")))
    }.orElse(Option(options.get(key + "Timestamp")).map { v =>
      val ms = scala.util.Try(v.toLong).getOrElse(
        scala.util.Try(java.time.Instant.parse(v).toEpochMilli).getOrElse(
          sys.error(s"${key}Timestamp must be epoch millis or ISO-8601, " +
            s"got '$v'")))
      table.versionAsOf(ms)
    })
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required: StructType = schema

      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema

      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = required

        override def toMicroBatchStream(checkpointLocation: String)
            : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
          val maxV = Option(options.get("maxVersionsPerTrigger")).map { v =>
            val n = scala.util.Try(v.toLong).getOrElse(sys.error(
              s"maxVersionsPerTrigger must be a positive number, got '$v'"))
            require(n >= 1, s"maxVersionsPerTrigger must be >= 1, got $n")
            n
          }
          new graft.streaming.GraftChangesTableStream(table, schema,
            required, checkpointLocation, versionOpt(options, "changesFrom"),
            maxV,
            updateImages = Option(options.get("updateImages"))
              .orElse(table.publishedSnapshot().properties
                .get("graft.cdc.update-images"))
              .exists(_.equalsIgnoreCase("true")))
        }

        override def toV1TableScan[T <: BaseRelation with TableScan](
            context: SQLContext): T =
          new BaseRelation with TableScan {
            override val sqlContext: SQLContext = context
            override def schema: StructType = required
            override def buildScan(): RDD[Row] = {
              val from = versionOpt(options, "changesFrom")
                .getOrElse(table.log.versions().head)
              val to = versionOpt(options, "changesTo")
                .getOrElse(table.currentVersion())
              // opt-in per-commit labeled feed (update_preimage /
              // update_postimage): read option wins; the table
              // property sets a default for SQL-only consumers
              val cdf = Option(options.get("updateImages"))
                .orElse(table.publishedSnapshot().properties
                  .get("graft.cdc.update-images"))
                .exists(_.equalsIgnoreCase("true"))
              val changes =
                if (cdf) table.changesCdf(from, to)
                else table.changes(from, to)
              changes.select(required.fieldNames.toIndexedSeq.map(c =>
                org.apache.spark.sql.functions.col(
                  SnapshotTable.quoted(c))): _*).rdd
            }
          }.asInstanceOf[T]
      }
    }
}

object GraftV2Table {

  /** Row-identity metadata columns the native row-level operations key
    * on (Iceberg's `_file`/`_pos` equivalents — prefixed to dodge user
    * column collisions; `SupportsMetadataColumns` hides shadowed names
    * anyway).
    */
  /** `graft.db.t` → ``graft.db.`t#changes` `` (error-message helper). */
  private[catalog] def changesName(ident: String): String =
    ident.split('.').toSeq match {
      case parts :+ last => (parts :+ s"`$last#changes`").mkString(".")
      case _ => s"`$ident#changes`"
    }

  private[catalog] val MetaFileCol = "_graft_file"
  private[catalog] val MetaPosCol = "_graft_pos"
  private[catalog] val MetaCols: Set[String] = Set(MetaFileCol, MetaPosCol)

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col, lit}
  import org.apache.spark.sql.sources._

  /** Key extraction for `graft.delete.mode=equality`: a DELETE whose
    * conjuncts are single-column equalities / IN lists over DISTINCT
    * top-level columns of simple types defines its deleted keys
    * entirely in the predicate — the key set is the conjuncts' cross
    * product, capped (10k tuples) to keep the delete file key-sized.
    * Values must be the external JVM renderings `createDataFrame`
    * accepts for the column's type (numerics/strings/booleans — ids,
    * in practice); NULLs never match `=`/`IN`, so a null value defeats
    * the shortcut rather than silently deleting the null key.
    * None = not key-shaped, caller falls back to positional vectors.
    */
  private[catalog] def equalityDeleteKeys(schema: StructType,
      filters: Array[Filter]): Option[(Seq[String], Seq[Seq[Any]])] = {
    import org.apache.spark.sql.types._
    def simple(c: String): Boolean =
      schema.fields.find(_.name == c).map(_.dataType).exists {
        case ByteType | ShortType | IntegerType | LongType | FloatType |
             DoubleType | StringType | BooleanType => true
        case _: DecimalType => true
        case _ => false
      }
    val parts: Seq[Option[(String, Seq[Any])]] = filters.toSeq.map {
      case EqualTo(c, v) if v != null && simple(c) => Some((c, Seq(v)))
      case In(c, vs) if vs.nonEmpty && !vs.contains(null) && simple(c) =>
        Some((c, vs.toSeq))
      case _ => None
    }
    if (parts.isEmpty || parts.exists(_.isEmpty)) return None
    val byCol = parts.flatten
    val cols = byCol.map(_._1)
    if (cols.distinct.size != cols.size) return None
    if (byCol.map(_._2.size.toLong).product > 10000L) return None
    val tuples = byCol.foldLeft(Seq(Seq.empty[Any])) {
      case (acc, (_, vs)) => acc.flatMap(t => vs.map(v => t :+ v))
    }
    Some((cols, tuples))
  }

  /** `sources.Filter` → `Column`, the inverse of the pushdown
    * translation, for lowering v2 `deleteWhere` filters onto the
    * snapshot layer's predicate API. None = no column form (caller
    * reports the delete unsupported and Spark falls back).
    */
  private[graft] def filterToColumn(f: Filter): Option[Column] = {
    def c(n: String) = col(SnapshotTable.quoted(n))
    f match {
      case EqualTo(a, v) => Some(c(a) === lit(v))
      case EqualNullSafe(a, v) => Some(c(a) <=> lit(v))
      case GreaterThan(a, v) => Some(c(a) > lit(v))
      case GreaterThanOrEqual(a, v) => Some(c(a) >= lit(v))
      case LessThan(a, v) => Some(c(a) < lit(v))
      case LessThanOrEqual(a, v) => Some(c(a) <= lit(v))
      case In(a, vs) => Some(c(a).isInCollection(vs.toIndexedSeq))
      case IsNull(a) => Some(c(a).isNull)
      case IsNotNull(a) => Some(c(a).isNotNull)
      case StringStartsWith(a, v) => Some(c(a).startsWith(v))
      case StringEndsWith(a, v) => Some(c(a).endsWith(v))
      case StringContains(a, v) => Some(c(a).contains(v))
      case And(l, r) =>
        for { lc <- filterToColumn(l); rc <- filterToColumn(r) } yield lc && rc
      case Or(l, r) =>
        for { lc <- filterToColumn(l); rc <- filterToColumn(r) } yield lc || rc
      case Not(x) => filterToColumn(x).map(!_)
      case _: AlwaysTrue => Some(lit(true))
      case _: AlwaysFalse => Some(lit(false))
      case _ => None
    }
  }
}

/** The `V1Scan` landing relation: Spark's v2 pushdown has already
  * settled the final filter and projection set, so `buildScan` is one
  * manifest-pruned snapshot read projected to the required columns.
  * Filters re-apply above (skip-only contract), merge-on-read deletes
  * and field-id evolution apply inside `scanFor` as on every path.
  * When the projection requests the row-identity METADATA columns (a
  * row-level operation's scan), the snapshot read runs position-aware
  * and surfaces (file URI, row ordinal) under the metadata names.
  */
private final class GraftV2ScanRelation(
    override val sqlContext: SQLContext,
    v2: GraftV2Table,
    version: Option[Long],
    filters: Array[Filter],
    required: StructType) extends BaseRelation with TableScan {

  override def schema: StructType = required

  override def buildScan(): RDD[Row] = {
    // a row-level scan is pinned to its operation's base version —
    // schema drift is then checked by the commit, not the scan
    if (version.isEmpty) v2.guardSchemaDrift()
    val needsPos = required.fieldNames.exists(
      GraftV2Table.MetaCols.contains)
    val df0 = v2.table.scanFor(version, filters.toIndexedSeq,
      withPos = needsPos)
    val df =
      if (!needsPos) df0
      else df0
        .withColumnRenamed(SnapshotTable.DvFileCol, GraftV2Table.MetaFileCol)
        .withColumnRenamed(SnapshotTable.DvPosCol, GraftV2Table.MetaPosCol)
    // Catalyst may prune NESTED fields too (SELECT meta.boost arrives
    // as meta: struct<boost>): the declared schema must match the rows
    // byte-for-byte, so conform each struct column to the pruned shape
    // by NAME — a bare top-level select would return the full struct
    // under a narrower declared type and fail row encoding
    val projected =
      if (required.isEmpty) df.select()
      else graft.schema.SchemaOps.alignTo(
        df.select(required.fieldNames.toIndexedSeq.map(c =>
          org.apache.spark.sql.functions.col(SnapshotTable.quoted(c))): _*),
        required)
    projected.rdd
  }
}
