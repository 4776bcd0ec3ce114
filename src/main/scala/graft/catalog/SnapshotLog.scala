package graft.catalog

import java.nio.file.{Files, Paths}

import scala.util.control.NonFatal

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.json4s._
import org.json4s.jackson.JsonMethods

import org.apache.spark.sql.types.{DataType, StructType}

/** Per-file, per-column statistics recorded in the manifest at write
  * time — the Iceberg data-file stats (`lower_bounds` / `upper_bounds`
  * / `null_value_counts`) that make FILE skipping work on any column,
  * not just the partition value. Values are stored as strings in a
  * type-dependent canonical form (see [[FileStats]]): numerics render
  * decimally, timestamps as epoch micros (time-zone-free), dates as
  * `yyyy-MM-dd`, strings as themselves with `min` truncated to a
  * 64-char PREFIX (a prefix is still a valid lower bound) and `max`
  * dropped entirely when longer than 64 chars (`None` = unbounded —
  * never an invalid truncated upper bound). `min`/`max` are `None` when
  * every value in the file is NULL or the bound was dropped; pruning
  * treats a missing bound as ±∞.
  */
final case class ColStats(min: Option[String], max: Option[String],
    nullCount: Long, bloom: Option[String] = None)

/** One immutable data file referenced by a snapshot. `path` is relative
  * to the table root (the table directory is relocatable as a unit);
  * `partition` is the hidden-partition value the file belongs to
  * (`None` for unpartitioned tables AND for the null partition — rows
  * whose partition source column is NULL); `rows` is the file's row
  * count, collected at write time for compaction planning and commit
  * summaries; `stats` holds per-column bounds for stats-eligible
  * columns (empty for manifests written before the stats format — a
  * missing entry simply disables skipping for that file); `cols` is the
  * file's WRITE SCHEMA as ordered (column-name-as-written, field-id)
  * pairs — the Iceberg field-id indirection that makes column RENAME
  * and DROP metadata-only: the read path matches files to the current
  * schema by id, never by name (empty = legacy entry, names map
  * positionally to the snapshot schema). `stats` keys are write-time
  * names; pruning translates them through `cols`.
  */
final case class DataFileEntry(path: String, partition: Option[String],
    rows: Long, stats: Map[String, ColStats] = Map.empty,
    cols: Seq[(String, Int)] = Seq.empty)

/** Hidden-partition spec, Iceberg-style (the reference's
  * `month(created_at)`, `/root/reference/src/jobs/job.py:125` +
  * `spark_utils.py:163`): the partition value is DERIVED from a source
  * data column at write time and recorded in the manifest per file — it
  * is never a data column, so the logical schema matches the
  * reference's Iceberg table exactly (closing SURVEY §7.0's visible
  * derived-column substitution for tables managed through this layer).
  *
  * Transforms: `month` (yyyy-MM of a timestamp column) and `identity`.
  */
final case class PartitionSpec(source: String, transform: String) {
  require(transform == "month" || transform == "identity",
    s"unsupported partition transform: $transform")
}

/** One committed table version: the full file list plus the schema that
  * was current when it committed (so time travel reads old data with
  * its contemporary schema). `parent` forms the history chain;
  * `properties` are the reference's TBLPROPERTIES carried forward
  * (`vacuum_min_snapshots_to_keep` et al. are OPERATIONAL here — see
  * [[SnapshotTable.maintain]] — not inert like the Hive-catalog path).
  */
final case class Snapshot(
    version: Long,
    parent: Option[Long],
    operation: String,
    timestampMs: Long,
    schema: StructType,
    spec: Option[PartitionSpec],
    properties: Map[String, String],
    files: Seq[DataFileEntry],
    fieldIds: Seq[(String, Int)] = Seq.empty,
    nextFieldId: Int = 0) {

  /** Distinct partition values present (None = null/unpartitioned). */
  def partitions: Seq[Option[String]] = files.map(_.partition).distinct

  /** Current (column name, stable field id) pairs, schema-ordered.
    * Field ids are the rename/drop indirection: a column keeps its id
    * across renames, and a DROPPED name re-added later gets a FRESH id,
    * so old files' same-named data never resurrects (Iceberg schema-
    * evolution semantics). Legacy manifests (no recorded ids) map
    * positionally.
    */
  def ids: Seq[(String, Int)] =
    if (fieldIds.nonEmpty || schema.isEmpty) fieldIds
    else schema.fieldNames.toIndexedSeq.zipWithIndex

  /** The next free field id (allocator is monotonic per table). */
  def nextIds: Int =
    math.max(nextFieldId, ids.map(_._2).foldLeft(-1)(math.max) + 1)
}

/** A concurrent writer won the race for the version this commit was
  * based on, and the operation cannot be rebased safely (read-modify-
  * write ops like upsert validate against their read snapshot — the
  * caller must re-run on the new current state).
  */
final class SnapshotConflictException(msg: String)
  extends RuntimeException(msg)

/** Version-file snapshot log — the atomic-commit primitive the
  * reference gets from Iceberg (`table_type=ICEBERG`,
  * `/root/reference/src/utils/spark/spark_utils.py:153-173`), rebuilt
  * on plain filesystem semantics in the style of Iceberg's Hadoop
  * tables: the log directory `<root>/_graft_log/` holds one JSON
  * manifest per committed version (`snap-%011d.json`), and COMMITTING
  * version v+1 is a single create-exclusive of that one file. Readers
  * list the log directory and take the highest committed version;
  * writers that lose the create-exclusive race get a clean conflict
  * signal and rebase or abort.
  *
  * Atomicity: on `file://` the create goes through NIO
  * `CREATE_NEW` (O_CREAT|O_EXCL — kernel-atomic); on HDFS,
  * `FileSystem.create(path, overwrite=false)` is atomic in the
  * NameNode. Object stores without atomic create-if-absent (plain S3)
  * need a catalog lock service for the pointer, exactly as Iceberg's
  * HadoopTables documentation states — the log format itself is
  * unchanged, only `tryCommit` would swap in a conditional-put.
  */
final class SnapshotLog(val root: Path, conf: Configuration) {

  private val fs: FileSystem = root.getFileSystem(conf)
  private val logDir = new Path(root, SnapshotLog.LogDirName)

  private def snapPath(v: Long): Path =
    new Path(logDir, f"snap-$v%011d.json")

  def exists(): Boolean = fs.exists(logDir)

  /** Highest committed version, or None for a not-yet-created table.
    * One directory listing — no pointer file to keep consistent, so a
    * crashed writer can never leave the pointer behind the log.
    */
  def currentVersion(): Option[Long] = {
    if (!fs.exists(logDir)) return None
    val vs = fs.listStatus(logDir).iterator.map(_.getPath.getName).collect {
      case SnapshotLog.SnapName(v) => v.toLong
    }.toSeq
    if (vs.isEmpty) None else Some(vs.max)
  }

  def read(version: Long): Snapshot = {
    val in = fs.open(snapPath(version))
    val bytes =
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      } finally in.close()
    SnapshotLog.fromJson(new String(bytes, "UTF-8"))
  }

  def current(): Option[Snapshot] = currentVersion().map(read)

  /** All committed versions, ascending (expired ones are gone). */
  def versions(): Seq[Long] = {
    if (!fs.exists(logDir)) return Seq.empty
    fs.listStatus(logDir).iterator.map(_.getPath.getName).collect {
      case SnapshotLog.SnapName(v) => v.toLong
    }.toSeq.sorted
  }

  /** Atomically commit `s` as version `s.version`. Returns false when a
    * concurrent writer committed that version first (caller rebases);
    * write errors PROPAGATE (they are failures, not lost races).
    *
    * The manifest content is fully written to a temp file FIRST and
    * only then published under the version name, so a crash or write
    * error can never leave a partial `snap-*.json` as the highest
    * committed version (the log is never observed half-written):
    *   - local fs: `Files.createLink` — link(2) is kernel-atomic and
    *     fails with FileAlreadyExistsException when the loser of a race
    *     tries to publish (a plain rename would silently REPLACE the
    *     winner's manifest on POSIX);
    *   - HDFS: `fs.rename` — atomic in the NameNode, returns false when
    *     the target exists.
    * Routing is by the FILESYSTEM's scheme, not the path's: a
    * scheme-less root on a cluster with `fs.defaultFS=hdfs://…` must
    * commit through HDFS, not the driver's local disk. A crashed
    * writer can leave only an orphaned temp file (`.tmp-*`, never
    * matching the snapshot-name pattern), cleaned age-guarded by
    * `SnapshotTable.removeOrphanFiles`.
    */
  def tryCommit(s: Snapshot): Boolean = {
    if (!fs.exists(logDir)) fs.mkdirs(logDir)
    val target = snapPath(s.version)
    val json = SnapshotLog.toJson(s).getBytes("UTF-8")
    if (fs.getScheme == "file") {
      val dirPath = Paths.get(fs.makeQualified(logDir).toUri.getPath)
      val tmp = Files.createTempFile(dirPath, s".tmp-${s.version}-", ".json")
      try {
        Files.write(tmp, json)
        try {
          Files.createLink(
            Paths.get(fs.makeQualified(target).toUri.getPath), tmp)
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      } finally { Files.deleteIfExists(tmp); () }
    } else {
      val tmp = new Path(logDir,
        s".tmp-${s.version}-${java.util.UUID.randomUUID().toString.take(8)}.json")
      val os = fs.create(tmp, false)
      try os.write(json) finally os.close()
      try {
        val published = fs.rename(tmp, target)
        if (!published) fs.delete(tmp, false)
        published
      } catch {
        case NonFatal(e) => fs.delete(tmp, false); throw e
      }
    }
  }

  /** Delete the manifest of an expired version (data files are handled
    * by [[SnapshotTable.expireSnapshots]]).
    */
  def delete(version: Long): Unit = { fs.delete(snapPath(version), false); () }
}

object SnapshotLog {

  val LogDirName = "_graft_log"
  val DataDirName = "data"

  private val SnapName = raw"snap-(\d+)\.json".r

  /** Manifest codec — json4s AST in/out (jackson backend from Spark's
    * own jars), schema embedded as Spark's canonical `StructType.json`.
    * Manual field extraction: no reflective `Extraction` (fragile
    * across json4s versions), every field explicit.
    */
  def toJson(s: Snapshot): String = {
    val files = JArray(s.files.toList.map { f =>
      val base = List(
        "path" -> (JString(f.path): JValue),
        "partition" -> (f.partition.map(JString(_)).getOrElse(JNull): JValue),
        "rows" -> (JLong(f.rows): JValue))
      val stats =
        if (f.stats.isEmpty) Nil
        else List("stats" -> (JObject(f.stats.toList.sortBy(_._1).map {
          case (c, st) => c -> (JObject(List(
            "min" -> (st.min.map(JString(_)).getOrElse(JNull): JValue),
            "max" -> (st.max.map(JString(_)).getOrElse(JNull): JValue),
            "nulls" -> (JLong(st.nullCount): JValue)) ++
            st.bloom.map(b => "bloom" -> (JString(b): JValue)).toList): JValue)
        }): JValue))
      val cols =
        if (f.cols.isEmpty) Nil
        else List("cols" -> (JArray(f.cols.toList.map { case (n, id) =>
          JArray(List(JString(n), JInt(id))) }): JValue))
      JObject(base ++ stats ++ cols)
    })
    val spec = s.spec match {
      case Some(p) => JObject(List("source" -> JString(p.source),
        "transform" -> JString(p.transform)))
      case None => JNull
    }
    val obj = JObject(List(
      "formatVersion" -> JInt(1),
      "version" -> JLong(s.version),
      "parent" -> s.parent.map(JLong(_)).getOrElse(JNull),
      "operation" -> JString(s.operation),
      "timestampMs" -> JLong(s.timestampMs),
      "schema" -> JString(s.schema.json),
      "partitionSpec" -> spec,
      "properties" -> JObject(s.properties.toList.map {
        case (k, v) => k -> (JString(v): JValue)
      }),
      "fieldIds" -> JArray(s.fieldIds.toList.map { case (n, id) =>
        JArray(List(JString(n), JInt(id))) }),
      "nextFieldId" -> JInt(s.nextFieldId),
      "files" -> files))
    JsonMethods.compact(JsonMethods.render(obj))
  }

  def fromJson(json: String): Snapshot = {
    val j = JsonMethods.parse(json)
    def field(name: String): JValue = j \ name
    def str(v: JValue): String = v match {
      case JString(s) => s
      case other => sys.error(s"expected string, got $other")
    }
    def lng(v: JValue): Long = v match {
      case JLong(l) => l
      case JInt(i) => i.toLong
      case other => sys.error(s"expected long, got $other")
    }
    def optLong(v: JValue): Option[Long] = v match {
      case JNull | JNothing => None
      case other => Some(lng(other))
    }
    val spec = field("partitionSpec") match {
      case JNull | JNothing => None
      case o => Some(PartitionSpec(str(o \ "source"), str(o \ "transform")))
    }
    val props = field("properties") match {
      case JObject(kvs) => kvs.map { case (k, v) => k -> str(v) }.toMap
      case _ => Map.empty[String, String]
    }
    def optStr(v: JValue): Option[String] = v match {
      case JNull | JNothing => None
      case other => Some(str(other))
    }
    def pairs(v: JValue): Seq[(String, Int)] = v match {
      case JArray(items) => items.map {
        case JArray(List(n, id)) => (str(n), lng(id).toInt)
        case other => sys.error(s"expected [name, id] pair, got $other")
      }
      case _ => Seq.empty
    }
    val files = field("files") match {
      case JArray(items) => items.map { f =>
        val stats = (f \ "stats") match {
          case JObject(kvs) => kvs.map { case (c, st) =>
            c -> ColStats(optStr(st \ "min"), optStr(st \ "max"),
              lng(st \ "nulls"), optStr(st \ "bloom"))
          }.toMap
          case _ => Map.empty[String, ColStats]
        }
        DataFileEntry(str(f \ "path"), optStr(f \ "partition"),
          lng(f \ "rows"), stats, pairs(f \ "cols"))
      }
      case _ => Seq.empty
    }
    Snapshot(
      version = lng(field("version")),
      parent = optLong(field("parent")),
      operation = str(field("operation")),
      timestampMs = lng(field("timestampMs")),
      schema = DataType.fromJson(str(field("schema"))).asInstanceOf[StructType],
      spec = spec,
      properties = props,
      files = files,
      fieldIds = pairs(field("fieldIds")),
      nextFieldId = field("nextFieldId") match {
        case JNull | JNothing => 0
        case v => lng(v).toInt
      })
  }
}
