package graft

import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Regression: the driver's testdata has shipped `events.ts` both as
  * parquet TIMESTAMP (read as TimestampType) and as tz-less
  * timestamp[us] (read as TIMESTAMP_NTZ in Spark 4). Round 7's bench
  * failed `q_range_join` and `stream_sessionize` with
  * DATATYPE_MISMATCH because `unix_micros` rejects NTZ. Every
  * registry query that does timestamp arithmetic must accept BOTH
  * encodings and keep its output ts columns in the INPUT's type (the
  * oracle compare is against DuckDB reading the same parquet).
  */
class NtzRegressionSpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark
  import spark.implicits._

  /** A miniature events.parquet whose ts is TIMESTAMP_NTZ. */
  private lazy val ntzDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ntz").toString
    val t0 = LocalDateTime.of(2024, 1, 1, 0, 0, 0)
    val rows = (0 until 200).map { i =>
      // two users; a >30min gap every 50 events forces session breaks
      (i.toLong, t0.plusMinutes(i / 2 * 7L + (i / 50) * 45L),
        (i % 2).toLong, s"type${i % 3}", i * 1.5, s"""{"k":$i}""")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("testdata fixture really is TIMESTAMP_NTZ") {
    val ts = spark.read.parquet(s"$ntzDir/events.parquet").schema("ts")
    assert(ts.dataType == TimestampNTZType)
  }

  test("q_range_join runs on NTZ events and keeps the point ts NTZ") {
    val out = SparkEntry.queries("q_range_join")(spark, ntzDir)
    assert(out.schema("ts").dataType == TimestampNTZType)
    // window_start comes out of date_trunc, which always returns
    // TIMESTAMP — value-identical to the oracle under the UTC session
    // (driver-verified), so only the passthrough column's type is pinned
    assert(out.schema("window_start").dataType == TimestampType)
    assert(out.count() > 0)
  }

  test("stream_sessionize runs on NTZ events and keeps NTZ outputs") {
    val out = SparkEntry.queries("stream_sessionize")(spark, ntzDir)
    assert(out.schema("session_start").dataType == TimestampNTZType)
    assert(out.schema("session_end").dataType == TimestampNTZType)
    val sessions = out.collect()
    assert(sessions.nonEmpty)
    // the 45-minute jump every 50 events must break sessions: with 200
    // events / 2 users there are 4 runs per user
    assert(sessions.length == 8, s"got ${sessions.length} sessions")
  }

  test("snapshot manifest records NTZ bounds and prunes range scans on them") {
    import graft.catalog.SnapshotTable
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("ntzsnap")
      .resolve("t").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("ts", TimestampNTZType)))
    val t = SnapshotTable.create(spark, root, schema, None)
    // 4 files, each one contiguous day — bounds must localize them
    val df = (0L until 96L).map(i =>
      (i, LocalDateTime.of(2024, 1, 1 + (i / 24).toInt, (i % 24).toInt, 30, 0)))
      .toDF("id", "ts")
      .repartitionByRange(4, col("ts")).sortWithinPartitions("ts")
    t.append(df)
    val files = t.currentSnapshot().files
    assert(files.size == 4)
    val bounds = files.flatMap(_.stats("ts").min)
    // fixed-width wall-clock rendering, lexicographically ordered
    assert(bounds.forall(_.matches(
      """\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{6}""")), bounds.mkString(";"))
    val jan3 = LocalDateTime.of(2024, 1, 3, 0, 0, 0)
    assert(t.pruneFiles(col("ts") >= lit(jan3) &&
      col("ts") < lit(jan3.plusDays(1))).size == 1)
    // equality exactly ON a file's max bound must keep that file
    // (fixed-width rendering makes equal instants render identically)
    val lastOfDay2 = LocalDateTime.of(2024, 1, 2, 23, 30, 0)
    assert(t.pruneFiles(col("ts") === lit(lastOfDay2)).size == 1)
    assert(t.readWhere(col("ts") === lit(lastOfDay2)).count() == 1L)
    // full-scan parity: pruning never changes results
    val pred = col("ts") >= lit(jan3)
    assert(t.readWhere(pred).count() == t.read().filter(pred).count())
  }

  test("malformed NTZ bound (5-digit year) keeps the file conservatively") {
    // a year-10000 row renders a 27-char bound that sorts BELOW 4-digit
    // years lexicographically ("10000-…" < "2024-…") — the pruner must
    // treat any bound not matching the fixed-width shape as unusable,
    // never as a skip signal
    import graft.catalog.{ColStats, DataFileEntry, StatsPruner}
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("ts", TimestampNTZType)))
    val f = DataFileEntry("f.parquet", None, 2L, Map("ts" -> ColStats(
      min = Some("10000-01-01 00:00:00.000000"),
      max = Some("10000-01-02 00:00:00.000000"), nullCount = 0L)))
    val probe = LocalDateTime.of(2024, 6, 1, 0, 0, 0)
    // pre-guard, max("10000-…") < "2024-…" pruned this file although a
    // year-10000 table could also hold matching rows appended later
    assert(StatsPruner.mayMatch(f, schema,
      org.apache.spark.sql.sources.GreaterThan("ts", probe)))
    assert(StatsPruner.mayMatch(f, schema,
      org.apache.spark.sql.sources.LessThan("ts", probe)))
    assert(StatsPruner.mayMatch(f, schema,
      org.apache.spark.sql.sources.EqualTo("ts", probe)))
    // …while a well-formed bound still prunes
    val ok = f.copy(stats = Map("ts" -> ColStats(
      min = Some("2023-01-01 00:00:00.000000"),
      max = Some("2023-12-31 00:00:00.000000"), nullCount = 0L)))
    assert(!StatsPruner.mayMatch(ok, schema,
      org.apache.spark.sql.sources.GreaterThan("ts", probe)))
  }

  test("pointInInterval: NTZ and TIMESTAMP inputs produce identical pairs") {
    import graft.operators.RangeJoin
    val r = new scala.util.Random(41)
    val base = LocalDateTime.of(2024, 3, 1, 0, 0, 0)
    val pts = (1 to 300).map(i =>
      (r.nextInt(4).toLong, i.toLong, base.plusSeconds(r.nextInt(7200).toLong)))
    val ivs = (1 to 60).map { i =>
      val s = r.nextInt(7200)
      (r.nextInt(4).toLong, i.toLong, base.plusSeconds(s.toLong),
        base.plusSeconds(s + 600L))
    }
    val pNtz = pts.toDF("k", "pid", "t")
    val iNtz = ivs.toDF("k", "iid", "s", "e")
    assert(pNtz.schema("t").dataType == TimestampNTZType)
    def ltz(df: org.apache.spark.sql.DataFrame, cols: String*) =
      cols.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(TimestampType)))
    def pairs(p: org.apache.spark.sql.DataFrame, iv: org.apache.spark.sql.DataFrame) =
      RangeJoin.pointInInterval(p, iv, "k", "t", "s", "e",
          bucketUs = 10L * 60 * 1000000)
        .select("pid", "iid").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
    val ntzPairs = pairs(pNtz, iNtz)
    val ltzPairs = pairs(ltz(pNtz, "t"), ltz(iNtz, "s", "e"))
    assert(ntzPairs == ltzPairs)
    assert(ntzPairs.nonEmpty)
  }
}
