package graft

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.RunQuery
import graft.config.GraftConfig
import graft.gen.FakeData
import graft.ingest.CsvIngest

/** G1 (status-string SQL submission), H3 (validated env config), and
  * F2 (unpersist on completion) — the three small parity gaps VERDICT
  * r1 flagged.
  */
class ConfigRunQuerySpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark

  // ---------------------------------------------------------------- G1

  test("RunQuery: valid SQL returns SUCCEEDED with a result") {
    val o = RunQuery.run(spark, "SELECT 1 AS one")
    assert(o.succeeded && o.message.isEmpty)
    assert(o.result.get.collect().head.getInt(0) == 1)
    assert(RunQuery.runStatus(spark, "SELECT 1") == "SUCCEEDED")
  }

  test("RunQuery: bad SQL returns ERROR with the engine message, no throw") {
    val o = RunQuery.run(spark, "SELECT * FROM graft_no_such_table_xyz")
    assert(!o.succeeded && o.result.isEmpty)
    assert(o.message.get.contains("graft_no_such_table_xyz"))
    val status = RunQuery.runStatus(spark, "SELEKT 1")
    assert(status.startsWith("ERROR: "))
  }

  test("RunQuery: DDL executes eagerly through the contract") {
    assert(RunQuery.runStatus(spark,
      "CREATE DATABASE IF NOT EXISTS graft_rq_db") == "SUCCEEDED")
    assert(spark.catalog.databaseExists("graft_rq_db"))
    spark.sql("DROP DATABASE graft_rq_db")
  }

  // ---------------------------------------------------------------- H3

  test("GraftConfig: defaults when env is empty") {
    val cfg = GraftConfig.fromEnv(Map.empty)
    assert(cfg.sfDir == GraftConfig.DefaultSfDir)
    assert(cfg.cpus == GraftConfig.DefaultCpus)
  }

  test("GraftConfig: reads SPARK_GRAFT_* overrides") {
    val cfg = GraftConfig.fromEnv(Map(
      GraftConfig.SfDirVar -> "/data/sf1",
      GraftConfig.CpusVar -> "8"))
    assert(cfg.sfDir == "/data/sf1" && cfg.cpus == 8)
  }

  test("GraftConfig: collects every invalid var in one error") {
    val e = intercept[IllegalArgumentException] {
      GraftConfig.fromEnv(Map(
        GraftConfig.SfDirVar -> "  ",
        GraftConfig.CpusVar -> "zero"))
    }
    assert(e.getMessage.contains(GraftConfig.SfDirVar))
    assert(e.getMessage.contains(GraftConfig.CpusVar))
  }

  // ---------------------------------------------------------------- F2

  test("withIngested persists during the body and unpersists after") {
    val dir = Files.createTempDirectory("graft-f2").toString
    FakeData.generate(dir, start = 1, end = 3, records = 5, seed = 7L,
      maxOptional = 4)
    val clock = Instant.parse("2026-01-01T00:00:00Z")
    // track RDD IDS, not map sizes: the shared session's ContextCleaner
    // may concurrently release stale localCheckpoint RDDs from OTHER
    // suites, so size comparisons race — only the pins this ingest
    // creates are under test
    val before = spark.sparkContext.getPersistentRDDs.keySet
    var during = Set.empty[Int]
    val n = CsvIngest.withIngested(spark, dir, clock) { df =>
      val c = df.count() // materializes the DISK_ONLY pins
      during = spark.sparkContext.getPersistentRDDs.keySet.toSet
      assert((during -- before).nonEmpty,
        "per-file frames should be pinned inside the body")
      c
    }
    assert(n >= 3)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(after.intersect(during -- before).isEmpty,
      "every frame pinned by ingest must be released after the body")
  }

  test("withIngested unpersists even when the body throws") {
    val dir = Files.createTempDirectory("graft-f2b").toString
    FakeData.generate(dir, start = 1, end = 2, records = 5, seed = 8L,
      maxOptional = 4)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    intercept[RuntimeException] {
      CsvIngest.withIngested(spark, dir,
        Instant.parse("2026-01-01T00:00:00Z")) { _ =>
        throw new RuntimeException("boom")
      }
    }
    // id-based (see above): no pin created by this ingest may survive
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).isEmpty)
  }

  test("ingest(persist=true) still returns a usable frame (legacy path)") {
    val dir = Files.createTempDirectory("graft-f1").toString
    FakeData.generate(dir, start = 1, end = 2, records = 4, seed = 9L,
      maxOptional = 3)
    val df = CsvIngest.ingest(spark,
      dir, Instant.parse("2026-01-01T00:00:00Z"), persist = true)
    assert(df.count() >= 2)
    // clean up the pins this legacy path leaves (the reason withIngested exists)
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist())
  }
}
