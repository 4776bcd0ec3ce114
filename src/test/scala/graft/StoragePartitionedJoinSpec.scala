package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.SnapshotTable

/** The native DSv2 batch scan and the storage-partitioned join (SPJ):
  * a bucket-partitioned snapshot table reports
  * `KeyGroupedPartitioning(bucket(n, col))`, so two co-bucketed tables
  * join with NO exchange on either side — the 100 TB co-location story
  * the round-13 FunctionCatalog seam was built for. Also pins the
  * fallback contract: any read-time resolution work (delete vectors,
  * schema evolution, metadata columns) silently reverts to the V1
  * bridge with identical results.
  */
class StoragePartitionedJoinSpec extends AnyFunSuite {

  private lazy val spark = TestSparkSession.spark
  import spark.implicits._

  private def sql(q: String): DataFrame = spark.sql(q)
  private def warehouse = spark.conf.get("spark.sql.catalog.graft.warehouse")

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def makeBucketTable(name: String, rows: Long, shift: Long = 0): Unit = {
    sql(s"DROP TABLE IF EXISTS graft.spj.$name")
    sql(s"CREATE TABLE graft.spj.$name (id BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(8, id))")
    sql(s"INSERT INTO graft.spj.$name SELECT id, cast(id + $shift as double) " +
      s"FROM range(0, $rows)")
  }

  test("native batch scan reads bucket tables exactly, reports pruned stats") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.spj")
    makeBucketTable("a", 10000)
    val df = spark.table("graft.spj.a")
    val plan = finalPlan(df.filter("id >= 0"))
    assert(plan.contains("BatchScan") && plan.contains("GraftBatchScan"),
      s"bucket table must plan the native batch scan:\n${plan.take(2000)}")
    assert(!plan.contains("RowDataSourceScan"), plan.take(2000))
    // exactness vs the V1 path, same snapshot
    val native = df.as[(Long, Double)].collect().sortBy(_._1).toSeq
    withConf("spark.sql.graft.nativeBatchScan" -> "false") {
      val v1 = spark.table("graft.spj.a").as[(Long, Double)]
        .collect().sortBy(_._1).toSeq
      assert(native == v1)
    }
    assert(native.size == 10000 && native.head == ((0L, 0.0)))
    // bucket pruning: an equality filter opens only the key's bucket
    val one = spark.table("graft.spj.a").filter($"id" === 42L)
    assert(one.as[(Long, Double)].collect().toSeq == Seq((42L, 42.0)))
  }

  test("storage-partitioned join: co-bucketed tables join with zero exchange") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.spj")
    makeBucketTable("l", 20000)
    makeBucketTable("r", 20000, shift = 1000000)
    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      // forbid both fallbacks a small test table would otherwise take:
      // broadcast (manifest stats make these tiny) and shuffled hash
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.join.preferSortMergeJoin" -> "true") {
      val j = sql("""SELECT l.id, l.v, r.v AS rv FROM graft.spj.l l
                    |JOIN graft.spj.r r ON l.id = r.id""".stripMargin)
      val plan = finalPlan(j)
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle either side:\n${plan.take(4000)}")
      assert(j.count() == 20000)
      val row = j.filter($"id" === 7L).as[(Long, Double, Double)]
        .collect().toSeq
      assert(row == Seq((7L, 7.0, 1000007.0)))
    }
    // aggregation clusters on the bucket source too: GROUP BY id over
    // a bucket(8, id) table aggregates with ZERO exchange (the
    // KeyGroupedPartitioning satisfies the aggregate's distribution)
    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true") {
      val a = sql("SELECT id, sum(v) AS s FROM graft.spj.l GROUP BY id")
      val plan = finalPlan(a)
      assert(!plan.contains("Exchange"),
        s"bucket-clustered aggregate must not shuffle:\n${plan.take(3000)}")
      assert(a.count() == 20000)
    }
    // same join WITHOUT v2 bucketing: exchanges return (the feature is
    // the conf-gated SPJ, not an accident of tiny data)
    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = sql("""SELECT l.id FROM graft.spj.l l
                    |JOIN graft.spj.r r ON l.id = r.id""".stripMargin)
      assert(finalPlan(j).contains("Exchange"))
    }
  }

  test("unpartitioned and identity tables scan natively too (vectorized, no row bridge)") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.spj")
    sql("DROP TABLE IF EXISTS graft.spj.u")
    sql("CREATE TABLE graft.spj.u (id BIGINT, kind STRING, v DOUBLE) " +
      "PARTITIONED BY (kind)")
    sql("INSERT INTO graft.spj.u SELECT id, " +
      "concat('k', cast(id % 3 as string)), cast(id as double) " +
      "FROM range(0, 9000)")
    val df = sql("SELECT sum(v) AS s, count(*) AS n FROM graft.spj.u " +
      "WHERE id % 2 = 0")
    val plan = finalPlan(df)
    assert(plan.contains("GraftBatchScan"),
      s"identity-partitioned scan must be native:\n${plan.take(2000)}")
    assert(!plan.contains("GraftV2ScanRelation"), plan.take(2000))
    val got = df.as[(Double, Long)].collect().head
    withConf("spark.sql.graft.nativeBatchScan" -> "false") {
      val v1 = sql("SELECT sum(v) AS s, count(*) AS n FROM graft.spj.u " +
        "WHERE id % 2 = 0").as[(Double, Long)].collect().head
      assert(got == v1, s"native $got vs v1 $v1")
    }
    assert(got._2 == 4500)
    // flat projections read COLUMNAR: whole ColumnarBatches flow into
    // codegen (ColumnarToRow above the scan), rows never materialize
    // one at a time in the reader
    assert(plan.contains("ColumnarToRow"),
      s"vectorizable projection must scan columnar:\n${plan.take(2000)}")
    sql("DROP TABLE graft.spj.u")
  }

  test("identity-partitioned tables storage-partition-join on the partition column") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.spj")
    for (n <- Seq("il", "ir")) {
      sql(s"DROP TABLE IF EXISTS graft.spj.$n")
      sql(s"CREATE TABLE graft.spj.$n (id BIGINT, kind STRING, v DOUBLE) " +
        "PARTITIONED BY (kind)")
      sql(s"INSERT INTO graft.spj.$n SELECT id, " +
        "concat('k', cast(id % 5 as string)), cast(id as double) " +
        "FROM range(0, 10000)")
    }
    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // join keys (kind, id) are a SUPERSET of the partition keys
      // (kind): co-partition then requires relaxing the
      // all-cluster-keys rule, exactly as with Iceberg SPJ
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false") {
      // partition-wise aggregate: GROUP BY the identity source
      val a = sql("SELECT kind, sum(v) AS s FROM graft.spj.il GROUP BY kind")
      val ap = finalPlan(a)
      assert(!ap.contains("Exchange"),
        s"identity-clustered aggregate must not shuffle:\n${ap.take(3000)}")
      assert(a.count() == 5)
      // partition-wise join on the identity column
      val j = sql("""SELECT l.kind, count(*) AS n
                    |FROM graft.spj.il l JOIN graft.spj.ir r
                    |ON l.kind = r.kind AND l.id = r.id
                    |GROUP BY l.kind""".stripMargin)
      val jp = finalPlan(j)
      assert(!jp.contains("Exchange"),
        s"identity co-partitioned join must not shuffle:\n${jp.take(4000)}")
      import spark.implicits._
      assert(j.as[(String, Long)].collect().toMap
        == (0 until 5).map(k => s"k$k" -> 2000L).toMap)
    }
    Seq("il", "ir").foreach(n => sql(s"DROP TABLE graft.spj.$n"))
  }

  test("month-partitioned tables storage-partition-join on the timestamp") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.spj")
    for (n <- Seq("ml", "mr")) {
      sql(s"DROP TABLE IF EXISTS graft.spj.$n")
      sql(s"CREATE TABLE graft.spj.$n (id BIGINT, ts TIMESTAMP, v DOUBLE) " +
        "PARTITIONED BY (month(ts))")
      sql(s"INSERT INTO graft.spj.$n SELECT id, " +
        "timestampadd(DAY, cast(id % 180 as int), TIMESTAMP'2024-01-15 00:00:00'), " +
        "cast(id as double) FROM range(0, 6000)")
    }
    withConf(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false") {
      val j = sql("""SELECT l.id, l.v, r.v AS rv FROM graft.spj.ml l
                    |JOIN graft.spj.mr r
                    |ON l.ts = r.ts AND l.id = r.id""".stripMargin)
      val plan = finalPlan(j)
      assert(!plan.contains("Exchange"),
        s"month co-partitioned join must not shuffle:\n${plan.take(4000)}")
      assert(j.count() == 6000L)
    }
    Seq("ml", "mr").foreach(n => sql(s"DROP TABLE graft.spj.$n"))
  }

  test("runtime filtering: a selective join side prunes fact partitions at execution") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.spj")
    sql("DROP TABLE IF EXISTS graft.spj.fact")
    sql("CREATE TABLE graft.spj.fact (id BIGINT, kind STRING, v DOUBLE) " +
      "PARTITIONED BY (kind)")
    sql("INSERT INTO graft.spj.fact SELECT id, " +
      "concat('k', cast(id % 10 as string)), cast(id as double) " +
      "FROM range(0, 20000)")
    import spark.implicits._
    // parquet-backed dim: a LocalRelation would constant-fold the
    // selective filter away and DPP sees no predicate to derive
    val dimDir = java.nio.file.Files
      .createTempDirectory("spj-dim").resolve("d").toString
    (0 until 10).map(k => (s"k$k", if (k == 3 || k == 7) 1 else 0))
      .toDF("kind", "flag").coalesce(1).write.parquet(dimDir)
    spark.read.parquet(dimDir).createOrReplaceTempView("spj_dim")
    val q = sql("""SELECT sum(f.v) AS s, count(*) AS n
                  |FROM graft.spj.fact f JOIN spj_dim d ON f.kind = d.kind
                  |WHERE d.flag = 1""".stripMargin)
    val plan = finalPlan(q)
    assert(plan.contains("GraftBatchScan"), plan.take(2000))
    // the scan received a dynamic-pruning runtime filter on kind
    assert(plan.contains("dynamicpruning") ||
      plan.contains("RuntimeFilters: [in("),
      s"fact scan must carry a runtime filter:\n${plan.take(4000)}")
    val (s, n) = q.as[(Double, Long)].collect().head
    // kinds k3/k7: ids ≡ 3, 7 (mod 10)
    val expect = (0 until 20000).filter(i => i % 10 == 3 || i % 10 == 7)
    assert(n == expect.size && s == expect.map(_.toDouble).sum, (s, n))
    sql("DROP TABLE graft.spj.fact")
  }

  test("fallback: delete vectors, evolution, and row-level scans revert to the V1 path") {
    sql("CREATE NAMESPACE IF NOT EXISTS graft.spj")
    makeBucketTable("f", 5000)
    val root = s"$warehouse/spj/f"
    // 1. a MoR delete adds vectors -> native scan ineligible, values exact
    val t = SnapshotTable.load(spark, root)
    t.deleteWithVectors(org.apache.spark.sql.functions.col("id") % 100 === 0)
    val df = spark.table("graft.spj.f")
    val plan = finalPlan(df)
    assert(!plan.contains("GraftBatchScan"),
      s"a DV table must fall back:\n${plan.take(2000)}")
    assert(df.count() == 4950)
    // 2. schema evolution (new column) -> old files' ids differ from
    // the snapshot's -> fallback, typed nulls resolve
    makeBucketTable("g", 1000)
    val g = SnapshotTable.load(spark, s"$warehouse/spj/g")
    g.append(spark.range(1000, 1100).selectExpr("id",
      "cast(id as double) as v",
      "if(id >= 0, concat('t', cast(id as string)), null) as tag"))
    val dg = spark.table("graft.spj.g")
    assert(!finalPlan(dg).contains("GraftBatchScan"))
    assert(dg.count() == 1100)
    assert(dg.filter("tag IS NULL").count() == 1000)
    // 3. a native UPDATE (metadata-column scan) works over a bucket
    // table: the row-level read path must not take the batch scan
    makeBucketTable("h", 1000)
    sql("UPDATE graft.spj.h SET v = v + 0.5 WHERE id % 10 = 0")
    assert(sql("SELECT v FROM graft.spj.h WHERE id = 20").as[Double]
      .head == 20.5)
    Seq("a", "l", "r", "f", "g", "h").foreach(n =>
      sql(s"DROP TABLE IF EXISTS graft.spj.$n"))
    sql("DROP NAMESPACE graft.spj")
  }
}
