package graft

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.funsuite.AnyFunSuite

/** TEMPORARY probe — deleted before commit. */
class ScratchProbeSpec extends AnyFunSuite {

  private lazy val spark = TestSparkSession.spark

  test("probe: analyzer and optimizer batch order") {
    def batchNames(re: AnyRef): Seq[String] = {
      val m = re.getClass.getMethods.find(_.getName == "batches").get
      m.invoke(re).asInstanceOf[Seq[AnyRef]].map { b =>
        b.getClass.getMethod("name").invoke(b).asInstanceOf[String]
      }
    }
    println("=== ANALYZER: " + batchNames(spark.sessionState.analyzer).mkString(" | "))
    println("=== OPTIMIZER: " + batchNames(spark.sessionState.optimizer).mkString(" | "))
  }

  test("probe: native MERGE plan shape on a partitioned table") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.probe")
    spark.sql("DROP TABLE IF EXISTS graft.probe.t")
    spark.sql("CREATE TABLE graft.probe.t (id BIGINT, kind STRING, v DOUBLE) " +
      "PARTITIONED BY (kind)")
    spark.sql("INSERT INTO graft.probe.t SELECT id, " +
      "concat('k', cast(id % 6 as string)), cast(id as double) " +
      "FROM range(0, 10000)")
    spark.sql("INSERT INTO graft.probe.t SELECT id, " +
      "concat('k', cast(id % 6 as string)), cast(id as double) " +
      "FROM range(10000, 20000)")

    val plans = scala.collection.mutable.ArrayBuffer.empty[(String, QueryExecution)]
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        plans.synchronized { plans += ((funcName, qe)); () }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      spark.range(0, 2000).selectExpr("id * 10 as id",
        "concat('k', cast(id % 6 as string)) as kind", "cast(id as double) as v")
        .createOrReplaceTempView("probe_src")
      spark.sql("""MERGE INTO graft.probe.t t USING probe_src s ON t.id = s.id
                  |WHEN MATCHED THEN UPDATE SET v = t.v + s.v
                  |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      Thread.sleep(2000)
      plans.synchronized {
        plans.foreach { case (fn, qe) =>
          val s = qe.executedPlan.toString
          if (s.contains("WriteDelta") || s.contains("MergeRows")) {
            println(s"=== MERGE physical plan ($fn):\n$s")
            println(s"=== MERGE optimized:\n${qe.optimizedPlan}")
          }
        }
      }
    } finally spark.listenerManager.unregister(listener)

    // month-partitioned native UPDATE: does the months() transform resolve?
    val schema2 = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType)))
    val warehouse0 = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val root2 = s"$warehouse0/probe/m"
    org.apache.hadoop.fs.FileSystem.get(new java.net.URI(root2), spark.sparkContext.hadoopConfiguration).delete(new org.apache.hadoop.fs.Path(root2), true)
    val t2 = graft.catalog.SnapshotTable.create(spark, root2, schema2,
      Some(graft.catalog.PartitionSpec("ts", "month")))
    t2.append(spark.range(0, 5000).selectExpr("id",
      "timestamp_seconds(1700000000 + id * 100000) as ts", "cast(id as double) as v"))
    val pre2 = t2.currentSnapshot().files.size
    spark.sql("UPDATE graft.probe.m SET v = v + 1.0 WHERE id % 7 = 0")
    Thread.sleep(1500)
    plans.synchronized {
      plans.foreach { case (fn, qe) =>
        val s = qe.executedPlan.toString
        if (s.contains("WriteDelta") && s.contains("probe.m")) {
          println("=== month UPDATE physical plan:\n" + s.take(4000))
        }
      }
    }
    val cur2 = graft.catalog.SnapshotTable.load(spark, root2).currentSnapshot()
    println(s"=== month table: op=${cur2.operation} preFiles=$pre2 files=${cur2.files.size} dvs=${cur2.dvFiles.size}")
    println("=== month new files by partition: " + cur2.files.drop(pre2).groupBy(_.partition).map { case (p, fs) => s"$p:${fs.size}" }.toSeq.sorted.mkString(", "))

    // file count after merge
    val warehouse = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val t = graft.catalog.SnapshotTable.load(spark, s"$warehouse/probe/t")
    val cur = t.currentSnapshot()
    println(s"=== op=${cur.operation} files=${cur.files.size} dvs=${cur.dvFiles.size}")
    val newFiles = cur.files.filter(_.path.nonEmpty).map(f => (f.partition, f.path))
    println("=== files by partition: " + newFiles.groupBy(_._1).map { case (p, fs) => s"$p:${fs.size}" }.toSeq.sorted.mkString(", "))
  }
}
