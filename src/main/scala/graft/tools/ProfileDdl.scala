package graft.tools

import graft.config.GraftConfig
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Ad-hoc profiler for the `sql_catalog_ddl` commit path: times every
  * statement of the query body separately and counts the Spark jobs
  * (with their wall time) each statement launches, so the commit cost
  * splits into driver-side planning vs job execution. Measurement
  * harness only — not part of the bench or the declared queries.
  */
object ProfileDdl {
  def main(args: Array[String]): Unit = {
    val cfg = GraftConfig.fromEnv(appName = "graft-profile-ddl")
    val s = cfg.newSession()
    val dir = cfg.sfDir

    @volatile var jobs = 0
    @volatile var jobNanos = 0L
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val descs = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        starts.put(j.jobId, System.nanoTime()); jobs += 1
        val d = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        val stages = j.stageInfos.map(si =>
          s"${si.name.takeWhile(_ != ' ')}x${si.numTasks}").mkString("+")
        descs.put(j.jobId, s"$stages ${d.take(60)}")
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach { t0 =>
          val dt = System.nanoTime() - t0
          jobNanos += dt
          println(f"[job] ${j.jobId}%3d ${dt / 1e9}%7.3f s  ${descs.getOrDefault(j.jobId, "")}")
        }
      }
    })

    def phase[T](name: String)(body: => T): T = {
      Thread.sleep(50) // let listener events drain
      val (j0, n0) = (jobs, jobNanos)
      val t0 = System.nanoTime()
      val r = body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(50)
      println(f"[profile] $name%-28s wall=$wall%7.3f s  jobs=${jobs - j0}%3d  jobtime=${(jobNanos - n0) / 1e9}%7.3f s")
      r
    }

    val fq = s"graft.db.ddl_h${math.abs(dir.hashCode)}"
    // warm-up: run the full body once so JIT/codegen/catalog init is
    // not charged to the profiled pass
    def body(tag: String): Unit = {
      println(s"--- pass: $tag ---")
      phase("view+namespace") {
        graft.Queries.t(s, dir, "events")
          .createOrReplaceTempView("graft_ddl_src")
        s.sql("CREATE NAMESPACE IF NOT EXISTS graft.db")
      }
      phase("drop") { s.sql(s"DROP TABLE IF EXISTS $fq") }
      phase("create") {
        s.sql(s"CREATE TABLE $fq " +
          "(event_id BIGINT, event_type STRING, value DOUBLE) " +
          "PARTITIONED BY (event_type) " +
          "TBLPROPERTIES ('graft.write.sort-by'='event_id', " +
          "'graft.write.distribution-mode'='hash')")
      }
      phase("insert") {
        s.sql(s"INSERT INTO $fq " +
          "SELECT event_id, event_type, value FROM graft_ddl_src")
      }
      phase("alter") { s.sql(s"ALTER TABLE $fq ADD COLUMNS (score DOUBLE)") }
      phase("delete") { s.sql(s"DELETE FROM $fq WHERE event_id > 5000") }
      phase("select+noop") {
        s.sql(s"SELECT event_id, event_type, value, score FROM $fq")
          .write.format("noop").mode("overwrite").save()
      }
    }
    body("warm-up")
    body("measured-1")
    body("measured-2")
    s.stop()
  }
}
