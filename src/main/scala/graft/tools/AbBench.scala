package graft.tools

import graft.config.GraftConfig
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Measurement harness (dev-only, not part of the bench contract):
  *
  *  - `ab q1,q2[,…] [rounds]` — interleaved A/B of registry queries in
  *    ONE JVM, alternating order each round, fixtures prebuilt; prints
  *    per-query min/median. The shared-host load oscillates on the
  *    timescale of a full bench run, so sequential before/after runs
  *    are not comparable — interleaving is (OPTIMIZATION_r19
  *    methodology).
  *  - `profile q [n]` — splits one registry query's wall time into
  *    CONSTRUCTION (the query-builder call: temp views, catalog ops,
  *    index reads) vs EXECUTION (the noop save), with job counts and
  *    job wall time per phase — the driver-timeline probe for the
  *    sub-second tail (VERDICT r19 #4).
  */
object AbBench {

  def main(args: Array[String]): Unit = {
    val cfg = GraftConfig.fromEnv(appName = "graft-ab")
    val spark = cfg.newSession()

    @volatile var jobs = 0
    @volatile var jobNanos = 0L
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        starts.put(j.jobId, System.nanoTime()); jobs += 1
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach(t0 =>
          jobNanos += System.nanoTime() - t0)
      }
    })

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def run(name: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      noop(fn(spark, cfg.sfDir))
      (System.nanoTime() - t0) / 1e9
    }

    def med(xs: Seq[Double]): Double = xs.sorted.apply((xs.size - 1) / 2)

    // warm-up + the shared fixtures any selected query may need
    graft.SparkEntry.queries.get("q1_agg")
      .foreach(fn => try noop(fn(spark, cfg.sfDir)) catch { case _: Throwable => () })

    args.toList match {
      case mode :: qlist :: rest if mode == "ab" || mode == "abnf" =>
        val names = qlist.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val rounds = rest.headOption.map(_.toInt).getOrElse(6)
        // "abnf" skips the shared-fixture prebuild (for queries that
        // lazily build what they need — saves ~30 s per measurement)
        if (mode == "ab") graft.Queries.fixtures.foreach { case (fname, ffn) =>
          System.err.println(s"[ab] building $fname")
          ffn(spark, cfg.sfDir)
        }
        names.foreach(n => run(n)) // one untimed warm pass each
        val times = scala.collection.mutable.Map[String,
          scala.collection.mutable.ArrayBuffer[Double]]()
        for (r <- 0 until rounds) {
          val order = if (r % 2 == 0) names else names.reverse
          for (n <- order) {
            val t = run(n)
            times.getOrElseUpdate(n,
              scala.collection.mutable.ArrayBuffer[Double]()) += t
            println(f"[ab] round=$r $n%-28s $t%7.3f s")
          }
          System.gc()
        }
        for (n <- names) {
          val xs = times(n).toSeq
          println(f"[ab] SUMMARY $n%-28s min=${xs.min}%7.3f med=${med(xs)}%7.3f " +
            xs.map(x => f"$x%.3f").mkString("[", ",", "]"))
        }
      case "profile" :: q :: rest =>
        val n = rest.headOption.map(_.toInt).getOrElse(5)
        val fn = graft.SparkEntry.queries(q)
        for (i <- 0 until n) {
          Thread.sleep(50)
          val (j0, jn0) = (jobs, jobNanos)
          val t0 = System.nanoTime()
          val df = fn(spark, cfg.sfDir)
          val t1 = System.nanoTime()
          Thread.sleep(50)
          val (j1, jn1) = (jobs, jobNanos)
          val t2 = System.nanoTime()
          noop(df)
          val t3 = System.nanoTime()
          Thread.sleep(50)
          println(f"[profile] $q i=$i construct=${(t1 - t0) / 1e9}%6.3f s " +
            f"(jobs=${j1 - j0} jobtime=${(jn1 - jn0) / 1e9}%6.3f) " +
            f"exec=${(t3 - t2) / 1e9}%6.3f s (jobs=${jobs - j1} " +
            f"jobtime=${(jobNanos - jn1) / 1e9}%6.3f)")
          System.gc()
        }
      case other =>
        System.err.println(s"usage: ab <q1,q2[,…]> [rounds] | profile <q> [n] — got $other")
        sys.exit(2)
    }
    spark.stop()
  }
}
