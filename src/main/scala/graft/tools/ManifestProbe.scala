package graft.tools

import graft.catalog.{ColStats, DataFileEntry, Snapshot, SnapshotTable}

/** Standalone manifest-layer scale probe (shared with
  * [[graft.ScaleSmoke]]): commit latency, reload (manifest parse),
  * prune-walk time and on-disk metadata bytes at N synthetic file
  * entries — zero data I/O, so the curve isolates the metadata layer.
  * Disjoint per-file id ranges make the range filter classify every
  * file decisively, so `plan` measures a REAL prune walk.
  *
  * Run: `sbt "runMain graft.tools.ManifestProbe 10000 100000 1000000"`
  */
object ManifestProbe {

  def du(p: java.nio.file.Path): Long = {
    val s = java.nio.file.Files.walk(p)
    try s.filter(java.nio.file.Files.isRegularFile(_))
      .mapToLong(java.nio.file.Files.size(_)).sum()
    finally s.close()
  }

  /** (commit s, load s, plan s, log bytes) at `n` files. */
  def probe(spark: org.apache.spark.sql.SparkSession,
      n: Int): (Double, Double, Double, Long) = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-smoke-manifest").resolve("t").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    val t = SnapshotTable.create(spark, root, schema, None)
    val base = t.currentSnapshot()
    val files = (0 until n).map { i =>
      DataFileEntry(f"data/f$i%07d.parquet", None, 1000L,
        stats = Map("id" -> ColStats(Some((i * 1000L).toString),
          Some((i * 1000L + 999L).toString), 0L)),
        cols = base.ids, seq = base.version + 1, bytes = 64L << 20)
    }
    val cand = Snapshot(base.version + 1, Some(base.version),
      "synthetic-append", System.currentTimeMillis(), base.schema,
      None, base.properties, files, base.fieldIds, base.nextFieldId)
    val c0 = System.nanoTime()
    require(t.log.tryCommit(cand), "manifest probe commit failed")
    val commitS = (System.nanoTime() - c0) / 1e9
    val l0 = System.nanoTime()
    val t2 = SnapshotTable.load(spark, root)
    val snap = t2.currentSnapshot()
    require(snap.files.size == n, s"reloaded ${snap.files.size} of $n")
    val loadS = (System.nanoTime() - l0) / 1e9
    val p0 = System.nanoTime()
    val kept = t2.prunedFiles(snap, Seq(
      org.apache.spark.sql.sources.GreaterThanOrEqual("id",
        (n.toLong / 2) * 1000L)))
    val planS = (System.nanoTime() - p0) / 1e9
    require(kept.size == n / 2, s"prune kept ${kept.size} of $n")
    (commitS, loadS, planS,
      du(java.nio.file.Paths.get(root, "_graft_log")))
  }

  def main(args: Array[String]): Unit = {
    val cfg = graft.config.GraftConfig.fromEnv(appName = "graft-manifest-probe")
    val spark = cfg.newSession()
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toInt)
      else Seq(10000, 100000)
    probe(spark, 1000) // warm: class loading, JIT, fs caches
    sizes.foreach { n =>
      val (c, l, p, b) = probe(spark, n)
      println(f"""{"metric":"manifest_probe_n","files":$n,"commit_sec":$c%.3f,"load_sec":$l%.3f,"plan_sec":$p%.4f,"log_bytes":$b}""")
    }
    spark.stop()
  }
}
