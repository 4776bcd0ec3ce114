package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{DataFileEntry, Snapshot, SnapshotTable}

/** Plan admission for the labeled change feed (VERDICT r18 #3):
  * [[SnapshotTable.changesCdf]] used to build ONE union branch per
  * commit — a 500-commit catch-up window planned a 500-child union,
  * all driver-side analysis cost. It now coalesces runs of commits
  * whose coalesced frame is provably the per-commit multiset
  * (insert-only runs, provably-net-zero maintenance runs) and refuses
  * windows that still exceed `graft.cdf.max-frames` with the
  * iteration contract in the error.
  *
  * Three pins: (1) a 500-commit append-heavy window plans a BOUNDED
  * number of nodes (count assert — the un-coalesced shape is ≥ 500
  * leaves by construction); (2) a window over the cap refuses with
  * guidance, and the cap is a table property; (3) coalescing changes
  * the PLAN only — on a real history mixing every commit class, the
  * coalesced window's labeled multiset equals the union of its
  * single-commit windows (which never coalesce anything).
  */
class CdfAdmissionSpec extends AnyFunSuite {

  private lazy val spark = TestSparkSession.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("v", DoubleType, nullable = true)))

  private def rows(ids: Seq[(Long, Double)]): DataFrame = {
    val data = ids.map { case (i, v) => Row(i, v) }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
  }

  /** One real 1-row parquet blob, copied under each synthetic path —
    * plan-time analysis checks path existence, so the files must be
    * on disk, but 500 copies of one blob cost ~nothing vs 500 Spark
    * write jobs.
    */
  private lazy val blob: Array[Byte] = {
    val d = java.nio.file.Files.createTempDirectory("graft-cdf-blob")
    rows(Seq(0L -> 0.0)).coalesce(1).write.parquet(s"$d/p")
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(s"$d/p"))
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    java.nio.file.Files.readAllBytes(part)
  }

  /** Synthetic append commit: one 1-row file entry (real bytes, copied
    * blob) on top of the current snapshot — 500 commits cost 500
    * metadata writes plus 500 file copies, no Spark write jobs.
    */
  private def syntheticCommit(t: SnapshotTable, op: String,
      addFile: Boolean): Unit = {
    val base = t.currentSnapshot()
    val v = base.version + 1
    val files =
      if (addFile) {
        val rel = f"data/synth-$v%05d.parquet"
        val p = java.nio.file.Paths.get(t.root.toString, rel)
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p, blob)
        base.files :+ DataFileEntry(rel, None, 1L,
          cols = base.ids, seq = v, bytes = blob.length.toLong)
      } else base.files
    val cand = Snapshot(v, Some(base.version), op,
      System.currentTimeMillis(), base.schema, base.spec,
      base.properties, files, base.fieldIds, base.nextFieldId,
      base.deleteFiles, base.specSince, base.dvFiles, base.nestedIds)
    require(t.log.tryCommit(cand), s"synthetic commit $v failed")
  }

  private def nodeCount(df: DataFrame): Int =
    df.queryExecution.logical.collect { case p => p }.size

  test("a 500-commit window plans O(runs), not O(commits)") {
    val root = java.nio.file.Files.createTempDirectory("graft-cdf-adm")
      .resolve("t").toString
    val t = SnapshotTable.create(spark, root, schema, None)
    // 500 commits: 497 appends with 3 rewriting (class-'U') commits
    // interleaved — 4 coalescible runs + 3 per-commit frames
    val boundary = Set(150L, 300L, 450L)
    (1 to 500).foreach { i =>
      if (boundary.contains(i.toLong)) syntheticCommit(t, "overwrite", addFile = true)
      else syntheticCommit(t, "append", addFile = true)
    }
    val t2 = SnapshotTable.load(spark, root)
    val head = t2.currentVersion()
    assert(head >= 500L)
    val df = t2.changesCdf(1L, head)
    val nodes = nodeCount(df)
    val leaves = df.queryExecution.logical.collectLeaves().size
    // un-coalesced: >= 500 scan leaves (one per commit frame); the
    // coalesced plan carries 4 insert-run frames + 3 diff frames
    assert(leaves < 40, s"leaf count $leaves — admission not coalescing")
    assert(nodes < 400, s"node count $nodes — admission not coalescing")
  }

  test("windows over graft.cdf.max-frames refuse with the iteration contract") {
    val root = java.nio.file.Files.createTempDirectory("graft-cdf-cap")
      .resolve("t").toString
    val t = SnapshotTable.create(spark, root, schema, None,
      properties = Map(SnapshotTable.CdfMaxFramesProp -> "8"))
    (1 to 20).foreach(_ => syntheticCommit(t, "overwrite", addFile = true))
    val head = t.currentVersion()
    val e = intercept[IllegalStateException](t.changesCdf(1L, head))
    assert(e.getMessage.contains(SnapshotTable.CdfMaxFramesProp), e.getMessage)
    assert(e.getMessage.contains("sub-window"), e.getMessage)
    // under the cap still serves (plans lazily; 8 frames allowed)
    t.changesCdf(head - 8, head)
  }

  test("coalesced windows serve the same labeled multiset as per-commit unions") {
    val root = java.nio.file.Files.createTempDirectory("graft-cdf-eq")
      .resolve("t").toString
    val t = SnapshotTable.create(spark, root, schema, None,
      properties = Map(
        "graft.update.mode" -> "merge-on-read",
        "graft.delete.mode" -> "merge-on-read"))
    // a history mixing every admission class: append runs (coalesce),
    // evolution inside a run (stays coalescible), MoR update + delete
    // (per-commit), maintenance (provably net-zero, dropped)
    t.append(rows((0L until 8L).map(i => i -> i.toDouble)))      // v2  A
    t.append(rows((8L until 12L).map(i => i -> i.toDouble)))     // v3  A
    t.addColumnWithDefault(StructField("src",
      org.apache.spark.sql.types.StringType), "legacy")          // v4  A (evolution)
    t.append(Seq((12L, 12.0, "live")).toDF("id", "v", "src"))    // v5  A
    t.updateRouted(Seq("v" -> (col("v") + lit(100.0d))),
      col("id") === 3L)                                          // v6  U update-pos
    t.append(Seq((13L, 13.0, "live")).toDF("id", "v", "src"))    // v7  A
    t.deleteRouted(col("id") === 5L)                             // v8  U delete-pos
    t.setProperties(Map("probe" -> "1"))                         // v9  A (set-properties)
    t.compact()                                                  // v10 M netzero
    t.append(Seq((14L, 14.0, "live")).toDF("id", "v", "src"))    // v11 A
    val head = t.currentVersion()

    // single-commit windows render under their OWN endpoint schema
    // (pre-evolution windows have no `src`), so the comparison
    // projects the columns every endpoint carries — coalescing
    // happens per-run, so label/id/value survival is the whole claim
    def labeled(df: DataFrame): Seq[(String, Long, Double)] =
      df.select(col("_change_type"), col("id"), col("v"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toSeq.sorted

    // single-commit windows never coalesce more than one commit —
    // their union IS the per-commit contract
    val perCommit = (2L to head)
      .flatMap(v => labeled(t.changesCdf(v - 1, v))).sorted
    val coalesced = labeled(t.changesCdf(1L, head))
    assert(coalesced == perCommit,
      s"coalesced ${coalesced.take(6)}... != per-commit ${perCommit.take(6)}...")
    // and the window is genuinely coalescing: fewer scan leaves than
    // a per-frame plan would carry
    val leaves = t.changesCdf(1L, head)
      .queryExecution.logical.collectLeaves().size
    assert(leaves < 30, s"leaf count $leaves")
  }
}
