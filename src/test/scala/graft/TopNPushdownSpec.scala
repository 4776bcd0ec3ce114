package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.ScanEvents

/** ORDER BY + LIMIT as manifest file pruning (SupportsPushDownTopN on
  * the native batch scan). Every case pins BOTH the planned file count
  * (ScanEvents) and the exact answer against the kill-switch-off run —
  * a threshold bug either over-plans (caught by the count) or drops a
  * contributing file (caught by the rows).
  */
class TopNPushdownSpec extends AnyFunSuite {
  private lazy val spark = TestSparkSession.spark

  private def withTopnOff[T](f: => T): T = {
    spark.conf.set("spark.sql.graft.topnPrune", "false")
    try f finally spark.conf.set("spark.sql.graft.topnPrune", "true")
  }

  /** Run `sql`, returning (sorted rows, files kept, files total). */
  private def probe(sql: String): (Seq[Row], Int, Int) = {
    val (rows, events) = ScanEvents.capture(spark.sql(sql).collect())
    val ev = events.last
    (rows.toSeq.sortBy(_.toString), ev.kept, ev.total)
  }

  private def mkIds(name: String, props: String = ""): String = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.probe")
    spark.sql(s"DROP TABLE IF EXISTS graft.probe.$name")
    spark.sql(s"CREATE TABLE graft.probe.$name (id BIGINT)" +
      (if (props.isEmpty) "" else s" TBLPROPERTIES ($props)"))
    (0 until 20).foreach { i =>
      spark.sql(s"INSERT INTO graft.probe.$name SELECT /*+ REPARTITION(1) */" +
        s" id FROM range(${i * 100}, ${i * 100 + 100})")
    }
    s"graft.probe.$name"
  }

  test("DESC top-k plans only the tail files, answer exact") {
    val t = mkIds("topn_ids")
    val (rows, kept, total) = probe(s"SELECT * FROM $t ORDER BY id DESC LIMIT 150")
    assert(total == 20 && kept == 2, s"expected 2 of 20 files, got $kept of $total")
    assert(rows.map(_.getLong(0)).sorted == (1850L until 2000L))
    val (off, offKept, _) = withTopnOff(
      probe(s"SELECT * FROM $t ORDER BY id DESC LIMIT 150"))
    assert(offKept == 20, "kill switch must disable the prune")
    assert(off == rows)
  }

  test("ASC top-k plans only the head file") {
    val t = "graft.probe.topn_ids"
    val (rows, kept, _) = probe(s"SELECT * FROM $t ORDER BY id ASC LIMIT 50")
    assert(kept == 1)
    assert(rows.map(_.getLong(0)).sorted == (0L until 50L))
  }

  test("a second sort key keeps the first-key prune sound") {
    val t = "graft.probe.topn_ids"
    val (rows, kept, _) = probe(
      s"SELECT id, id % 7 AS r FROM $t ORDER BY id DESC, r ASC LIMIT 150")
    assert(kept == 2)
    assert(rows.map(_.getLong(0)).sorted == (1850L until 2000L))
  }

  test("NULL ordering decides wholesale: nulls win, lose, and seed the threshold") {
    spark.sql("DROP TABLE IF EXISTS graft.probe.topn_nulls")
    spark.sql("CREATE TABLE graft.probe.topn_nulls (id BIGINT)")
    spark.sql("INSERT INTO graft.probe.topn_nulls " +
      "SELECT /*+ REPARTITION(1) */ id FROM range(0, 100)")
    spark.sql("INSERT INTO graft.probe.topn_nulls " +
      "SELECT /*+ REPARTITION(1) */ CAST(NULL AS BIGINT) FROM range(0, 100)")
    spark.sql("INSERT INTO graft.probe.topn_nulls " +
      "SELECT /*+ REPARTITION(1) */ id FROM range(100, 200)")
    val t = "graft.probe.topn_nulls"
    // nulls win and alone cover k: ONLY the null file plans
    val (nw, nwKept, _) = probe(
      s"SELECT * FROM $t ORDER BY id ASC NULLS FIRST LIMIT 50")
    assert(nwKept == 1 && nw.size == 50 && nw.forall(_.isNullAt(0)))
    // nulls lose: the all-NULL file is dropped once values cover k
    val (nl, nlKept, _) = probe(
      s"SELECT * FROM $t ORDER BY id DESC LIMIT 150")
    assert(nlKept == 2)
    assert(nl.map(_.getLong(0)).sorted == (50L until 200L))
    // nulls win but don't cover k: they seed the accumulator and the
    // null file stays alongside the value file at the threshold
    val (ns, nsKept, _) = probe(
      s"SELECT * FROM $t ORDER BY id ASC NULLS FIRST LIMIT 150")
    assert(nsKept == 2)
    val (nulls, vals) = ns.partition(_.isNullAt(0))
    assert(nulls.size == 100 && vals.map(_.getLong(0)).sorted == (0L until 50L))
  }

  test("DESC NULLS FIRST: nulls win independently of direction") {
    val t = "graft.probe.topn_nulls"
    val (nw, nwKept, _) = probe(
      s"SELECT * FROM $t ORDER BY id DESC NULLS FIRST LIMIT 50")
    assert(nwKept == 1 && nw.size == 50 && nw.forall(_.isNullAt(0)))
    // beyond the nulls, the DESC threshold takes over
    val (mix, mixKept, _) = probe(
      s"SELECT * FROM $t ORDER BY id DESC NULLS FIRST LIMIT 150")
    assert(mixKept == 2)
    val (nulls, vals) = mix.partition(_.isNullAt(0))
    assert(nulls.size == 100 &&
      vals.map(_.getLong(0)).sorted == (150L until 200L))
  }

  test("delete vectors shrink the per-file guarantee, never the keep set") {
    val t = mkIds("topn_dv", "'graft.delete.mode' = 'merge-on-read'")
    spark.sql(s"DELETE FROM $t WHERE id >= 1850 AND id < 1950")
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    assert(graft.catalog.SnapshotTable.load(spark, s"$wh/probe/topn_dv")
      .currentSnapshot().dvFiles.nonEmpty,
      "the delete must have committed vectors")
    // top two files each keep 50 live rows: the threshold must budget
    // both (an unsubtracted guarantee would plan one file and lose the
    // 1800s), and the answer must be the live top-100
    val (rows, kept, total) = probe(s"SELECT * FROM $t ORDER BY id DESC LIMIT 100")
    assert(kept < total, s"expected a prune, planned $kept of $total")
    assert(rows.map(_.getLong(0)).sorted ==
      ((1800L until 1850L) ++ (1950L until 2000L)))
  }

  test("equality deletes disable the prune entirely") {
    val t = mkIds("topn_eq", "'graft.delete.mode' = 'equality'")
    spark.sql(s"DELETE FROM $t WHERE id IN (1999, 1998)")
    val (rows, kept, total) = probe(s"SELECT * FROM $t ORDER BY id DESC LIMIT 100")
    assert(kept == total, "live counts are unknowable under equality deletes")
    assert(rows.map(_.getLong(0)).sorted == (1898L until 1998L))
  }

  test("a pushed filter above the scan disables the prune") {
    val t = "graft.probe.topn_ids"
    // the residual Filter node blocks Spark's TopN pushdown, so the
    // scan must plan every file and the answer stays exact
    val (rows, kept, total) = probe(
      s"SELECT * FROM $t WHERE id % 2 = 0 ORDER BY id DESC LIMIT 100")
    assert(kept == total)
    assert(rows.map(_.getLong(0)).sorted ==
      (1800L until 2000L by 2).toSeq)
  }

  test("ORDER BY + LIMIT + OFFSET stays exact under the prune") {
    val t = "graft.probe.topn_ids"
    // Spark must push a top-N covering offset+limit (as it does for
    // plain LIMIT — LimitOffsetProbeSpec); an under-planned prefix
    // would lose the offset's tail. Pinned empirically.
    val rows = spark.sql(
      s"SELECT * FROM $t ORDER BY id DESC LIMIT 100 OFFSET 50").collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == (1850L until 1950L))
  }

  test("string bounds threshold in UTF-8 order") {
    spark.sql("DROP TABLE IF EXISTS graft.probe.topn_str")
    spark.sql("CREATE TABLE graft.probe.topn_str (s STRING)")
    (0 until 10).foreach { i =>
      spark.sql("INSERT INTO graft.probe.topn_str " +
        s"SELECT /*+ REPARTITION(1) */ concat('k', lpad(CAST(id AS STRING), 4, '0')) " +
        s"FROM range(${i * 100}, ${i * 100 + 100})")
    }
    val (rows, kept, total) = probe(
      "SELECT * FROM graft.probe.topn_str ORDER BY s DESC LIMIT 100")
    assert(total == 10 && kept == 1)
    assert(rows.map(_.getString(0)).sorted ==
      (900 until 1000).map(i => f"k$i%04d"))
  }
}
