package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.SnapshotTable
import graft.operators.Ivf

/** The live-ingest composition the two r9 capabilities exist for: a
  * vector table's CDC changelog stream (`readStream.format("graft")`)
  * drives [[Ivf.appendToIndex]] from `foreachBatch`, so the persisted
  * ANN index follows the corpus commit-by-commit — no rebuild, no
  * full-corpus re-assignment, and the probe answers exactly like a
  * fresh full build (frozen model ⇒ same assignment ⇒ set equality).
  * Also the only test driving ARRAY<FLOAT> columns through the
  * changelog source's pinned-schema conform path.
  */
class StreamingIvfSpec extends AnyFunSuite {

  private lazy val spark = TestSparkSession.spark
  import spark.implicits._

  /** 60 deterministic 8-dim vectors in 3 well-separated direction
    * families + a planted mutant (id+1000) of every 10th vector.
    */
  private def corpus(): DataFrame = {
    def vec(id: Long): Array[Float] = {
      val fam = (id % 3).toInt
      Array.tabulate(8)(d =>
        (if (d % 3 == fam) 1.0f else 0.05f) + 0.001f * ((id * 7 + d) % 13))
    }
    val base = (0L until 60L).map(i => (i, vec(i)))
    val mutants = base.filter(_._1 % 10 == 0).map { case (i, v) =>
      (i + 1000L, v.zipWithIndex.map { case (x, d) =>
        x + (if (d % 2 == 0) 0.01f else -0.01f) })
    }
    (base ++ mutants).toDF("vec_id", "embedding")
  }

  test("changelog stream drives appendToIndex; probe equals full rebuild") {
    val all = corpus()
    val prefix = all.filter(col("vec_id") % 5 =!= 0)
    val tail = all.filter(col("vec_id") % 5 === 0)
    val queries = all.filter(col("vec_id") >= 1000L)
    val model = Ivf.train(all, k = 3, iters = 3)

    val base = Files.createTempDirectory("graft-stream-ivf")
    val srcRoot = base.resolve("src").toString
    val idxRoot = base.resolve("idx").toString

    // the SOURCE table starts with the prefix; the index is built from
    // exactly that state
    val src = SnapshotTable.create(spark, srcRoot, all.schema, None)
    src.append(prefix)
    Ivf.buildIndex(spark, prefix, model, idxRoot)

    // live maintenance loop: every insert batch the changelog emits is
    // appended to the index under the frozen centroids
    val reports = scala.collection.mutable.ArrayBuffer.empty[Ivf.IndexAppend]
    val q = spark.readStream.format("graft").load(srcRoot)
      .writeStream
      .option("checkpointLocation", base.resolve("ckpt").toString)
      .foreachBatch { (df: DataFrame, _: Long) =>
        val inserts = df.filter(col("_change_type") === "insert")
          .select(col("vec_id"), col("embedding"))
        if (!inserts.isEmpty)
          reports.synchronized {
            reports += Ivf.appendToIndex(spark, inserts, model, idxRoot)
          }
        ()
      }
      .start()
    try {
      // two ingest commits → two O(batch) appends
      src.append(tail.filter(col("vec_id") < 1000L))
      q.processAllAvailable()
      src.append(tail.filter(col("vec_id") >= 1000L))
      q.processAllAvailable()
    } finally q.stop()

    val reps = reports.synchronized(reports.toList)
    assert(reps.size == 2, s"expected one append per commit, got $reps")
    assert(reps.forall(r =>
      r.table.log.read(r.table.currentVersion()).operation == "append" ||
        r.table.currentSnapshot().operation == "append"))
    assert(reps.forall(!_.stale), s"same-distribution batches: $reps")
    assert(reps.map(_.appendedRows).sum == tail.count())

    // the streamed index answers EXACTLY like a cold full rebuild
    val streamed = SnapshotTable.load(spark, idxRoot)
    val viaStream = Ivf.topKWithIndex(streamed, queries, model,
        k = 1, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fullRoot = base.resolve("full").toString
    val full = Ivf.buildIndex(spark, all, model, fullRoot)
    val viaFull = Ivf.topKWithIndex(full, queries, model, k = 1, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaStream == viaFull,
      s"stream-maintained index diverged: $viaStream vs $viaFull")
    // every query resolved within its own direction family (the
    // exact-origin pin lives in DedupSimilaritySpec, whose corpus
    // separates members further than the mutant perturbation)
    def family(id: Long): Long = (if (id >= 1000L) id - 1000L else id) % 3
    for ((qid, nid) <- viaStream)
      assert(family(qid) == family(nid), s"$qid -> $nid crossed families")
  }
}
