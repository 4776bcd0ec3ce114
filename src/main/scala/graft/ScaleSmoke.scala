package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perf-only scale probe (VERDICT r6 item 8): replays the heaviest
  * dedup/ANN shapes on an N×-replicated corpus derived from the driver
  * testdata, timing each at 1× and at N× in the same JVM and printing
  * one JSON line with the per-query scaling factor. A family whose
  * cost grows faster than ~N× here has a super-linear edge the sf0.1
  * bench can't see (candidate-pair blowup, propagation-round growth).
  *
  * NOT an oracle gate — replicas are deterministic mutations, built so
  * each replica keeps the ORIGINAL's statistical shape:
  *  - documents: per-replica letter rotation (`translate`) keeps every
  *    replica's shingle-frequency profile while making cross-replica
  *    shingles distinct. Ten exact copies would instead multiply every
  *    shingle's document frequency by N and the maxDocFreq guard would
  *    prune the whole index — a 10× corpus of NEW content is the
  *    honest scale-up.
  *  - embeddings: per-replica deterministic jitter (±0.01-ish per
  *    coordinate) keeps near-dup geometry per replica without creating
  *    cross-replica exact ties.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE=10
  *      sbt "runMain graft.ScaleSmoke"
  */
object ScaleSmoke {

  private val Letters = "abcdefghijklmnopqrstuvwxyz"

  /** N replicas of the near-dup document corpus: replica r rotates the
    * alphabet by r (identity for r = 0) and offsets ids by r·10⁷
    * (corpus ids stay < 2·10⁵ per replica).
    */
  def scaleDocs(corpus: DataFrame, factor: Int): DataFrame =
    (0 until factor).map { r =>
      val to = Letters.drop(r % 26) + Letters.take(r % 26)
      corpus.select(
        (col("doc_id") + lit(r * 10000000L)).as("doc_id"),
        (if (r == 0) col("text") else translate(col("text"), Letters, to))
          .as("text"))
    }.reduce(_ unionByName _)

  /** N replicas of a vector corpus: replica r jitters each coordinate
    * by a deterministic (index, replica)-keyed offset in ±0.01 and
    * offsets ids by r·10⁸ (wide-corpus ids reach 16·10⁶).
    */
  def scaleVectors(corpus: DataFrame, idCol: String, factor: Int): DataFrame =
    (0 until factor).map { r =>
      val emb =
        if (r == 0) col("embedding")
        else transform(col("embedding"), (x, i) =>
          (x + (pmod(i * 131 + lit(r * 17), lit(11)) - lit(5)).cast("float")
            * lit(0.002f)).cast("float"))
      corpus.select((col(idCol) + lit(r * 100000000L)).as(idCol),
        emb.as("embedding"))
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val cfg = graft.config.GraftConfig.fromEnv(appName = "graft-scale-smoke")
    val spark = cfg.newSession()
    val dir = cfg.sfDir
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt

    // count() executes the full join/aggregation pipelines these shapes
    // are made of, and the row count is itself the blowup signal this
    // probe exists to read (candidate pairs, cluster rows)
    def time(f: => DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f.count()
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    import graft.operators.{Dedup, Governance, Ivf}

    val docs1 = Queries.nearDupCorpus(spark, dir)
    val vecs1 = Queries.nearDupVectors(spark, dir)
    val wide1 = Queries.wideVectors(spark, dir)

    // the coarse quantizer scales WITH the corpus (k ∝ N — the same
    // discipline the SemDeDup family documents): a fixed nprobe over
    // k·N clusters keeps the probed fraction of the corpus constant,
    // which is what makes the indexed query SUBLINEAR in corpus size.
    // A fixed-k model would honestly measure ~linear probe cost — the
    // wrong operating point at scale, not a property of the index.
    // Training itself reads a bounded deterministic sample, so model
    // fit stays cheap at any corpus size; PQ codebooks quantize
    // subvectors and do NOT scale with the corpus. Models are forced
    // BEFORE the timed loop so build ratios stay clean.
    lazy val narrowModel = Ivf.train(vecs1, k = 16, iters = 2)
    lazy val narrowCb = Ivf.trainPq(vecs1, m = 8, ksub = 16, iters = 5)
    lazy val wideModel = Ivf.train(wide1, k = 16, iters = 2)
    lazy val wideCb = Ivf.trainPq(wide1, m = 64, ksub = 16, iters = 5)
    lazy val narrowModelN = Ivf.train(
      scaleVectors(vecs1, "vec_id", factor), k = 16 * factor, iters = 2)
    lazy val wideModelN = Ivf.train(
      scaleVectors(wide1, "vec_id", factor), k = 16 * factor, iters = 2)

    def ivfStages(corpus: DataFrame, queries: DataFrame, wide: Boolean,
        scale: Int): Seq[(String, Int, () => DataFrame)] = {
      val tag = if (wide) "sim_wide_ivfpq_index" else "sim_topk_ivf_index"
      def model = (wide, scale == 1) match {
        case (true, true) => wideModel
        case (true, false) => wideModelN
        case (false, true) => narrowModel
        case (false, false) => narrowModelN
      }
      // a BOUNDED query batch: the sublinearity being probed is the
      // manifest's cluster pruning, and it is only observable when the
      // batch's probed-cluster union does NOT cover the index (a
      // full-coverage batch reads every cluster whatever k is — batch
      // ANN over exhaustive query sets is linear by nature, per query
      // is what stays flat). 8 fixed queries × nprobe clusters of
      // 16·N leave most of the scaled index unread.
      val probeQ = queries.orderBy(col("vec_id")).limit(8)
      var root: String = null
      Seq(
        (s"${tag}_build", scale, () => {
          root = java.nio.file.Files.createTempDirectory("graft-smoke-ivf")
            .resolve("index").toString
          Ivf.buildIndex(spark, corpus, model, root,
            pq = Some(if (wide) wideCb else narrowCb))
          spark.range(1).toDF("built") // build is the timed work
        }),
        (s"${tag}_query", scale, () => {
          val idx = graft.catalog.SnapshotTable.load(spark, root)
          if (wide)
            Ivf.topKPqWithIndex(idx, probeQ, model, wideCb, k = 1,
              nprobe = 8, shortlist = 8)
          else
            Ivf.topKWithIndex(idx, probeQ, model, k = 1, nprobe = 4)
        }))
    }

    val narrowQueries = vecs1.filter(col("vec_id") >= 100000L &&
      col("vec_id") < 100000000L)

    // sharded-model family (round-16 extreme-k path): training,
    // assignment and probing all run with the fine model as a
    // DATAFRAME — k ∝ N like the broadcast family, so the fixed-batch
    // query must stay sublinear while the build (count + sampling +
    // per-super local Lloyd + join-descent assignment) scales
    // ~linearly. Centroids are checkpointed at the lazy val so stage
    // timings never re-run the trainer.
    lazy val shardedModel1 = {
      val (s, c) = Ivf.trainSharded(vecs1, kFine = 16, iters = 2)
      (s, c.localCheckpoint(true))
    }
    lazy val shardedModelN = {
      val (s, c) = Ivf.trainSharded(
        scaleVectors(vecs1, "vec_id", factor), kFine = 16 * factor,
        iters = 2)
      (s, c.localCheckpoint(true))
    }
    def shardedStages(corpus: DataFrame, queries: DataFrame,
        scale: Int): Seq[(String, Int, () => DataFrame)] = {
      def sm = if (scale == 1) shardedModel1 else shardedModelN
      val probeQ = queries.orderBy(col("vec_id")).limit(8)
      var root: String = null
      Seq(
        ("sim_topk_ivf_sharded_build", scale, () => {
          root = java.nio.file.Files
            .createTempDirectory("graft-smoke-shard").resolve("index")
            .toString
          Ivf.buildIndexSharded(spark, corpus, sm._1, sm._2, nsuper = 4,
            root)
          spark.range(1).toDF("built")
        }),
        ("sim_topk_ivf_sharded_query", scale, () => {
          val idx = graft.catalog.SnapshotTable.load(spark, root)
          Ivf.topKSharded(idx, probeQ, sm._1, sm._2, k = 1, nsuper = 4,
            nprobe = 4)
        }))
    }

    // contamination index: BUILD scales with the train corpus; the
    // PROBE uses the FIXED 1x eval set (the realistic asymmetry — eval
    // benchmarks don't grow with the train corpus), so probe time
    // should stay near-flat as the index scales (file pruning + the
    // driver-sized probe set)
    def contamStages(corpus: DataFrame,
        scale: Int): Seq[(String, Int, () => DataFrame)] = {
      var root: String = null
      Seq(
        ("contamination_index_build", scale, () => {
          root = java.nio.file.Files
            .createTempDirectory("graft-smoke-contam")
            .resolve("idx").toString
          Governance.buildNgramIndex(spark,
            corpus.filter(col("doc_id") % 10 =!= 0), root, n = 3)
          spark.range(1).toDF("built")
        }),
        ("contamination_index_probe", scale, () =>
          Governance.contaminationAgainstIndex(
            graft.catalog.SnapshotTable.load(spark, root),
            docs1.filter(col("doc_id") % 10 === 0), n = 3)))
    }

    // merge-on-read read path under ACCUMULATED vectors (round-12 new
    // path): 10 vector-delete commits over a 32-file table leave up to
    // 10 applicable vector generations per file, and every read unions
    // them. Timed separately: the accumulation (delete cost), the
    // burdened full scan (read amplification), and the scan after
    // rewriteDeleteVectors folds the coverage into one generation — a
    // super-linear dv_read edge means the per-file vector union broke;
    // dv_rewrite_read pins that maintenance restores the flat shape.
    def dvStages(corpus: DataFrame,
        scale: Int): Seq[(String, Int, () => DataFrame)] = {
      var root: String = null
      Seq(
        ("dv_accumulate", scale, () => {
          root = java.nio.file.Files.createTempDirectory("graft-smoke-dv")
            .resolve("t").toString
          val t = graft.catalog.SnapshotTable.create(spark, root,
            corpus.schema, None)
          t.append(corpus.repartition(32))
          (0 until 10).foreach(k =>
            t.deleteWithVectors(pmod(col("doc_id"), lit(97L)) === k.toLong))
          spark.range(1).toDF("built")
        }),
        ("dv_read", scale, () =>
          graft.catalog.SnapshotTable.load(spark, root).read()),
        ("dv_rewrite_read", scale, () => {
          val t = graft.catalog.SnapshotTable.load(spark, root)
          t.rewriteDeleteVectors()
          t.read()
        }))
    }

    // storage-partitioned join vs the same join shuffled, on two
    // co-bucketed snapshot tables in the catalog warehouse (SPJ needs
    // the v2 catalog scan): spj_join must track spj_join_shuffle's
    // scaling while beating its wall-clock — the gap IS the exchange
    // both sides skip. Joins execute INSIDE the closure under their
    // conf (plans capture conf at action time), the timed stage
    // returns a constant-cost frame.
    def spjStages(events: DataFrame,
        scale: Int): Seq[(String, Int, () => DataFrame)] = {
      var idents: (String, String) = null
      def runJoin(bucketing: Boolean): DataFrame = {
        val confs = Seq(
          "spark.sql.sources.v2.bucketing.enabled" -> bucketing.toString,
          "spark.sql.autoBroadcastJoinThreshold" -> "-1")
        val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
        try {
          confs.foreach { case (k, v) => spark.conf.set(k, v) }
          val j = spark.table(idents._1).alias("l")
            .join(spark.table(idents._2).alias("r"), Seq("event_id"))
          val plan = j.queryExecution.executedPlan.toString
          require(plan.contains("Exchange") != bucketing,
            s"SPJ probe planned the wrong join shape (bucketing=$bucketing)")
          val n = j.count()
          spark.range(n).toDF("joined")
        } finally old.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
      }
      Seq(
        ("spj_build", scale, () => {
          val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
          val db = java.nio.file.Paths.get(wh, "db")
          java.nio.file.Files.createDirectories(db)
          val spec = Some(graft.catalog.PartitionSpec("event_id",
            "bucket[32]"))
          def mk(tag: String, df: DataFrame): String = {
            val name = s"smoke_spj_${tag}_$scale"
            val t = graft.catalog.SnapshotTable.create(spark,
              db.resolve(name).toString, df.schema, spec)
            t.append(df)
            s"graft.db.$name"
          }
          idents = (mk("l", events),
            mk("r", events.withColumn("value", col("value") + lit(1.0d))))
          spark.range(1).toDF("built")
        }),
        ("spj_join", scale, () => runJoin(bucketing = true)),
        ("spj_join_shuffle", scale, () => runJoin(bucketing = false)))
    }

    /** N replicas of events with disjoint id ranges. */
    def scaleEvents(ev: DataFrame, factor: Int): DataFrame =
      (0 until factor).map(r =>
        ev.withColumn("event_id", col("event_id") + lit(r * 1000000000L)))
        .reduce(_ unionByName _)

    // split-planning probe (VERDICT r14 #1 acceptance): the native
    // batch scan must fan a single large file out over row-group
    // splits and bin-pack many small files into few tasks — the two
    // failure modes of one-task-per-file at 100 TB (straggler tasks /
    // scheduler flood). Probed on real catalog tables, hard require()s
    // so a planner regression fails the smoke run, stderr-reported.
    locally {
      val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
      val db = java.nio.file.Paths.get(wh, "db")
      java.nio.file.Files.createDirectories(db)
      def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
        val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
        pairs.foreach { case (k, v) => spark.conf.set(k, v) }
        try body finally old.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
      }
      // one fat multi-row-group file
      val big = graft.catalog.SnapshotTable.create(spark,
        db.resolve("smoke_split_big").toString,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("payload",
            org.apache.spark.sql.types.StringType))), None)
      withConfs("spark.hadoop.parquet.block.size" -> "131072") {
        big.append(spark.range(0L, 500000L, 1L, 1)
          .selectExpr("id", "repeat(uuid(), 2) as payload"))
      }
      require(big.currentSnapshot().files.size == 1, "split probe fixture")
      // 512 tiny files in ONE commit
      val small = graft.catalog.SnapshotTable.create(spark,
        db.resolve("smoke_split_small").toString,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType))), None,
        properties = Map("graft.write.distribution-mode" -> "none"))
      small.append(spark.range(0L, 512L, 1L, 512).toDF("id"))
      val smallFiles = small.currentSnapshot().files.size
      withConfs(
        "spark.sql.files.maxPartitionBytes" -> "1048576",
        "spark.sql.files.openCostInBytes" -> "65536") {
        val bigTasks = spark.table("graft.db.smoke_split_big")
          .rdd.getNumPartitions
        val smallTasks = spark.table("graft.db.smoke_split_small")
          .rdd.getNumPartitions
        System.err.println(s"[scale-smoke] split probe: big file 1 -> " +
          s"$bigTasks tasks; $smallFiles small files -> $smallTasks tasks")
        require(bigTasks > 4,
          s"one large file must split into many tasks, got $bigTasks")
        require(smallTasks * 8 <= smallFiles,
          s"$smallFiles small files must bin-pack (<=1/8), got $smallTasks")
        require(spark.table("graft.db.smoke_split_big").count() == 500000L)
        require(spark.table("graft.db.smoke_split_small").count() == 512L)
      }

      // TopN probe (round-15): ORDER BY + LIMIT must plan a handful of
      // the 512 single-row files via the manifest threshold — at 100 TB
      // this is the difference between one split and a full scan
      val (topGot, topEvents) = graft.catalog.ScanEvents.capture {
        spark.sql("SELECT * FROM graft.db.smoke_split_small " +
          "ORDER BY id DESC LIMIT 10").collect()
      }
      val topEv = topEvents.last
      System.err.println(s"[scale-smoke] topn probe: planned " +
        s"${topEv.kept} of ${topEv.total} files")
      require(topGot.map(_.getLong(0)).sorted.toSeq == (502L until 512L),
        "topn probe answer drifted")
      require(topEv.total == smallFiles && topEv.kept <= 16,
        s"top-10 over $smallFiles single-row files must plan <=16, " +
          s"planned ${topEv.kept}")

      // metadata-delete probe (round-15): a fully-covered retention
      // DELETE drops files from the manifest with ZERO staged
      // replacements — O(files) bound checks, no data I/O, any size
      val md = graft.catalog.SnapshotTable.create(spark,
        db.resolve("smoke_metadel").toString,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType))), None,
        properties = Map("graft.write.distribution-mode" -> "none"))
      md.append(spark.range(0L, 256L, 1L, 256).toDF("id"))
      val preDel = md.currentSnapshot().files.map(_.path).toSet
      require(preDel.size == 256, "metadata-delete probe fixture")
      val postDel = md.delete(col("id") < 128L)
      System.err.println(s"[scale-smoke] metadata-delete probe: " +
        s"${preDel.size} files -> ${postDel.files.size}, staged " +
        s"${postDel.files.map(_.path).toSet.diff(preDel).size}")
      require(postDel.files.size == 128 &&
        postDel.files.map(_.path).toSet.subsetOf(preDel),
        "retention delete must drop covered files without staging rewrites")
      require(spark.table("graft.db.smoke_metadel").count() == 128L)
    }

    // quantizer-cost probe (VERDICT r15 #1 acceptance): per-row
    // assignment work must grow SUBLINEARLY in k on the two-level
    // hierarchy — the flat quantizer is O(k·d)/row with k codegen'd
    // cosines in the plan, the hierarchy O((g + nsuper·k/g)·d) = O(√k·d)
    // at g = √k. Same fixed corpus at every k (synthetic deterministic
    // centroids; values are irrelevant to COST), so the timing ratio
    // isolates the per-row probe work. Hard require()s: a regression to
    // linear descent fails the smoke run.
    locally {
      def synthModel(k: Int): Ivf.Model =
        Seq.tabulate(k)(j => Seq.tabulate(64)(d =>
          1.0 + math.sin(j * 131 + d * 17).abs))
      def assignTime(q: Ivf.Quantizer): Double = {
        val t0 = System.nanoTime()
        vecs1.select(q.assign(col("embedding")).as("c"))
          .agg(sum(col("c"))).collect()
        (System.nanoTime() - t0) / 1e9
      }
      def tl(k: Int): Ivf.TwoLevelQuantizer =
        Ivf.twoLevel(synthModel(k), math.ceil(math.sqrt(k.toDouble)).toInt,
          iters = 4, nsuper = 4)
      // warm the path once (codegen/JIT) before timing
      assignTime(tl(256))
      val flat256 = assignTime(Ivf.FlatQuantizer(synthModel(256)))
      val flat1024 = assignTime(Ivf.FlatQuantizer(synthModel(1024)))
      val tl256 = assignTime(tl(256))
      val tl1024 = assignTime(tl(1024))
      val tl4096 = assignTime(tl(4096))
      System.err.println(f"[scale-smoke] quantizer probe: flat k=256 " +
        f"$flat256%.2f s, k=1024 $flat1024%.2f s; two-level k=256 " +
        f"$tl256%.2f s, k=1024 $tl1024%.2f s, k=4096 $tl4096%.2f s")
      // 16× the clusters must cost ≲ √16 = 4× on the hierarchy; allow
      // 2× headroom for constants and host noise, still far from the
      // 16× a linear descent would read
      require(tl4096 / tl256 < 8.0,
        f"two-level assignment must scale ~sqrt(k): k=256 $tl256%.2f s " +
          f"-> k=4096 $tl4096%.2f s (${tl4096 / tl256}%.1fx)")
      println(s"""{"metric":"quantizer_probe","flat256":${f"$flat256%.2f"},""" +
        s""""flat1024":${f"$flat1024%.2f"},"tl256":${f"$tl256%.2f"},""" +
        s""""tl1024":${f"$tl1024%.2f"},"tl4096":${f"$tl4096%.2f"}}""")

      // hierarchy BUILD cost (SURVEY §19.8 #2 acceptance): Lloyd
      // training runs on at most trainMax sampled centroids — an A/B
      // at the SAME k (sampled vs unsampled trainer, best-of-2 each,
      // same host conditions) isolates the sampling win from host
      // contention. At k=16384 the unsampled trainer runs
      // 11·k·√k cosines vs the sampled (10·trainMax + k)·√k ≈ 3× fewer
      // — the gap widens with k (the final full pass is shared; Lloyd
      // is what the cap flattens). Growth across k is reported
      // informationally (the shared O(k·√k·d) final pass dominates it
      // by design, so it is NOT a sampling signal).
      // probe at k = 10⁵ — below that the whole build is a fraction of
      // a second either way (measured 0.2 s at k = 16384 after the
      // O(k²) list-indexing fix) and the A/B reads timer noise; at 10⁵
      // the full trainer's Lloyd (10 × k × √k × d ≈ 2×10¹⁰ flops)
      // dominates the shared final pass ~5×, so the win is visible on
      // any host and the gate cannot flake
      def buildTime(k: Int, cap: Int): Double = {
        val m = synthModel(k)
        (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          Ivf.twoLevel(m, math.ceil(math.sqrt(k.toDouble)).toInt,
            iters = 10, nsuper = 4, trainMax = cap)
          (System.nanoTime() - t0) / 1e9
        }.min
      }
      buildTime(16384, 1024) // warm JIT
      val bSampled = buildTime(100000, 1024)
      val bFull = buildTime(100000, 100000)
      System.err.println(f"[scale-smoke] quantizer build k=100000: " +
        f"sampled(1024) $bSampled%.2f s vs full $bFull%.2f s " +
        f"(${bFull / bSampled}%.1fx win)")
      // WARNING, not a hard gate (ADVICE r16): this A/B compares two
      // wall-clock timings on a shared host — a contention spike
      // landing on both sampled runs must not abort the whole smoke
      // run. The algorithmic invariants stay hard-pinned elsewhere
      // (partition coverage in DedupSimilaritySpec; the ~5× margin is
      // informational here and visible in the JSON metric below).
      if (bSampled >= bFull)
        System.err.println(f"[scale-smoke] WARNING: sampled two-level " +
          f"training did not beat the full Lloyd at the same k " +
          f"(sampled $bSampled%.2f s vs full $bFull%.2f s) — expected " +
          f"~5x win; likely host contention, investigate if persistent")
      println(s"""{"metric":"quantizer_build_probe","sampled100k":${f"$bSampled%.2f"},""" +
        s""""full100k":${f"$bFull%.2f"}}""")
    }

    // manifest scale probe (VERDICT r15 #6): commit latency, reload
    // (manifest parse), plan-walk time and on-disk metadata bytes at
    // 10⁴ and 10⁵ files — SYNTHETIC manifest entries, zero data I/O,
    // so the curve isolates the metadata layer. Hard require()s pin
    // the curve at linear-or-better (10× files ≤ 30× time, generous
    // headroom for host noise; a quadratic edge would read ≥100×).
    locally {
      // probe body shared with the standalone runner (r17):
      // graft.tools.ManifestProbe — disjoint id ranges per file, so
      // the plan probe's range filter classifies every file decisively
      // and measures a REAL prune walk
      def probe(n: Int): (Double, Double, Double, Long) =
        graft.tools.ManifestProbe.probe(spark, n)
      probe(1000) // warm (class loading, JIT, fs caches)
      val (c4, l4, p4, b4) = probe(10000)
      val (c5, l5, p5, b5) = probe(100000)
      System.err.println(f"[scale-smoke] manifest probe: 10k files " +
        f"commit $c4%.2f s load $l4%.2f s plan $p4%.3f s ${b4 / 1024}%d KiB; " +
        f"100k files commit $c5%.2f s load $l5%.2f s plan $p5%.3f s " +
        f"${b5 / 1024}%d KiB")
      require(c5 < c4 * 30 && l5 < l4 * 30 && p5 < math.max(p4, 0.01) * 30,
        f"manifest layer must scale linearly: commit $c4%.2f->$c5%.2f, " +
          f"load $l4%.2f->$l5%.2f, plan $p4%.3f->$p5%.3f")
      println(s"""{"metric":"manifest_probe","files10k":{"commit_sec":${f"$c4%.3f"},""" +
        s""""load_sec":${f"$l4%.3f"},"plan_sec":${f"$p4%.3f"},"log_bytes":$b4},""" +
        s""""files100k":{"commit_sec":${f"$c5%.3f"},"load_sec":${f"$l5%.3f"},""" +
        s""""plan_sec":${f"$p5%.3f"},"log_bytes":$b5}}""")
      // XL tier — 10⁶ files, the §19.6 extrapolation MEASURED instead
      // of assumed. Opt-in (SPARK_GRAFT_MANIFEST_XL=1): ~160 MiB of
      // metadata and tens of seconds of driver work have no place in
      // the per-commit smoke loop, but the curve's last decade is what
      // a 100 TB table (10⁵-10⁶ files at 64-256 MB) actually lives in.
      if (sys.env.get("SPARK_GRAFT_MANIFEST_XL").contains("1")) {
        val (c6, l6, p6, b6) = probe(1000000)
        System.err.println(f"[scale-smoke] manifest probe XL: 1M files " +
          f"commit $c6%.2f s load $l6%.2f s plan $p6%.3f s ${b6 / 1024}%d KiB")
        // plan gate tightened to 15× per 10× (VERDICT r16 #4): the
        // columnar StatsIndex walk (parallel build, late r17) measures
        // ~3× per decade quiet (0.28 s at 1M incl. the one-time index
        // build) where the boxed per-file walk read ≈32× — 15× leaves
        // ~5× contention headroom over the worst observed reading.
        // commit/load are WARNINGS, not gates (r17): they are one-shot
        // I/O + JSON-parse wall clocks whose 100k and 1M measurements
        // land minutes apart on a shared host — observed 8× swings on
        // the SAME 100k load across windows make any hard ratio a
        // contention lottery (the ADVICE r16 A/B-gate principle). The
        // metric line still rides the JSON for drift review.
        require(p6 < math.max(p5, 0.01) * 15,
          f"manifest prune walk must stay ~linear to 1M files: " +
            f"plan $p5%.3f->$p6%.3f")
        if (c6 >= c5 * 30 || l6 >= l5 * 30)
          System.err.println(f"[scale-smoke] WARNING: manifest " +
            f"commit/load ratio above 30x at the XL tier (commit " +
            f"$c5%.2f->$c6%.2f, load $l5%.2f->$l6%.2f) — expected " +
            f"~10-25x; likely host contention, investigate if persistent")
        // ...but keep a VERY loose hard backstop (ADVICE r17): 100×
        // per decade is past any observed contention swing (worst 8×),
        // while a genuinely super-linear regression (a quadratic fold)
        // reads ≥100× and must fail the run, not hide in stderr
        require(c6 < math.max(c5, 0.05) * 100 && l6 < math.max(l5, 0.05) * 100,
          f"manifest commit/load super-linear at the XL tier: commit " +
            f"$c5%.2f->$c6%.2f, load $l5%.2f->$l6%.2f (backstop 100x)")
        println(s"""{"metric":"manifest_probe_xl","files1m":{"commit_sec":${f"$c6%.3f"},""" +
          s""""load_sec":${f"$l6%.3f"},"plan_sec":${f"$p6%.3f"},"log_bytes":$b6}}""")
        // XXL tier — 10⁷ files, the decade ABOVE where a 100 TB table
        // lives (VERDICT r17 #4): ~1.6 GiB of metadata and minutes of
        // driver work, so double-opt-in (SPARK_GRAFT_MANIFEST_XXL=1,
        // implies XL ran first for the ratio). Only the loose 100×
        // backstop gates — at this size GC pauses dominate wall-clock
        // variance; the metric line is the record.
        if (sys.env.get("SPARK_GRAFT_MANIFEST_XXL").contains("1")) {
          val (c7, l7, p7, b7) = probe(10000000)
          System.err.println(f"[scale-smoke] manifest probe XXL: 10M " +
            f"files commit $c7%.2f s load $l7%.2f s plan $p7%.3f s " +
            f"${b7 / (1024 * 1024)}%d MiB")
          require(c7 < math.max(c6, 0.05) * 100 &&
            l7 < math.max(l6, 0.05) * 100 &&
            p7 < math.max(p6, 0.01) * 100,
            f"manifest layer super-linear at the XXL tier: commit " +
              f"$c6%.2f->$c7%.2f, load $l6%.2f->$l7%.2f, " +
              f"plan $p6%.3f->$p7%.3f (backstop 100x)")
          println(s"""{"metric":"manifest_probe_xxl","files10m":{"commit_sec":${f"$c7%.3f"},""" +
            s""""load_sec":${f"$l7%.3f"},"plan_sec":${f"$p7%.3f"},"log_bytes":$b7}}""")
        }
      }
    }

    // force training BEFORE the timed loop — otherwise the first build
    // entry absorbs the (expensive, scale-independent) model fit and
    // the 1×-vs-N× build ratio reads nonsense (r8 first run did)
    locally { narrowModel; narrowCb; wideModel; wideCb
      narrowModelN; wideModelN; shardedModel1; shardedModelN; () }

    // each family: 1× then N×, same code path
    val runs: Seq[(String, Int, () => DataFrame)] = Seq(
      ("dedup_ngram", 1, () =>
        Dedup.ngramJaccardPairs(docs1, shingleLen = 3, threshold = 0.5,
          maxDocFreq = 50)),
      ("dedup_ngram", factor, () =>
        Dedup.ngramJaccardPairs(scaleDocs(docs1, factor), shingleLen = 3,
          threshold = 0.5, maxDocFreq = 50)),
      ("dedup_clusters", 1, () => {
        val pairs = Dedup.minhashPairs(docs1, shingleLen = 3, k = 64,
          bands = 16, threshold = 0.6)
        Dedup.clusters(pairs, docs1.select(col("doc_id")), idCol = "doc_id")
      }),
      ("dedup_clusters", factor, () => {
        val d = scaleDocs(docs1, factor)
        val pairs = Dedup.minhashPairs(d, shingleLen = 3, k = 64,
          bands = 16, threshold = 0.6)
        Dedup.clusters(pairs, d.select(col("doc_id")), idCol = "doc_id")
      }),
      // SemDeDup cost model at scale: clusters grow WITH the corpus
      // (k ∝ N) so each inverted list stays constant-sized and the
      // within-cluster pair join stays ~linear — train+pair both timed
      // (training is part of the documented cost, and it scales too).
      // Replica jitter keeps each base vector's mutants τ-close, so
      // the OUTPUT pair count grows ~N² (cross-replica jitters of one
      // base are genuine semantic dups) while the JOIN work stays ~N —
      // the rows column separates the two signals.
      ("dedup_semantic", 1, () => {
        val m = Ivf.train(vecs1, k = 16, iters = 2)
        graft.operators.SemDedup.semanticPairs(vecs1, m, tau = 0.95)
      }),
      ("dedup_semantic", factor, () => {
        val v = scaleVectors(vecs1, "vec_id", factor)
        val m = Ivf.train(v, k = 16 * factor, iters = 2)
        graft.operators.SemDedup.semanticPairs(v, m, tau = 0.95)
      }),
      // the production k ∝ N path through the AUTO quantizer: the 1×
      // corpus stays flat (k = 16 ≤ cap), the N× corpus routes through
      // the two-level hierarchy (k = 16N > cap) — assignment cost per
      // row stays ~flat while the flat twin above pays O(k·d)/row
      ("dedup_semantic_2l", 1, () => {
        val m = Ivf.train(vecs1, k = 16, iters = 2)
        graft.operators.SemDedup.semanticPairs(vecs1,
          Ivf.quantizer(m, flatMax = 64, nsuper = 4), tau = 0.95,
          probes = 2, "vec_id", "embedding")
      }),
      ("dedup_semantic_2l", factor, () => {
        val v = scaleVectors(vecs1, "vec_id", factor)
        val m = Ivf.train(v, k = 16 * factor, iters = 2)
        graft.operators.SemDedup.semanticPairs(v,
          Ivf.quantizer(m, flatMax = 64, nsuper = 4), tau = 0.95,
          probes = 2, "vec_id", "embedding")
      }),
      // the SHARDED twin: same k ∝ N discipline with the fine model as
      // a DataFrame (join-descent soft assignment) — nothing O(k·d)
      // materialized, so the same ~flat-per-row shape must hold past
      // the broadcast wall (pre-trained models: pair time is the probe)
      ("dedup_semantic_sharded", 1, () =>
        graft.operators.SemDedup.semanticPairsSharded(vecs1,
          shardedModel1._1, shardedModel1._2, tau = 0.95,
          probes = 2, nsuper = 4)),
      ("dedup_semantic_sharded", factor, () =>
        graft.operators.SemDedup.semanticPairsSharded(
          scaleVectors(vecs1, "vec_id", factor),
          shardedModelN._1, shardedModelN._2, tau = 0.95,
          probes = 2, nsuper = 4))) ++
      Seq(
      // seeded global shuffle: a pure projection + one exchange — must
      // scale ~linearly with the corpus, no caveats
      ("pipeline_shuffle_shards", 1, () =>
        Governance.shuffleShards(docs1, nShards = 16)
          .groupBy(col("shard")).count()),
      ("pipeline_shuffle_shards", factor, () =>
        Governance.shuffleShards(scaleDocs(docs1, factor), nShards = 16)
          .groupBy(col("shard")).count())) ++
      contamStages(docs1, 1) ++
      contamStages(scaleDocs(docs1, factor), factor) ++
      dvStages(docs1, 1) ++
      dvStages(scaleDocs(docs1, factor), factor) ++
      ivfStages(vecs1, narrowQueries, wide = false, 1) ++
      ivfStages(scaleVectors(vecs1, "vec_id", factor), narrowQueries,
        wide = false, factor) ++
      ivfStages(wide1, Queries.wideQueries(wide1), wide = true, 1) ++
      ivfStages(scaleVectors(wide1, "vec_id", factor),
        Queries.wideQueries(wide1), wide = true, factor) ++
      shardedStages(vecs1, narrowQueries, 1) ++
      shardedStages(scaleVectors(vecs1, "vec_id", factor), narrowQueries,
        factor) ++ {
        val ev1 = graft.sources.Tables.load(spark, dir, "events")
        spjStages(ev1, 1) ++ spjStages(scaleEvents(ev1, factor), factor)
      }

    // optional family filter (comma-separated name prefixes) so the
    // ×100 probe can target the heaviest families without paying for
    // every stage at that scale: SPARK_GRAFT_SCALE_FAMILIES=dedup_ngram,dv
    val familyFilter = sys.env.get("SPARK_GRAFT_SCALE_FAMILIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = familyFilter match {
      case None => runs
      case Some(fams) => runs.filter { case (name, _, _) =>
        fams.exists(name.startsWith) }
    }
    val timed = selected.map { case (name, f, mk) =>
      val (secs, rows) = time(mk())
      System.err.println(f"[scale-smoke] $name%s x$f%d: $secs%.2f s, $rows rows")
      (name, f, secs, rows)
    }
    def fmt(v: Double): String = f"$v%.2f"
    val byName = timed.groupBy(_._1)
    val entries = byName.toSeq.sortBy(_._1).map { case (name, rs) =>
      val t1 = rs.find(_._2 == 1).get._3
      val tn = rs.find(_._2 == factor).get._3
      s""""$name":{"t1":${fmt(t1)},"t$factor":${fmt(tn)},""" +
        s""""ratio":${fmt(tn / t1)}}"""
    }
    println(s"""{"metric":"scale_smoke","factor":$factor,""" +
      entries.mkString("", ",", s""","sf":"$dir"}"""))
    spark.stop()
  }
}
