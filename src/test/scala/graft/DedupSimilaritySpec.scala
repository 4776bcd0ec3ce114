package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SimHash64
import graft.operators.{Dedup, Similarity}

class DedupSimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSparkSession.spark
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank yesterday"), // near-dup of 1
    (3L, "completely different text about spark query engines and columnar execution"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (5L, "unrelated short note")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical canonical text") {
    val out = Dedup.exact(corpus).collect()
    assert(out.length == 4) // 1&4 merge
    val dupGroup = out.find(_.getAs[Long]("n_dups") == 2).get
    assert(dupGroup.getAs[Long]("doc_id") == 1L)
  }

  test("minhash LSH finds the near-dup pair and not unrelated docs") {
    val pairs = Dedup.minhashPairs(corpus, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 4L))) // exact dup also caught
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("simhashPairs maxHamming=0 (one 64-bit band) finds exact dups without mask overflow") {
    // 1L<<64 wraps to 1; a zero mask would put EVERY doc in one bucket
    val pairs = Dedup.simhashPairs(corpus, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((1L, 4L, 0))) // only the exact dup pair
  }

  test("clusters throws instead of returning truncated labels when maxIter is too small") {
    import org.apache.spark.sql.functions.col
    // chain 1-2-3-4-5: diameter 4, needs >2 rounds to converge
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("id_a", "id_b")
    val ids = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    intercept[IllegalStateException] {
      Dedup.clusters(pairs, ids, maxIter = 2).collect()
    }
    val ok = Dedup.clusters(pairs, ids, maxIter = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok.values.toSet == Set(1L)) // whole chain labels to min id
  }

  test("topK UDAF ranks NaN sims first (matching Spark's descending sort order)") {
    import org.apache.spark.sql.functions._
    val scored = Seq((1L, 0.9, 10L), (1L, Double.NaN, 11L), (1L, 0.8, 12L),
      (1L, Double.NaN, 9L)).toDF("q_id", "sim", "n_id")
    val top = scored.groupBy("q_id")
      .agg(graft.functions.TopK.topK(col("sim"), col("n_id"), 3).as("t"))
      .select(explode(col("t")).as("s")).select("s.id").collect().map(_.getLong(0))
    // NaN ties broken by id asc, then finite sims descending
    assert(top.toSeq == Seq(9L, 11L, 10L))
  }

  test("simhash expression: identical text -> distance 0, near-dup small, unrelated large") {
    val fps = Dedup.simhashes(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(4L))
    assert(SimHash64.hamming(fps(1L), fps(2L)) <= 12)
    assert(SimHash64.hamming(fps(1L), fps(3L)) > 12)
    // blocking guarantee (pigeonhole over 4 bands) holds for hamming <= 3:
    // the exact dup must be found; the ~8-bit pair (1,2) may or may not
    // share a clean band and is out of the guarantee
    val pairs = Dedup.simhashPairs(corpus, maxHamming = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("simhash pigeonhole banding finds pairs the fixed-4-band scheme missed") {
    // deterministic planted pair at Hamming distance 5 whose fingerprints
    // share NONE of the four 16-bit bands — the r1 parameterization
    // (4 bands, maxHamming=8) silently dropped exactly this shape
    val baseText = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    val mutText = baseText + " am max"
    val ha = SimHash64.compute(baseText)
    val hb = SimHash64.compute(mutText)
    assert(SimHash64.hamming(ha, hb) == 5)
    assert((0 until 4).forall(i =>
      ((ha >>> (i * 16)) & 0xffffL) != ((hb >>> (i * 16)) & 0xffffL)))
    val docs = Seq((1L, baseText), (2L, mutText)).toDF("doc_id", "text")
    // maxHamming = 5 -> 6 bands -> guaranteed recall by pigeonhole
    val pairs = Dedup.simhashPairs(docs, maxHamming = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("simhash blocking guarantee: every pair within radius is emitted") {
    // across the whole corpus, simhashPairs(maxHamming=h) must emit
    // EVERY pair whose true Hamming distance is <= h (soundness of the
    // maxHamming+1 banding)
    val fps = corpus.collect().map(r => r.getLong(0) -> SimHash64.compute(
      r.getString(1).toLowerCase.replaceAll("\\s+", " ").trim)).toMap
    for (h <- Seq(0, 3, 12)) {
      val expected = (for {
        a <- fps.keys; b <- fps.keys if a < b
        if SimHash64.hamming(fps(a), fps(b)) <= h
      } yield (a, b)).toSet
      val got = Dedup.simhashPairs(corpus, maxHamming = h)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"maxHamming=$h")
    }
  }

  test("ngram jaccard pairs match a naive all-pairs oracle") {
    // independent truth: exact Jaccard over Scala-computed shingle sets
    def shingles(t: String): Set[String] = {
      val toks = t.toLowerCase.replaceAll("\\s+", " ").trim.split(" ").toSeq
      if (toks.length < 3) Set(toks.mkString(" "))
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val sh = corpus.collect().map(r => r.getLong(0) -> shingles(r.getString(1))).toMap
    val expected = (for {
      a <- sh.keys; b <- sh.keys if a < b
      j = (sh(a) & sh(b)).size.toDouble / (sh(a) | sh(b)).size.toDouble
      if j >= 0.5
    } yield (a, b) -> j).toMap
    val got = Dedup.ngramJaccardPairs(corpus, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == expected)
  }

  test("ngram jaccard inverted index finds near-dups with exact score") {
    val rows = Dedup.ngramJaccardPairs(corpus, threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(rows.contains((1L, 4L)) && rows((1L, 4L)) == 1.0)
    assert(rows.contains((1L, 2L)) && rows((1L, 2L)) > 0.5 && rows((1L, 2L)) < 1.0)
    assert(!rows.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhashAgainstIndex equals the cross slice of the one-shot pair run") {
    import org.apache.spark.sql.functions._
    // corpus = ids < 100; batch = mutants shifted +1000
    val corpusDocs = corpus.filter(col("doc_id") < 100)
    val batch = corpusDocs.filter(col("doc_id") % 2 === 0)
      .select((col("doc_id") + 1000).as("doc_id"),
        concat(col("text"), lit(" tail")).as("text"))
    val index = Dedup.minhashSignatures(corpusDocs)
    val got = Dedup.minhashAgainstIndex(index, batch, corpusDocs,
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // one-shot run over corpus ∪ batch, sliced to cross pairs
    val expected = Dedup.minhashPairs(corpusDocs.unionByName(batch),
        threshold = 0.5)
      .filter(col("id_a") < 1000 && col("id_b") >= 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == expected)
    assert(got.nonEmpty, "planted mutants must match their originals")
  }

  test("simhashAgainstIndex equals the cross slice of the one-shot pair run") {
    import org.apache.spark.sql.functions._
    val corpusDocs = corpus.filter(col("doc_id") < 100)
    val batch = corpusDocs
      .select((col("doc_id") + 1000).as("doc_id"), col("text"))
    val index = Dedup.simhashes(corpusDocs)
    val got = Dedup.simhashAgainstIndex(index, batch, maxHamming = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val expected = Dedup.simhashPairs(corpusDocs.unionByName(batch),
        maxHamming = 5)
      .filter(col("id_a") < 1000 && col("id_b") >= 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got == expected)
    // exact copies have hamming 0 against their originals
    assert(got.exists(_._2 == 0), s"planted copies must surface: $got")
  }

  test("ngramJaccardPairsPrefix is result-identical to the plain inverted index") {
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val plain = Dedup.ngramJaccardPairs(corpus, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val prefix = Dedup.ngramJaccardPairsPrefix(corpus, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(prefix == plain, s"threshold=$t")
    }
  }

  test("wordShingles expression matches the HOF formulation on real docs") {
    import graft.functions.TextFunctions.normalText
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val toks = split(normalText(col("text")), " ")
    val viaHof = array_sort(array_distinct(
      when(size(toks) < 3, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(0), size(toks) - 3),
          i => concat_ws(" ", slice(toks, i + 1, lit(3)))))))
    val mismatches = docs.select(
        array_sort(Dedup.wordShingles(col("text"), 3)).as("fast"),
        viaHof.as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(mismatches == 0)
    // short/empty-doc edge cases
    val edge = Seq((1L, ""), (2L, "  "), (3L, "one"), (4L, "one two"),
      (5L, "one two three"), (6L, "a  b\tc\nd")).toDF("doc_id", "text")
    val got = edge.select(col("doc_id"), Dedup.wordShingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    assert(got(1L) == Seq("") && got(2L) == Seq(""))
    assert(got(3L) == Seq("one") && got(4L) == Seq("one two"))
    assert(got(5L) == Seq("one two three"))
    assert(got(6L) == Seq("a b c", "b c d"))
  }

  test("clusters: min-label propagation finds components incl. chains") {
    // chain 1-2, 2-3 (one component), pair 5-6, singleton 9
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val ids = Seq(1L, 2L, 3L, 5L, 6L, 9L).toDF("id")
    val got = Dedup.clusters(pairs, ids)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 9L -> 9L))
  }

  test("simhash codegen and interpreted paths agree") {
    val df = corpus.select(SimHash64.simhash64(col("text")).as("h"))
    val viaScala = corpus.collect().map(r => SimHash64.compute(r.getString(1)))
    assert(df.collect().map(_.getLong(0)).toSeq == viaScala.toSeq)
  }

  private val vecs = {
    val r = new scala.util.Random(3)
    def unit(): Array[Float] = {
      val v = Array.fill(16)(r.nextGaussian().toFloat)
      v
    }
    val base = unit()
    val nearDup = base.zipWithIndex.map { case (x, i) =>
      x + (if (i % 2 == 0) 0.01f else -0.01f) }
    Seq((0L, base), (1L, nearDup), (2L, unit()), (3L, unit()), (4L, unit()))
      .toDF("vec_id", "embedding")
  }

  test("brute-force topk ranks the near-dup vector first") {
    val out = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), k = 2)
      .orderBy("rank").collect()
    assert(out.head.getAs[Long]("n_id") == 1L)
    assert(out.head.getAs[Double]("sim") > 0.99)
    assert(out.length == 2)
  }

  test("embedding near-dup pairs via LSH banding finds the planted pair") {
    val pairs = Similarity.embeddingNearDupPairs(vecs, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("TopK aggregator matches row_number window ranking exactly") {
    import org.apache.spark.sql.expressions.Window
    val r = new scala.util.Random(11)
    val scored = (1 to 500).map(_ =>
      (r.nextInt(5).toLong, r.nextLong().abs % 1000,
        // duplicated sims force tie-breaks through the id ordering
        (r.nextInt(20) / 20.0))).toDF("q_id", "n_id", "sim")
      .dropDuplicates("q_id", "n_id")
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
    val viaWindow = scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 7)
      .select("q_id", "n_id", "sim", "rank")
      .collect().map(_.toSeq).toSet
    val viaAgg = scored
      .groupBy(col("q_id"))
      .agg(graft.functions.TopK.topK(col("sim"), col("n_id"), 7).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("q_id"), col("s.id").as("n_id"), col("s.sim").as("sim"),
        (col("pos") + 1).cast("long").as("rank"))
      .collect().map(_.toSeq).toSet
    assert(viaAgg == viaWindow)
  }

  /** sf0.001 embeddings ∪ planted ±0.01-perturbed mutants of every 10th
    * vector (mirrors `Queries.nearDupVectors` and the DuckDB oracle's
    * reconstruction — keep the three in sync).
    */
  private def plantedMutantCorpus(): org.apache.spark.sql.DataFrame = {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    e.unionByName(e.filter(col("vec_id") % 10 === 0)
      .withColumn("vec_id", col("vec_id") + 100000)
      .withColumn("embedding",
        zip_with(col("embedding"), sequence(lit(0), size(col("embedding")) - 1),
          (x, d) => (x + when(d % 2 === 0, lit(0.01f)).otherwise(lit(-0.01f)))
            .cast("float"))))
  }

  test("IVF recall@1 on planted near-dup vectors at sf0.001") {
    import graft.operators.Ivf
    val corpus = plantedMutantCorpus()
    val got = Ivf.topK(corpus, corpus.filter(col("vec_id") >= 100000), k = 1,
        kClusters = 16, iters = 2, nprobe = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val queries = corpus.filter(col("vec_id") >= 100000)
      .select(col("vec_id")).collect().map(_.getLong(0))
    assert(queries.nonEmpty)
    // every mutant's nearest neighbor is its original
    for (q <- queries) assert(got.get(q).contains(q - 100000), s"query $q")
  }

  test("persisted IVF index: result-identical to in-memory path, manifest-pruned reads") {
    import graft.operators.Ivf
    val corpus = plantedMutantCorpus()
    val queries = corpus.filter(col("vec_id") >= 100000)
    val model = Ivf.train(corpus, k = 8, iters = 2)
    val root = java.nio.file.Files.createTempDirectory("ivf-idx")
      .resolve("t").toString
    val index = Ivf.buildIndex(spark, corpus, model, root)
    // cluster ids are manifest partition values, not extra data columns
    // beyond the stored assignment
    assert(index.currentSnapshot().partitions.flatten.nonEmpty)
    val viaIndex = Ivf.topKWithIndex(index, queries, model, k = 1, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaModel = Ivf.topKWithModel(corpus, queries, model, k = 1, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaIndex == viaModel, "persisted index must not change results")
    // pruning proof: reading one probed cluster opens strictly fewer
    // files than the full index holds (file list cut at the manifest)
    val someCluster = index.currentSnapshot().partitions.flatten.head
    val opened = index.readPartitions(_.contains(someCluster))
      .select(input_file_name()).distinct().count()
    val total = index.currentSnapshot().files.size.toLong
    assert(opened < total,
      s"expected manifest pruning: opened $opened of $total files")
    // REBUILD on the same root: the data lands in one atomic overwrite
    // commit (followed by the metadata-only staleness-baseline
    // property), same results
    val vBefore = index.currentVersion()
    val rebuilt = Ivf.buildIndex(spark, corpus, model, root)
    assert(rebuilt.log.read(vBefore + 1).operation == "overwrite_table")
    assert(rebuilt.currentSnapshot().operation == "set-properties")
    assert(rebuilt.currentSnapshot().properties.contains(Ivf.BaseSimProp))
    val viaRebuilt = Ivf.topKWithIndex(rebuilt, queries, model, k = 1, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaRebuilt == viaModel)
  }

  test("appendToIndex: incremental batch equals full rebuild; drifted batch flags stale") {
    import graft.operators.Ivf
    val corpus = plantedMutantCorpus()
    val queries = corpus.filter(col("vec_id") >= 100000)
    val model = Ivf.train(corpus, k = 8, iters = 2)
    // build from a PREFIX, append the remainder as an ingest batch
    val prefix = corpus.filter(col("vec_id") % 5 =!= 0)
    val batch = corpus.filter(col("vec_id") % 5 === 0)
    val root = java.nio.file.Files.createTempDirectory("ivf-appendidx")
      .resolve("t").toString
    Ivf.buildIndex(spark, prefix, model, root)
    val rep = Ivf.appendToIndex(spark, batch, model, root)
    // O(batch) commit: an append, never a rewrite
    assert(rep.table.currentSnapshot().operation == "append")
    assert(rep.appendedRows == batch.count())
    // same distribution → no staleness flag, and the baseline is recorded
    assert(rep.baseMeanSim.isDefined)
    assert(!rep.stale, s"same-distribution batch flagged stale: $rep")
    // the incrementally-maintained index answers EXACTLY like a full
    // rebuild over the whole corpus (same frozen model ⇒ same clusters)
    val viaAppend = Ivf.topKWithIndex(rep.table, queries, model,
        k = 1, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fullRoot = java.nio.file.Files.createTempDirectory("ivf-fullidx")
      .resolve("t").toString
    val full = Ivf.buildIndex(spark, corpus, model, fullRoot)
    val viaFull = Ivf.topKWithIndex(full, queries, model, k = 1, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaAppend == viaFull, "incremental index must match full rebuild")
    // a distribution-shifted batch (orthogonalized vectors: even dims
    // zeroed, odd dims negated) assigns much worse → stale fires
    val drifted = batch.select(col("vec_id"),
      expr("transform(embedding, (x, i) -> CAST(CASE WHEN i % 2 = 0 " +
        "THEN 0.0 ELSE -x END AS FLOAT))").as("embedding"))
    val rep2 = Ivf.appendToIndex(spark, drifted
      .withColumn("vec_id", col("vec_id") + 900000L), model, root)
    assert(rep2.stale, s"drifted batch must flag stale: $rep2")
    // a PQ-coded index refuses a codebook-less append (and vice versa)
    val e = intercept[IllegalArgumentException] {
      Ivf.appendToIndex(spark, batch, model, root,
        pq = Some(Ivf.trainPq(corpus, m = 8, ksub = 16, iters = 2)))
    }
    assert(e.getMessage.contains("codebook"), e.getMessage)
  }

  test("PQ encode/LUT/ADC agree with direct subspace arithmetic") {
    import graft.functions.Pq
    val r = new scala.util.Random(7)
    val d = 8
    val rows = (0L until 40L).map(i =>
      (i, Array.fill(d)(r.nextGaussian().toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val cb = graft.operators.Ivf.trainPq(df, m = 4, ksub = 4, iters = 5)
    assert(cb.dsub == 2 && cb.flat.length == 4 * 4 * 2)
    val out = df.select(col("vec_id"), Pq.encode(col("embedding"), cb).as("code"),
        Pq.lut(col("embedding"), cb).as("lut"))
      .withColumn("adc_self", Pq.adc(col("code"), col("lut"), cb))
      .collect()
    for (row <- out) {
      val id = row.getLong(0)
      val v = rows(id.toInt)._2.map(_.toDouble)
      val code = row.getAs[Array[Byte]](1)
      // each code entry is the argmin centroid of its subspace
      for (s <- 0 until cb.m) {
        val dists = (0 until cb.ksub).map { j =>
          val c = cb.centroid(s, j)
          (0 until cb.dsub).map(i => math.pow(v(s * cb.dsub + i) - c(i), 2)).sum
        }
        assert(code(s) == dists.indexOf(dists.min).toByte, s"id=$id s=$s")
      }
      // ADC of a vector against its own LUT = sum of per-subspace
      // min distances (quantization error), reproduced exactly
      val expect = (0 until cb.m).map { s =>
        (0 until cb.ksub).map { j =>
          val c = cb.centroid(s, j)
          (0 until cb.dsub).map(i => math.pow(v(s * cb.dsub + i) - c(i), 2)).sum
        }.min
      }.sum
      assert(math.abs(row.getDouble(3) - expect) < 1e-12, s"id=$id")
    }
  }

  test("IVF-PQ with exact re-rank matches the plain IVF results exactly") {
    import graft.operators.Ivf
    val corpus = plantedMutantCorpus()
    val queries = corpus.filter(col("vec_id") >= 100000)
    val model = Ivf.train(corpus, k = 16, iters = 2)
    val cb = Ivf.trainPq(corpus, m = 8, ksub = 16, iters = 5)
    val viaPq = Ivf.topKPqWithModel(corpus, queries, model, cb,
        k = 1, nprobe = 4, shortlist = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaIvf = Ivf.topKWithModel(corpus, queries, model, k = 1, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the exact re-rank restores bit-identical (q, n, sim) triples as
    // long as the true neighbor survives the ADC shortlist
    assert(viaPq == viaIvf)
    // and recall@1 is perfect on the planted mutants
    val got = viaPq.map(t => t._1 -> t._2).toMap
    got.foreach { case (q, n) => assert(n == q - 100000, s"query $q") }
  }

  test("IVF-PQ over the persisted index: manifest-pruned, code-only scan, identical results") {
    import graft.operators.Ivf
    val corpus = plantedMutantCorpus()
    val queries = corpus.filter(col("vec_id") >= 100000)
    val model = Ivf.train(corpus, k = 16, iters = 2)
    val cb = Ivf.trainPq(corpus, m = 8, ksub = 16, iters = 5)
    val root = java.nio.file.Files.createTempDirectory("ivfpq-idx")
      .resolve("t").toString
    val index = Ivf.buildIndex(spark, corpus, model, root, pq = Some(cb))
    assert(index.schema.fieldNames.contains("code"))
    val viaIndex = Ivf.topKPqWithIndex(index, queries, model, cb,
        k = 1, nprobe = 4, shortlist = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaModel = Ivf.topKPqWithModel(corpus, queries, model, cb,
        k = 1, nprobe = 4, shortlist = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaIndex == viaModel,
      "persisted PQ index must not change IVF-PQ results")
    // an index built WITHOUT codes refuses the PQ read path up front
    val plainRoot = java.nio.file.Files.createTempDirectory("ivfpq-plain")
      .resolve("t").toString
    val plain = Ivf.buildIndex(spark, corpus, model, plainRoot)
    intercept[IllegalArgumentException](
      Ivf.topKPqWithIndex(plain, queries, model, cb, k = 1))
  }

  test("lsh topk returns subset consistent with brute force at high band count") {
    val bf = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), k = 4)
      .collect().map(_.getAs[Long]("n_id")).toSet
    val lsh = Similarity.lshTopK(vecs, vecs.filter($"vec_id" === 0), k = 4,
      bitsPerBand = 2, bands = 8)
      .collect().map(_.getAs[Long]("n_id")).toSet
    assert(lsh.subsetOf(bf + 1L))
    assert(lsh.contains(1L)) // near-identical vector must share a band
  }

  test("crossDocNgrams: exact dups fully duplicated, unique docs at zero, short docs whole-text") {
    val docs = Seq(
      (1L, "a b c d e f g h"),          // 4 distinct 5-grams, all shared with 2
      (2L, "a b c d e f g h"),          // exact dup of 1
      (3L, "p q r s t u v w x"),        // 5 distinct 5-grams, none shared
      (4L, "c d e f g z z z z"),        // shares exactly "c d e f g" with 1/2
      (5L, "tiny doc")                  // < 5 tokens -> one whole-text shingle
    ).toDF("doc_id", "text")
    val out = Dedup.crossDocNgrams(docs, shingleLen = 5, minDocs = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == (4L, 4L)) // every 5-gram occurs in doc 2 as well
    assert(out(2L) == (4L, 4L))
    assert(out(3L) == (5L, 0L)) // nothing shared
    assert(out(4L) == (5L, 1L)) // only "c d e f g" is cross-document
    assert(out(5L) == (1L, 0L)) // whole-text shingle, unique
  }

  test("dedupParagraphs: repeated paragraphs strip everywhere, order-exact reconstruction, all-boilerplate doc → empty") {
    val sep = "\n\n"
    val docs = Seq(
      (1L, Seq("unique one", "SUBSCRIBE NOW", "alpha beta").mkString(sep)),
      (2L, Seq("SUBSCRIBE NOW", "unique two").mkString(sep)),
      (3L, "SUBSCRIBE NOW"),                       // only boilerplate
      (4L, Seq("solo paragraph", "another solo").mkString(sep)),
      // same paragraph TWICE in one doc but nowhere else: df counts
      // DISTINCT docs, so it survives (within-doc repetition is the
      // text_repetition signal, not boilerplate)
      (5L, Seq("twice here", "twice here").mkString(sep))
    ).toDF("doc_id", "text")
    val out = Dedup.dedupParagraphs(docs, minDf = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == s"unique one${sep}alpha beta") // order preserved
    assert(out(2L) == "unique two")
    assert(out(3L) == "")                            // row kept, text empty
    assert(out(4L) == s"solo paragraph${sep}another solo")
    assert(out(5L) == s"twice here${sep}twice here")
  }

  test("SemDedup: cluster-path pairs equal brute-force τ-pairs; min-id survivors") {
    import graft.functions.VectorFunctions.cosine
    import graft.operators.{Ivf, SemDedup}
    val corpus = plantedMutantCorpus()
    val model = Ivf.train(corpus, k = 16, iters = 2)
    val got = SemDedup.semanticPairs(corpus, model, tau = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth: exact all-pairs cosine (test-sized corpus only)
    val a = corpus.select(col("vec_id").as("a_id"), col("embedding").as("av"))
    val b = corpus.select(col("vec_id").as("b_id"), col("embedding").as("bv"))
    val brute = a.crossJoin(b).where(col("a_id") < col("b_id"))
      .where(cosine(col("av"), col("bv")) >= 0.95)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty, "planted mutants must produce τ-pairs")
    assert(got == brute,
      "soft-assigned within-cluster pairs must equal the global τ-pairs")
    // every pair is (original, its planted mutant): min-id keep drops
    // exactly the mutants
    assert(brute.forall { case (lo, hi) => hi == lo + 100000L })
    val survivors = SemDedup.survivors(corpus, model, tau = 0.95)
      .select("vec_id").as[Long].collect().toSet
    val ids = corpus.select("vec_id").as[Long].collect().toSet
    assert(survivors == ids -- brute.map(_._2))
    // determinism: a second run produces the identical pair set
    assert(SemDedup.semanticPairs(corpus, model, tau = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == got)
  }

  test("incremental SemDedup: batch vs persisted index, manifest-pruned") {
    import graft.functions.VectorFunctions.cosine
    import graft.operators.{Ivf, SemDedup}
    val corpus = plantedMutantCorpus()
    val model = Ivf.train(corpus, k = 8, iters = 2)
    val root = java.nio.file.Files.createTempDirectory("semdedup-idx")
      .resolve("t").toString
    val index = Ivf.buildIndex(spark, corpus, model, root)
    // batch: jitters of every 7th base (semantic dups of INDEXED rows —
    // must drop) ∪ negated copies of every 13th (cos ≈ −1 — survive)
    val e = corpus.filter(col("vec_id") < 100000L)
    val batch = e.filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 200000L).as("vec_id"),
        transform(col("embedding"),
          x => (x + lit(0.005f)).cast("float")).as("embedding"))
      .unionByName(e.filter(col("vec_id") % 13 === 0)
        .select((col("vec_id") + 300000L).as("vec_id"),
          transform(col("embedding"),
            x => (x * lit(-1.0f)).cast("float")).as("embedding")))
      .localCheckpoint(true)
    val got = SemDedup.survivorsAgainstIndex(index, batch, model,
      tau = 0.95).select("vec_id").as[Long].collect().toSet
    // ground truth: brute-force vs corpus ∪ min-id within batch
    val vsCorpus = batch.select(col("vec_id").as("b_id"),
        col("embedding").as("bv"))
      .crossJoin(corpus.select(col("vec_id").as("c_id"),
        col("embedding").as("cv")))
      .where(cosine(col("bv"), col("cv")) >= 0.95)
      .select("b_id").as[Long].collect().toSet
    val withinBatch = batch.select(col("vec_id").as("a_id"),
        col("embedding").as("av"))
      .crossJoin(batch.select(col("vec_id").as("b_id"),
        col("embedding").as("bv")))
      .where(col("a_id") < col("b_id") &&
        cosine(col("av"), col("bv")) >= 0.95)
      .select("b_id").as[Long].collect().toSet
    val ids = batch.select("vec_id").as[Long].collect().toSet
    assert(got == ids -- vsCorpus -- withinBatch,
      "index-incremental survivors must equal the brute-force rule")
    // the jittered rows all dropped; the negated rows all survived
    assert(got.forall(_ >= 300000L))
    assert((ids -- got).forall(_ < 300000L))
    assert(got.nonEmpty && (ids -- got).nonEmpty)
  }

  test("two-level quantizer probing ALL supers reproduces the flat ranking exactly") {
    import graft.operators.Ivf
    val corpus = plantedMutantCorpus()
    val model = Ivf.train(corpus, k = 16, iters = 2)
    val tl = Ivf.twoLevel(model, groups = 4, nsuper = 2)
    // the children lists PARTITION the fine model
    assert(tl.children.flatten.map(_._1).sorted == model.indices.toList)
    // probing every super makes the hierarchy a reordering of the flat
    // candidate set: same arithmetic, same (sim desc, id asc) tie-break
    val tlAll = tl.copy(nsuper = tl.supers.size)
    val flat = Ivf.FlatQuantizer(model)
    val bad = corpus.select(
        flat.probe(col("embedding"), 5).as("fp"),
        tlAll.probe(col("embedding"), 5).as("tp"),
        flat.assign(col("embedding")).as("fa"),
        tlAll.assign(col("embedding")).as("ta"))
      .filter(col("fp") =!= col("tp") || col("fa") =!= col("ta"))
      .count()
    assert(bad == 0L, s"$bad rows diverge between flat and two-level")
  }

  test("two-level training on a centroid sample still covers every fine centroid") {
    import graft.operators.Ivf
    val corpus = plantedMutantCorpus()
    val model = Ivf.train(corpus, k = 16, iters = 2)
    // trainMax below k forces the stride-sampled Lloyd path (the
    // extreme-k posture: training cost flat in k); the hierarchy must
    // still PARTITION the full fine model and keep exact parity with
    // the flat ranking when probing all supers
    val tl = Ivf.twoLevel(model, groups = 4, nsuper = 2, trainMax = 6)
    assert(tl.children.flatten.map(_._1).sorted == model.indices.toList)
    val tlAll = tl.copy(nsuper = tl.supers.size)
    val flat = Ivf.FlatQuantizer(model)
    val bad = corpus.select(
        flat.probe(col("embedding"), 5).as("fp"),
        tlAll.probe(col("embedding"), 5).as("tp"))
      .filter(col("fp") =!= col("tp")).count()
    assert(bad == 0L, s"$bad rows diverge under sampled training")
    // at k <= trainMax the sample IS the model: bit-identical hierarchy
    val a = Ivf.twoLevel(model, groups = 4, nsuper = 2)
    val b = Ivf.twoLevel(model, groups = 4, nsuper = 2, trainMax = 16)
    assert(a.supers == b.supers && a.children == b.children)
  }

  test("flat quantizer ranks identically across the FlatLitMax codegen threshold") {
    // past FlatLitMax (256) FlatQuantizer swaps the k-literal plan for
    // the broadcast loop (the k-literal subexpression method trips
    // Janino's 64 KB limit at k ≈ 10³ and silently ran interpreted —
    // SURVEY §20.7 #2); this pins that the swap changes the PLAN only:
    // assign/probe answers at k = 300 equal the literal formulation's
    import graft.operators.Ivf
    val model: Ivf.Model = Seq.tabulate(300)(j =>
      Seq.tabulate(16)(d => 1.0 + math.sin(j * 131 + d * 17)))
    val vecs = spark.range(0, 200).select(col("id"),
      transform(sequence(lit(0), lit(15)),
        d => sin(col("id") * lit(37) + d * lit(5)) + lit(1.1))
        .as("embedding"))
    val q = Ivf.FlatQuantizer(model) // k = 300 > FlatLitMax -> loop path
    val got = vecs.select(col("id"), q.assign(col("embedding")).as("c"),
        q.probe(col("embedding"), 4).as("p"),
        q.bestSim(col("embedding")).as("s"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Int](2).toVector, r.getDouble(3))).sortBy(_._1)
    val want = vecs.select(col("id"),
        Ivf.assignExpr(col("embedding"), model).as("c"),
        Ivf.probeExpr(col("embedding"), model, 4).as("p"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Int](2).toVector)).sortBy(_._1)
    assert(got.map(t => (t._1, t._2, t._3)).toSeq == want.toSeq,
      s"loop path diverged: ${got.take(3).mkString("; ")} vs " +
        s"${want.take(3).mkString("; ")}")
    // bestSim must be the cosine of the assigned centroid, bit-exact
    // (spot-checked — one collect per probe)
    got.take(5).foreach { case (id, c, _, s) =>
      val viaLit = vecs.filter(col("id") === id)
        .select(graft.functions.VectorFunctions.cosine(col("embedding"),
          typedLit(model(c))))
        .head.getDouble(0)
      assert(s == viaLit, s"id=$id bestSim $s != cos(assigned) $viaLit")
    }
  }

  test("quantizer() picks flat for small k, two-level past the cap") {
    import graft.operators.Ivf
    val corpus = plantedMutantCorpus()
    val model = Ivf.train(corpus, k = 16, iters = 2)
    assert(Ivf.quantizer(model).isInstanceOf[Ivf.FlatQuantizer])
    val q = Ivf.quantizer(model, flatMax = 8)
    assert(q.isInstanceOf[Ivf.TwoLevelQuantizer])
    // g = ceil(sqrt(16)) = 4 supers (minus any empties)
    assert(q.asInstanceOf[Ivf.TwoLevelQuantizer].supers.size <= 4)
    assert(q.k == 16)
  }

  test("two-level persisted index: recall@1 holds with nsuper < supers") {
    import graft.operators.Ivf
    val corpus = plantedMutantCorpus()
    val queries = corpus.filter(col("vec_id") >= 100000)
    val model = Ivf.train(corpus, k = 16, iters = 2)
    val tl = Ivf.twoLevel(model, groups = 4, nsuper = 2)
    assert(tl.nsuper < tl.supers.size || tl.supers.size <= 2)
    val root = java.nio.file.Files.createTempDirectory("ivf-2l")
      .resolve("t").toString
    val index = Ivf.buildIndex(spark, corpus, tl, root,
      "vec_id", "embedding", None)
    val got = Ivf.topKWithIndex(index, queries, tl, k = 1, nprobe = 4,
        "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val qs = queries.select(col("vec_id")).collect().map(_.getLong(0))
    assert(qs.nonEmpty)
    for (q <- qs) assert(got.get(q).contains(q - 100000), s"query $q")
  }

  test("sharded model: deterministic DataFrame training, assignment parity, index recall") {
    import graft.operators.Ivf
    val corpus = plantedMutantCorpus()
    val (supers, centroids) = Ivf.trainSharded(corpus, kFine = 16,
      iters = 4, samplePerSuper = 256)
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getInt(1),
        r.getSeq[Double](2).toSeq)).toSet
    val c1 = snap(centroids)
    // fine ids globally unique; every super id references the model
    assert(c1.map(_._1).size == c1.size)
    assert(c1.map(_._2).forall(s => s >= 0 && s < supers.size))
    // deterministic end to end (hash sampling, in-group sort, stride
    // seeding, sequential sums)
    val (s2, cDf2) = Ivf.trainSharded(corpus, kFine = 16,
      iters = 4, samplePerSuper = 256)
    assert(supers == s2 && snap(cDf2) == c1)
    // join-based assignment equals the broadcast hierarchy built from
    // the SAME (super, children) rows at equal nsuper
    val grouped = c1.groupBy(_._2).toSeq.sortBy(_._1)
    assert(grouped.map(_._1) == supers.indices.toSeq,
      "test fixture expects every super populated")
    val tl = Ivf.TwoLevelQuantizer(
      grouped.map { case (s, _) => supers(s) },
      grouped.map(_._2.toSeq.sortBy(_._1).map(c => (c._1, c._3))),
      nsuper = 2)
    val viaJoin = Ivf.assignSharded(corpus, supers, centroids, nsuper = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaBc = corpus.select(col("vec_id"),
        tl.assign(col("embedding")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaJoin == viaBc, "join descent must equal broadcast descent")
    // persisted sharded index: recall@1 on the planted mutants
    val root = java.nio.file.Files.createTempDirectory("ivf-sharded")
      .resolve("t").toString
    val idx = Ivf.buildIndexSharded(spark, corpus, supers, centroids,
      nsuper = 2, root)
    val queries = corpus.filter(col("vec_id") >= 100000)
    val got = Ivf.topKSharded(idx, queries, supers, centroids, k = 1,
        nsuper = 2, nprobe = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val qs = queries.select(col("vec_id")).collect().map(_.getLong(0))
    assert(qs.nonEmpty)
    for (qid <- qs) assert(got.get(qid).contains(qid - 100000), s"query $qid")
  }

  test("SemDeDup under the two-level quantizer finds the same pairs as flat") {
    import graft.operators.{Ivf, SemDedup}
    val corpus = plantedMutantCorpus()
    val model = Ivf.train(corpus, k = 16, iters = 2)
    val tl = Ivf.twoLevel(model, groups = 4, nsuper = 2)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val flatPairs = pairSet(SemDedup.semanticPairs(corpus, model, tau = 0.95))
    val tlPairs = pairSet(SemDedup.semanticPairs(corpus, tl, tau = 0.95,
      probes = 2, idCol = "vec_id", vecCol = "embedding"))
    // the flat path is oracle-pinned against the GLOBAL recomputation;
    // matching it proves the hierarchy's soft assignment missed nothing
    assert(tlPairs == flatPairs)
  }

  test("sharded appendToIndex: incremental equals rebuild; drifted batch flags stale") {
    import graft.operators.Ivf
    val corpus = plantedMutantCorpus()
    val queries = corpus.filter(col("vec_id") >= 100000)
    val (supers, centroids) = Ivf.trainSharded(corpus, kFine = 16,
      iters = 4, samplePerSuper = 256)
    val prefix = corpus.filter(col("vec_id") % 5 =!= 0)
    val batch = corpus.filter(col("vec_id") % 5 === 0)
    val root = java.nio.file.Files.createTempDirectory("ivf-shard-app")
      .resolve("t").toString
    Ivf.buildIndexSharded(spark, prefix, supers, centroids, nsuper = 2, root)
    val rep = Ivf.appendToIndexSharded(spark, batch, supers, centroids,
      nsuper = 2, root)
    assert(rep.table.currentSnapshot().operation == "append")
    assert(rep.appendedRows == batch.count())
    assert(rep.baseMeanSim.isDefined)
    assert(!rep.stale, s"same-distribution batch flagged stale: $rep")
    def res(t: graft.catalog.SnapshotTable) =
      Ivf.topKSharded(t, queries, supers, centroids, k = 1,
          nsuper = 2, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fullRoot = java.nio.file.Files.createTempDirectory("ivf-shard-full")
      .resolve("t").toString
    val full = Ivf.buildIndexSharded(spark, corpus, supers, centroids,
      nsuper = 2, fullRoot)
    assert(res(rep.table) == res(full),
      "incremental sharded index must match full rebuild")
    // a distribution-shifted batch assigns much worse → stale fires
    val drifted = batch.select(col("vec_id"),
      expr("transform(embedding, (x, i) -> CAST(CASE WHEN i % 2 = 0 " +
        "THEN 0.0 ELSE -x END AS FLOAT))").as("embedding"))
    val rep2 = Ivf.appendToIndexSharded(spark, drifted
      .withColumn("vec_id", col("vec_id") + 900000L), supers, centroids,
      nsuper = 2, root)
    assert(rep2.stale, s"drifted batch must flag stale: $rep2")
  }

  test("sharded training backstops sample-starved supers; no row strands") {
    import graft.operators.Ivf
    // every vector identical → ALL assign to super 0, so super 1's
    // sample is empty; without the fallback its probers would find no
    // candidates and silently drop from assignment
    val corpus = Seq.tabulate(50)(i => (i.toLong, Seq.fill(8)(1.0)))
      .toDF("vec_id", "embedding")
    val (supers, centroids) = Ivf.trainSharded(corpus, kFine = 4,
      iters = 2, samplePerSuper = 16)
    assert(supers.size == 2)
    val c = centroids.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toSeq))
    assert(c.map(_._2).toSet == Set(0, 1),
      s"every super must own a centroid: ${c.toSeq}")
    // the starved super's backstop is the super centroid itself, in
    // the reserved id range
    val fallback = c.filter(_._1 >= 2 * 2)
    assert(fallback.nonEmpty &&
      fallback.forall(f => f._3 == supers(f._2)))
    // and assignment covers every row
    val assigned = Ivf.assignSharded(corpus, supers, centroids, nsuper = 2)
    assert(assigned.count() == 50L)
  }

  test("persisted sharded centroids: super-partitioned table, pruned reads, same results") {
    import graft.operators.Ivf
    val corpus = plantedMutantCorpus()
    val queries = corpus.filter(col("vec_id") >= 100000)
    val (supers, centroids) = Ivf.trainSharded(corpus, kFine = 16,
      iters = 4, samplePerSuper = 256)
    val idxRoot = java.nio.file.Files.createTempDirectory("ivf-shard-ct")
      .resolve("t").toString
    val idx = Ivf.buildIndexSharded(spark, corpus, supers, centroids,
      nsuper = 2, idxRoot)
    val cRoot = java.nio.file.Files.createTempDirectory("ivf-shard-cents")
      .resolve("t").toString
    val ct = Ivf.saveCentroids(spark, centroids, cRoot)
    // super ids are manifest partition values on the centroid table
    assert(ct.currentSnapshot().partitions.flatten.nonEmpty)
    def rset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaTable = rset(Ivf.topKSharded(idx, queries, supers, ct,
      k = 1, nsuper = 2, nprobe = 4, "vec_id", "embedding"))
    val viaDf = rset(Ivf.topKSharded(idx, queries, supers, centroids,
      k = 1, nsuper = 2, nprobe = 4))
    assert(viaTable == viaDf, "persisted centroids must not change results")
    // pruning proof on the CENTROID table: one probed super's read
    // opens strictly fewer files than the table holds
    val someSuper = ct.currentSnapshot().partitions.flatten.head
    val opened = ct.readPartitions(_.contains(someSuper))
      .select(input_file_name()).distinct().count()
    assert(opened < ct.currentSnapshot().files.size.toLong,
      s"expected centroid-table pruning: opened $opened of " +
        s"${ct.currentSnapshot().files.size}")
  }

  test("sharded IVF-PQ with exact re-rank matches the plain sharded results") {
    import graft.operators.Ivf
    val corpus = plantedMutantCorpus()
    val (supers, centroids) = Ivf.trainSharded(corpus, kFine = 16,
      iters = 4, samplePerSuper = 256)
    val cb = Ivf.trainPq(corpus, m = 8, ksub = 16, iters = 2)
    val root = java.nio.file.Files.createTempDirectory("ivf-shard-pq")
      .resolve("t").toString
    val idx = Ivf.buildIndexSharded(spark, corpus, supers, centroids,
      nsuper = 2, root, "vec_id", "embedding", pq = Some(cb))
    val queries = corpus.filter(col("vec_id") >= 100000)
    def rset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaPq = rset(Ivf.topKPqSharded(idx, queries, supers, centroids, cb,
      k = 1, nsuper = 2, nprobe = 4, shortlist = 8))
    val viaFloat = rset(Ivf.topKSharded(idx, queries, supers, centroids,
      k = 1, nsuper = 2, nprobe = 4))
    assert(viaPq == viaFloat,
      "ADC + exact re-rank must restore the float answers")
    // mismatched codebook expectations are refused, both directions
    intercept[IllegalArgumentException] {
      Ivf.appendToIndexSharded(spark, queries, supers, centroids,
        nsuper = 2, root)
    }
    ()
  }

  test("sharded SemDeDup matches the broadcast hierarchy and the flat oracle path") {
    import graft.operators.{Ivf, SemDedup}
    val corpus = plantedMutantCorpus()
    val (supers, centroids) = Ivf.trainSharded(corpus, kFine = 16,
      iters = 4, samplePerSuper = 256)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val shard = pairSet(SemDedup.semanticPairsSharded(corpus, supers,
      centroids, tau = 0.95, probes = 2, nsuper = 2))
    // identical to the broadcast hierarchy built from the SAME
    // (super, children) rows — the join-based soft assignment must
    // reproduce TwoLevelQuantizer.probe's sets exactly
    val grouped = centroids.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toSeq))
      .groupBy(_._2).toSeq.sortBy(_._1)
    val tl = Ivf.TwoLevelQuantizer(
      grouped.map { case (s, _) => supers(s) },
      grouped.map(_._2.sortBy(_._1).map(c => (c._1, c._3)).toSeq),
      nsuper = 2)
    val viaTl = pairSet(SemDedup.semanticPairs(corpus, tl, tau = 0.95,
      probes = 2, "vec_id", "embedding"))
    assert(shard == viaTl, "sharded pairs must equal the broadcast descent")
    // and equal to the flat path, which the global DuckDB oracle pins —
    // the planted mutants land with their originals under any of the
    // three model shapes
    val model = Ivf.train(corpus, k = 16, iters = 2)
    val flatPairs = pairSet(SemDedup.semanticPairs(corpus, model, tau = 0.95))
    assert(shard == flatPairs)
    // survivors: anti-join of the min-id rule
    val surv = SemDedup.survivorsSharded(corpus, supers, centroids,
      tau = 0.95, probes = 2, nsuper = 2)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val droppedB = shard.map(_._2)
    assert(surv == corpus.select(col("vec_id")).collect()
      .map(_.getLong(0)).toSet -- droppedB)
  }

  test("incremental sharded SemDeDup equals the broadcast-quantizer incremental path") {
    import graft.operators.{Ivf, SemDedup}
    val corpus = plantedMutantCorpus()
    val (supers, centroids) = Ivf.trainSharded(corpus, kFine = 16,
      iters = 4, samplePerSuper = 256)
    val prefix = corpus.filter(col("vec_id") % 5 =!= 0)
    val batch = corpus.filter(col("vec_id") % 5 === 0)
    val rootS = java.nio.file.Files.createTempDirectory("semdd-shard")
      .resolve("t").toString
    val idxS = Ivf.buildIndexSharded(spark, prefix, supers, centroids,
      nsuper = 2, rootS)
    val viaShard = SemDedup.survivorsAgainstIndexSharded(idxS, batch,
        supers, centroids, tau = 0.95, probes = 2, nsuper = 2)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    // the broadcast hierarchy from the SAME (super, children) rows over
    // an index built WITH it: assignment parity makes the two indexes
    // identical, so the incremental answers must coincide exactly
    val grouped = centroids.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toSeq))
      .groupBy(_._2).toSeq.sortBy(_._1)
    val tl = Ivf.TwoLevelQuantizer(
      grouped.map { case (s, _) => supers(s) },
      grouped.map(_._2.sortBy(_._1).map(c => (c._1, c._3)).toSeq),
      nsuper = 2)
    val rootB = java.nio.file.Files.createTempDirectory("semdd-bc")
      .resolve("t").toString
    val idxB = Ivf.buildIndex(spark, prefix, tl, rootB,
      "vec_id", "embedding", None)
    val viaBc = SemDedup.survivorsAgainstIndex(idxB, batch, tl,
        tau = 0.95, probes = 2, "vec_id", "embedding")
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(viaShard == viaBc)
    assert(viaShard.nonEmpty && viaShard != batch.select(col("vec_id"))
      .collect().map(_.getLong(0)).toSet,
      "fixture must both keep and drop something")
  }

  test("incremental SemDeDup under the two-level quantizer matches flat") {
    import graft.operators.{Ivf, SemDedup}
    val corpus = plantedMutantCorpus()
    val model = Ivf.train(corpus, k = 16, iters = 2)
    val tl = Ivf.twoLevel(model, groups = 4, nsuper = 3)
    val prefix = corpus.filter(col("vec_id") % 5 =!= 0)
    val batch = corpus.filter(col("vec_id") % 5 === 0)
    def run(q: Ivf.Quantizer, tag: String): Set[Long] = {
      val root = java.nio.file.Files.createTempDirectory(s"semdd-$tag")
        .resolve("t").toString
      val idx = Ivf.buildIndex(spark, prefix, q, root,
        "vec_id", "embedding", None)
      SemDedup.survivorsAgainstIndex(idx, batch, q, tau = 0.95,
          probes = 2, "vec_id", "embedding")
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    }
    val viaFlat = run(Ivf.FlatQuantizer(model), "flat")
    val viaTl = run(tl, "tl")
    assert(viaTl == viaFlat,
      s"two-level incremental dedup diverged: ${viaTl.diff(viaFlat)} / ${viaFlat.diff(viaTl)}")
  }

  test("trainAuto switches family at the broadcast budget; answers agree across the boundary") {
    import graft.operators.Ivf
    val corpus = plantedMutantCorpus()
    val d = corpus.select(size(col("embedding")).as("d")).head.getInt(0)
    val k = 16
    val modelBytes = k.toLong * d * 8L
    // threshold pin: exactly at budget → broadcast; one byte under →
    // sharded. budgetOverride doubles as the caller override.
    val atBudget = Ivf.trainAuto(corpus, k, iters = 2,
      nsuper = 3, budgetOverride = Some(modelBytes))
    assert(atBudget.isInstanceOf[Ivf.BroadcastTrained],
      s"model of $modelBytes bytes must fit a budget of $modelBytes")
    val underBudget = Ivf.trainAuto(corpus, k, iters = 2,
      nsuper = 3, budgetOverride = Some(modelBytes - 1))
    assert(underBudget.isInstanceOf[Ivf.ShardedTrained],
      "one byte under budget must pick the sharded family")
    // the session CONF drives the default decision
    val prev = spark.conf.getOption(Ivf.BroadcastBudgetKey)
    try {
      spark.conf.set(Ivf.BroadcastBudgetKey, "1")
      assert(Ivf.trainAuto(corpus, k, iters = 2, nsuper = 3)
        .isInstanceOf[Ivf.ShardedTrained])
      spark.conf.set(Ivf.BroadcastBudgetKey, (64L << 20).toString)
      assert(Ivf.trainAuto(corpus, k, iters = 2, nsuper = 3)
        .isInstanceOf[Ivf.BroadcastTrained])
    } finally prev match {
      case Some(v) => spark.conf.set(Ivf.BroadcastBudgetKey, v)
      case None => spark.conf.unset(Ivf.BroadcastBudgetKey)
    }
    // unchanged RESULTS across the boundary: both families must answer
    // the planted-mutant recall contract identically through the SAME
    // handle surface (index build + probe), and assignments must cover
    // every row exactly once
    val queries = corpus.filter(col("vec_id") >= 100000)
    def answers(tq: Ivf.TrainedQuantizer, tag: String): Map[Long, Long] = {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-auto-$tag").resolve("t").toString
      val idx = tq.buildIndex(spark, corpus, root)
      val n = corpus.count()
      assert(tq.assignments(corpus).count() == n,
        s"$tag: every row must receive exactly one cluster")
      tq.topK(idx, queries, k = 1, nprobe = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val viaBroadcast = answers(atBudget, "bc")
    val viaSharded = answers(underBudget, "sh")
    assert(viaBroadcast == viaSharded,
      "the family switch must not change query answers on this corpus")
    val qs = queries.select(col("vec_id")).collect().map(_.getLong(0))
    assert(qs.nonEmpty)
    for (q <- qs) assert(viaBroadcast.get(q).contains(q - 100000),
      s"query $q must find its planted original")
  }

  test("trainSharded sizes its sample from the manifest on a snapshot-table corpus (no count scan)") {
    import graft.operators.Ivf
    val corpus = plantedMutantCorpus()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.shardmeta")
    spark.sql("DROP TABLE IF EXISTS graft.shardmeta.corpus")
    spark.sql("CREATE TABLE graft.shardmeta.corpus " +
      "(vec_id BIGINT, embedding ARRAY<FLOAT>)")
    corpus.writeTo("graft.shardmeta.corpus").append()
    def tblRead() = spark.table("graft.shardmeta.corpus")
    val n = corpus.count()
    // the metadata probe: exact on a bare catalog read and on a
    // projected one; None (→ fall back to counting) the moment a
    // residual Filter sits above the scan — a pushed-but-conservative
    // prune must never smuggle an overcount into the sampling fraction
    assert(Ivf.metadataRowCount(tblRead()).contains(n))
    assert(Ivf.metadataRowCount(
      tblRead().select(col("vec_id"), col("embedding"))).contains(n))
    assert(Ivf.metadataRowCount(
      tblRead().filter(col("vec_id") >= Long.MinValue)).isEmpty)
    assert(Ivf.metadataRowCount(corpus).isEmpty,
      "a union corpus has no manifest row count")
    // the count JOB itself must not run on the snapshot-table corpus:
    // identical Spark job counts with and without an explicit hint
    // (the hint variant provably runs no count), strictly fewer than
    // the forced-fallback shape which must pay one
    def jobsOf(group: String)(f: => Unit): Int = {
      spark.sparkContext.setJobGroup(group, group,
        interruptOnCancel = false)
      try f finally spark.sparkContext.clearJobGroup()
      // statusTracker is fed by an async listener bus: poll until two
      // consecutive reads agree so the count is settled, bounded retries
      var prev = -1
      var cur = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
      var tries = 0
      while (cur != prev && tries < 100) {
        prev = cur
        Thread.sleep(50)
        cur = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
        tries += 1
      }
      cur
    }
    def snap(r: (Ivf.Model, org.apache.spark.sql.DataFrame)) =
      (r._1, r._2.collect().map(x => (x.getInt(0), x.getInt(1),
        x.getSeq[Double](2).toSeq)).toSet)
    var a: (Ivf.Model, Set[(Int, Int, Seq[Double])]) = null
    var b: (Ivf.Model, Set[(Int, Int, Seq[Double])]) = null
    var c: (Ivf.Model, Set[(Int, Int, Seq[Double])]) = null
    val jobsMeta = jobsOf("shard-meta") {
      a = snap(Ivf.trainSharded(tblRead(), kFine = 16, iters = 4,
        samplePerSuper = 256))
    }
    val jobsHint = jobsOf("shard-hint") {
      b = snap(Ivf.trainSharded(tblRead(), kFine = 16, iters = 4,
        samplePerSuper = 256, rowCountHint = Some(n)))
    }
    val jobsCount = jobsOf("shard-count") {
      c = snap(Ivf.trainSharded(
        tblRead().filter(col("vec_id") >= Long.MinValue), kFine = 16,
        iters = 4, samplePerSuper = 256))
    }
    assert(a == b && b == c,
      "the size source must not change the trained model")
    assert(jobsMeta == jobsHint,
      s"snapshot-table corpus must train with ZERO count jobs: " +
        s"metadata path ran $jobsMeta jobs vs hint path $jobsHint")
    assert(jobsCount > jobsMeta,
      s"fallback shape must pay the count job: $jobsCount vs $jobsMeta")
    // MoR shapes: a delete VECTOR keeps the count exact (position
    // counts are manifest facts); a pending EQUALITY delete makes the
    // live count unknowable without reading — the probe must refuse,
    // not overcount (the estimate twin rounds up by design)
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val underlying = graft.catalog.SnapshotTable.load(spark,
      s"$wh/shardmeta/corpus")
    underlying.deleteWithVectors(col("vec_id") === 3L)
    assert(Ivf.metadataRowCount(tblRead()).contains(n - 1),
      "delete-vector rows subtract exactly")
    import spark.implicits._
    underlying.deleteByKeys(Seq(5L).toDF("vec_id"), Seq("vec_id"))
    assert(Ivf.metadataRowCount(tblRead()).isEmpty,
      "pending equality deletes must refuse the metadata count")
  }
}
