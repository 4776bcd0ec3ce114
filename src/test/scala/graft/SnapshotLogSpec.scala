package graft

import java.nio.file.{Files, Paths}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{ColStats, DataFileEntry, Snapshot, SnapshotLog}

/** Pins the sharded-metadata format (v2): commit I/O is O(batch) not
  * O(table), Bloom payloads live in sidecars and resolve lazily,
  * format-v1 logs stay readable, and the manifest list stays bounded.
  * Pure log-layer tests — no SparkSession.
  */
class SnapshotLogSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("k", LongType), StructField("s", StringType)))

  private def freshRoot(): String =
    Files.createTempDirectory("snaplog").resolve("t").toString

  private def fakeBloom(seed: Int): String =
    java.util.Base64.getEncoder.encodeToString(
      Array.tabulate[Byte](1024)(i => ((i * seed) & 0xff).toByte))

  private def entry(i: Int, bloom: Boolean = false): DataFileEntry =
    DataFileEntry(f"data/b0/part-$i%05d.parquet", Some("2024-01"), 100L,
      Map("k" -> ColStats(Some(s"${i * 10}"), Some(s"${i * 10 + 9}"), 0L,
        if (bloom) Some(fakeBloom(i + 1)) else None)),
      Seq("k" -> 0, "s" -> 1))

  private def snap(v: Long, parent: Option[Long], files: Seq[DataFileEntry],
      props: Map[String, String] = Map.empty): Snapshot =
    Snapshot(v, parent, if (parent.isEmpty) "create" else "append",
      1000000L + v, schema, None, props, files,
      fieldIds = Seq("k" -> 0, "s" -> 1), nextFieldId = 2)

  private def snapSize(root: String, v: Long): Long =
    Files.size(Paths.get(root, SnapshotLog.LogDirName, f"snap-$v%011d.json"))

  test("streaming manifest writer is byte-identical to the json4s reference") {
    // every optional-field combination, plus strings that exercise
    // the full escaping table (quotes, backslashes, named control
    // escapes, generic \u00XX control chars, unicode passthrough)
    val nasty = "a\"b\\c\bd\fe\nf\rg\thij — ünïcødé"
    val entries = Seq(
      DataFileEntry("data/plain.parquet", None, 0L),
      DataFileEntry(nasty, Some(nasty), 42L,
        Map(nasty -> ColStats(Some(nasty), None, 7L, Some("QUJD"),
            Some("12"), Some("3.50")),
          "a" -> ColStats(None, Some("z"), 0L),
          "b" -> ColStats(Some("1"), Some("2"), 1L, None, Some("5"))),
        Seq(nasty -> 3, "k" -> 0), seq = 9L,
        nested = Seq("1.x" -> 4), bytes = 1L << 40, upd = true),
      DataFileEntry("data/defaults.parquet", Some("p"), 1L,
        Map.empty, Seq("k" -> 0), seq = 0L, bytes = 0L),
      entry(5, bloom = true))
    // whole-manifest parity, single-entry parity, and empty manifest
    assert(SnapshotLog.manifestToJson(entries) ==
      SnapshotLog.manifestToJsonAst(entries))
    entries.foreach(e => assert(SnapshotLog.manifestToJson(Seq(e)) ==
      SnapshotLog.manifestToJsonAst(Seq(e)), e.path))
    assert(SnapshotLog.manifestToJson(Nil) ==
      SnapshotLog.manifestToJsonAst(Nil))
    // round trip through the streaming writer AND parser
    assert(SnapshotLog.manifestFromJson(
      SnapshotLog.manifestToJson(entries)) == entries)
    // streaming parser ≡ json4s reference parser, on both writers'
    // bytes (field-order tolerance is exercised by the AST writer
    // emitting the same order; unknown-field skipping by a doctored
    // payload)
    val jsons = Seq(SnapshotLog.manifestToJson(entries),
      SnapshotLog.manifestToJsonAst(entries))
    jsons.foreach { j =>
      assert(SnapshotLog.manifestFromJson(j) ==
        SnapshotLog.manifestFromJsonAst(j))
    }
    val doctored = SnapshotLog.manifestToJson(entries)
      .replaceFirst("\\{\"path\"",
        "{\"futureField\":{\"x\":[1,2,{\"y\":null}]},\"path\"")
    assert(SnapshotLog.manifestFromJson(doctored) ==
      SnapshotLog.manifestFromJsonAst(doctored))
  }

  test("commit cost is O(batch), not O(table): 1000-file table, 10-file append") {
    val root = freshRoot()
    val log = new SnapshotLog(new Path(root), new Configuration())
    val base = (1 to 1000).map(entry(_))
    assert(log.tryCommit(snap(1, None, base)))
    // the appending commit re-points at the parent's manifest and
    // writes only its own 10-entry batch
    val added = (2001 to 2010).map(entry(_))
    assert(log.tryCommit(snap(2, Some(1), base ++ added)))
    assert(snapSize(root, 2) < 4096,
      s"snapshot file must stay pointer-sized, got ${snapSize(root, 2)}")
    val mans = log.manifestList(2)
    // commit-2 I/O = its snapshot + its 10-entry manifest; the table's
    // 1000-entry manifest is reused by path, never rewritten
    def manSize(rel: String): Long =
      Files.size(Paths.get(root, SnapshotLog.LogDirName, rel))
    val Seq(bigMan) = log.manifestList(1).map(_.path)
    val newMan = mans.map(_.path).filterNot(_ == bigMan)
    assert(newMan.size == 1)
    assert(manSize(newMan.head) + snapSize(root, 2) < manSize(bigMan) / 20,
      s"append wrote ${manSize(newMan.head) + snapSize(root, 2)} metadata " +
        s"bytes against a ${manSize(bigMan)}-byte table manifest — not O(batch)")
    assert(mans.size == 2, "one reused manifest + one new batch manifest")
    assert(mans.map(_.fileCount).sorted == Seq(10, 1000))
    assert(log.manifestList(1).map(_.path).toSet
      .subsetOf(mans.map(_.path).toSet), "parent manifest reused by path")
    // full read-back equality, order preserved (reused first, batch last)
    assert(log.read(2).files == base ++ added)
    // a metadata-only commit (same files) writes NO new manifest
    assert(log.tryCommit(snap(3, Some(2), base ++ added)))
    assert(log.manifestList(3).map(_.path) == mans.map(_.path))
  }

  test("bloom payloads move to a sidecar and resolve lazily by ref") {
    val root = freshRoot()
    val log = new SnapshotLog(new Path(root), new Configuration())
    val files = (1 to 5).map(entry(_, bloom = true))
    assert(log.tryCommit(snap(1, None, files)))
    // neither the snapshot nor the manifest embeds the payload
    val snapJson = new String(Files.readAllBytes(
      Paths.get(root, SnapshotLog.LogDirName, f"snap-${1L}%011d.json")), "UTF-8")
    assert(!snapJson.contains(fakeBloom(2).take(32)))
    val readBack = log.read(1)
    val tokens = readBack.files.map(_.stats("k").bloom.get)
    assert(tokens.forall(_.startsWith(SnapshotLog.RefPrefix)))
    val manJson = new String(Files.readAllBytes(Paths.get(root,
      SnapshotLog.LogDirName, log.manifestList(1).head.path)), "UTF-8")
    assert(!manJson.contains(fakeBloom(2).take(32)),
      "manifest itself must not carry bloom bytes")
    // the ref resolves to the exact original payload, keyed by file+col
    readBack.files.zipWithIndex.foreach { case (f, i) =>
      assert(log.resolveBloom(f.stats("k").bloom.get, f.path)
        .contains(fakeBloom(i + 2)))
    }
    // a fresh log instance (cold cache) resolves too
    val cold = new SnapshotLog(new Path(root), new Configuration())
    val f0 = cold.read(1).files.head
    assert(cold.resolveBloom(f0.stats("k").bloom.get, f0.path)
      .contains(fakeBloom(2)))
    // unknown refs keep conservative semantics: None, never a throw
    assert(log.resolveBloom("ref:blooms/nope.json#k", "x").isEmpty)
    // carried-forward ref tokens survive a partial rewrite untouched
    val survivors = files.drop(1)
    assert(log.tryCommit(snap(2, Some(1), survivors)))
    val f1 = log.read(2).files.head
    assert(log.resolveBloom(f1.stats("k").bloom.get, f1.path)
      .contains(fakeBloom(3)), "rewritten manifest points at OLD sidecar")
  }

  test("format-v1 logs stay readable and migrate on first commit") {
    val root = freshRoot()
    val logDir = Paths.get(root, SnapshotLog.LogDirName)
    Files.createDirectories(logDir)
    val v1 = snap(1, None, (1 to 20).map(entry(_, bloom = true)))
    Files.write(logDir.resolve(f"snap-${1L}%011d.json"),
      SnapshotLog.toJson(v1).getBytes("UTF-8")) // old writer: inline files
    val log = new SnapshotLog(new Path(root), new Configuration())
    assert(log.manifestList(1).isEmpty, "v1 snapshot has no manifest list")
    val r = log.read(1)
    assert(r.files == v1.files)
    assert(r.files.head.stats("k").bloom.exists(
      !_.startsWith(SnapshotLog.RefPrefix)), "v1 blooms stay inline")
    // first v2 commit on a v1 parent writes the one-time full manifest
    assert(log.tryCommit(snap(2, Some(1), v1.files :+ entry(99))))
    assert(log.manifestList(2).size == 1)
    assert(log.read(2).files.map(_.path).toSet ==
      (v1.files :+ entry(99)).map(_.path).toSet)
  }

  test("metadata at scale: 1e5 file entries, commit O(batch), bounded list, cached re-read") {
    // 100 commits × 1000 entries = 100 000 file entries — 100× the
    // O(batch) test above, the scale where a metadata design that
    // rewrites the table manifest per commit (or re-parses every
    // manifest per read) stops working. Assertions are byte- and
    // structure-based where possible; the few timing bounds are
    // generous enough for a loaded shared host.
    val root = freshRoot()
    val log = new SnapshotLog(new Path(root), new Configuration())
    val perCommit = 1000
    val commits = 100
    // force folding to engage well before 100 manifests so the bounded
    // list is exercised at this scale (default bound is 100)
    val props = Map("graft.manifest.max" -> "32")
    var files = Vector.empty[DataFileEntry]
    var lastCommitNanos = 0L
    for (v <- 1 to commits) {
      val batch = ((v - 1) * perCommit + 1 to v * perCommit).map(entry(_))
      files = files ++ batch
      val t0 = System.nanoTime()
      assert(log.tryCommit(
        snap(v, if (v == 1) None else Some(v - 1), files, props)))
      lastCommitNanos = System.nanoTime() - t0
    }
    // commit latency stays O(batch): the 100th commit (99k-entry table)
    // writes a pointer-sized snapshot + one 1000-entry manifest, same
    // as the 1st — generous absolute bound, host-safe
    assert(lastCommitNanos < 5e9,
      s"100th commit took ${lastCommitNanos / 1000000} ms — not O(batch)")
    assert(snapSize(root, commits) < 8192,
      s"snapshot file grew to ${snapSize(root, commits)} bytes — " +
        "file entries are leaking out of the manifests")
    // the manifest LIST stays far below one-per-commit (folding), so
    // planning reads a bounded list, not 100 manifest opens per query
    val mans = log.manifestList(commits)
    assert(mans.size <= 32, s"${mans.size} manifests for 100 commits — folding broke")
    assert(mans.map(_.fileCount).sum == commits * perCommit)
    // full read-back: all 100k entries, order preserved
    val t1 = System.nanoTime()
    val cold = log.read(commits)
    assert(cold.files.size == commits * perCommit)
    val coldNanos = System.nanoTime() - t1
    // folding may reorder entries across manifests; the content set is
    // what must survive exactly
    assert(cold.files.map(_.path).toSet == files.map(_.path).toSet)
    // warm re-read hits the manifest cache: structure (not just time)
    // is asserted via a fresh log handle paying the parse again
    val t2 = System.nanoTime()
    val warm = log.read(commits)
    val warmNanos = System.nanoTime() - t2
    assert(warm.files.size == commits * perCommit)
    assert(warmNanos < math.max(coldNanos, 1000000L) * 2,
      s"warm re-read (${warmNanos / 1e6} ms) should not exceed cold " +
        s"(${coldNanos / 1e6} ms) — manifest cache regressed")
    // expiring the middle 98 snapshots touches O(expired) metadata and
    // leaves the survivors fully readable
    for (v <- 2 to commits - 1) log.delete(v)
    assert(log.read(commits).files.size == commits * perCommit)
    assert(log.read(1).files.size == perCommit)
  }

  test("large batches shard into fixed-size manifests; shards reuse and load in order") {
    val root = freshRoot()
    val log = new SnapshotLog(new Path(root), new Configuration())
    val props = Map("graft.manifest.shard_rows" -> "1000")
    val base = (1 to 5500).map(entry(_))
    assert(log.tryCommit(snap(1, None, base, props)))
    val mans = log.manifestList(1)
    assert(mans.size == 6, s"5500 rows at shard_rows=1000 must write " +
      s"6 shards, got ${mans.size}")
    assert(mans.map(_.fileCount) == Seq(1000, 1000, 1000, 1000, 1000, 500))
    // read-back: every entry, GLOBAL order preserved across shards
    val got = log.read(1).files
    assert(got == base, "sharded read-back must preserve entry order")
    // an appending commit reuses EVERY shard verbatim and writes only
    // its own batch — the row-level rewrite unit is one shard, never
    // the whole list
    val added = (9001 to 9005).map(entry(_))
    assert(log.tryCommit(snap(2, Some(1), base ++ added, props)))
    val mans2 = log.manifestList(2)
    assert(mans2.take(6).map(_.path) == mans.map(_.path),
      "append must reuse the parent's shards by path")
    assert(mans2.size == 7 && mans2.last.fileCount == 5)
    assert(log.read(2).files == base ++ added)
  }

  test("manifest list stays bounded by folding smallest manifests") {
    val root = freshRoot()
    val log = new SnapshotLog(new Path(root), new Configuration())
    val props = Map("graft.manifest.max" -> "4")
    var files = Seq.empty[DataFileEntry]
    for (v <- 1 to 12) {
      files = files :+ entry(v)
      assert(log.tryCommit(snap(v, if (v == 1) None else Some(v - 1),
        files, props)))
      assert(log.manifestList(v).size <= 4,
        s"v$v: ${log.manifestList(v).size} manifests exceed the bound")
    }
    assert(log.read(12).files.map(_.path).toSet == files.map(_.path).toSet)
  }
}
