package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{ColStats, DataFileEntry, SnapshotLog}

/** Property coverage for the streaming manifest codec (r19): over
  * seeded-random file entries spanning the full optional-field matrix
  * and adversarial strings, the streaming writer must be
  * BYTE-IDENTICAL to the json4s reference and both parsers must
  * round-trip the bytes to the same entries. Hand-rolled generators —
  * fixed seed, the repo's SchemaOpsPropSpec discipline (the
  * scalatest↔scalacheck bridge isn't in the offline cache).
  */
class ManifestCodecPropSpec extends AnyFunSuite {

  private def str(r: Random): String = {
    val n = r.nextInt(24)
    val sb = new StringBuilder
    for (_ <- 0 until n) r.nextInt(8) match {
      case 0 => sb.append((r.nextInt(0x1f) + 1).toChar) // control chars
      case 1 => sb.append(Seq('"', '\\', '/', '\n', '\t')(r.nextInt(5)))
      case 2 => sb.append((0x80 + r.nextInt(0x2000)).toChar) // unicode
      case _ => sb.append(('a' + r.nextInt(26)).toChar)
    }
    sb.toString
  }

  private def opt[A](r: Random)(a: => A): Option[A] =
    if (r.nextBoolean()) Some(a) else None

  private def colStats(r: Random): ColStats =
    ColStats(opt(r)(str(r)), opt(r)(str(r)), r.nextLong(1L << 40),
      opt(r)(str(r)), opt(r)(str(r)), opt(r)(str(r)))

  private def pairs(r: Random): Seq[(String, Int)] =
    Seq.fill(r.nextInt(4))((str(r), r.nextInt(1000)))

  private def entry(r: Random): DataFileEntry =
    DataFileEntry(
      path = s"data/${str(r)}.parquet",
      partition = opt(r)(str(r)),
      rows = r.nextLong(1L << 50),
      stats = Seq.fill(r.nextInt(4))((str(r), colStats(r))).toMap,
      cols = pairs(r),
      // seq = 0 exercises the omit-default branch
      seq = if (r.nextBoolean()) 0L else r.nextLong(1L << 30),
      nested = pairs(r),
      bytes = if (r.nextBoolean()) 0L else r.nextLong(1L << 44),
      upd = r.nextBoolean())

  test("streaming writer == json4s reference, byte-for-byte, over random entries") {
    val r = new Random(191)
    for (i <- 1 to 200) {
      val entries = Seq.fill(r.nextInt(6))(entry(r))
      val streamed = SnapshotLog.manifestToJson(entries)
      val reference = SnapshotLog.manifestToJsonAst(entries)
      assert(streamed == reference, s"iteration $i: byte divergence\n" +
        s"streamed=$streamed\nreference=$reference")
    }
  }

  test("both parsers round-trip both writers' bytes to the same entries") {
    val r = new Random(409)
    for (i <- 1 to 100) {
      val entries = Seq.fill(r.nextInt(6))(entry(r))
      for (json <- Seq(SnapshotLog.manifestToJson(entries),
          SnapshotLog.manifestToJsonAst(entries))) {
        assert(SnapshotLog.manifestFromJson(json) == entries,
          s"iteration $i: streaming parser round-trip")
        assert(SnapshotLog.manifestFromJsonAst(json) == entries,
          s"iteration $i: reference parser round-trip")
      }
    }
  }
}
