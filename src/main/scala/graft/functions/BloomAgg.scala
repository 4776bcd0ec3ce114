package graft.functions

import java.util.Base64

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Per-group Bloom filter aggregation — the write-side half of
  * manifest-level POINT-LOOKUP file skipping (Iceberg/Delta bloom
  * filter indexes; Iceberg spec `parquet.bloom-filter-enabled.column`).
  * Min/max bounds only skip files when data is range-clustered on the
  * probed column; a per-file Bloom filter skips equality probes on
  * columns with NO sort order at all — the "find one document id in
  * 100 TB" shape — at an opt-in, bounded manifest cost.
  *
  * Inputs are 64-bit hashes (pair with Spark's codegen'd `xxhash64` on
  * the data column; the driver-side probe in
  * [[graft.catalog.StatsPruner]] replays the same hash via
  * `XxHash64Function`). k bit positions derive from the one hash by
  * double hashing ([[BloomUtil.positions]] — shared by build and
  * probe). The serialized form is versioned and self-describing
  * (`[version, k, words…]`), so probe-time needs no out-of-band
  * configuration.
  *
  * Scale shape: the buffer is a fixed `bits/64`-word array; reduce sets
  * k bits per row, merge is a word-wise OR — a classic bounded-state
  * mergeable sketch, same family as the HLL/quantile sketches in
  * SURVEY §8.2b.
  */
object BloomAgg {

  /** Default filter size in bits (8 KiB serialized). ~1% false-positive
    * rate at ~6.8k distinct values per file with k=7; size via the
    * `graft.bloom.bits` table property for bigger files (bits ≈ 9.6 ×
    * expected distinct values for 1%).
    */
  val DefaultBits = 65536

  val DefaultHashes = 7

  private val FormatVersion = 1.toByte

  /** The k bit positions for hash `h` in an `m`-bit filter: double
    * hashing `(h1 + i·h2) mod m` with h2 forced odd — build and probe
    * MUST both use this.
    */
  def positions(h: Long, m: Int, k: Int): Array[Int] = {
    val h1 = h
    val h2 = (h >>> 32 | h << 32) | 1L
    val out = new Array[Int](k)
    var i = 0
    while (i < k) {
      out(i) = (((h1 + i * h2) % m + m) % m).toInt
      i += 1
    }
    out
  }

  /** Probe a serialized filter (base64 of `[version, k, words…]`).
    * Unknown versions answer true (conservative: never prune on a
    * payload we cannot read).
    */
  def mightContain(serialized: String, hash: Long): Boolean = {
    // MIME decoder: accepts both basic and line-broken base64
    val bytes =
      try Base64.getMimeDecoder.decode(serialized)
      catch { case _: IllegalArgumentException => return true }
    if (bytes.length < 2 || bytes(0) != FormatVersion) return true
    val k = bytes(1).toInt
    val words = (bytes.length - 2) / 8
    val m = words * 64
    if (m == 0 || k <= 0) return true
    val buf = java.nio.ByteBuffer.wrap(bytes, 2, words * 8)
    val arr = new Array[Long](words)
    buf.asLongBuffer().get(arr)
    positions(hash, m, k).forall(p => (arr(p >> 6) & (1L << (p & 63))) != 0L)
  }

  def serialize(words: Array[Long], k: Int): Array[Byte] = {
    val bytes = new Array[Byte](2 + words.length * 8)
    bytes(0) = FormatVersion
    bytes(1) = k.toByte
    val buf = java.nio.ByteBuffer.wrap(bytes, 2, words.length * 8)
    buf.asLongBuffer().put(words)
    bytes
  }

  /** Aggregator over pre-hashed values: `reduce` sets k bits, `merge`
    * ORs word arrays, `finish` emits the versioned byte form.
    */
  final class BloomFilterAgg(bits: Int, k: Int)
    extends Aggregator[Long, Array[Long], Array[Byte]] {
    require(bits > 0 && bits % 64 == 0, s"bits must be a positive multiple of 64: $bits")
    require(k > 0 && k <= 127, s"k out of range: $k")

    override def zero: Array[Long] = new Array[Long](bits / 64)

    override def reduce(buf: Array[Long], h: Long): Array[Long] = {
      val ps = positions(h, bits, k)
      var i = 0
      while (i < ps.length) {
        buf(ps(i) >> 6) |= 1L << (ps(i) & 63)
        i += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Array[Byte] = serialize(buf, k)

    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      Encoders.BINARY
  }

  /** Column API: `bloomAgg(xxhash64(col), bits, k)` → binary filter. */
  def bloomAgg(hashed: Column, bits: Int = DefaultBits,
      k: Int = DefaultHashes): Column =
    udaf(new BloomFilterAgg(bits, k), Encoders.scalaLong).apply(hashed)
}
