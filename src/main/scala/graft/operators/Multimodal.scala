package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines (extension
  * surface): image/audio/video payloads ride as opaque `binary` columns
  * with a typed metadata struct; decode/feature-extraction runs
  * per-partition in batches.
  *
  * The DECODE STEP IS A STUB: no image/audio codec ships in this
  * environment, so [[FakeDecoder]] deterministically derives "pixels"
  * from the bytes themselves. Everything around it — the schema, the
  * binary column handling, partition-batched execution via
  * `mapPartitions` (the Scala analog of `mapInPandas`: one iterator per
  * partition, vectorizable batch shape, no per-row JVM boundary), frame
  * sampling, resize — is real Spark plumbing and is what carries over
  * unchanged when a real codec replaces the stub.
  */
object Multimodal {

  /** Typed metadata carried next to the payload. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", IntegerType)))

  /** Canonical media schema: id, kind ∈ {image, audio, video}, payload,
    * metadata.
    */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType),
    StructField("content", BinaryType),
    StructField("meta", MetaSchema)))

  /** Deterministic media table derived from the documents testdata:
    * text bytes become the payload, metadata derives from doc fields.
    * Stands in for `spark.read.format("binaryFile")` over a media bucket.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("content"),
      struct(
        (col("n_chars") % 64 + 1).cast("int").as("width"),
        (col("n_chars") % 48 + 1).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") * 10).cast("int").as("duration_ms")).as("meta"))

  /** Cheap whole-payload facts computed without decoding: byte length
    * and content checksum — the dedup/integrity pass that runs before
    * any expensive decode at scale. Pure codegen'd expressions.
    */
  def checksums(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      length(col("content")).cast("long").as("n_bytes"),
      sha2(col("content"), 256).as("sha256"))

  /** Output row of the stubbed decode + feature extraction. */
  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, features: Array[Double])

  /** STUB decoder: derives a deterministic 16-bin byte histogram
    * ("pixels") from the payload. A real implementation would decode
    * JPEG/PCM here; the signature — bytes in, fixed-length feature
    * vector out — is the contract the pipeline depends on.
    */
  object FakeDecoder {
    val FeatureDim = 16
    def decode(content: Array[Byte]): Array[Double] = {
      val hist = new Array[Double](FeatureDim)
      if (content == null || content.isEmpty) return hist
      var i = 0
      while (i < content.length) {
        hist((content(i) & 0xff) % FeatureDim) += 1.0
        i += 1
      }
      val n = content.length.toDouble
      var b = 0
      while (b < FeatureDim) { hist(b) /= n; b += 1 }
      hist
    }
  }

  /** Partition-batched decode + feature extraction. `mapPartitions`
    * keeps one decoder per partition (a real codec's native context is
    * expensive to construct — this is why the batching matters), streams
    * rows through it, and never materializes a partition in memory.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("content"),
        col("meta.width"), col("meta.height"))
      .mapPartitions { rows: Iterator[Row] =>
        // per-partition decoder context would be initialized here
        rows.map { r =>
          val content = r.getAs[Array[Byte]]("content")
          MediaFeatures(
            media_id = r.getAs[Long]("media_id"),
            kind = r.getAs[String]("kind"),
            n_bytes = if (content == null) 0L else content.length.toLong,
            width = r.getAs[Int]("width"),
            height = r.getAs[Int]("height"),
            features = FakeDecoder.decode(content))
        }
      }
  }

  /** Frame sampling for video payloads: slice the byte stream into
    * `frameLen`-byte frames at `stride` intervals, one output row per
    * frame — pure expressions (sequence/transform/substring on binary),
    * so sampling stays inside codegen and the payload is never copied
    * to the driver.
    */
  def sampleFrames(media: DataFrame, frameLen: Int, stride: Int): DataFrame = {
    val nFrames = greatest(
      floor((length(col("content")) - frameLen) / stride) + 1, lit(0))
    // payloads shorter than one frame emit nothing (the explicit filter
    // also guards Spark's sequence(), which would otherwise count DOWN
    // for a negative frame count)
    media.filter(col("kind") === "video" && length(col("content")) >= frameLen)
      .select(col("media_id"),
        posexplode(transform(sequence(lit(0), nFrames.cast("int") - 1),
          i => substring(col("content"), (i * stride + 1).cast("int"), lit(frameLen))))
          .as(Seq("frame_idx", "frame_bytes")))
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        col("frame_bytes"))
  }

  /** STUB resize: truncate or zero-pad the payload to `targetBytes`
    * (stands in for pixel resampling; keeps the binary-out contract).
    */
  def resize(media: DataFrame, targetBytes: Int): DataFrame = {
    val zeros = lit(Array.fill[Byte](targetBytes)(0))
    media.withColumn("content",
      substring(concat(col("content"), zeros), 1, targetBytes))
  }
}
