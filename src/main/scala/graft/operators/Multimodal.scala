package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Typed metadata emitted by the (stubbed) media decoder. */
case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
    channels: Int, phash: Long)

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata. The container has no image/audio codecs, so the
  * decode step is a clearly-marked deterministic STUB — but the
  * Spark-side shape is real: binary payload column, batched
  * per-partition decoding (the JVM analog of a Pandas-UDF
  * `mapInPandas` batch), typed `Dataset[MediaMeta]` output, and
  * partition counts that scale with input splits (decoders are
  * CPU-bound; at 100 TB you repartition to cores, not files).
  */
object Multimodal {

  val BatchSize = 64

  /** STUB decoder: stands in for an image codec. Deterministic fake
    * metadata from the payload bytes; replace the body with a real
    * codec (e.g. TwelveMonkeys ImageIO) in production.
    */
  def decodeStub(docId: Long, payload: Array[Byte]): MediaMeta = {
    var h = 1125899906842597L // ??? real codec goes here — fake pHash/dims below
    payload.foreach(b => h = h * 31 + b)
    MediaMeta(docId, payload.length,
      width = (math.floorMod(h, 1920L) + 1L).toInt,
      height = (math.floorMod(h >>> 17, 1080L) + 1L).toInt,
      channels = 3, phash = h)
  }

  /** Documents with a binary media payload column (utf-8 bytes of the
    * text stand in for an image blob).
    */
  def withPayload(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism) // decode is CPU-bound
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))

  /** Batched decode over partitions: payloads are grouped into
    * fixed-size batches inside each partition (decoders amortize
    * setup per batch) — the Scala twin of `mapInPandas`. Returns a
    * typed Dataset; downstream ops get full Catalyst optimization.
    */
  def decodeBatched(s: SparkSession, dir: String): Dataset[MediaMeta] = {
    import s.implicits._
    withPayload(s, dir).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(BatchSize).flatMap(batch =>
        batch.map { case (id, bytes) => decodeStub(id, bytes) }))
  }

  /** The `m1_mm_manifest` query: decoded metadata manifest ordered by
    * doc_id (rows-only check; decode is stubbed).
    */
  def manifest(s: SparkSession, dir: String): DataFrame =
    decodeBatched(s, dir).toDF()
      .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
        col("channels"), col("phash"))
      .orderBy(col("doc_id"))

  /** STUB resize: stands in for a bilinear image resize. The real
    * version decodes `payload`, resizes to (w, h) and re-encodes;
    * the stub derives a deterministic fake thumbnail (w*h bytes of a
    * rolling hash over the payload) so downstream plumbing — binary
    * in, smaller binary out, metadata carried — is exercised for real.
    */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h) // ??? real codec resample goes here
    var acc = 1469598103934665603L
    var i   = 0
    while (i < out.length) {
      acc = (acc ^ payload(i % math.max(payload.length, 1))) * 1099511628211L
      out(i) = acc.toByte
      i += 1
    }
    out
  }

  /** Thumbnails: batched resize over partitions; output keeps the
    * payload column shape (binary) plus the target dims.
    */
  def thumbnails(s: SparkSession, dir: String, w: Int = 32, h: Int = 32): DataFrame = {
    import s.implicits._
    withPayload(s, dir).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(BatchSize).flatMap(_.map { case (id, bytes) =>
        (id, resizeStub(bytes, w, h), w, h)
      }))
      .toDF("doc_id", "thumb", "width", "height")
  }

  /** STUB frame sampler: stands in for video frame extraction — the
    * real version demuxes the container and decodes every k-th frame;
    * the stub cuts the payload into `frames` deterministic slices.
    * One input row fans out to `frames` rows (explode shape), each a
    * binary "frame" with its index — the schema a video pipeline
    * needs downstream.
    */
  def frameSampleStub(payload: Array[Byte], frames: Int): Seq[Array[Byte]] = {
    val n = math.max(payload.length / math.max(frames, 1), 1)
    (0 until frames).map { f => // ??? real demux/decode goes here
      val from = math.min(f * n, payload.length)
      val until = math.min(from + n, payload.length)
      java.util.Arrays.copyOfRange(payload, from, until)
    }
  }

  /** Sampled frames: one row per (doc, frame index). */
  def sampledFrames(s: SparkSession, dir: String, frames: Int = 4): DataFrame = {
    import s.implicits._
    withPayload(s, dir).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        frameSampleStub(bytes, frames).zipWithIndex.map { case (fr, idx) => (id, idx, fr) }
      }
      .toDF("doc_id", "frame_idx", "frame")
  }

  /** STUB feature extractor: stands in for a vision encoder — maps a
    * payload to a fixed-dim float vector (deterministic fake). Output
    * schema matches the embeddings table (`array<float>`), so the ANN
    * operators (Ann.*) run on it unchanged — that composition is the
    * point.
    */
  def featureStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim) // ??? real encoder forward pass goes here
    var acc = 1125899906842597L
    var i   = 0
    while (i < dim) {
      acc = acc * 6364136223846793005L + 1442695040888963407L + payload(i % math.max(payload.length, 1))
      out(i) = ((acc >>> 40).toInt / 8388608.0f) - 1.0f
      i += 1
    }
    out
  }

  /** Embedding extraction: binary payload → `array<float>` column. */
  def extractFeatures(s: SparkSession, dir: String, dim: Int = 64): DataFrame = {
    import s.implicits._
    withPayload(s, dir).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(BatchSize).flatMap(_.map { case (id, bytes) =>
        (id, featureStub(bytes, dim))
      }))
      .toDF("doc_id", "embedding")
  }
}
