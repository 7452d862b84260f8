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
}
