package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Typed metadata emitted by the media decoder. `n_bytes` is the
  * DECODED content size (width × height × channels) — the number a
  * storage planner actually needs, and (unlike the container byte
  * length, which depends on the encoder) a pure function of the
  * image content, so the DuckDB oracle can recompute it.
  */
case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
    channels: Int, phash: Long)

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata. The IMAGE path is real end-to-end: payloads are
  * PNG containers (deterministic fixture images keyed by doc_id,
  * encoded with `javax.imageio`) and decode / resize / feature
  * extraction operate on REAL decoded pixels through ImageIO — no
  * external deps, PNG is lossless, so decoded pixels equal the
  * fixture formula exactly and the m1 manifest stays oracle-exact.
  * Only VIDEO frame sampling remains a clearly-marked stub (no
  * demuxer in the JDK). The Spark-side shape is the point at scale:
  * binary payload column, batched per-partition decoding (the JVM
  * analog of a Pandas-UDF `mapInPandas` batch), typed
  * `Dataset[MediaMeta]` output, and partition counts that scale with
  * cores, not files (decoders are CPU-bound).
  */
object Multimodal {

  val BatchSize = 64

  // --- deterministic image fixtures ---------------------------------
  // Dims and pixels are simple integer formulas of (doc_id, x, y) so
  // the DuckDB oracle can regenerate them in SQL; PNG is lossless, so
  // what the codec decodes IS the formula.

  /** Fixture image dims for a doc: 8..31 × 8..24. */
  def imageDims(docId: Long): (Int, Int) =
    ((math.floorMod(docId, 24L) + 8L).toInt, (math.floorMod(docId, 17L) + 8L).toInt)

  /** Fixture pixel at (x, y): packed 0xRRGGBB. */
  def pixel(docId: Long, x: Int, y: Int): Int = {
    val r = math.floorMod(docId * 31L + x * 7L + y * 13L, 256L).toInt
    val g = math.floorMod(docId * 17L + x * 3L + y * 5L, 256L).toInt
    val b = math.floorMod(docId * 7L + x * 11L + y * 3L, 256L).toInt
    (r << 16) | (g << 8) | b
  }

  /** REAL PNG container bytes for a doc's fixture image (ImageIO
    * encoder). The byte stream is a genuine PNG any decoder opens.
    */
  def pngPayload(docId: Long): Array[Byte] = {
    val (w, h) = imageDims(docId)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, pixel(docId, x, y)); x += 1 }
      y += 1
    }
    encodePng(img)
  }

  private def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  // --- real codec kernels -------------------------------------------

  /** REAL image decode via the JDK's ImageIO (PNG/JPEG/BMP/GIF). */
  def decodeImage(payload: Array[Byte]): BufferedImage = {
    ImageIO.setUseCache(false) // pure in-memory decode, no temp files
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    if (img == null) throw new IllegalArgumentException(
      s"payload (${payload.length} bytes) is not a decodable image")
    img
  }

  /** Decode one payload to typed metadata. All fields come from the
    * DECODED image: dims and band count from the codec, `phash` a
    * row-major fold over the actual pixel values.
    */
  def decode(docId: Long, payload: Array[Byte]): MediaMeta = {
    val img = decodeImage(payload)
    val (w, h) = (img.getWidth, img.getHeight)
    val channels = img.getRaster.getNumBands
    var hash = 1125899906842597L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { hash = hash * 31L + (img.getRGB(x, y) & 0xFFFFFF); x += 1 }
      y += 1
    }
    MediaMeta(docId, w * h * channels, w, h, channels, hash)
  }

  /** REAL nearest-neighbor resample of a decoded image. Deliberately
    * nearest (not bilinear): bit-exact, so tests can assert
    * thumb(x, y) == source(x·sw/w, y·sh/h) against the fixture
    * formula.
    */
  def resizeImage(img: BufferedImage, w: Int, h: Int): BufferedImage = {
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val (sw, sh) = (img.getWidth, img.getHeight)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out.setRGB(x, y, img.getRGB(x * sw / w, y * sh / h) & 0xFFFFFF)
        x += 1
      }
      y += 1
    }
    out
  }

  /** REAL feature extraction over decoded pixels: channel values are
    * mean-pooled round-robin into `dim` cells and centered to
    * [-0.5, 0.5]. Simple, but computed from the actual image — the
    * output schema matches the embeddings table (`array<float>`), so
    * the ANN operators (Ann.*) run on it unchanged.
    */
  def imageFeatures(img: BufferedImage, dim: Int): Array[Float] = {
    val sums = new Array[Float](dim)
    val counts = new Array[Int](dim)
    val (w, h) = (img.getWidth, img.getHeight)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        var c = 0
        while (c < 3) {
          val v = (rgb >>> (16 - 8 * c)) & 0xFF
          val idx = ((y * w + x) * 3 + c) % dim
          sums(idx) += v / 255f
          counts(idx) += 1
          c += 1
        }
        x += 1
      }
      y += 1
    }
    Array.tabulate(dim)(i => if (counts(i) == 0) 0f else sums(i) / counts(i) - 0.5f)
  }

  // --- Spark plumbing -----------------------------------------------

  /** Documents with a binary media payload column: a REAL PNG per doc
    * (fixture image keyed by doc_id — the container has no media
    * corpus, so the images are generated, but the bytes are genuine
    * PNG containers round-tripped through the codec).
    */
  def withPayload(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism) // codec is CPU-bound
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, pngPayload(id))))
      .toDF("doc_id", "payload")
  }

  /** Batched decode over partitions: payloads are grouped into
    * fixed-size batches inside each partition (decoders amortize
    * setup per batch) — the Scala twin of `mapInPandas`. Returns a
    * typed Dataset; downstream ops get full Catalyst optimization.
    */
  def decodeBatched(s: SparkSession, dir: String): Dataset[MediaMeta] = {
    import s.implicits._
    withPayload(s, dir).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(BatchSize).flatMap(batch =>
        batch.map { case (id, bytes) => decode(id, bytes) }))
  }

  /** The `m1_mm_manifest` query: decoded metadata manifest ordered by
    * doc_id. Oracle-exact: every column is recomputed by the DuckDB
    * oracle from the fixture formulas (PNG is lossless, so the codec
    * output equals the formulas bit-for-bit).
    */
  def manifest(s: SparkSession, dir: String): DataFrame =
    decodeBatched(s, dir).toDF()
      .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
        col("channels"), col("phash"))
      .orderBy(col("doc_id"))

  /** Thumbnails: batched REAL decode → resample → re-encode over
    * partitions; binary PNG in, smaller binary PNG out, dims carried.
    */
  def thumbnails(s: SparkSession, dir: String, w: Int = 32, h: Int = 32): DataFrame = {
    import s.implicits._
    withPayload(s, dir).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(BatchSize).flatMap(_.map { case (id, bytes) =>
        (id, encodePng(resizeImage(decodeImage(bytes), w, h)), w, h)
      }))
      .toDF("doc_id", "thumb", "width", "height")
  }

  /** STUB frame sampler: stands in for video frame extraction — the
    * real version demuxes the container and decodes every k-th frame
    * (no video demuxer ships with the JDK, so this one stays a stub);
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

  /** Embedding extraction: binary payload → REAL decode → pooled
    * `array<float>` column.
    */
  def extractFeatures(s: SparkSession, dir: String, dim: Int = 64): DataFrame = {
    import s.implicits._
    withPayload(s, dir).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(BatchSize).flatMap(_.map { case (id, bytes) =>
        (id, imageFeatures(decodeImage(bytes), dim))
      }))
      .toDF("doc_id", "embedding")
  }
}
