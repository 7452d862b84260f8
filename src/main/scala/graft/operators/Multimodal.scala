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
  * The VIDEO path is real too: fixture videos are genuine animated
  * GIFs (the JDK's one native multi-frame container), frame sampling
  * is an actual demux + per-frame decode, and grayscale frames make
  * the GIF palette lossless — so the m2 frame manifest is
  * oracle-exact as well. The Spark-side shape is the point at scale:
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

  /** Row-major fold over decoded pixel values — the ONE
    * implementation behind m1's `phash` and m2's `fhash`; both DuckDB
    * oracles recompute this exact fold (seed, ·31, 24-bit mask) as a
    * HUGEINT reduction, so the two call sites must never diverge.
    */
  def pixelFold(img: BufferedImage): Long = {
    var hash = 1125899906842597L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) { hash = hash * 31L + (img.getRGB(x, y) & 0xFFFFFF); x += 1 }
      y += 1
    }
    hash
  }

  /** Decode one payload to typed metadata. All fields come from the
    * DECODED image: dims and band count from the codec, `phash` a
    * row-major fold over the actual pixel values.
    */
  def decode(docId: Long, payload: Array[Byte]): MediaMeta = {
    val img = decodeImage(payload)
    val (w, h) = (img.getWidth, img.getHeight)
    val channels = img.getRaster.getNumBands
    MediaMeta(docId, w * h * channels, w, h, channels, pixelFold(img))
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
    manifestFrame(withPayload(s, dir).as[(Long, Array[Byte])])
  }

  /** The m1 decode transform over ANY (doc_id, payload) frame —
    * stateless batched mapPartitions, so the SAME code produces the
    * manifest from a batch table and from a readStream/MemoryStream
    * of ARRIVING media (gopherGateFrame's deployment discipline
    * extended to binary payloads: score assets at ingest, not in a
    * nightly rescan; StreamingSpec asserts streamed ≡ batch
    * row-for-row).
    */
  def manifestFrame(media: Dataset[(Long, Array[Byte])]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.grouped(BatchSize).flatMap(batch =>
      batch.map { case (id, bytes) => decode(id, bytes) }))
  }

  /** The `m1_mm_manifest` query: decoded metadata manifest ordered by
    * doc_id. Oracle-exact: every column is recomputed by the DuckDB
    * oracle from the fixture formulas (PNG is lossless, so the codec
    * output equals the formulas bit-for-bit).
    */
  def manifest(s: SparkSession, dir: String): DataFrame =
    // ordered(): the codec pipeline is narrow, so a bare orderBy's
    // range-sampling job would decode every image twice
    graft.Caches.ordered(
      decodeBatched(s, dir).toDF()
        .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
          col("channels"), col("phash")),
      col("doc_id"))

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

  /** Test hook: the private PNG encoder for spec-side round-trips. */
  private[graft] def encodePngPublic(img: BufferedImage): Array[Byte] = encodePng(img)

  /** The `m10_thumb_manifest` query: thumbnail-generation audit —
    * the derived-asset pipeline (CDN thumbnail jobs, dataset preview
    * sheets) proven end-to-end through REAL codecs: decode → 8×8
    * nearest-neighbor resample → PNG re-encode → decode AGAIN, and
    * the manifest folds the round-tripped pixels. Passing the fold
    * through the second decode proves the re-encoded container is a
    * valid, lossless PNG (not just that resample math ran). Oracle:
    * nearest-neighbor is pure integer index mapping
    * (`sx = tx·w div 8`), so DuckDB re-derives every thumb pixel
    * from the m1 fixture formulas and folds identically. Zero
    * shuffle, codec-bound (m7/m8's distribution shape).
    */
  def thumbManifest(s: SparkSession, dir: String, tw: Int = 8, th: Int = 8): DataFrame = {
    import s.implicits._
    graft.Caches.ordered(
      withPayload(s, dir).as[(Long, Array[Byte])]
        .mapPartitions(_.grouped(BatchSize).flatMap(_.map { case (id, bytes) =>
          val round = decodeImage(encodePng(resizeImage(decodeImage(bytes), tw, th)))
          (id, round.getWidth, round.getHeight, pixelFold(round))
        }))
        .toDF("doc_id", "twidth", "theight", "thash"),
      col("doc_id"))
  }

  // --- video: REAL multi-frame container (animated GIF) -------------
  // GIF is the one multi-frame media container the JDK demuxes and
  // encodes natively (ImageIO's gif plugin supports image sequences),
  // so the video path needs no stub: fixture "videos" are genuine
  // animated GIFs, frame sampling is a real demux (per-frame decode
  // through the codec), and — because the fixture frames are
  // grayscale (≤ 256 colors ⇒ GIF's palette is lossless) — decoded
  // pixels equal the fixture formula exactly, keeping the frame
  // manifest oracle-exact like m1.

  /** Frame count for a doc's fixture video: 2..6. */
  def frameCount(docId: Long): Int = (math.floorMod(docId, 5L) + 2L).toInt

  /** Fixture frame pixel (grayscale 0..255) at (frame f, x, y). */
  def framePixel(docId: Long, f: Int, x: Int, y: Int): Int =
    math.floorMod(docId * 31L + f * 101L + x * 7L + y * 13L, 256L).toInt

  /** REAL animated-GIF container bytes for a doc's fixture video:
    * frameCount full-size grayscale frames written as a GIF image
    * sequence through the JDK encoder. Any GIF demuxer opens these.
    */
  def gifPayload(docId: Long): Array[Byte] = {
    val (w, h) = imageDims(docId)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      val n = frameCount(docId)
      while (f < n) {
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, framePixel(docId, f, x, y)); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** REAL video demux: every frame of a multi-frame container decoded
    * through the JDK's GIF plugin (`getNumImages(true)` forces a full
    * stream scan — the demux step; `read(i)` decodes frame i).
    */
  def demuxFrames(payload: Array[Byte]): IndexedSeq[BufferedImage] = {
    ImageIO.setUseCache(false)
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
    try {
      reader.setInput(iis, false)
      val n = reader.getNumImages(true)
      (0 until n).map(reader.read)
    } finally { reader.dispose(); iis.close() }
  }

  /** Total demux for untrusted payloads: a corrupt container yields
    * None instead of an exception — the skip-bad-records shape a
    * 100 TB media pipeline needs (count the Nones, never kill the
    * job). The fixture queries use the strict [[demuxFrames]] (their
    * payloads are valid by construction); MultimodalSpec fuzzes this
    * one with truncations and byte flips.
    */
  def tryDemux(payload: Array[Byte]): Option[IndexedSeq[BufferedImage]] =
    try {
      val fs = demuxFrames(payload)
      if (fs.isEmpty) None else Some(fs)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Documents with a binary VIDEO payload column (real animated
    * GIFs), the video twin of [[withPayload]].
    */
  def withVideoPayload(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism) // codec is CPU-bound
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, gifPayload(id))))
      .toDF("doc_id", "payload")
  }

  /** Sampled frames: REAL demux + per-frame decode, keeping every
    * `stride`-th frame. One input row fans out to ceil(n/stride) rows
    * (explode shape), each a re-encoded single-frame binary with its
    * index — the schema a video pipeline needs downstream.
    */
  def sampledFrames(s: SparkSession, dir: String, stride: Int = 2): DataFrame = {
    import s.implicits._
    withVideoPayload(s, dir).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        demuxFrames(bytes).zipWithIndex.collect {
          case (fr, idx) if idx % stride == 0 => (id, idx, encodePng(toRgb(fr)))
        }
      }
      .toDF("doc_id", "frame_idx", "frame")
  }

  /** Copy a decoded frame into a plain sRGB raster before re-encoding:
    * the GIF plugin's indexed/gray frames pass raw palette values
    * through getRGB, but handing that image object straight to another
    * encoder triggers a gray→sRGB colorspace conversion (gamma shifts
    * every pixel). The getRGB copy is the identity the demux tests
    * assert, so the re-encoded container is lossless.
    */
  private def toRgb(img: BufferedImage): BufferedImage = {
    val out = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) { out.setRGB(x, y, img.getRGB(x, y) & 0xFFFFFF); x += 1 }
      y += 1
    }
    out
  }

  /** The `m2_frame_manifest` query: demuxed-frame metadata manifest —
    * one row per sampled frame (every `stride`-th), all fields from
    * the DECODED frames: dims from the codec, `fhash` the same
    * row-major fold as m1 over actual frame pixels. Oracle-exact: the
    * grayscale fixture frames survive GIF's palette losslessly, so
    * DuckDB recomputes every column from the fixture formulas.
    */
  def frameManifest(s: SparkSession, dir: String, stride: Int = 2): DataFrame = {
    import s.implicits._
    val unsorted = withVideoPayload(s, dir).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(BatchSize).flatMap(_.flatMap { case (id, bytes) =>
        val frames = demuxFrames(bytes)
        frames.zipWithIndex.collect { case (img, idx) if idx % stride == 0 =>
          (id, idx, frames.length, img.getWidth, img.getHeight, pixelFold(img))
        }
      }))
      .toDF("doc_id", "frame_idx", "n_frames", "width", "height", "fhash")
    // ordered(): the demux+decode pipeline is narrow, so a bare
    // orderBy's range-sampling job would demux every video twice
    graft.Caches.ordered(unsorted, col("doc_id"), col("frame_idx"))
  }

  /** 64-bit average-hash of a decoded grayscale frame — the standard
    * perceptual frame signature (aHash): the image pools onto an 8×8
    * grid (uneven integer block bounds `b·w/8`), bit b = block mean >
    * global mean, compared by INTEGER cross-multiplication
    * (blockSum·totalPixels > totalSum·blockPixels) so the DuckDB
    * oracle reproduces every bit without touching floats. MSB-first
    * fold (block 0 highest) keeps the sign bit meaningful as bit 63.
    */
  def avgHash64(img: BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val raster = img.getRaster
    val n = w.toLong * h
    var total = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { total += raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      val bx = b % 8; val by = b / 8
      val x0 = bx * w / 8; val x1 = (bx + 1) * w / 8
      val y0 = by * h / 8; val y1 = (by + 1) * h / 8
      var bs = 0L
      var yy = y0
      while (yy < y1) {
        var xx = x0
        while (xx < x1) { bs += raster.getSample(xx, yy, 0); xx += 1 }
        yy += 1
      }
      val bn = (x1 - x0).toLong * (y1 - y0)
      sig = (sig << 1) | (if (bs * n > total * bn) 1L else 0L)
      b += 1
    }
    sig
  }

  /** The `m4_frame_neardup` query: NEAR-DUPLICATE FRAMES across
    * videos — the multimodal × dedup composition every video-corpus
    * pipeline runs (static intros, shared stock footage, re-encodes
    * of one clip): every stride-th frame of every video decodes to a
    * 64-bit average-hash ([[avgHash64]]), and frame pairs within
    * Hamming distance `maxHamming` surface as duplicate candidates.
    *
    * Scale shape is d3's exactly: each signature explodes into 4
    * 16-bit chunks; a pair with Hamming ≤ 3 must agree on ≥ 1 chunk
    * (pigeonhole — lossless blocking), so candidates come from a
    * chunk-keyed equi-join (shuffle ∝ frames·4, never frames²) and
    * the exact `bit_count(xor)` filter keeps true pairs only. Oracle:
    * DuckDB recomputes every signature from the fixture formulas with
    * the same integer threshold rule and brute-forces the pair join.
    */
  def frameNearDup(s: SparkSession, dir: String, stride: Int = 2,
      maxHamming: Int = 3): DataFrame = {
    import s.implicits._
    val sigs = graft.Caches.track(withVideoPayload(s, dir).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(BatchSize).flatMap(_.flatMap { case (id, bytes) =>
        demuxFrames(bytes).zipWithIndex.collect {
          case (img, idx) if idx % stride == 0 => (id, idx, avgHash64(img))
        }
      }))
      .toDF("doc_id", "frame_idx", "sig"))
    val chunked = sigs.select(col("doc_id"), col("frame_idx"), col("sig"),
        explode(sequence(lit(0), lit(3))).as("ci"))
      // arithmetic shift + 16-bit mask ≡ unsigned shift + mask
      .withColumn("cv", expr("shiftright(sig, ci * 16) & 65535"))
    val cands = chunked.as("x").join(chunked.as("y"),
        col("x.ci") === col("y.ci") && col("x.cv") === col("y.cv") &&
          (col("x.doc_id") < col("y.doc_id") ||
            (col("x.doc_id") === col("y.doc_id") &&
              col("x.frame_idx") < col("y.frame_idx"))))
      .select(col("x.doc_id").as("doc_a"), col("x.frame_idx").as("frame_a"),
        col("x.sig").as("sig_a"),
        col("y.doc_id").as("doc_b"), col("y.frame_idx").as("frame_b"),
        col("y.sig").as("sig_b"))
      .distinct()
    graft.Caches.ordered(
      cands.withColumn("hamming",
          bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("int"))
        .filter(col("hamming") <= maxHamming)
        .select(col("doc_a"), col("frame_a"), col("doc_b"), col("frame_b"),
          col("hamming")),
      col("doc_a"), col("frame_a"), col("doc_b"), col("frame_b"))
  }

  /** The `m7_scene_cuts` query: shot-boundary detection over the
    * video corpus — the first pass of every video-understanding
    * pipeline (ffmpeg's scdet / PySceneDetect content mode): a scene
    * CUT is a transition whose adjacent-frame perceptual distance
    * exceeds a threshold. Frames hash to [[avgHash64]] and
    * consecutive pairs compare by Hamming distance, `> tau` bits
    * flipped = cut.
    *
    * Scale shape: the VIDEO is the processing unit (g14's tile
    * discipline) — demux, per-frame hash, and the adjacent-pair fold
    * all happen inside the video's own split, so the operator is
    * ZERO-shuffle and codec-bound linear; no frame table ever
    * materializes, no window over (doc, frame) is needed. Output is
    * one row per transition with the distance and the cut flag.
    * Oracle: DuckDB recomputes every frame signature from the fixture
    * formulas (m4's integer cross-multiplied aHash) and joins
    * adjacent frames.
    */
  def sceneCuts(s: SparkSession, dir: String, tau: Int = 40): DataFrame = {
    import s.implicits._
    val unsorted = withVideoPayload(s, dir).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(BatchSize).flatMap(_.flatMap { case (id, bytes) =>
        val sigs = demuxFrames(bytes).map(avgHash64)
        sigs.sliding(2).zipWithIndex.collect {
          case (Seq(a, b), i) => (id, i + 1, java.lang.Long.bitCount(a ^ b))
        }
      }))
      .toDF("doc_id", "frame_idx", "hamming")
      .withColumn("is_cut", col("hamming") > tau)
    graft.Caches.ordered(unsorted, col("doc_id"), col("frame_idx"))
  }

  // --- image near-dup: family-structured grayscale corpus -----------
  // The m1/m4 fixtures key every pixel off doc_id, so no two images
  // are alike and a near-dup query would return nothing. This corpus
  // has the m5_audio_neardup family structure instead: docs in the
  // same FIXED-SIZE family of 25 share a noise-like base image
  // (quadratic-congruential in the pixel index — a linear formula
  // would make every same-dims family a constant offset of the next
  // mod 256, i.e. one giant cross-family dup cluster and quadratic
  // pair output), and each doc perturbs ONE pixel (position and
  // amplitude keyed by doc_id; amp 0 for doc_id%7==0, the exact-dup
  // sub-band). Family count scales with the corpus while family size
  // stays 25, so duplicate clusters stay bounded and the pair output
  // is corpus-LINEAR at every sf.

  /** Fixture family of a doc (fixed size 25). */
  def imageFamily(docId: Long): Long = docId / 25

  /** Family image dims: 8..31 × 8..24 (shared by the whole family). */
  def familyDims(fam: Long): (Int, Int) =
    ((math.floorMod(fam, 24L) + 8L).toInt, (math.floorMod(fam, 17L) + 8L).toInt)

  /** Gray pixel value at row-major index i: the family's
    * quadratic-congruential base, plus the doc's single spike (mod
    * 256 — explicit wrap, no clamp, so the oracle reproduces it).
    */
  def familyPixel(docId: Long, i: Int): Int = {
    val fam = imageFamily(docId)
    val base = math.floorMod(fam * 40503L + i.toLong * i * 13933L + i * 7919L, 256L)
    val (w, h) = familyDims(fam)
    val spike = math.floorMod(docId * 131L, (w * h).toLong)
    if (i == spike) math.floorMod(base + math.floorMod(docId, 7L) * 37L, 256L).toInt
    else base.toInt
  }

  /** REAL grayscale PNG container for a doc's family image (8-bit
    * gray is lossless through PNG, like m2's grayscale GIF frames).
    */
  def familyPngPayload(docId: Long): Array[Byte] = {
    val (w, h) = familyDims(imageFamily(docId))
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < w * h) {
      raster.setSample(i % w, i / w, 0, familyPixel(docId, i))
      i += 1
    }
    encodePng(img)
  }

  /** Documents with the family-corpus image payload column. */
  def withFamilyPayload(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism) // codec is CPU-bound
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map(id => (id, familyPngPayload(id))))
      .toDF("doc_id", "payload")
  }

  /** 8×8 integer block-sum signature of a decoded grayscale image —
    * the all-integer cousin of [[avgHash64]] (same uneven `b·w/8`
    * block bounds): 64 block SUMS instead of 64 threshold bits, so
    * the signature carries brightness structure for SIMILARITY
    * ranking, not just dup detection, and stays byte-exactly
    * reproducible from the fixture formulas (no float pooling).
    */
  def blockSums64(img: BufferedImage): Array[Long] = {
    val w = img.getWidth
    val h = img.getHeight
    val raster = img.getRaster
    val out = new Array[Long](64)
    var b = 0
    while (b < 64) {
      val bx = b % 8; val by = b / 8
      val x0 = bx * w / 8; val x1 = (bx + 1) * w / 8
      val y0 = by * h / 8; val y1 = (by + 1) * h / 8
      var s = 0L
      var yy = y0
      while (yy < y1) {
        var xx = x0
        while (xx < x1) { s += raster.getSample(xx, yy, 0); xx += 1 }
        yy += 1
      }
      out(b) = s
      b += 1
    }
    out
  }

  /** The `m9_visual_search` query: content-based image retrieval —
    * the multimodal × ANN composition (CLIP-style visual search with
    * the embedding stage stood in by [[blockSums64]], since no vision
    * model ships in this container; the Spark-side plumbing — decode,
    * per-image signature, broadcast query side, bounded-heap top-k —
    * is exactly the production shape, and swapping the signature for
    * a model embedding changes nothing downstream). Every image
    * decodes (REAL PNG path) to its 64-long integer signature; the
    * 20 query images broadcast; cosine is computed in double over
    * INTEGER components (every product and partial sum < 2^53 —
    * EXACT, so even the unrounded ranking order is engine-identical)
    * and ranked by Ann's bounded-heap TopKCosine. Oracle: DuckDB
    * re-derives every signature from the fixture formulas and ranks
    * with a window — hash-exact.
    */
  def visualSearch(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import s.implicits._
    val sigs = graft.Caches.track(withFamilyPayload(s, dir).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(BatchSize).flatMap(_.map { case (id, bytes) =>
        val v = blockSums64(decodeImage(bytes))
        var n2 = 0.0
        var i = 0
        while (i < 64) { n2 += v(i).toDouble * v(i); i += 1 }
        (id, v, math.sqrt(n2))
      }))
      .toDF("vec_id", "sig", "nrm"))
    val q = sigs.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("sig").as("q_sig"), col("nrm").as("q_nrm"))
    val dot = aggregate(
      zip_with(col("q_sig"), col("sig"), (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x.cast("double"))
    Ann.rankTopK(
      broadcast(q).join(sigs, col("q_id") =!= col("vec_id"))
        .select(col("q_id"), col("vec_id"),
          (dot / (col("q_nrm") * col("nrm"))).as("cos_raw")),
      k)
  }

  /** The `m6_image_neardup` query: NEAR-DUPLICATE IMAGES across the
    * corpus — the image leg of the dedup × modality matrix (text d2,
    * video frames m4, audio clips m5): re-saves, light edits, and
    * single-pixel-corrupted re-uploads of one image. Every payload
    * decodes through the REAL PNG codec to a 64-bit average-hash
    * ([[avgHash64]] — integer cross-multiplication bits, float-free),
    * then m4's lossless 4×16-bit chunk blocking (Hamming ≤ 3 shares a
    * chunk by pigeonhole; shuffle ∝ images·4, never images²) feeds the
    * exact `bit_count(xor)` filter. Oracle: DuckDB re-derives every
    * signature from the fixture formulas and brute-forces the pairs.
    */
  def imageNearDup(s: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    import s.implicits._
    val sigs = graft.Caches.track(withFamilyPayload(s, dir).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(BatchSize).flatMap(_.map { case (id, bytes) =>
        (id, avgHash64(decodeImage(bytes)))
      }))
      .toDF("doc_id", "sig"))
    val chunked = sigs.select(col("doc_id"), col("sig"),
        explode(sequence(lit(0), lit(3))).as("ci"))
      .withColumn("cv", expr("shiftright(sig, ci * 16) & 65535"))
    val cands = chunked.as("x").join(chunked.as("y"),
        col("x.ci") === col("y.ci") && col("x.cv") === col("y.cv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("x.sig").as("sig_a"),
        col("y.doc_id").as("doc_b"), col("y.sig").as("sig_b"))
      .distinct()
    graft.Caches.ordered(
      cands.withColumn("hamming",
          bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("int"))
        .filter(col("hamming") <= maxHamming)
        .select(col("doc_a"), col("doc_b"), col("hamming")),
      col("doc_a"), col("doc_b"))
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

  /** m13: PIXEL-LEVEL LUMINANCE census per image — the exposure/
    * contrast QA report before any visual model trusts the asset
    * (ffmpeg `signalstats` / the brightness gates in web-scale image
    * curation, LAION-style): REAL PNG decode → per-pixel ITU-R BT.601
    * luma in PURE INTEGER form `(299·R + 587·G + 114·B) div 1000`
    * (the published coefficients ×1000 — no float ever exists), then
    * per image: pixel count, luma sum / min / max and a 4-bin
    * histogram (64-wide bins — the dark/shadow/light/bright split).
    * PNG is lossless RGB, so the oracle recomputes every column from
    * the fixture formula pixel-by-pixel (the m1 discipline).
    *
    * Scale shape: everything computes inside the payload's own file
    * split (m7/m8 discipline — codec-bound, ZERO shuffle before the
    * final order); per-image state is 8 longs however large the
    * image. At 100 TB this is the embarrassingly parallel decode
    * sweep a 1000-executor cluster wants.
    */
  def pixelStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withPayload(s, dir).as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(BatchSize).flatMap(_.map { case (id, bytes) =>
        val img = decodeImage(bytes)
        var (sum, mn, mx) = (0L, 255L, 0L)
        val bins = new Array[Long](4)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            val lum = (299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) +
              114L * (rgb & 0xFF)) / 1000L
            sum += lum
            if (lum < mn) mn = lum
            if (lum > mx) mx = lum
            bins((lum >> 6).toInt) += 1L
            x += 1
          }
          y += 1
        }
        (id, img.getWidth.toLong * img.getHeight, sum, mn, mx,
          bins(0), bins(1), bins(2), bins(3))
      }))
      .toDF("doc_id", "n_px", "lum_sum", "lum_min", "lum_max",
        "b_dark", "b_shadow", "b_light", "b_bright")
      .orderBy("doc_id")
  }

  /** m12: DECODE-HEALTH audit across all three modalities — the
    * corrupt-asset census every media-ingest pipeline reports before
    * anything downstream trusts the payload column (the driver-query
    * form of the tryDecode/tryDemux fuzz discipline): per modality,
    * how many containers decode and how many quarantine. The corpus's
    * fixtures are all valid, so corruption is PLANTED by doc_id
    * arithmetic (§3): every 13th-mod-5 payload is beheaded to its
    * first 10 bytes with the magic byte flipped — no decoder can open
    * a wrong-magic 10-byte container, so health is a deterministic
    * function of the rule and the oracle recomputes the census from
    * it. The decode itself is REAL (total tryX wrappers over ImageIO
    * / javax.sound on the real mangled bytes — they must quarantine,
    * never throw), inside each partition: zero shuffle before the
    * 3-row rollup.
    */
  def decodeAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ids = Tables.documents(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id")).as[Long]
    val rows = ids.mapPartitions(_.flatMap { id =>
      val corrupt = id % 13 == 5
      def mangle(b: Array[Byte]): Array[Byte] =
        if (!corrupt) b
        else {
          val t = java.util.Arrays.copyOf(b, math.min(10, b.length))
          t(0) = (t(0) ^ 0xFF).toByte
          t
        }
      val img = try decodeImage(mangle(pngPayload(id)) ) != null
                catch { case scala.util.control.NonFatal(_) => false }
      val aud = graft.operators.Audio.tryDecode(
        mangle(graft.operators.Audio.wavPayload(id))).isDefined
      val vid = tryDemux(mangle(gifPayload(id))).exists(_.nonEmpty)
      Iterator(("image", id, img), ("audio", id, aud), ("video", id, vid))
    })
    rows.toDF("modality", "doc_id", "ok")
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n_total"),
        count(when(col("ok"), 1)).as("n_ok"),
        count(when(!col("ok"), 1)).as("n_corrupt"),
        sum(when(!col("ok"), col("doc_id"))).as("sum_corrupt_ids"))
      .orderBy(col("modality"))
  }
}
