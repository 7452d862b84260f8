package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions.col

class MultimodalSpec extends SparkSpec {

  test("png payload is a real container and the codec round-trips the fixture pixels exactly") {
    for (id <- Seq(0L, 1L, 17L, 24L, 4081L)) {
      val bytes = Multimodal.pngPayload(id)
      // genuine PNG magic, not a fake blob
      assert((bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
      val img = Multimodal.decodeImage(bytes)
      val (w, h) = Multimodal.imageDims(id)
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w)
        assert((img.getRGB(x, y) & 0xFFFFFF) == Multimodal.pixel(id, x, y),
          s"pixel mismatch doc=$id ($x,$y)")
    }
  }

  test("decode is container-agnostic: a JPEG payload decodes too (dims exact, pixels lossy)") {
    val (w, h) = Multimodal.imageDims(5L)
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, Multimodal.pixel(5L, x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val jpeg = bos.toByteArray
    assert((jpeg(0) & 0xFF) == 0xFF && (jpeg(1) & 0xFF) == 0xD8) // JPEG SOI
    val back = Multimodal.decodeImage(jpeg)
    assert(back.getWidth == w && back.getHeight == h)
    // lossy codec: pixels near, not equal — decode must still be sane
    val d = (img.getRGB(0, 0) & 0xFF) - (back.getRGB(0, 0) & 0xFF)
    assert(math.abs(d) < 64)
  }

  test("manifest emits decoded metadata for every doc, deterministically") {
    val a = Multimodal.manifest(spark, Sf).collect()
    val b = Multimodal.manifest(spark, Sf).collect()
    assert(a.length == Tables.documents(spark, Sf).count())
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    a.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (w, h) = Multimodal.imageDims(id)
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
      assert(r.getAs[Int]("channels") == 3)
      assert(r.getAs[Int]("n_bytes") == w * h * 3)
      // phash folds the DECODED pixels; PNG lossless => equals the formula fold
      var expect = 1125899906842597L
      for (y <- 0 until h; x <- 0 until w)
        expect = expect * 31L + Multimodal.pixel(id, x, y)
      assert(r.getAs[Long]("phash") == expect)
    }
  }

  test("decode runs batched per partition and reports decoded size") {
    val ds = Multimodal.decodeBatched(spark, Sf)
    assert(ds.filter(m => m.n_bytes != m.width * m.height * m.channels).count() == 0)
  }

  test("resize re-encodes real thumbnails whose pixels map back to the source") {
    val t = Multimodal.thumbnails(spark, Sf, w = 16, h = 16)
    assert(t.count() == Tables.documents(spark, Sf).count())
    t.limit(8).collect().foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val img = Multimodal.decodeImage(r.getAs[Array[Byte]]("thumb"))
      assert(img.getWidth == 16 && img.getHeight == 16)
      val (sw, sh) = Multimodal.imageDims(id)
      for (y <- 0 until 16; x <- 0 until 16)
        assert((img.getRGB(x, y) & 0xFFFFFF) ==
          Multimodal.pixel(id, x * sw / 16, y * sh / 16),
          s"thumb pixel mismatch doc=$id ($x,$y)")
    }
  }

  test("gif payload is a real multi-frame container and demux round-trips every frame exactly") {
    for (id <- Seq(0L, 3L, 17L, 24L, 4081L)) {
      val bytes = Multimodal.gifPayload(id)
      // genuine GIF magic, not a fake blob
      assert(bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == '8')
      val frames = Multimodal.demuxFrames(bytes)
      assert(frames.length == Multimodal.frameCount(id))
      val (w, h) = Multimodal.imageDims(id)
      frames.zipWithIndex.foreach { case (img, f) =>
        assert(img.getWidth == w && img.getHeight == h)
        for (y <- 0 until h; x <- 0 until w) {
          val rgb = img.getRGB(x, y) & 0xFFFFFF
          val v = Multimodal.framePixel(id, f, x, y)
          // grayscale fixture ⇒ GIF palette is lossless and r=g=b
          assert(rgb == v * 0x10101, s"frame pixel mismatch doc=$id f=$f ($x,$y)")
        }
      }
    }
  }

  test("frame sampling demuxes real videos into every stride-th decoded frame") {
    val f = Multimodal.sampledFrames(spark, Sf, stride = 2)
    import spark.implicits._
    val perDoc = f.groupBy("doc_id").count().as[(Long, Long)].collect()
    perDoc.foreach { case (id, n) =>
      val total = Multimodal.frameCount(id)
      assert(n == (total + 1) / 2, s"doc=$id total=$total sampled=$n")
    }
    // sampled frames are themselves decodable containers with the fixture pixels
    val r = f.filter(col("doc_id") === 3L && col("frame_idx") === 2).head()
    val img = Multimodal.decodeImage(r.getAs[Array[Byte]]("frame"))
    val (w, h) = Multimodal.imageDims(3L)
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w)
      assert((img.getRGB(x, y) & 0xFFFFFF) == Multimodal.framePixel(3L, 2, x, y) * 0x10101)
  }

  test("tryDemux never escalates on corrupted containers — Some(frames) or None, only") {
    val base = Multimodal.gifPayload(17L)
    val rnd = new scala.util.Random(11)
    // truncations at every boundary region + random byte flips: a
    // malformed container must drop out (None), never crash a task
    val mutants =
      (0 until base.length by 5).map(base.take(_)) ++
      (1 to 300).map { _ =>
        val m = base.clone()
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
        m
      } :+ Array.empty[Byte] :+ Array.fill(64)(0x41.toByte)
    mutants.foreach { m =>
      Multimodal.tryDemux(m) match {
        case Some(frames) => assert(frames.nonEmpty)
        case None         => // skipped record — the correct outcome
      }
    }
    // and the pristine container still demuxes through the same API
    assert(Multimodal.tryDemux(base).exists(_.length == Multimodal.frameCount(17L)))
  }

  test("feature extraction pools real pixels and composes with the ANN operators' schema") {
    val e = Multimodal.extractFeatures(spark, Sf, dim = 64)
    val row = e.head()
    val v1 = row.getSeq[Float](row.fieldIndex("embedding")).toList
    assert(v1.length == 64)
    assert(v1.forall(v => v >= -0.5f && v <= 0.5f)) // mean of [0,1] values, centered
    // deterministic: same payload -> same vector
    val again = Multimodal.extractFeatures(spark, Sf, dim = 64).head()
    assert(v1 == again.getSeq[Float](again.fieldIndex("embedding")).toList)
    // and it IS the pooled decode of the fixture image
    val id = row.getLong(row.fieldIndex("doc_id"))
    val expect = Multimodal.imageFeatures(
      Multimodal.decodeImage(Multimodal.pngPayload(id)), 64).toList
    assert(v1 == expect)
  }

  test("m4: chunk-blocked frame near-dup equals the brute-force pair set") {
    // brute force over driver-computed signatures from the real
    // decode path — the blocked equi-join must lose nothing
    // (pigeonhole: hamming <= 3 over 4 chunks shares a chunk)
    val sigs = graft.Tables.documents(spark, Sf).select("doc_id")
      .collect().map(_.getLong(0)).flatMap { id =>
        Multimodal.demuxFrames(Multimodal.gifPayload(id)).zipWithIndex.collect {
          case (img, idx) if idx % 2 == 0 => (id, idx, Multimodal.avgHash64(img))
        }
      }
    val brute = (for {
      i <- sigs.indices; j <- (i + 1) until sigs.length
      (da, fa, sa) = sigs(i); (db, fb, sb) = sigs(j)
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield {
      if (da < db || (da == db && fa < fb)) (da, fa, db, fb, h)
      else (db, fb, da, fa, h)
    }).toSet
    val got = Multimodal.frameNearDup(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getInt(4))).toSet
    assert(got == brute, s"got=${got.size} brute=${brute.size}")
    assert(brute.nonEmpty) // the threshold actually fires on this corpus
  }

  test("m6: chunk-blocked image near-dup equals brute force; family corpus has a real band") {
    // brute force over driver-computed signatures from the REAL PNG
    // decode path (gray PNG is lossless, so the codec round-trip is
    // exact); the blocked equi-join must lose nothing
    val sigs = graft.Tables.documents(spark, Sf).select("doc_id")
      .collect().map(_.getLong(0)).map { id =>
        (id, Multimodal.avgHash64(Multimodal.decodeImage(Multimodal.familyPngPayload(id))))
      }
    val brute = (for {
      i <- sigs.indices; j <- (i + 1) until sigs.length
      (da, sa) = sigs(i); (db, sb) = sigs(j)
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield if (da < db) (da, db, h) else (db, da, h)).toSet
    val got = Multimodal.imageNearDup(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute, s"got=${got.size} brute=${brute.size}")
    // the fixture produces BOTH sub-bands: exact (hamming 0) and
    // near (1..3) — and every pair stays within one family of 25
    assert(brute.exists(_._3 == 0) && brute.exists(_._3 > 0))
    brute.foreach { case (a, b, _) => assert(a / 25 == b / 25) }
  }

  test("m10: thumb manifest folds equal a driver-side decode→resize→re-encode→decode") {
    val expect = graft.Tables.documents(spark, Sf).select("doc_id")
      .collect().map(_.getLong(0)).map { id =>
        val round = Multimodal.decodeImage(Multimodal.encodePngPublic(
          Multimodal.resizeImage(Multimodal.decodeImage(Multimodal.pngPayload(id)), 8, 8)))
        id -> ((round.getWidth, round.getHeight, Multimodal.pixelFold(round)))
      }.toMap
    val got = Multimodal.thumbManifest(spark, Sf).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    assert(got == expect)
    got.values.foreach { case (w, h, _) => assert(w == 8 && h == 8) }
  }

  test("m9: visual search equals a driver-side exact cosine ranking") {
    val ids = graft.Tables.documents(spark, Sf).select("doc_id")
      .collect().map(_.getLong(0))
    val sigs = ids.map(id =>
      id -> Multimodal.blockSums64(Multimodal.decodeImage(Multimodal.familyPngPayload(id))))
      .toMap
    def cos(a: Array[Long], b: Array[Long]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < 64) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val exp = ids.filter(_ < 20).flatMap { q =>
      ids.filter(_ != q).map(v => (q, v, cos(sigs(q), sigs(v))))
        .sortBy { case (_, v, s) => (-s, v) }.take(10)
        .zipWithIndex.map { case ((_, v, s), i) => (q, i + 1) -> ((v, s)) }
    }.toMap
    val got = Multimodal.visualSearch(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == exp.keySet)
    got.foreach { case (k, (v, s)) =>
      assert(v == exp(k)._1, s"$k: $v vs ${exp(k)._1}")
      assert(math.abs(s / 1e6 - exp(k)._2) <= 5.01e-7, s"$k")
    }
  }

  test("m7: scene-cut distances equal an independent demux+hash; both classes fire") {
    val expect = graft.Tables.documents(spark, Sf).select("doc_id")
      .collect().map(_.getLong(0)).flatMap { id =>
        val sigs = Multimodal.demuxFrames(Multimodal.gifPayload(id)).map(Multimodal.avgHash64)
        sigs.sliding(2).zipWithIndex.collect {
          case (Seq(a, b), i) => (id, i + 1) -> java.lang.Long.bitCount(a ^ b)
        }
      }.toMap
    val got = Multimodal.sceneCuts(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getInt(2), r.getBoolean(3)))).toMap
    assert(got.keySet == expect.keySet) // one row per transition, n_frames - 1 per video
    got.foreach { case (k, (h, cut)) =>
      assert(h == expect(k), s"$k")
      assert(cut == (h > 40))
    }
    // the threshold separates: corpus has cuts AND continuous transitions
    assert(got.values.exists(_._2) && got.values.exists(!_._2))
  }

  test("m13 pixel stats: formula recompute vs the real decode path; bins partition") {
    val Sf = "/root/testdata/sf0.001"
    val got = Multimodal.pixelStats(spark, Sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))).toMap
    assert(got.nonEmpty)
    got.foreach { case (id, (nPx, sum, mn, mx, b0, b1, b2, b3)) =>
      val (w, h) = Multimodal.imageDims(id)
      val lums = for { y <- 0 until h; x <- 0 until w } yield {
        val rgb = Multimodal.pixel(id, x, y)
        (299L * ((rgb >> 16) & 0xFF) + 587L * ((rgb >> 8) & 0xFF) + 114L * (rgb & 0xFF)) / 1000L
      }
      assert(nPx == w.toLong * h && b0 + b1 + b2 + b3 == nPx)
      assert((sum, mn, mx) == ((lums.sum, lums.min, lums.max)), s"doc $id")
      assert((b0, b1, b2, b3) == ((lums.count(_ < 64).toLong, lums.count(l => l >= 64 && l < 128).toLong,
        lums.count(l => l >= 128 && l < 192).toLong, lums.count(_ >= 192).toLong)), s"doc $id")
    }
    // the census separates: all four bins populated somewhere in the corpus
    assert(got.values.map(_._5).sum > 0 && got.values.map(_._6).sum > 0 &&
      got.values.map(_._7).sum > 0 && got.values.map(_._8).sum > 0)
  }

  test("m12 decode audit: census follows the beheading rule; decoders never throw") {
    val Sf = "/root/testdata/sf0.001"
    val got = graft.operators.Multimodal.decodeAudit(spark, Sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val ids = Tables.documents(spark, Sf).select("doc_id").collect().map(_.getLong(0))
    val bad = ids.filter(_ % 13 == 5)
    val expRow = ((ids.length.toLong, (ids.length - bad.length).toLong,
      bad.length.toLong, bad.sum))
    assert(got.keySet == Set("image", "audio", "video"))
    got.values.foreach(v => assert(v == expRow))
    assert(bad.nonEmpty) // the rule fires on this corpus
    // the health verdicts are REAL decoder outcomes, not the rule
    // restated: a valid container decodes, its beheaded twin does not
    val p = graft.operators.Multimodal.pngPayload(7L)
    assert(graft.operators.Multimodal.decodeImage(p) != null)
    val behead = java.util.Arrays.copyOf(p, 10)
    behead(0) = (behead(0) ^ 0xFF).toByte
    intercept[Exception](graft.operators.Multimodal.decodeImage(behead))
    assert(graft.operators.Audio.tryDecode(
      java.util.Arrays.copyOf(graft.operators.Audio.wavPayload(7L), 10)).isEmpty)
  }
}
