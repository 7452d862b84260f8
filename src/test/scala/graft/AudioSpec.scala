package graft

import graft.operators.Audio
import org.apache.spark.sql.functions.col

class AudioSpec extends SparkSpec {

  test("wav payload is a real RIFF container and the codec round-trips the fixture samples exactly") {
    for (id <- Seq(0L, 1L, 17L, 399L, 4081L)) {
      val bytes = Audio.wavPayload(id)
      // genuine RIFF/WAVE magic, not a fake blob
      assert(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F')
      assert(bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')
      val (f, samples) = Audio.decodeAudio(bytes)
      assert(f.getSampleRate.toInt == Audio.SampleRate && f.getChannels == 1)
      val n = Audio.sampleCount(id)
      assert(samples.length == n)
      var i = 0
      while (i < n) {
        assert(samples(i) == Audio.sample(id, i), s"sample mismatch doc=$id i=$i")
        i += 1
      }
    }
  }

  test("decode metadata equals the fixture formula (energy, fold hash, duration)") {
    for (id <- Seq(3L, 42L, 499L)) {
      val meta = Audio.decode(id, Audio.wavPayload(id))
      val n = Audio.sampleCount(id)
      var energy = 0L
      var hash = 1125899906842597L
      for (i <- 0 until n) {
        val s = Audio.sample(id, i).toLong
        energy += s * s
        hash = hash * 31L + (s & 0xFFFFL)
      }
      assert(meta == graft.operators.AudioMeta(id, n, 8000, 1, n / 8, energy, hash))
    }
  }

  test("decimate keeps every factor-th sample bit-exactly at the halved rate") {
    val id = 11L
    val out = Audio.decimate(Audio.wavPayload(id), 2)
    val (f, samples) = Audio.decodeAudio(out)
    assert(f.getSampleRate.toInt == Audio.SampleRate / 2)
    val n = Audio.sampleCount(id)
    assert(samples.length == (n + 1) / 2)
    samples.indices.foreach(i => assert(samples(i) == Audio.sample(id, i * 2)))
  }

  test("audioFeatures pools frame energies into the requested dim, in [0,1]") {
    val (_, samples) = Audio.decodeAudio(Audio.wavPayload(7L))
    val feats = Audio.audioFeatures(samples, 64)
    assert(feats.length == 64)
    assert(feats.forall(v => v >= 0f && v <= 1f))
    // deterministic
    assert(feats.sameElements(Audio.audioFeatures(samples, 64)))
  }

  test("tryDecode never throws on corrupt containers (truncations + byte flips)") {
    val good = Audio.wavPayload(5L)
    assert(Audio.tryDecode(good).isDefined)
    for (cut <- Seq(0, 3, 11, 40, good.length / 2))
      Audio.tryDecode(good.take(cut)) // must not throw
    val rnd = new scala.util.Random(17)
    for (_ <- 0 until 300) {
      val m = good.clone()
      val pos = rnd.nextInt(m.length)
      m(pos) = (m(pos) ^ (1 << rnd.nextInt(8))).toByte
      Audio.tryDecode(m) // must not throw; may be None or a garbled Some
    }
    assert(Audio.tryDecode(Array.fill[Byte](64)(0x41)).isEmpty)
  }

  test("m3 manifest emits decoded metadata for every doc, ordered and deterministic") {
    val rows = Audio.manifest(spark, Sf).collect()
    assert(rows.length == Tables.documents(spark, Sf).count())
    assert(rows.map(_.getLong(0)).toSeq == rows.map(_.getLong(0)).toSeq.sorted)
    // spot-check a row against the local decode
    val r = rows.find(_.getLong(0) == 42L).get
    val m = Audio.decode(42L, Audio.wavPayload(42L))
    assert(r.getInt(1) == m.n_samples && r.getInt(4) == m.duration_ms &&
      r.getLong(5) == m.energy && r.getLong(6) == m.ahash)
  }

  test("extractFeatures emits ANN-compatible array<float> embeddings") {
    val df = Audio.extractFeatures(spark, Sf, dim = 16)
    val row = df.filter(col("doc_id") === 9L).collect().head
    val emb = row.getSeq[Float](1)
    assert(emb.length == 16)
    val (_, samples) = Audio.decodeAudio(Audio.wavPayload(9L))
    assert(emb == Audio.audioFeatures(samples, 16).toSeq)
  }

  test("m5: chunk-blocked audio near-dup equals the brute-force pair set") {
    // brute force over driver-computed fingerprints from the real
    // decode path — the blocked equi-join must lose nothing
    // (pigeonhole: hamming <= 3 over 4 chunks shares a chunk)
    val sigs = Tables.documents(spark, Sf).select("doc_id")
      .collect().map(_.getLong(0)).map { id =>
        (id, Audio.energySig63(Audio.decodeAudio(Audio.famClipPayload(id))._2))
      }
    val brute = (for {
      i <- sigs.indices; j <- (i + 1) until sigs.length
      (da, sa) = sigs(i); (db, sb) = sigs(j)
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield if (da < db) (da, db, h) else (db, da, h)).toSet
    val got = Audio.audioNearDup(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute, s"got=${got.size} brute=${brute.size}")
    assert(brute.nonEmpty) // family structure guarantees true pairs
    // equal-offset family members are EXACT dups (hamming 0)
    assert(brute.exists(_._3 == 0))
  }

  test("m8: VAD segments equal an independent decode+RLE; segments tile the clip") {
    val expect = graft.Tables.documents(spark, Sf).select("doc_id")
      .collect().map(_.getLong(0)).flatMap { id =>
        val (_, smp) = Audio.decodeAudio(Audio.segPayload(id))
        val nf = smp.length / 160
        val sums = Array.tabulate(nf) { f =>
          (f * 160 until (f + 1) * 160).map(i => math.abs(smp(i).toInt).toLong).sum
        }
        def sil(f: Int) = sums(f) < 160L * 256
        val segs = scala.collection.mutable.ArrayBuffer.empty[((Long, Int), (Boolean, Int, Int, Long))]
        var f = 0; var k = 0
        while (f < nf) {
          var g = f; var mass = 0L
          while (g < nf && sil(g) == sil(f)) { mass += sums(g); g += 1 }
          segs += (((id, k), (sil(f), f, g - f, mass)))
          k += 1; f = g
        }
        segs
      }.toMap
    val got = Audio.vadSegments(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getBoolean(2), r.getInt(3), r.getInt(4), r.getLong(5)))).toMap
    assert(got == expect)
    // corpus has both classes; per doc, segments tile [0, nf) with
    // alternating states
    assert(got.values.exists(_._1) && got.values.exists(!_._1))
    got.groupBy(_._1._1).foreach { case (_, segs) =>
      val inOrder = segs.toSeq.sortBy(_._1._2).map(_._2)
      inOrder.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b._2 == a._2 + a._3) // contiguous
          assert(a._1 != b._1)        // states alternate
        case _ =>
      }
      assert(inOrder.head._2 == 0)
    }
  }

  test("m11 clipping audit matches an independent formula recompute") {
    val Sf = "/root/testdata/sf0.001"
    val got = graft.operators.Audio.clippingAudit(spark, Sf).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    graft.Caches.clear()
    val ids = Tables.documents(spark, Sf).select("doc_id").collect().map(_.getLong(0))
    val exp = ids.map { id =>
      val n = graft.operators.Audio.sampleCount(id)
      val ab = (0 until n).map(i =>
        math.abs(graft.operators.Audio.sample(id, i).toInt))
      val peak = ab.max; val nc = ab.count(_ >= 32700).toLong
      val sa = ab.map(_.toLong).sum
      id -> ((n, peak, nc, sa, sa * 1000 / n,
        (32768L - peak) * 1000 / 32768L, nc * 1000 / n))
    }.toMap
    assert(got == exp && got.nonEmpty)
    // the audit is not vacuous on this corpus: clipping fires
    // somewhere and headroom varies across clips
    assert(got.values.exists(_._3 > 0))
    assert(got.values.map(_._6).toSet.size > 1)
  }
}
