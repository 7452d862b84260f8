package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hot loops the built-in
  * higher-order functions evaluate interpretively (SURVEY.md §4):
  * whole-stage-codegen'd, allocation-free inner loops. Each keeps
  * bit-identical semantics with the HOF formulation it replaces
  * (sequential left-to-right double folds), so oracle parity is
  * unaffected.
  */
object ArrayExprs {
  /** Codegen'd float-array dot product in double precision. */
  def float_dot(a: Column, b: Column): Column =
    ExpressionUtils.column(FloatDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Codegen'd MinHash signature over 32-bit-folded feature hashes. */
  def minhash_sig(hashes: Column, a: Array[Long], b: Array[Long], p: Long): Column =
    ExpressionUtils.column(MinHashSig(ExpressionUtils.expression(hashes), a, b, p))

  /** Codegen'd one-permutation-hashing signature (see [[OphSig]]). */
  def oph_sig(hashes: Column, k: Int, a: Long, b: Long, p: Long, c: Long): Column =
    ExpressionUtils.column(OphSig(ExpressionUtils.expression(hashes), k, a, b, p, c))

  /** Fused 64-bit-hashes → OPH slots → LSH band keys kernel (see
    * [[OphBands]]).
    */
  def oph_bands(hashes64: Column, bands: Int, rows: Int, a: Long, b: Long,
      p: Long, c: Long): Column =
    ExpressionUtils.column(OphBands(ExpressionUtils.expression(hashes64), bands, rows, a, b, p, c))

  /** Fused one-pass set Jaccard (what FuseJaccardRule rewrites the
    * composed intersect/union form into).
    */
  def jaccard_sets(a: Column, b: Column): Column =
    ExpressionUtils.column(JaccardSets(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Merge-based set Jaccard with threshold abort over SORTED-distinct
    * long arrays (see [[SortedJaccardGe]]).
    */
  def jaccard_sorted_ge(a: Column, b: Column, tau: Double): Column =
    ExpressionUtils.column(SortedJaccardGe(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b), tau))

  /** Exact-rational-threshold overlap counts `struct(inter, un)`, null
    * below `tauNum/tauDen` (see [[SortedJaccardCounts]]).
    */
  def jaccard_counts_ge(a: Column, b: Column, tauNum: Int, tauDen: Int): Column =
    ExpressionUtils.column(SortedJaccardCounts(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b), tauNum, tauDen))

  /** The `nprobe` nearest centroid ids for a float vector (see
    * [[NearestClusters]]).
    */
  def nearest_clusters(v: Column, cents: Array[Array[Float]], nprobe: Int): Column =
    ExpressionUtils.column(NearestClusters(ExpressionUtils.expression(v), cents, nprobe))

  /** Distinct xxhash64 values of the character n-grams of a
    * normalized string, hashed in place (no gram strings built).
    */
  def char_gram_hashes(nrm: Column, n: Int): Column =
    ExpressionUtils.column(GramHashes(ExpressionUtils.expression(nrm), n, byWord = false))

  /** POSITIONAL xxhash64 values of the character n-grams: element i
    * (1-based) is exactly `xxhash64(substr(nrm, i, n))`, one per
    * window position, duplicates kept (see [[GramHashesPos]]). The
    * offset-addressable twin of [[char_gram_hashes]]: callers filter
    * window POSITIONS by hash before building any window string.
    */
  def char_gram_hashes_pos(nrm: Column, n: Int): Column =
    ExpressionUtils.column(GramHashesPos(ExpressionUtils.expression(nrm), n))

  /** [[char_gram_hashes_pos]] under an explicit seed — the second
    * member of d6's 128-bit span-identity pair (two independent
    * 64-bit hashes of the same window).
    */
  def char_gram_hashes_pos_seeded(nrm: Column, n: Int, seed: Long): Column =
    ExpressionUtils.column(GramHashesPos(ExpressionUtils.expression(nrm), n, seed))

  /** Distinct xxhash64 values of the word k-shingles of a normalized
    * (single-spaced) string, hashed in place.
    */
  def word_shingle_hashes(nrm: Column, k: Int): Column =
    ExpressionUtils.column(GramHashes(ExpressionUtils.expression(nrm), k, byWord = true))

  /** Bloom bitmap (`words`×64 bits) of a long-hash set (see
    * [[BloomBits]]).
    */
  def bloom_bits(hashes: Column, words: Int): Column =
    ExpressionUtils.column(BloomBits(ExpressionUtils.expression(hashes), words))

  /** Lossless Bloom-bound pre-verify for Jaccard ≥ tau (see
    * [[BloomBoundGe]]).
    */
  def bloom_bound_ge(ba: Column, bb: Column, sza: Column, szb: Column,
      tau: Double): Column =
    ExpressionUtils.column(BloomBoundGe(
      ExpressionUtils.expression(ba), ExpressionUtils.expression(bb),
      ExpressionUtils.expression(sza), ExpressionUtils.expression(szb), tau))

  /** Codegen'd multi-bit hyperplane sketch: bit b of the output is
    * sign(v · plane_b), packed into `bits/64` longs. `planes` is the
    * flattened [bits × dim] matrix.
    */
  def hyperplane_sketch(v: Column, planes: Array[Double], dim: Int, bits: Int): Column =
    ExpressionUtils.column(HyperplaneSketch(ExpressionUtils.expression(v), planes, dim, bits))

  /** Fused hot-window extractor for d6 (see [[HotSpanOccs]]):
    * `array(struct(h1, h2, off))` of the windows whose positional
    * hash is in the SORTED `hot` set, h2 computed in place only for
    * survivors.
    */
  def hot_span_occs(nrm: Column, hs: Column, hot: Column, n: Int,
      seed: Long): Column =
    ExpressionUtils.column(HotSpanOccs(ExpressionUtils.expression(nrm),
      ExpressionUtils.expression(hs), ExpressionUtils.expression(hot), n, seed))

  /** Fused 64-bit SimHash over a word array (see [[SimHash64]]):
    * `array(hi32, lo32)` of the majority-vote signature.
    */
  def simhash64(words: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(words)))
}

/** Fused SimHash kernel: one pass over the word array computing both
  * 32-bit signature halves. Per word, the hash is the md5 digest's
  * first 8 bytes split big-endian into (hi32, lo32) — BIT-IDENTICAL
  * to the hex-digit formulation `conv(substring(md5(w), 1|9, 8), 16,
  * 10)` that the DuckDB oracle evaluates (asserted in ExprSpec) — and
  * bit j of each output half is set when more than half the words set
  * it. Replaces 2 interpreted md5→conv→substring HOF transforms plus
  * 64 interpreted filter/size array passes per document with a single
  * loop and 64 counters. Null words count as hash 0 (matching the
  * HOF form, where md5(null) → null → getLong reads 0... they don't
  * occur: upstream is array_distinct(split(...))).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(in: Any): Any = {
    val words = in.asInstanceOf[ArrayData]
    val n = words.numElements()
    val counts = new Array[Int](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        md.reset()
        val d = md.digest(words.getUTF8String(i).getBytes)
        val hi = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
          ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
        val lo = ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
          ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
        var j = 0
        while (j < 32) {
          if (((hi >> j) & 1L) == 1L) counts(j) += 1
          if (((lo >> j) & 1L) == 1L) counts(32 + j) += 1
          j += 1
        }
      }
      i += 1
    }
    var hiOut = 0L; var loOut = 0L
    var j = 0
    while (j < 32) {
      if (counts(j) * 2 > n) hiOut |= 1L << j
      if (counts(32 + j) * 2 > n) loOut |= 1L << j
      j += 1
    }
    new GenericArrayData(Array(hiOut, loOut))
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** Packed sign-sketch of an `array<float>` vector against a fixed
  * hyperplane matrix: bit b set iff `v · plane_b > 0`. The sketch is a
  * distance-preserving compression for angular similarity
  * (P[bit differs] = angle/π, Goemans–Williamson), so the Hamming
  * distance between two sketches estimates their cosine with std-dev
  * `π·sqrt(p(1-p)/bits)` — the prefilter kernel behind Ann.lshTopK.
  * One fused pass: `bits × dim` multiplies per row, no intermediate
  * arrays.
  */
case class HyperplaneSketch(child: Expression, planes: Array[Double], dim: Int, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(planes.length == bits * dim && bits % 64 == 0)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(in: Any): Any = {
    val v = in.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    val words = new Array[Long](bits / 64)
    var b = 0
    while (b < bits) {
      var s = 0.0
      var i = 0
      val off = b * dim
      while (i < n) { s += v.getFloat(i).toDouble * planes(off + i); i += 1 }
      if (s > 0) words(b >> 6) |= 1L << (b & 63)
      b += 1
    }
    new GenericArrayData(words)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, in => {
      val n = ctx.freshName("n")
      val w = ctx.freshName("w")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val o = ctx.freshName("o")
      s"""
        |int $n = java.lang.Math.min($dim, $in.numElements());
        |long[] $w = new long[${bits / 64}];
        |for (int $b = 0; $b < $bits; $b++) {
        |  double $s = 0.0;
        |  int $o = $b * $dim;
        |  for (int $i = 0; $i < $n; $i++) {
        |    $s += ((double) $in.getFloat($i)) * $pRef[$o + $i];
        |  }
        |  if ($s > 0) $w[$b >> 6] |= 1L << ($b & 63);
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($w);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneSketch = copy(child = c)
}

/** Fused featurize kernel: the distinct 64-bit feature hashes of a
  * document in one pass, with NO intermediate gram strings. Because
  * the input is whitespace-normalized (single spaces), every word
  * k-shingle joined by " " — and every char n-gram — is literally a
  * contiguous substring of the input, so each feature hashes as a
  * byte range of the original UTF8String. Hash values are EXACTLY
  * `xxhash64(gram)` (same XXH64, seed 42), so Jaccard on these sets
  * equals Jaccard on the string sets (asserted in ExprSpec).
  *
  * Inputs shorter than one full gram yield the whole-string hash,
  * matching TextFns.charGrams / wordShingles degradation.
  *
  * CodegenFallback: the per-row loop IS the work; codegen would only
  * remove the boxing of one input/output per row.
  */
case class GramHashes(child: Expression, n: Int, byWord: Boolean)
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val Seed = 42L

  override def nullSafeEval(in: Any): Any = {
    val s     = in.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val base  = s.getBaseObject
    val off   = s.getBaseOffset
    val nb    = s.numBytes()
    val set   = new java.util.LinkedHashSet[java.lang.Long]()
    def hashRange(from: Int, until: Int): Unit =
      set.add(org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(base, off + from, until - from, Seed))
    if (byWord) {
      // byte offsets of word starts (normalized input: single 0x20s)
      val starts = scala.collection.mutable.ArrayBuffer(0)
      var i = 0
      while (i < nb) {
        if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' ') starts += i + 1
        i += 1
      }
      val words = starts.length
      if (words < n) hashRange(0, nb)
      else {
        var w = 0
        while (w + n <= words) {
          val end = if (w + n < words) starts(w + n) - 1 else nb
          hashRange(starts(w), end)
          w += 1
        }
      }
    } else {
      // char n-grams: walk code-point boundaries
      val cps = scala.collection.mutable.ArrayBuffer(0)
      var i = 0
      while (i < nb) {
        i += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(
          org.apache.spark.unsafe.Platform.getByte(base, off + i))
        cps += i
      }
      val chars = cps.length - 1
      if (chars < n) hashRange(0, nb)
      else {
        var c = 0
        while (c + n <= chars) { hashRange(cps(c), cps(c + n)); c += 1 }
      }
    }
    val out = new Array[Long](set.size)
    val it  = set.iterator()
    var j   = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): GramHashes = copy(child = c)
}

/** Sequential-fold dot product of two `array<float>` columns in
  * double precision — bit-identical to
  * `aggregate(zip_with(a, b, (x, y) -> double(x)*double(y)), 0d, +)`
  * and to DuckDB's `list_dot_product` on `DOUBLE[]`, INCLUDING the
  * HOF form's null semantics: unequal lengths (zip_with null-pads)
  * or a null element make the whole result null — asserted in
  * ExprSpec.
  */
/** The `nprobe` nearest centroid ids (ascending by (score, id)) for a
  * float vector — the coarse-quantizer assignment kernel shared by
  * k-means training, IVF/PQ bucket assignment, and d9's multi-probe
  * cluster replication. Score and ordering are BIT-IDENTICAL to the
  * sort-of-structs formulation it replaces (Ann.topClusters r5):
  * negscore = Σc²/2 − dot(v, c) with both sides left-to-right double
  * folds, ties broken by ascending centroid id. The sort form built
  * k literal-struct expressions in the PLAN (k ≈ n/256 reaches
  * thousands at scale — analysis alone took seconds per d9 run) and
  * sorted all k structs per ROW; this is one plan node holding the
  * centroid matrix as a reference object, an O(k·dim) fused loop,
  * and an O(nprobe) insertion — no per-row allocation beyond the
  * result. Returns null for a null vector, a null element, or a
  * dim mismatch with the centroids (the sort form had no defined
  * order there; every call site filters such rows before or after).
  */
case class NearestClusters(child: Expression, cents: Array[Array[Float]],
    nprobe: Int) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  // Σc²/2 per centroid, the same left-to-right double fold the r5
  // column formulation evaluated at plan-construction time
  @transient private lazy val halves: Array[Double] =
    cents.map(_.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble) / 2)

  override def nullSafeEval(in: Any): Any = {
    val v = in.asInstanceOf[ArrayData]
    val out = NearestClusters.select(v, cents, halves, nprobe)
    if (out == null) null else new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cRef = ctx.addReferenceObj("cents", cents, "float[][]")
      val hRef = ctx.addReferenceObj("halves", halves, "double[]")
      val out = ctx.freshName("out")
      s"""
        |int[] $out = org.apache.spark.sql.graft.NearestClusters.select(
        |  $a, $cRef, $hRef, $nprobe);
        |if ($out == null) { ${ev.isNull} = true; }
        |else { ${ev.value} =
        |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out); }
      """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): NearestClusters =
    copy(child = c)
}

object NearestClusters {
  /** Shared eval/codegen kernel: ids of the `nprobe` smallest
    * (Σc²/2 − dot, id) pairs, or null for a bad vector. Static so the
    * generated code calls it without capturing the expression.
    */
  def select(v: ArrayData, cents: Array[Array[Float]], halves: Array[Double],
      nprobe: Int): Array[Int] = {
    val n = v.numElements()
    val k = cents.length
    if (k > 0 && cents(0).length != n) return null
    var i = 0
    while (i < n) { if (v.isNullAt(i)) return null; i += 1 }
    val m = math.min(nprobe, k)
    if (m <= 0) return Array.emptyIntArray
    val bs = new Array[Double](m)
    val bi = new Array[Int](m)
    var filled = 0
    var c = 0
    while (c < k) {
      val cent = cents(c)
      var s = 0.0
      i = 0
      while (i < n) { s += v.getFloat(i).toDouble * cent(i).toDouble; i += 1 }
      val neg = halves(c) - s
      // strict-less insertion keeps equal scores in ascending-id order
      if (filled < m) {
        var p = filled
        while (p > 0 && neg < bs(p - 1)) { bs(p) = bs(p - 1); bi(p) = bi(p - 1); p -= 1 }
        bs(p) = neg; bi(p) = c; filled += 1
      } else if (neg < bs(m - 1)) {
        var p = m - 1
        while (p > 0 && neg < bs(p - 1)) { bs(p) = bs(p - 1); bi(p) = bi(p - 1); p -= 1 }
        bs(p) = neg; bi(p) = c
      }
      c += 1
    }
    if (filled == m) bi else java.util.Arrays.copyOf(bi, filled)
  }
}

case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  // null even for non-null inputs: length mismatch / null element
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
        |int $n = $a.numElements();
        |if ($n != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $s = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
        |    $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
        |  }
        |  if (!${ev.isNull}) ${ev.value} = $s;
        |}
      """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatDot =
    copy(left = l, right = r)
}

/** MinHash signature: for permutation j, `min_h((a(j)*h + b(j)) % p)`
  * over an `array<long>` of 32-bit-folded feature hashes. Constants
  * satisfy a < 2^31, h < 2^32, so the product never overflows a
  * signed long — identical to the ANSI-safe HOF formulation.
  */
case class MinHashSig(child: Expression, a: Array[Long], b: Array[Long], p: Long)
    extends UnaryExpression with ExpectsInputTypes {

  require(a.length == b.length)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(in: Any): Any = {
    val hs  = in.asInstanceOf[ArrayData]
    val n   = hs.numElements()
    val out = new Array[Long](a.length)
    var j   = 0
    while (j < a.length) {
      var m = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = (a(j) * hs.getLong(i) + b(j)) % p
        if (v < m) m = v
        i += 1
      }
      out(j) = m
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("permA", a, "long[]")
    val bRef = ctx.addReferenceObj("permB", b, "long[]")
    nullSafeCodeGen(ctx, ev, in => {
      val n   = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i   = ctx.freshName("i")
      val j   = ctx.freshName("j")
      val m   = ctx.freshName("m")
      val v   = ctx.freshName("v")
      s"""
        |int $n = $in.numElements();
        |long[] $out = new long[${a.length}];
        |for (int $j = 0; $j < ${a.length}; $j++) {
        |  long $m = Long.MAX_VALUE;
        |  for (int $i = 0; $i < $n; $i++) {
        |    long $v = ($aRef[$j] * $in.getLong($i) + $bRef[$j]) % ${p}L;
        |    if ($v < $m) $m = $v;
        |  }
        |  $out[$j] = $m;
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** One-permutation-hashing MinHash signature (Li, Owen, Zhang, NIPS
  * 2012) with OPTIMAL densification (Shrivastava, ICML 2017): ONE
  * universal hash `(a·h + b) mod p` maps every feature into one of
  * `k` bins (`v mod k`); each bin keeps its minimum hashed value; an
  * empty bin j copies the value of a donor bin found by probing
  * `mix(j, t) mod k` for t = 1, 2, … until a filled bin is hit, where
  * `mix` is a splitmix64-style mixer seeded by `c`. Replaces k
  * independent permutation scans (O(k·|set|) per doc) with one scan
  * (O(|set| + k·probes)) while keeping per-slot collision probability
  * ≈ Jaccard — the candidate-generation property LSH banding needs.
  *
  * Donor selection is deliberately NOT the classic rotation walk
  * ("borrow from the next filled bin to the right"): in the sparse
  * regime (|set| ≪ k) rotation copies ONE donor value across an
  * entire empty run, so a single shared feature can light up r
  * consecutive slots at once and a banded r-row scheme collapses —
  * measured on this corpus (≈250 distinct grams vs k=1024): 124,319
  * candidate pairs vs 1,227 under classic MinHash (≈ all-pairs at 500
  * docs). Per-(bin, attempt) hashed probing makes slot agreements
  * independent across slots, restoring the J^r band-collision curve.
  * Probing is capped at 256 attempts (P[miss] < (1-f/k)^256, ≈ 1e-28
  * at 20% fill) with a rotation-walk fallback for pathological
  * occupancy. Empty input yields all-sentinel slots (same behavior
  * as MinHashSig on an empty array).
  */
case class OphSig(child: Expression, k: Int, a: Long, b: Long, p: Long, c: Long)
    extends UnaryExpression with ExpectsInputTypes {

  require(k > 0)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(in: Any): Any =
    new GenericArrayData(
      OphKernel.slots(in.asInstanceOf[ArrayData], k, a, b, p, c))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => s"""
      |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      |  org.apache.spark.sql.graft.OphKernel.slots(
      |    $in, $k, ${a}L, ${b}L, ${p}L, ${c}L));
    """.stripMargin)

  override protected def withNewChildInternal(c2: Expression): OphSig = copy(child = c2)
}

/** The OPH slot-fill + optimal-densification kernel, shared by the
  * interpreted AND generated paths of [[OphSig]] and [[OphBands]] —
  * one implementation, four call sites, so a densification change can
  * never make the measurement tools' signatures (oph_sig) diverge
  * from the shipped d4 path (oph_bands). Static forwarders make the
  * methods directly callable from generated Java; the JIT inlines hot
  * statics, so this costs nothing over the previous inline codegen.
  */
object OphKernel {

  /** One-pass slot fill (min hashed value per bin; Long.MaxValue =
    * empty) followed by optimal densification: an empty bin copies a
    * donor found by seeded per-(bin, attempt) probing over the
    * ORIGINAL occupancy, with a rotation-walk fallback after 256
    * misses. The 32-bit fold (`h & 0xFFFFFFFF`) is applied
    * UNCONDITIONALLY: it is the identity on oph_sig's in-contract
    * 32-bit inputs, it is the input convention of oph_bands' raw
    * 64-bit hashes, and it makes the kernel TOTAL — a negative or
    * 64-bit value fed to oph_sig via SQL yields a deterministic
    * signature instead of a negative-bin ArrayIndexOutOfBounds that
    * kills the query.
    */
  def slots(hs: ArrayData, k: Int, a: Long, b: Long, p: Long,
      c: Long): Array[Long] = {
    val n = hs.numElements()
    val slots = new Array[Long](k)
    java.util.Arrays.fill(slots, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i) & 0xFFFFFFFFL
      val v = (a * h + b) % p
      val bin = (v % k).toInt
      if (v < slots(bin)) slots(bin) = v
      i += 1
    }
    var anyFilled = false
    i = 0
    while (i < k && !anyFilled) { anyFilled = slots(i) != Long.MaxValue; i += 1 }
    if (anyFilled) {
      val filled = new Array[Boolean](k) // probe ORIGINAL occupancy
      i = 0
      while (i < k) { filled(i) = slots(i) != Long.MaxValue; i += 1 }
      var j = 0
      while (j < k) {
        if (!filled(j)) {
          var donor = -1
          var t = 1
          while (donor < 0 && t <= 256) {
            var z = j * c + t * 0xC2B2AE3D27D4EB4FL
            z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
            z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
            val d = (((z ^ (z >>> 31)) >>> 1) % k).toInt
            if (filled(d)) donor = d
            t += 1
          }
          if (donor < 0) { // pathological occupancy: rotation fallback
            var w = 1
            while (!filled((j + w) % k)) w += 1
            donor = (j + w) % k
          }
          slots(j) = slots(donor)
        }
        j += 1
      }
    }
    slots
  }

  /** Seeded avalanche mix of each band's `rows` consecutive slots
    * into one 64-bit band key.
    */
  def bandKeys(slots: Array[Long], bands: Int, rows: Int): Array[Long] = {
    val keys = new Array[Long](bands)
    var bnd = 0
    while (bnd < bands) {
      var h = bnd * 0x9E3779B97F4A7C15L + 0xC2B2AE3D27D4EB4FL
      var r = 0
      while (r < rows) {
        h = (h ^ slots(bnd * rows + r)) * 0x9E3779B97F4A7C15L
        h ^= h >>> 32
        r += 1
      }
      keys(bnd) = h
      bnd += 1
    }
    keys
  }
}

/** Fused d4 banding kernel: 64-bit feature hashes → 32-bit fold →
  * OPH slots (same scheme as [[OphSig]], optimal densification) →
  * `bands` LSH band keys, one per `rows` consecutive slots, in a
  * single pass with no intermediate arrays. Replaces three stages
  * that each materialized a per-doc array (an interpreted per-element
  * `pmod` HOF for the fold, the k-slot signature, and an
  * xxhash64-over-slices HOF for the band keys) with one codegen'd
  * kernel emitting the `bands`-long key array directly.
  *
  * The band key is a seeded avalanche mix over the band's slots —
  * not xxhash64 — which changes nothing semantically: a band key is
  * an internal bucket id; equal slot runs still map to equal keys
  * (candidate completeness is slot-determined) and a cross-band hash
  * collision can only ADD a candidate that exact verification
  * rejects. The 32-bit fold `h mod 2^32` equals the `pmod` HOF
  * formulation bit-for-bit (power-of-two modulus of a two's-
  * complement long is the unsigned low half).
  */
case class OphBands(child: Expression, bands: Int, rows: Int, a: Long, b: Long,
    p: Long, c: Long)
    extends UnaryExpression with ExpectsInputTypes {

  require(bands > 0 && rows > 0)
  private val k = bands * rows

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(in: Any): Any =
    new GenericArrayData(OphKernel.bandKeys(
      OphKernel.slots(in.asInstanceOf[ArrayData], k, a, b, p, c),
      bands, rows))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => s"""
      |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      |  org.apache.spark.sql.graft.OphKernel.bandKeys(
      |    org.apache.spark.sql.graft.OphKernel.slots(
      |      $in, $k, ${a}L, ${b}L, ${p}L, ${c}L),
      |    $bands, $rows));
    """.stripMargin)

  override protected def withNewChildInternal(c2: Expression): OphBands = copy(child = c2)
}

/** Per-document Bloom bitmap of a 64-bit feature-hash SET: an
  * m = words×64 bit array with bit `pmod(g, m)` set for every gram
  * hash g. Deterministic and order-insensitive, so it commutes with
  * the array_sort/array_distinct the verify path applies. Input must
  * be distinct-element (a set) only so that the SIZE carried next to
  * it means |A| — the bitmap itself tolerates duplicates.
  */
case class BloomBits(child: Expression, words: Int)
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(words > 0)
  private val m = words * 64

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(in: Any): Any = {
    val xs = in.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val out = new Array[Long](words)
    var i = 0
    while (i < n) {
      val idx = java.lang.Math.floorMod(xs.getLong(i), m.toLong).toInt
      out(idx >> 6) |= (1L << (idx & 63))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def prettyName: String = "bloom_bits"
  override protected def withNewChildInternal(c: Expression): BloomBits = copy(child = c)
}

/** LOSSLESS Bloom-bound candidate pre-verify for Jaccard ≥ τ (the
  * cheap reject between LSH banding and the exact merge kernel).
  *
  * Soundness: a bit set in bitmap `a` but clear in `b` certifies at
  * least one gram of A absent from B (any B-gram on that index would
  * have set b's bit), so with pab = pop(a&~b), pba = pop(b&~a):
  * |A\B| ≥ pab, |B\A| ≥ pba, hence |A∩B| ≤ |A|−pab and
  * |A∪B| ≥ |A|+pba (and symmetric), giving the deterministic bound
  *   J ≤ min((|A|−pab)/(|A|+pba), (|B|−pba)/(|B|+pab)).
  * Returns bound ≥ τ−1e−6 (the SortedJaccardGe margin discipline):
  * a FALSE can only reject pairs the exact ≥ τ verify would reject —
  * never a true pair — so outputs through the filter are identical
  * (property-asserted in ExprSpec against exact Jaccard). Bitmap
  * saturation only WEAKENS the bound toward keeping; correctness
  * never depends on m.
  */
case class BloomBoundGe(ba: Expression, bb: Expression,
    sza: Expression, szb: Expression, tau: Double)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression
    with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def first: Expression = ba
  override def second: Expression = bb
  override def third: Expression = sza
  override def fourth: Expression = szb

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType), IntegerType, IntegerType)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  private val margin = tau - 1e-6

  override def nullSafeEval(a: Any, b: Any, na: Any, nb: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val la = na.asInstanceOf[Int]
    val lb = nb.asInstanceOf[Int]
    if (la == 0 || lb == 0) return margin <= 0.0
    val n = math.min(xs.numElements(), ys.numElements())
    var pab = 0
    var pba = 0
    var i = 0
    while (i < n) {
      val wa = xs.getLong(i)
      val wb = ys.getLong(i)
      pab += java.lang.Long.bitCount(wa & ~wb)
      pba += java.lang.Long.bitCount(wb & ~wa)
      i += 1
    }
    val bound = math.min(
      (la - pab).toDouble / (la + pba).toDouble,
      (lb - pba).toDouble / (lb + pab).toDouble)
    bound >= margin
  }

  override def prettyName: String = "bloom_bound_ge"
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): BloomBoundGe =
    copy(ba = f, bb = s, sza = t, szb = q)
}

/** Positional char-n-gram hashes: out(c) = XXH64 of the window
  * starting at code point c (0-based array, so SQL element_at(hs, i)
  * == xxhash64(substr(s, i, n))), duplicates KEPT — the d6 span
  * pipeline filters window OFFSETS by hot-hash membership and builds
  * strings only for surviving offsets, instead of materializing every
  * window string first (measured allocation-bound: gc 13.2 s of a
  * 4.8 s sf0.1 wall). Same in-place byte hashing, seed, and short-
  * input degradation (chars < n -> one whole-string hash) as
  * [[GramHashes]]; `array_distinct` of this array is element-wise
  * identical to GramHashes' first-occurrence set (asserted in
  * ExprSpec).
  */
case class GramHashesPos(child: Expression, n: Int, Seed: Long = 42L)
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(in: Any): Any = {
    val s    = in.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val base = s.getBaseObject
    val off  = s.getBaseOffset
    val nb   = s.numBytes()
    def hashRange(from: Int, until: Int): Long =
      org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(base, off + from, until - from, Seed)
    val cps = scala.collection.mutable.ArrayBuffer(0)
    var i = 0
    while (i < nb) {
      i += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(
        org.apache.spark.unsafe.Platform.getByte(base, off + i))
      cps += i
    }
    val chars = cps.length - 1
    if (chars < n) return new GenericArrayData(Array(hashRange(0, nb)))
    val out = new Array[Long](chars - n + 1)
    var c = 0
    while (c + n <= chars) { out(c) = hashRange(cps(c), cps(c + n)); c += 1 }
    new GenericArrayData(out)
  }

  override def prettyName: String = "char_gram_hashes_pos"
  override protected def withNewChildInternal(c: Expression): GramHashesPos =
    copy(child = c)
}

/** d6's fused hot-window extractor: one pass over a document's
  * positional window hashes, keeping only offsets whose hash is a
  * member of the doc's SORTED hot set (binary search, O(log |hot|)
  * per window — r15 VERDICT #2: the HOF formulation did a LINEAR
  * `array_contains` scan per window over a heap-resident collect_set,
  * O(windows × |hot|) on repetitive docs, and re-evaluated the full
  * seeded hash array inside the lambda). For each surviving offset
  * the SECOND independent hash (h2, `seed`) is computed in place for
  * THAT window only — never for the ~99% of windows the prefilter
  * rejects. Output element i is `struct(h1, h2, off)` with `off`
  * 1-based, bit-identical to
  * `element_at(hs, off) / element_at(char_gram_hashes_pos_seeded(nrm,
  * n, seed), off)` (asserted in ExprSpec). The short-string
  * degenerate case (chars < n) mirrors [[GramHashesPos]]: one window
  * spanning the whole string.
  */
case class HotSpanOccs(first: Expression, second: Expression,
    third: Expression, n: Int, seed: Long)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false),
    StructField("off", IntegerType, nullable = false))), containsNull = false)

  override protected def nullSafeEval(nrm: Any, hsA: Any, hotA: Any): Any = {
    val s    = nrm.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val hs   = hsA.asInstanceOf[ArrayData]
    val hot  = hotA.asInstanceOf[ArrayData]
    val nHot = hot.numElements()
    val base = s.getBaseObject
    val off  = s.getBaseOffset
    val nb   = s.numBytes()
    // codepoint byte-offsets, once per doc (identical to GramHashesPos)
    val cps = new Array[Int](nb + 1)
    var nc = 0
    var i = 0
    while (i < nb) {
      i += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(
        org.apache.spark.unsafe.Platform.getByte(base, off + i))
      nc += 1
      cps(nc) = i
    }
    def isHot(h: Long): Boolean = {
      var lo = 0
      var hi = nHot - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val v = hot.getLong(mid)
        if (v < h) lo = mid + 1
        else if (v > h) hi = mid - 1
        else return true
      }
      false
    }
    val nw = hs.numElements()
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var w = 0
    while (w < nw) {
      val h1 = hs.getLong(w)
      if (isHot(h1)) {
        // window w spans codepoints [w, w+n) — or the whole string in
        // the chars < n degenerate case (then nw == 1 and w == 0)
        val from  = if (nc < n) 0 else cps(w)
        val until = if (nc < n) nb else cps(w + n)
        val h2 = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(base, off + from, until - from, seed)
        out += InternalRow(h1, h2, w + 1)
      }
      w += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def prettyName: String = "hot_span_occs"
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): HotSpanOccs =
    copy(first = f, second = s, third = t)
}
