package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Det._
import graft.functions.TextFns._

/** Deduplication operators over the `documents` table. The common
  * scale shape: NEVER all-pairs — every near-dup operator generates
  * candidates through an equi-join on a blocking key (LSH band /
  * SimHash chunk / rare-prefix token), so shuffle volume grows with
  * corpus size × small constant, not n². The exact verification step
  * then touches candidate pairs only. Outputs are exact-verified
  * quantities (Jaccard / Hamming), so engine-internal hash choices
  * (xxhash64) never need an oracle twin.
  */
object Dedup {

  /** Exact dedup: md5 of the canonical (lowercased,
    * whitespace-normalized) text; one row per content group with the
    * minimal doc_id as canonical survivor. Single shuffle, map-side
    * partial agg.
    */
  def exact(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), md5(normalize(col("text"))).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_dups"))
      .orderBy(col("canonical_id"))

  // --- MinHash + LSH ------------------------------------------------

  val NumPerms = 128
  val Bands    = 32
  val RowsPerBand: Int = NumPerms / Bands

  /** MinHash signature (128 perms) of a distinct-shingle array: perm j
    * is the seeded hash family member `xxhash64(j, shingle)` (ANSI-safe
    * — no wrapping affine arithmetic). One array expression — per-row
    * evaluation, no shuffle, no UDF.
    */
  def minhashSignature(shingles: Column): Column =
    transform(sequence(lit(0), lit(NumPerms - 1)),
      j => array_min(transform(shingles, sh => xxhash64(j, sh))))

  /** LSH band keys: 32 bands × 4 signature rows hashed together. A
    * pair with Jaccard j collides in ≥1 band with probability
    * 1-(1-j^4)^32 — at the 0.8 threshold the miss probability is
    * ~5e-8, so candidates→exact-verify reproduces the exact answer.
    */
  def bandKeys(sig: Column): Column =
    transform(sequence(lit(0), lit(Bands - 1)),
      b => xxhash64(b, slice(sig, b * RowsPerBand + 1, lit(RowsPerBand))))

  /** Near-dup pairs with exact word-3-shingle Jaccard ≥ 0.8 found via
    * MinHash-LSH: shingle → sign → band-explode → equi-self-join on
    * (band, key) → distinct candidates → exact verify. Shuffle is
    * corpus × 32 band rows; the self-join is hash-partitioned on the
    * band key (only colliding docs meet).
    */
  def minhashLsh(s: SparkSession, dir: String, threshold: Double = 0.8): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), wordShingles(words(col("text"))).as("shingles"))
    val bands = docs
      .select(col("doc_id"), posexplode(bandKeys(minhashSignature(col("shingles")))))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("bkey"))
    val cands = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    verifyJaccard(cands, docs, "shingles", threshold)
  }

  /** Exact-Jaccard verification of candidate pairs against the
    * feature arrays; only candidates shuffle.
    */
  private def verifyJaccard(cands: DataFrame, feats: DataFrame,
      featCol: String, threshold: Double): DataFrame = {
    val fa = feats.select(col("doc_id").as("id_a"), col(featCol).as("fa"))
    val fb = feats.select(col("doc_id").as("id_b"), col(featCol).as("fb"))
    cands.join(fa, "id_a").join(fb, "id_b")
      .select(col("id_a"), col("id_b"), r6(jaccard(col("fa"), col("fb"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy(col("id_a"), col("id_b"))
  }

  // --- SimHash ------------------------------------------------------

  /** 64-bit SimHash over distinct word hashes: bit i is set when more
    * than half the feature hashes have bit i set. Unrolled into 64
    * column expressions (engine-internal; pairs are verified by exact
    * Hamming distance).
    */
  def simhash64(w: Column): Column = {
    val hashes = transform(array_distinct(w), x => xxhash64(x))
    val n      = size(hashes)
    (0 until 64).foldLeft(lit(0L)) { (acc, i) =>
      val ones = size(filter(hashes, h => shiftright(h, i).bitwiseAND(lit(1L)) === 1L))
      acc.bitwiseOR(shiftleft(when(ones * 2 > n, lit(1L)).otherwise(lit(0L)), i))
    }
  }

  /** SimHash near-dup pairs with Hamming distance ≤ 3. Blocking: the
    * 64-bit signature splits into 4 16-bit chunks; ≤3 differing bits
    * ⇒ at least one chunk identical (pigeonhole), so an equi-join on
    * (chunk index, chunk value) is lossless and never all-pairs.
    */
  def simhashPairs(s: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), simhash64(words(col("text"))).as("sim"))
    val chunks = docs.select(col("doc_id"), col("sim"),
        posexplode(array((0 until 4).map(c =>
          shiftrightunsigned(col("sim"), 16 * c).bitwiseAND(lit(0xFFFFL))): _*)))
      .select(col("doc_id"), col("sim"), col("pos").as("chunk"), col("col").as("ckey"))
    chunks.as("x").join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.ckey") === col("y.ckey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        bit_count(col("x.sim").bitwiseXOR(col("y.sim"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("id_a"), col("id_b"))
  }

  // --- character-n-gram Jaccard (PPJoin-style prefix filtering) -----

  /** Near-dup pairs with exact char-4-gram Jaccard ≥ 0.7 via
    * distributed prefix filtering: grams are globally ordered
    * rarest-first (document frequency, then gram); each doc exposes
    * only its first `g - ⌈t·g⌉ + 1` grams; any pair with J ≥ t must
    * share a prefix gram (PPJoin bound), so the candidate join is an
    * equi-join on rare tokens — small buckets, no hot keys.
    */
  def ngramJaccard(s: SparkSession, dir: String, threshold: Double = 0.7): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), charGrams(col("text")).as("grams"))
    val exploded = docs.select(col("doc_id"), explode(col("grams")).as("g"))
    val freq = exploded.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val sorted = exploded.join(freq, "g")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("g")))).as("sg"))
      .select(col("doc_id"), transform(col("sg"), x => x("g")).as("sorted_grams"))
    val prefix = sorted.select(col("doc_id"),
        explode(slice(col("sorted_grams"), lit(1),
          (size(col("sorted_grams")) - ceil(lit(threshold) * size(col("sorted_grams"))) + 1)
            .cast("int"))).as("g"))
    val cands = prefix.as("x").join(prefix.as("y"),
        col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    verifyJaccard(cands, docs, "grams", threshold)
  }

  // --- embedding cosine near-dup ------------------------------------

  /** Embedding near-dup pairs: cosine ≥ threshold with norms
    * precomputed per vector. Exact (correctness baseline) — the
    * blocked scale path is Ann.lshTopK's hyperplane buckets; at this
    * corpus size Catalyst picks a broadcast nested-loop join.
    */
  def embedNearDup(s: SparkSession, dir: String, threshold: Double = 0.4): DataFrame = {
    import graft.functions.VecFns._
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        r6(cosinePre(col("a.embedding"), col("b.embedding"), col("a.nrm"), col("b.nrm")))
          .as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy(col("id_a"), col("id_b"))
  }
}
