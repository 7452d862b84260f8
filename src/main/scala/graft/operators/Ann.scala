package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Det._
import graft.functions.VecFns._

/** Approximate-nearest-neighbor search over the `embeddings` table.
  * Brute-force cosine is the exact correctness baseline (query side
  * broadcast: k queries ≪ corpus, so the corpus never shuffles);
  * random-hyperplane LSH is the scale path — bucketed equi-join, with
  * multi-probe on the query side to recover recall.
  */
object Ann {

  val K = 10

  /** Rank candidate (q_id, vec_id, cos_raw) rows to per-query top-k
    * via the bounded-heap TypedImperativeAggregate (TopKCosine): map
    * tasks each keep k candidates per query and partials merge, so at
    * most k rows per group per task shuffle — no per-partition sort of
    * the full candidate set (what `row_number().over(Window)` would
    * do). Output order/ties identical to the window form: (cosine
    * desc, vec_id asc).
    */
  private def rankTopK(cands: DataFrame, k: Int): DataFrame =
    cands.groupBy(col("q_id"))
      .agg(org.apache.spark.sql.graft.TopKCosine
        .top_k(col("cos_raw"), col("vec_id"), k).as("tk"))
      .select(col("q_id"), posexplode(col("tk")))
      .select(col("q_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("neighbor_id"), r6(col("col.score")).as("cosine"))
      .orderBy(col("q_id"), col("rank"))

  /** Exact top-k cosine neighbors for the query vectors
    * (vec_id < 20). The query set broadcasts; the corpus streams
    * through one pass; ranking is the partial top-k aggregate.
    */
  def bruteForceTopK(s: SparkSession, dir: String, k: Int = K): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .repartition(s.sparkContext.defaultParallelism) // local corpus is one split
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    rankTopK(
      broadcast(q).join(e, col("q_id") =!= col("vec_id"))
        .select(col("q_id"), col("vec_id"),
          cosinePre(col("q_emb"), col("embedding"), col("q_nrm"), col("nrm")).as("cos_raw")),
      k)
  }

  // --- random-hyperplane LSH ---------------------------------------

  val Dim = 64
  val Bits = 6

  /** Fixed seeded hyperplanes (engine-internal). */
  private val rng = new scala.util.Random(7)
  private val planes: Array[Array[Double]] =
    Array.fill(Bits)(Array.fill(Dim)(rng.nextGaussian()))

  /** Hyperplane signature: bit i = sign(v · h_i). */
  def hyperplaneSig(v: Column): Column =
    (0 until Bits).foldLeft(lit(0)) { (acc, i) =>
      val d = aggregate(
        zip_with(v, typedLit(planes(i).toSeq), (x, p) => x.cast("double") * p),
        lit(0.0), (a, x) => a + x)
      acc.bitwiseOR(shiftleft(when(d > 0, lit(1)).otherwise(lit(0)), i))
    }

  /** All probe masks with Hamming weight ≤ 2 — multi-probe LSH visits
    * the query's own bucket plus every 1- and 2-bit-flip neighbor.
    */
  private val probeMasks: Seq[Int] =
    0 +: (0 until Bits).map(1 << _) ++:
      (for { i <- 0 until Bits; j <- i + 1 until Bits } yield (1 << i) | (1 << j))

  // --- IVF (inverted-file index with k-means coarse quantizer) ------

  /** Lloyd's k-means over the embedding corpus. The per-iteration
    * loop is driver-side but each step is fully distributed: assign =
    * one scan with k codegen'd dot products per row; update =
    * posexplode → groupBy(cluster, dim) avg. Only the k×dim centroid
    * matrix is collected (tiny), the corpus never moves to the driver.
    * Deterministic init: the k lowest vec_ids.
    */
  def kmeansCentroids(e: DataFrame, k: Int = 16, iters: Int = 5): Array[Array[Float]] = {
    import e.sparkSession.implicits._
    var cents: Array[Array[Float]] = e.orderBy("vec_id").limit(k)
      .select("embedding").as[Seq[Float]].collect().map(_.toArray)
    for (_ <- 0 until iters) {
      val assigned = e.select(col("embedding"),
        assignCluster(col("embedding"), cents).as("cluster"))
      val upd = assigned
        .select(col("cluster"), posexplode(col("embedding")))
        .groupBy(col("cluster"), col("pos"))
        .agg(avg(col("col")).as("v"))
        .collect()
      val next = cents.map(_.clone())
      upd.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2).toFloat)
      cents = next
    }
    cents
  }

  /** Nearest-centroid id: argmax of (v·c − |c|²/2), k codegen'd dot
    * products per row. NOTE: an argmax built by folding
    * `when(s > best, ...)` pairs duplicates the score sub-expressions
    * exponentially (2^k expression copies — OOMs the planner at k=16);
    * the sort-of-structs form keeps each score expression single.
    */
  private def assignCluster(v: Column, cents: Array[Array[Float]]): Column =
    element_at(topClusters(v, cents, 1), 1)

  /** IVF ANN: k-means partitions the corpus into inverted lists;
    * queries probe the `nprobe` nearest lists and rank candidates by
    * exact cosine. At 100 TB the lists are the partitioning key — a
    * query touches nprobe/k of the data. Approximate; recall vs the
    * brute baseline asserted in AnnSpec.
    */
  def ivfTopK(s: SparkSession, dir: String, k: Int = K, nlist: Int = 16,
      nprobe: Int = 4): DataFrame = {
    val e = graft.Caches.track(Tables.embeddings(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm")))
    val cents = kmeansCentroids(e, nlist)
    val corpus = e.select(col("vec_id"), col("embedding"), col("nrm"),
      assignCluster(col("embedding"), cents).as("bucket"))
    // query probes: nprobe best centroids via the same score, exploded
    val probes = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"),
        explode(topClusters(col("embedding"), cents, nprobe)).as("bucket"))
    rankTopK(
      broadcast(probes).join(corpus, Seq("bucket"))
        .filter(col("q_id") =!= col("vec_id"))
        .select(col("q_id"), col("vec_id"),
          cosinePre(col("q_emb"), col("embedding"), col("q_nrm"), col("nrm")).as("cos_raw")),
      k)
  }

  /** The nprobe best centroid ids for a vector, as an array column:
    * scores sorted descending via sort on (-score, id) structs.
    */
  private def topClusters(v: Column, cents: Array[Array[Float]], nprobe: Int): Column = {
    val scored = cents.zipWithIndex.map { case (c, i) =>
      val half = c.map(x => x.toDouble * x.toDouble).sum / 2
      struct((lit(half) - graft.functions.VecFns.dot(v, typedLit(c.toSeq))).as("negscore"),
        lit(i).as("id"))
    }
    slice(transform(sort_array(array(scored: _*)), x => x("id")), 1, nprobe)
  }

  /** LSH ANN: corpus hashed once into buckets; queries probe their own
    * bucket plus all ≤2-bit-flip neighbors (multi-probe). Candidate
    * generation is an equi-join on the bucket id; exact cosine ranks
    * the candidates. Approximate — recall vs the brute baseline is
    * asserted in AnnSpec.
    */
  def lshTopK(s: SparkSession, dir: String, k: Int = K): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .repartition(s.sparkContext.defaultParallelism) // local corpus is one split
      .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"),
        hyperplaneSig(col("embedding")).as("sig"))
    val corpus = e.select(col("vec_id"), col("embedding"), col("nrm"), col("sig").as("bucket"))
    val probes = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"),
        explode(array(probeMasks.map(m => col("sig").bitwiseXOR(lit(m))): _*)).as("bucket"))
    rankTopK(
      broadcast(probes).join(corpus, Seq("bucket"))
        .filter(col("q_id") =!= col("vec_id"))
        .select(col("q_id"), col("vec_id"),
          cosinePre(col("q_emb"), col("embedding"), col("q_nrm"), col("nrm")).as("cos_raw"))
        .distinct(),
      k)
  }
}
