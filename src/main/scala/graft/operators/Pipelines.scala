package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFns._
import org.apache.spark.sql.graft.ArrayExprs

/** Composed end-to-end pipelines — the shapes a training-data curation
  * job chains the individual operators into.
  */
object Pipelines {

  /** p1: corpus curation = quality gate → near-dup removal.
    *
    * 1. quality gate: keep docs with ≥ 10 words and type-token ratio
    *    ≥ 0.3 (degenerate repetition filter);
    * 2. near-dup removal over the SURVIVING corpus: MinHash-LSH
    *    candidates (32×4) verified at word-3-shingle Jaccard ≥ 0.8;
    *    any doc with a lower-id near-duplicate partner is dropped, so
    *    each duplicate cluster keeps its lowest doc_id (exact dups are
    *    Jaccard 1.0 and fall out too).
    *
    * Everything is one lazy plan: the gate pushes to the scan, the
    * dedup is the banded equi-join pipeline, the removal is a
    * left-anti join.
    */
  def curate(s: SparkSession, dir: String, minWords: Int = 10,
      minTtr: Double = 0.3, threshold: Double = 0.8): DataFrame = {
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("text"), words(col("text")).as("w"))
      .select(col("doc_id"), col("lang"), col("text"),
        size(col("w")).as("n_words"),
        (size(array_distinct(col("w"))).cast("double") / size(col("w"))).as("ttr"))
      .filter(col("n_words") >= minWords && col("ttr") >= minTtr)
    val hashed = base
      .select(col("doc_id"), ArrayExprs.word_shingle_hashes(normalize(col("text")), 3).as("fh"))
    val dupIds = Dedup.pairsFromHashed(hashed, bands = 32, rows = 4, threshold)
      .select(col("id_b").as("doc_id")).distinct()
    base.join(dupIds, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("n_words"),
        graft.functions.Det.e6(col("ttr")).as("ttr_e6"))
      .orderBy(col("doc_id"))
  }

  /** p10: train/eval SPLIT with a cross-split leakage audit — the
    * eval-hygiene composition every benchmark-construction pipeline
    * runs (GPT-3's train-test overlap analysis, Brown et al. 2020
    * §4; the reason d7-style decontamination exists): a deterministic
    * md5-bucket split (p2's engine-portable rule — eval = bucket <
    * `evalPct`) followed by the question the split alone cannot
    * answer: which eval documents have a NEAR-DUPLICATE in train?
    * Those eval rows leak — metrics on them measure memorization.
    *
    * Output: one row per leaking cross-split pair (eval doc, its
    * train near-dup, exact Jaccard). Scale shape: the split is a
    * stateless per-row hash flag (no count pass, pushdown-friendly);
    * the pair set is d2's banded pipeline unchanged; the cross-split
    * filter is two 9-byte flag joins onto the pair frame. Oracle:
    * the same bucket rule + exact pair predicate in DuckDB.
    */
  def splitCheck(s: SparkSession, dir: String, evalPct: Int = 10): DataFrame = {
    val flags = Tables.documents(s, dir)
      .select(col("doc_id"),
        (pmod(conv(substring(md5(concat(lit("splt"), col("doc_id").cast("string"))), 1, 8),
          16, 10).cast("long"), lit(100)) < evalPct).as("is_eval"))
    val pairs = Dedup.minhashLsh(s, dir)
      .select(col("id_a"), col("id_b"), col("inter_sz"), col("union_sz"))
    pairs
      .join(flags.select(col("doc_id").as("id_a"), col("is_eval").as("ea")), "id_a")
      .join(flags.select(col("doc_id").as("id_b"), col("is_eval").as("eb")), "id_b")
      .filter(col("ea") =!= col("eb"))
      .select(
        when(col("ea"), col("id_a")).otherwise(col("id_b")).as("eval_doc"),
        when(col("ea"), col("id_b")).otherwise(col("id_a")).as("train_dup"),
        col("inter_sz"), col("union_sz"))
      .orderBy(col("eval_doc"), col("train_dup"))
  }

  /** p9: cluster-aware survivor selection — the policy step between
    * d8's duplicate CLUSTERS and the curated corpus: instead of p1's
    * "keep lowest id", keep each cluster's BEST member (RefinedWeb/
    * Dolma keep one representative per near-dup group; "longest
    * member" is the standard content-preserving choice — it keeps
    * the superset article over its excerpts). One row per cluster:
    * the keeper, its length, and how many members drop.
    *
    * The argmax is `max(struct(n_words, −doc_id))` — a map-side-
    * combinable aggregate (lexicographic struct max), NOT a window
    * over cluster partitions, so no cluster's membership ever sorts
    * through one task and ties break deterministically to the lowest
    * doc_id. The n_words attach joins the corpus-wide 16-byte
    * (doc_id, n_words) projection against the cluster-member frame
    * (only docs in some near-dup component — the small side at any
    * realistic dup rate; AQE picks the broadcast when it fits).
    * Oracle: d8's recursive-CTE closure + a window argmax.
    */
  def clusterSelect(s: SparkSession, dir: String): DataFrame = {
    val clusters = Dedup.dupClusters(s, dir)
    val nw = Tables.documents(s, dir)
      .select(col("doc_id"), size(words(col("text"))).cast("long").as("n_words"))
    clusters.join(nw, "doc_id")
      .groupBy(col("cluster_id"), col("cluster_size"))
      .agg(max(struct(col("n_words").as("w"), (-col("doc_id")).as("nid"))).as("best"))
      .select(col("cluster_id"), col("cluster_size"),
        (-col("best.nid")).as("keep_id"), col("best.w").as("keep_n_words"),
        (col("cluster_size") - 1L).as("n_dropped"))
      .orderBy(col("cluster_id"))
  }

  /** p8: the FULL web-corpus curation funnel — the CCNet/RefinedWeb/
    * Dolma stage chain composed end-to-end, with the per-stage audit
    * every production pipeline publishes (how many docs and tokens
    * each gate removed):
    *
    *   1. URL dedup (d10's canonicalization chain; keep each
    *      canonical URL's lowest doc_id — re-crawls dominate raw
    *      crawl duplicates, so this gate runs FIRST);
    *   2. exact content dedup among URL survivors (d1's
    *      md5-of-normalized-text key, lowest-id keeper);
    *   3. quality gate (p1's statics): ≥ `minWords` words and
    *      type-token ratio ≥ 0.3 — compared as the integer
    *      cross-multiplication `distinct·10 ≥ words·3`, bit-exact in
    *      any engine;
    *   4. repetition gate (t9's Gopher signals, Rae et al. 2021
    *      Table A1): drop when the most frequent word 2-gram covers
    *      > 1/5 of characters (`top2_num·5 > n_chars`) or duplicated
    *      5-grams cover > 3/10 (`dup5_num·10 > n_chars·3`) — integer
    *      numerators, no float thresholds.
    *
    * Output: one row per stage (0 = raw corpus) with cumulative
    * surviving docs, token volume, and per-stage drops — the funnel
    * table a curation run reports.
    *
    * Scale shape: ONE pass computes every per-doc column (URL key,
    * content hash, quality statics, repetition numerators — all
    * stateless projections sharing the scan); the two dedup gates are
    * the only shuffles, each on a SKINNY key (canonical URL string /
    * 32-char hash) with the doc's 8-byte id — text never crosses an
    * exchange; keeper sets join back by key. The funnel itself is one
    * conditional aggregate folded to a single row and exploded to 5 —
    * no per-stage rescan of the corpus.
    */
  def webPipeline(s: SparkSession, dir: String, minWords: Int = 10): DataFrame = {
    val base = Tables.documents(s, dir)
      .select(col("doc_id"),
        Curation.canonicalUrl(Curation.syntheticUrl).as("curl"),
        normalize(col("text")).as("nrm"))
      .select(col("doc_id"), col("curl"), md5(col("nrm")).as("chash"),
        col("nrm"), split(col("nrm"), " ").as("w"))
      .select(col("doc_id"), col("curl"), col("chash"),
        size(col("w")).cast("long").as("n_words"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct"),
        (length(col("nrm")) - (size(col("w")) - 1)).cast("long").as("n_chars"),
        TextAnalysis.gramRepNums(col("w"), 2).getField("top_num").as("top2_num"),
        TextAnalysis.gramRepNums(col("w"), 5).getField("dup_num").as("dup5_num"))
    val urlKeep = base.groupBy(col("curl"))
      .agg(min(col("doc_id")).as("ukeeper"))
    val f1 = base.join(urlKeep, Seq("curl"))
      .withColumn("k1", col("doc_id") === col("ukeeper"))
    val exKeep = f1.filter(col("k1")).groupBy(col("chash"))
      .agg(min(col("doc_id")).as("ekeeper"))
    val flags = f1.join(exKeep, Seq("chash"), "left")
      .withColumn("k2", col("k1") && col("doc_id") === col("ekeeper"))
      .withColumn("k3", col("k2") && col("n_words") >= minWords &&
        col("n_distinct") * 10 >= col("n_words") * 3)
      .withColumn("k4", col("k3") && col("top2_num") * 5 <= col("n_chars") &&
        col("dup5_num") * 10 <= col("n_chars") * 3)
    def stage(k: Column) = struct(
      sum(when(k, 1L).otherwise(0L)).as("n_docs"),
      coalesce(sum(when(k, col("n_words"))), lit(0L)).as("n_words"))
    val one = flags.agg(
      stage(lit(true)).as("s0"), stage(col("k1")).as("s1"),
      stage(col("k2")).as("s2"), stage(col("k3")).as("s3"),
      stage(col("k4")).as("s4"))
    val names = Seq("raw", "url_dedup", "exact_dedup", "quality_gate", "repetition_gate")
    one.select(explode(array((0 to 4).map(i => struct(
        lit(i).as("stage_idx"), lit(names(i)).as("stage"),
        col(s"s$i.n_docs").as("n_docs"), col(s"s$i.n_words").as("n_words"),
        (col(s"s${math.max(i - 1, 0)}.n_docs") - col(s"s$i.n_docs"))
          .as("n_dropped"))): _*)).as("r"))
      .select(col("r.*"))
      .orderBy(col("stage_idx"))
  }
}
