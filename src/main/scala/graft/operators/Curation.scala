package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFns._

/** Training-data curation operators beyond near-dup detection: the
  * exact-substring, decontamination and sampling stages a corpus
  * pipeline runs between crawl and tokenizer.
  */
object Curation {

  /** d6: cross-document repeated spans — every `width`-char window of
    * normalized text occurring in ≥ 2 documents (the exact-substring
    * signal behind boilerplate removal and train-set overlap audits;
    * the fixed-window form of the suffix-array method of Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better").
    *
    * Shape: window-explode → HASH-group prefilter → exact string
    * verify. The first aggregation shuffles only (hash, doc) pairs —
    * 8-byte keys, not 50-char strings; only windows whose hash
    * collides across rows (≈ the true repeats + vanishing xxhash64
    * collisions) re-shuffle as strings for the exact group-by, which
    * also removes any hash-collision false positives — the d2/d4
    * candidates→verify shape applied to substrings. Per-doc window
    * dedup (array_distinct) bounds a document's contribution to any
    * span at one.
    */
  def repeatedSpans(s: SparkSession, dir: String, width: Int = 50): DataFrame = {
    import org.apache.spark.sql.graft.ArrayExprs
    // pass 1 — hash-only: POSITIONAL xxhash64 of every width-char
    // window via the in-place GramHashesPos kernel (no window strings
    // exist at all; hs(i) addresses the window AT offset i, which is
    // what lets pass 2 filter offsets instead of strings); per-doc
    // distinct bounds a doc's contribution to any span at one, and a
    // hash seen in ≥2 docs is "hot"
    val h = graft.Caches.track(
      Tables.documents(s, dir)
        .select(col("doc_id"), normalize(col("text")).as("nrm"))
        .filter(length(col("nrm")) >= width)
        .select(col("doc_id"), col("nrm"),
          ArrayExprs.char_gram_hashes_pos(col("nrm"), width).as("hs")))
    val hot = h.select(explode(array_distinct(col("hs"))).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .select(col("g"))
    // pass 2 — verify on a 128-BIT HASH PAIR, strings materialized
    // ONCE PER GROUP (r10 VERDICT #2; the previous form substr'd and
    // shuffled EVERY surviving occurrence's 50-char string into the
    // exact group-by — on the pathologically repetitive 100× proxy,
    // 44M string allocations + a multi-GB string shuffle dominated
    // the query). Each doc re-attaches its hot-hash set (8-byte
    // longs, shuffle stays skinny) and keeps only window OFFSETS
    // whose in-place xxhash64 is a member — sound because a span in
    // ≥2 docs necessarily has a hot hash, so the filter can never
    // drop a true repeat. Surviving offsets emit (h1, h2, doc, off)
    // — h2 is the SECOND independent positional hash (seed 1337), so
    // grouping on (h1, h2) is span identity up to a 128-bit
    // collision, P ≈ windows²/2^129 — the same bound the d2 family
    // keys and featureHashes64 verify representation already accept.
    // Both groupBys are map-side combinable (a doc's occurrences sit
    // in one task), so the shuffle carries ~per-doc-distinct 24-byte
    // rows, never strings; each group's span string is built by ONE
    // substr from its representative (min (doc, off)) occurrence.
    // hotg is SORTED so the per-window membership test is a binary
    // search (r15 VERDICT #2: `array_contains` was a linear scan per
    // window over the heap-resident set — O(windows × |hotg|) per doc
    // on repetitive corpora, the source of d6's 3× in-run variance —
    // and the HOF lambda re-evaluated the full seeded hash array per
    // element). The fused HotSpanOccs kernel does one pass: binary
    // search each positional hash, and compute h2 IN PLACE only for
    // the surviving offsets, bounding per-doc cost at
    // O(windows · log |hotg| + survivors · width).
    val hotPerDoc = h.select(col("doc_id"), explode(array_distinct(col("hs"))).as("g"))
      .join(hot, "g")
      .groupBy(col("doc_id")).agg(sort_array(collect_set(col("g"))).as("hotg"))
    val occ = h.join(hotPerDoc, "doc_id")
      .select(col("doc_id"), explode(
        ArrayExprs.hot_span_occs(col("nrm"), col("hs"), col("hotg"),
          width, 1337L)).as("w"))
      .select(col("doc_id"), col("w.h1").as("h1"), col("w.h2").as("h2"),
        col("w.off").as("off"))
    // per-doc distinct (bounds a doc's contribution to any span at
    // one, as array_distinct did for strings), keeping the first
    // offset as the doc's occurrence
    val perDoc = occ.groupBy(col("doc_id"), col("h1"), col("h2"))
      .agg(min(col("off")).as("off"))
    val groups = perDoc.groupBy(col("h1"), col("h2"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"),
        min(struct(col("doc_id"), col("off"))).as("rep"))
      .filter(col("n_docs") >= 2) // removes single-seed-collision candidates
    // one substr per GROUP: the representative is min (doc, off), so
    // rep.doc_id == min_doc and the attach is a skinny equi-join
    groups.join(h.select(col("doc_id").as("rep_doc"), col("nrm")),
        col("rep.doc_id") === col("rep_doc"))
      .select(col("nrm").substr(col("rep.off"), lit(width)).as("span"),
        col("n_docs"), col("min_doc"), col("max_doc"))
      .orderBy(col("span"))
  }

  /** d7: benchmark decontamination — per training document, the number
    * of distinct word-3-shingles it shares with the benchmark POOL
    * (docs with doc_id % 97 == 0 stand in for an eval set), and a flag
    * at ≥ `flagAt` shared shingles. The pool's distinct shingles are
    * an sf-proportional set: NO broadcast hint — the join shuffles on
    * the shingle string (AQE broadcasts while the pool is small). The
    * train side explodes per-doc DISTINCT shingles, so n_shared counts
    * each contaminated shingle once.
    */
  def decontaminate(s: SparkSession, dir: String, flagAt: Int = 5): DataFrame = {
    import org.apache.spark.sql.graft.ArrayExprs
    // per-doc DISTINCT shingle hashes via the in-place kernel (the
    // shingle strings never exist as columns); matching on the 64-bit
    // hashes equals matching on the strings up to xxhash64 collisions
    // (P ≈ 1e-11 corpus-wide — the same working representation d2's
    // verify step uses), and the count is oracle-validated against the
    // string-based DuckDB twin
    val sh = graft.Caches.track(Tables.documents(s, dir)
      .select(col("doc_id"),
        ArrayExprs.word_shingle_hashes(normalize(col("text")), 3).as("sh")))
    val pool = sh.filter(pmod(col("doc_id"), lit(97)) === 0)
      .select(explode(col("sh")).as("g")).distinct()
    val train = sh.filter(pmod(col("doc_id"), lit(97)) =!= 0)
      .select(col("doc_id"), explode(col("sh")).as("g"))
    train.join(pool, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .withColumn("flagged", col("n_shared") >= flagAt)
      .orderBy(col("doc_id"))
  }

  /** p2: deterministic stratified sampling — the data-mixing stage.
    * Each doc hashes into a bucket 0..99 via the engine-portable
    * md5-hex fold (the t4 pattern, identical in DuckDB), and survives
    * when its bucket is under its language's quota. Hash-based
    * sampling is reproducible across runs/engines and needs no state,
    * shuffle, or count-first pass — at 100 TB it's a pushdown-friendly
    * per-row filter.
    */
  val SampleRates: Map[String, Int] =
    Map("de" -> 20, "en" -> 50, "es" -> 30, "fr" -> 10, "zh" -> 40)

  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(
      conv(substring(md5(concat(lit("smpl"), col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("long"), lit(100))
    val rate = SampleRates.foldLeft(lit(40)) { case (acc, (l, r)) =>
      when(col("lang") === l, lit(r)).otherwise(acc)
    }
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), bucket.as("bucket"))
      .filter(col("bucket") < rate)
      .orderBy(col("doc_id"))
  }

  /** p3: sequence-packing manifest — the stage that concatenates
    * documents (deterministic doc_id order per language) into
    * fixed-token-budget training sequences and records where each doc
    * lands: `seq_id` = the sequence the doc STARTS in, `seq_offset` =
    * its token offset within that sequence.
    *
    * Packing is a prefix sum, and a naive per-language running window
    * is ONE REDUCER per language — at 100 TB each language's whole
    * corpus funnels through a single task. This implementation is the
    * sharded two-pass form instead: docs split into contiguous
    * doc_id ranges (`shardWidth` docs per shard); pass 1 computes
    * shard-LOCAL prefix sums in bounded window partitions
    * (lang, shard); pass 2 prefixes the tiny per-shard token totals
    * per language and joins the offsets back. Result is identical to
    * the naive window for every shard width (asserted in
    * CurationSpec) while no window partition ever exceeds shardWidth
    * rows.
    */
  def packManifest(s: SparkSession, dir: String, budget: Int = 2048,
      shardWidth: Long = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"),
        tokenCount(col("text")).cast("long").as("n_tokens"),
        expr(s"doc_id div $shardWidth").as("shard"))
    // pass 1: shard-local running sums — window partitions hold at
    // most shardWidth rows
    val wLocal = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = toks.withColumn("local_start",
      sum(col("n_tokens")).over(wLocal) - col("n_tokens"))
    // pass 2: per-shard totals (corpus/shardWidth rows) → per-language
    // exclusive prefix = each shard's global token offset
    val wShard = Window.partitionBy(col("lang")).orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = toks.groupBy(col("lang"), col("shard"))
      .agg(sum(col("n_tokens")).as("shard_tokens"))
      .withColumn("offset", coalesce(sum(col("shard_tokens")).over(wShard), lit(0L)))
      .select(col("lang"), col("shard"), col("offset"))
    local.join(offsets, Seq("lang", "shard"))
      .withColumn("start", col("offset") + col("local_start"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        expr(s"start div $budget").as("seq_id"),
        pmod(col("start"), lit(budget.toLong)).as("seq_offset"))
      .orderBy(col("doc_id"))
  }

  /** p4: systematic probability-proportional-to-size sampling — the
    * curation stage that draws ~`k` documents with inclusion
    * probability ∝ token weight (longer docs proportionally likelier,
    * the standard PPS design for "sample by content volume, not doc
    * count"). Each doc owns the half-open weight interval
    * `(cum − w, cum]` on the cumulative-weight line; a doc is drawn
    * iff its interval contains a multiple of the stride
    * `S = max(W/k, 1)` — classic systematic PPS (Madow 1949), which
    * needs ONE pass, no rejection, and gives exactly-proportional
    * coverage (`n_hits` = multiples covered, ≥ 2 for docs heavier
    * than S). Everything is INTEGER arithmetic (`div`, no floats), so
    * the draw is reproducible across engines and the DuckDB oracle is
    * bit-exact — the same cross-engine-determinism discipline as p2's
    * md5 buckets. The cumulative sum reuses p3's sharded two-pass
    * prefix (shard-local windows of ≤ `shardWidth` rows + a skinny
    * per-shard offset join): no global single-reducer window at any
    * scale, identical to the naive window for every shardWidth
    * (CurationSpec). The total weight rides a broadcast 1-row
    * aggregate (t6's N pattern) — no driver-side job at construction.
    */
  def ppsSample(s: SparkSession, dir: String, k: Int = 500,
      shardWidth: Long = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), size(words(col("text"))).cast("long").as("w"),
        expr(s"doc_id div $shardWidth").as("shard"))
    val wLocal = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = docs.withColumn("cum_local", sum(col("w")).over(wLocal))
    val wShard = Window.orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // per-shard totals: corpus/shardWidth rows — the only global
    // window runs over that skinny frame, never the corpus
    val offsets = docs.groupBy(col("shard"))
      .agg(sum(col("w")).as("shard_w"))
      .withColumn("offset", coalesce(sum(col("shard_w")).over(wShard), lit(0L)))
      .select(col("shard"), col("offset"))
    val total = docs.agg(sum(col("w")).as("tot"))
    local.join(offsets, Seq("shard"))
      .withColumn("cum", col("offset") + col("cum_local"))
      .crossJoin(broadcast(total))
      .withColumn("stride", greatest(expr(s"tot div $k"), lit(1L)))
      .withColumn("n_hits",
        expr("cum div stride") - expr("(cum - w) div stride"))
      .filter(col("n_hits") > 0)
      .select(col("doc_id"), col("w"), col("cum"), col("n_hits"))
      .orderBy(col("doc_id"))
  }

  /** Temperature-based source mixing (α = 0.5) — the published
    * recipe for re-balancing a multi-source corpus (multilingual
    * pretraining: Devlin et al. 2019 mBERT exponentiated smoothing,
    * Conneau & Lample 2019 XLM): draw from source s with probability
    * ∝ n_s^α, upweighting low-resource sources relative to their raw
    * share. α is FIXED at 1/2 because that is the exactness-preserving
    * exponent: n^0.5 is `sqrt`, the one power IEEE 754 requires
    * correctly rounded (a libm `pow`/`ln` is not), so
    * `floor(sqrt(n_s))` is bit-identical in any engine and the whole
    * draw stays integer — per-source weight w_s = isqrt(n_s), target
    * share k·w_s/W (W = Σw_s), acceptance threshold
    * t_s = min(B, (B·k·w_s) div W div n_s) out of bucket space B
    * (nested `div` ≡ dividing by the product, dodging the 64-bit
    * overflow W·n_s would risk at corpus scale), and a doc is drawn
    * iff its p2-style md5 bucket < t_s. Shape: a tiny per-source
    * aggregate, a broadcast threshold map, then ONE stateless
    * per-row filter — no shuffle of the corpus, 100-TB-trivial.
    *
    * `docs` must carry (doc_id, mix_src); the driver query plants a
    * deterministic skewed tier key from doc_id arithmetic (§3
    * discipline — the synthetic corpus ships uniform sources, which
    * would make every rate equal).
    */
  def temperatureMix(docs: DataFrame, k: Long = 300, B: Long = 100000L): DataFrame = {
    val counts = docs.groupBy(col("mix_src")).agg(count(lit(1)).as("n_s"))
      .withColumn("w_s", floor(sqrt(col("n_s").cast("double"))).cast("long"))
    val tot = counts.agg(sum(col("w_s")).as("w_tot"))
    val th = counts.crossJoin(broadcast(tot))
      .withColumn("t_s",
        least(expr(s"(($B * $k * w_s) div w_tot) div n_s"), lit(B)))
      .select(col("mix_src"), col("t_s"))
    val bucket = pmod(
      conv(substring(md5(concat(lit("tmix"), col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("long"), lit(B))
    docs.withColumn("bucket", bucket)
      .join(broadcast(th), "mix_src")
      .filter(col("bucket") < col("t_s"))
      .select(col("doc_id"), col("mix_src"), col("bucket"))
      .orderBy(col("doc_id"))
  }

  /** The planted-skew mix key for the p5 driver query: five
    * geometric tiers over doc_id % 64 (32/16/8/4/4 per 64 — an 8:1
    * spread, present at EVERY sf since doc_ids are dense from 0),
    * pure integer compares so any engine derives the identical key.
    */
  def skewTier: Column = {
    val b = pmod(col("doc_id"), lit(64L))
    when(b < 32, 0).when(b < 48, 1).when(b < 56, 2)
      .when(b < 60, 3).otherwise(4)
  }

  /** p5: temperature mixing over the planted skew tiers. */
  def temperatureMixQuery(s: SparkSession, dir: String): DataFrame =
    temperatureMix(Tables.documents(s, dir)
      .select(col("doc_id"), skewTier.as("mix_src")))

  /** p6: EXACTLY-k-per-group deterministic sample — the other half of
    * the stratified-sampling story (p2 draws at a RATE; eval sets and
    * per-language dev splits need an exact count). Each doc gets the
    * p2-style md5 draw; the k smallest draws per language win. The
    * ranking runs on the bounded-heap TopKCosine aggregate (t5's
    * no-window-funnel pattern): map-side partials keep ≤ k rows per
    * group per task and partials merge associatively, so no window
    * ever sorts a language's full corpus through one reducer — at
    * 100 TB a `row_number().over(partitionBy(lang))` is a
    * single-task funnel per language; this is the same output with
    * ≤ k·tasks shuffled rows per group. Ties on the 32-bit draw
    * break by doc_id asc in BOTH engines (the heap's (score desc,
    * id asc) order ≡ the oracle's ORDER BY bucket, doc_id), and the
    * draw is recomputed from doc_id after the explode — cheaper than
    * carrying it through the heap.
    */
  def fixedSample(s: SparkSession, dir: String, k: Int = 50): DataFrame = {
    val bucket = conv(substring(md5(concat(lit("fix"), col("doc_id").cast("string"))), 1, 8),
      16, 10).cast("long")
    Tables.documents(s, dir)
      .select(col("lang"), col("doc_id"), bucket.as("bucket"))
      .groupBy(col("lang"))
      .agg(org.apache.spark.sql.graft.TopKCosine
        .top_k(-col("bucket").cast("double"), col("doc_id"), k).as("tk"))
      .select(col("lang"), posexplode(col("tk")))
      .select(col("lang"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("doc_id"))
      .withColumn("bucket",
        conv(substring(md5(concat(lit("fix"), col("doc_id").cast("string"))), 1, 8),
          16, 10).cast("long"))
      .orderBy(col("lang"), col("rank"))
  }

  /** d10: URL canonicalization + exact URL dedup — the first dedup
    * stage of every web-corpus pipeline (CCNet, RefinedWeb, Dolma
    * dedupe documents by canonical URL before any content pass,
    * because re-crawls of one page dominate raw crawl duplicates).
    * Canonicalization: lowercase scheme+host, strip a `www.` host
    * prefix and the scheme's default port, strip trailing path
    * slashes, drop tracking parameters (`utm_*`, `ref`), lowercase
    * remaining parameter KEYS and sort parameters byte-wise. All pure
    * column expressions in one projection — a stateless per-row map,
    * pushdown-friendly, zero shuffles before the final group-by
    * (which at 100 TB shuffles one skinny (url, id) pair per doc).
    *
    * The documents table ships no URL column, so raw URLs derive
    * deterministically from doc_id (§3 discipline): mixed-case
    * host/scheme, default port, tracking params whose VALUES vary
    * per doc within a canonical group (doc_id-driven) while the
    * canonical identity is (doc_id % 97)-driven — so raw strings
    * differ inside a group and the oracle proves the whole
    * normalization chain byte-exactly.
    */
  def urlDedup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), syntheticUrl.as("url"))
      .select(col("doc_id"), canonicalUrl(col("url")).as("canonical_url"))
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"),
        sum(col("doc_id")).as("id_sum"))
      .orderBy(col("canonical_url"))

  /** The deterministic raw URL the documents table would carry if the
    * synthetic corpus shipped one (§3 discipline; see urlDedup's
    * Scaladoc for why the tracking-param VALUES vary per doc while
    * the canonical identity is (doc_id % 97)-driven).
    */
  private[operators] def syntheticUrl: Column = {
    val h = pmod(col("doc_id"), lit(97))
    concat(
      lit("HTTPS://WWW.Site"), pmod(h, lit(37)),
      lit(".Example.COM:443/News/"), pmod(h, lit(11)),
      lit("/Item"), pmod(h, lit(101)), lit("/?id="), pmod(h, lit(13)),
      lit("&utm_source=s"), pmod(col("doc_id"), lit(5)),
      lit("&Lang="), pmod(h, lit(3)),
      lit("&ref=tw"), lit("&utm_campaign=c"), pmod(col("doc_id"), lit(7)))
  }

  /** Canonical host: lowercased, `www.` prefix and default port
    * stripped — the registrable-domain key a corpus mix report
    * groups by.
    */
  private[operators] def urlHost(url: Column): Column =
    regexp_replace(regexp_replace(
      lower(regexp_extract(url, "^[A-Za-z]+://([^/?]+)", 1)),
      "^www\\.", ""), ":443$", "")

  /** Full canonicalization chain (see urlDedup Scaladoc): lowercase
    * scheme+host, strip www./default port/trailing slashes, drop
    * tracking params, lowercase+sort surviving params.
    */
  private[operators] def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    val path = regexp_replace(
      regexp_extract(url, "^[A-Za-z]+://[^/?]+([^?]*)", 1), "/+$", "")
    val query = regexp_extract(url, "\\?(.*)$", 1)
    val params = sort_array(transform(
      filter(split(query, "&"), p =>
        p =!= "" && !p.startsWith("utm_") && !p.rlike("^[Rr]ef=")),
      p => concat(lower(substring_index(p, "=", 1)), lit("="),
        substring_index(p, "=", -1))))
    concat(scheme, lit("://"), urlHost(url), path,
      when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
        .otherwise(lit("")))
  }

  /** p7: DSIR data selection — hashed-n-gram importance resampling
    * (Xie et al., "Data Selection for Language Models via Importance
    * Resampling", NeurIPS 2023): raw documents are scored by how much
    * their token distribution resembles a curated TARGET corpus, via
    * bucket-level target/raw frequency ratios over hashed unigrams,
    * and the top-weighted docs are selected. The target here is the
    * `lang = 'en'` slice (standing in for DSIR's Wikipedia+books
    * target); features are words hashed into `buckets` by the p2
    * md5-hex fold, and the per-bucket score is the integer ratio
    * `(tgt+1)·10⁶ div (raw+1)` — add-one smoothing, and integer
    * arithmetic end-to-end so a doc's importance (Σ cnt·score over
    * its buckets) is bit-reproducible in any engine. (DSIR proper
    * draws with Gumbel noise; the deterministic top-k is the
    * reproducible variant — a Gumbel draw is one extra hashed column
    * if sampling is wanted.)
    *
    * Scale shape: two token-level aggregations with map-side partial
    * aggregation — (doc, bucket) term counts, then bucket totals
    * whose reducer state is bounded by `buckets` regardless of corpus
    * size; the `buckets`-row score table joins back as an explicit
    * BROADCAST; selection is `orderBy.limit(k)` which Spark executes
    * as TakeOrderedAndProject (per-partition bounded heap + driver
    * merge of k·partitions rows — no global sort shuffle at any
    * scale).
    */
  def dsirSelect(s: SparkSession, dir: String, buckets: Int = 8192,
      k: Int = 300): DataFrame = {
    val bucket = pmod(
      conv(substring(md5(concat(lit("dsir"), col("w"))), 1, 8), 16, 10)
        .cast("long"), lit(buckets.toLong))
    def pairs = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), explode(words(col("text"))).as("w"))
      .select(col("doc_id"), col("lang"), bucket.as("bucket"))
      .groupBy(col("doc_id"), col("lang"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val scores = pairs
      .groupBy(col("bucket"))
      .agg(sum(col("cnt")).as("raw_cnt"),
        coalesce(sum(when(col("lang") === "en", col("cnt"))), lit(0L)).as("tgt_cnt"))
      .select(col("bucket"),
        expr("(tgt_cnt + 1) * 1000000 div (raw_cnt + 1)").as("score"))
    pairs.join(broadcast(scores), "bucket")
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("cnt")).as("n_words"),
        sum(col("cnt") * col("score")).as("importance"))
      .orderBy(col("importance").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("lang"), col("n_words"), col("importance"))
      .orderBy(col("importance").desc, col("doc_id"))
  }

  /** p11: epoch-capped token-budget allocation across sources — the
    * WATER-FILLING step of a training-data recipe (the Llama/Dolma
    * "mix sources by weight, but never repeat a source more than E
    * epochs" rule): given a token budget `budgetNum`× the corpus, a
    * per-source quality weight, and an epoch cap E, allocate
    * `min(E·c_s, λ·w_s)` tokens per source with λ chosen so the
    * allocations sum to the budget — the leftover from capped
    * sources redistributes to uncapped ones proportionally.
    *
    * Exact closed form, no iteration: sources sort by cap-to-weight
    * ratio `E·c_s/w_s` ascending (the order caps engage as λ rises;
    * the ratio is the ONE float — an IEEE divide both engines round
    * identically — and ties break by source). A source is capped iff
    * every prefix predecessor satisfies the cross-multiplied test
    * `E·c_j·(W − cumW) ≤ (B − cumE)·w_j` (λ after capping the prefix
    * still exceeds its ratio); the prefix-AND window makes the test
    * exact for the boundary row and the monotone order makes it
    * exact everywhere (CurationSpec cross-checks an iterative
    * redistribute-until-fixpoint reference on randomized corpora).
    * Integer arithmetic end-to-end otherwise; uncapped allocation is
    * `R·w_s div W_u` floor division.
    *
    * Scale shape: the corpus scan collapses to one skinny per-source
    * aggregate (map-side combinable); everything after runs on a
    * sources-sized frame (tens of rows at any corpus size — the
    * global windows are over that frame, never the corpus).
    */
  def epochMix(docs: DataFrame, epochCap: Long = 3L,
      budgetNum: Long = 2L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Weight parse is UNBOUNDED substring (oracle parity for arbitrarily
    // long suffixes) and fails LOUDLY on a source name not of the form
    // 'srcN' — a silent NULL here would null w_tot and every allocation
    // downstream while the DuckDB oracle's ::BIGINT cast errors.
    val parsedW = expr("cast(substring(source, 4) as bigint)")
    val per = docs
      .groupBy(col("source")).agg(sum(col("n_chars")).as("c_s"))
      .withColumn("w_s",
        when(parsedW.isNotNull, pmod(parsedW, lit(5L)) + 1L)
          .otherwise(raise_error(concat(
            lit("epochMix: source name not of form 'srcN': "), col("source")))))
    val tot = per.agg(sum(col("c_s")).as("c_tot"), sum(col("w_s")).as("w_tot"))
    val b = per.crossJoin(broadcast(tot))
      .withColumn("budget", col("c_tot") * budgetNum)
      .withColumn("cap_tokens", col("c_s") * epochCap)
      .withColumn("rk", col("cap_tokens").cast("double") / col("w_s"))
    val wPrev = Window.orderBy(col("rk"), col("source"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wChain = Window.orderBy(col("rk"), col("source"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val capped = b
      .withColumn("cumE", coalesce(sum(col("cap_tokens")).over(wPrev), lit(0L)))
      .withColumn("cumW", coalesce(sum(col("w_s")).over(wPrev), lit(0L)))
      .withColumn("raw_ok",
        col("cap_tokens") * (col("w_tot") - col("cumW")) <=
          (col("budget") - col("cumE")) * col("w_s"))
      .withColumn("capped",
        min(when(col("raw_ok"), 1).otherwise(0)).over(wChain) === 1)
    val leftover = capped.agg(
      sum(when(col("capped"), col("cap_tokens")).otherwise(0L)).as("cape"),
      sum(when(!col("capped"), col("w_s")).otherwise(0L)).as("w_u"))
    capped.crossJoin(broadcast(leftover))
      .withColumn("alloc_tokens", when(col("capped"), col("cap_tokens"))
        .otherwise(expr("((budget - cape) * w_s) div w_u")))
      .withColumn("epochs_pm", expr("(alloc_tokens * 1000) div c_s"))
      .select(col("source"), col("c_s").as("n_tokens"), col("w_s"),
        col("cap_tokens"), col("capped"), col("alloc_tokens"), col("epochs_pm"))
      .orderBy(col("source"))
  }

  /** p11 driver query over the documents table. */
  def epochMixQuery(s: SparkSession, dir: String): DataFrame =
    epochMix(Tables.documents(s, dir).select(col("source"), col("n_chars")))

  /** p12: SOFT dedup — down-WEIGHT near-duplicate families instead of
    * dropping them (the SlimPajama/"soft dedup" alternative to d8's
    * keep-one: every member of a k-doc cluster keeps `1000 div k`
    * per-mille sampling weight, so the family contributes ~one doc's
    * worth of mass while retaining intra-family diversity). Rolled up
    * per source: docs, clustered docs, raw chars, and the effective
    * chars after weighting — the table a data recipe reads to see how
    * much of each feed survives dedup as MASS rather than row count.
    *
    * All-integer (`1000 div k`, then `n_chars·w div 1000` per doc —
    * floor twice, same in both engines). Scale: rides d8's collapsed
    * contraction CC (its cost profile, nothing added — the join-back
    * and rollup shuffle skinny (doc_id, k) pairs and a 20-key agg).
    */
  def softDedup(s: SparkSession, dir: String): DataFrame = {
    val cl = graft.operators.Dedup.dupClusters(s, dir)
      .select(col("doc_id"), col("cluster_size"))
    Tables.documents(s, dir).select(col("doc_id"), col("source"), col("n_chars"))
      .join(cl, Seq("doc_id"), "left")
      .withColumn("k", coalesce(col("cluster_size"), lit(1L)))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("k") > 1, 1L).otherwise(0L)).as("n_clustered"),
        sum(col("n_chars")).as("raw_chars"),
        sum(expr("(n_chars * (1000 div k)) div 1000")).as("eff_chars"))
      .orderBy(col("source"))
  }

  /** p13: CURRICULUM phase manifest — the easy→hard schedule
    * (Bengio et al. 2009; short→long is the canonical text
    * curriculum): docs rank by token count ascending and split into K
    * phases of ~equal doc counts, and the manifest reports each
    * phase's doc count, token budget and length bounds — what a
    * training loop consumes to pace its data loader.
    *
    * EXACT phase rule with no per-doc global rank: the corpus
    * collapses to per-length counts, the cumulative count over
    * ascending lengths is the q55/q56 sharded two-pass prefix sum,
    * and a length-run's phase is `(cum_before·K) div N` — every doc
    * of one length lands in ONE phase (a run never splits; stated),
    * so phase assignment is a broadcast join back on length, not a
    * corpus sort. Integer-exact end to end.
    */
  def curriculumPhases(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), tokenCount(col("text")).cast("long").as("n_tok"))
    val byLen = toks.groupBy(col("n_tok")).agg(count(lit(1)).as("cnt"))
      .withColumn("shard", expr("n_tok div 256"))
    val wLoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("n_tok"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val loc = byLen.withColumn("cum_loc", sum(col("cnt")).over(wLoc))
    val wSh = org.apache.spark.sql.expressions.Window.orderBy(col("shard"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val wAll = org.apache.spark.sql.expressions.Window.orderBy(col("shard"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    // per-shard totals (skinny) carry BOTH the exclusive prefix and
    // the corpus total — no separate count() pass over the corpus
    val off = byLen.groupBy(col("shard")).agg(sum(col("cnt")).as("sc"))
      .withColumn("off", coalesce(sum(col("sc")).over(wSh), lit(0L)))
      .withColumn("n_total", sum(col("sc")).over(wAll))
      .select(col("shard"), col("off"), col("n_total"))
    val phased = loc.join(broadcast(off), Seq("shard"))
      .withColumn("cum_before", col("off") + col("cum_loc") - col("cnt"))
      .select(col("n_tok"), expr(s"(cum_before * $k) div n_total").as("phase"))
    toks.join(broadcast(phased), Seq("n_tok"))
      .groupBy(col("phase"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        min(col("n_tok")).as("tok_min"), max(col("n_tok")).as("tok_max"))
      .orderBy(col("phase"))
  }
}
