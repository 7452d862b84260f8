package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Det._
import graft.functions.TextFns._

/** Text-analysis operators over the `documents` table (SURVEY.md §2,
  * `t*` rows). Pure column expressions; one scan, no shuffle except
  * final ordering.
  */
object TextAnalysis {

  /** t1: whitespace word count + BPE-ish pretokenizer token count. */
  def tokenCounts(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(words(col("text"))).as("n_words"),
        tokenCount(col("text")).as("n_tokens"))
      .orderBy(col("doc_id"))

  /** t2: quality scores — doc length, mean word length, stopword
    * ratio, type-token ratio. Mean word length is computed from
    * integer lengths ((chars - spaces) / words) so it is
    * bit-deterministic.
    */
  def qualityScores(s: SparkSession, dir: String): DataFrame = {
    val nrm = normalize(col("text"))
    val w   = words(col("text"))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        length(nrm).as("n_chars_norm"),
        size(w).as("n_words"),
        e6((length(nrm) - (size(w) - 1)).cast("double") / size(w)).as("avg_word_len_e6"),
        e6(stopwordRatio(w)).as("stopword_ratio_e6"),
        e6(typeTokenRatio(w)).as("type_token_ratio_e6"))
      .orderBy(col("doc_id"))
  }

  /** t3: language-ID — per-language marker-profile scores with a
    * deterministic first-max argmax, emitted next to the label for
    * downstream confusion analysis.
    */
  def langId(s: SparkSession, dir: String): DataFrame = {
    val w      = words(col("text"))
    val scored = Tables.documents(s, dir)
      .select((col("doc_id") +: col("lang").as("lang") +:
        LangProfiles.map { case (l, prof) => langScore(w, prof).as(s"s_$l") }): _*)
    val g = greatest(LangProfiles.map { case (l, _) => col(s"s_$l") }: _*)
    val pred = LangProfiles.init.foldRight(lit(LangProfiles.last._1)) {
      case ((l, _), acc) => when(col(s"s_$l") === g, l).otherwise(acc)
    }
    scored.withColumn("pred_lang", pred)
      .withColumn("correct", col("pred_lang") === col("lang"))
      .orderBy(col("doc_id"))
  }

  /** t4: document fingerprints — md5 of canonical text + 60-bit
    * integer prefix.
    */
  def fingerprints(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        md5(normalize(col("text"))).as("fp_md5"),
        fingerprint64(col("text")).as("fp64"))
      .orderBy(col("doc_id"))

  /** t5: per-language top terms by document frequency — ranked with
    * the bounded-heap TopKLabeled aggregate instead of a window: a
    * window partitioned by `lang` (a FIXED key set) would pull every
    * (lang, term) count through one reducer per language; the heap
    * aggregate shuffles at most k candidates per group per task.
    * Document frequency (not raw term frequency): each doc counts a
    * term once via per-doc distinct words.
    */
  def topTerms(s: SparkSession, dir: String, k: Int = 10): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"), explode(array_distinct(words(col("text")))).as("w"))
      .groupBy(col("lang"), col("w"))
      .agg(count(lit(1)).as("df"))
      .groupBy(col("lang"))
      .agg(org.apache.spark.sql.graft.TopKLabeled
        .top_k_labeled(col("df").cast("double"), col("w"), k).as("tk"))
      .select(col("lang"), posexplode(col("tk")))
      .select(col("lang"), (col("pos") + 1).cast("int").as("rank"),
        col("col.label").as("term"), col("col.score").cast("long").as("doc_freq"))
      .orderBy(col("lang"), col("rank"))

  /** t6: per-document top-k terms by TF-IDF — the keyword extractor a
    * training-data pipeline runs for topic tagging / quality signals.
    * The idf is the RATIONAL BM25 form `(N - df + 0.5)/(df + 0.5)`
    * rather than a log: division and multiplication are correctly
    * rounded IEEE ops, so the score is bit-identical in any engine
    * (a libm `ln` is not), keeping the query oracle-exact. Shape:
    * per-doc term counts (one shuffle), corpus document frequencies
    * off the tf table (second shuffle, term-keyed — no skewed
    * explode of raw tokens twice), a broadcast one-row corpus count,
    * and the bounded-heap TopKLabeled per doc instead of a window
    * (tie-break score desc, term asc — matches the oracle's ORDER
    * BY). Scales: every shuffle key is (doc, term) or term; no
    * driver-side state but the single N row.
    */
  def tfidfTerms(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val docs = Tables.documents(s, dir)
    val n = docs.agg(count(lit(1)).cast("double").as("n"))
    val tf = docs.select(col("doc_id"), explode(words(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    tf.join(dfreq, "w").crossJoin(broadcast(n))
      .select(col("doc_id"), col("w"),
        (col("tf").cast("double") * (col("n") - col("df") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))).as("score"))
      .groupBy(col("doc_id"))
      .agg(org.apache.spark.sql.graft.TopKLabeled
        .top_k_labeled(col("score"), col("w"), k).as("tk"))
      .select(col("doc_id"), posexplode(col("tk")))
      .select(col("doc_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.label").as("term"), e6(col("col.score")).as("score_e6"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** PII patterns shared by the Spark query and (string-identical,
    * SURVEY §5) the DuckDB oracle. Deliberately restricted to syntax
    * Java regex and RE2 interpret identically: character classes,
    * bounded repetition, `\b` word boundaries — no lookaround, no
    * backreferences (RE2 has neither).
    */
  val EmailRe = raw"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
  val Ipv4Re  = raw"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
  val PhoneRe = raw"\b555-\d{4}\b"

  /** PII-bearing text derived deterministically from (text, doc_id) —
    * the corpus ships no PII, so contact strings are appended by
    * arithmetic both engines compute identically (the §3 discipline:
    * derive, don't synthesize a private table). ~1/3 of docs gain an
    * email, 1/5 an IPv4, 1/7 a phone; overlaps compose.
    */
  private def withPii(c: org.apache.spark.sql.Column) = concat(c,
    when(col("doc_id") % 3 === 0,
      concat(lit(" contact user"), col("doc_id"), lit("@mail-"),
        col("doc_id") % 7, lit(".example.com"))).otherwise(""),
    when(col("doc_id") % 5 === 0,
      concat(lit(" from 10."), col("doc_id") % 256, lit(".0."),
        col("doc_id") % 100)).otherwise(""),
    when(col("doc_id") % 7 === 0,
      concat(lit(" call 555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      .otherwise(""))

  /** t7: PII detection + redaction — the scrubbing pass every
    * training-data pipeline runs before anything else. One scan, pure
    * codegen'd column expressions (match counts via
    * `regexp_extract_all`, redaction via chained `regexp_replace`),
    * no shuffle but the final order — trivially 100-TB-shaped. The
    * redacted text itself leaves the query as an md5 + length (the
    * oracle-comparable projection of a full-text column).
    */
  def piiRedact(s: SparkSession, dir: String): DataFrame = {
    val t = withPii(col("text"))
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(t, lit(EmailRe), lit("<EMAIL>")),
        lit(Ipv4Re), lit("<IP>")),
      lit(PhoneRe), lit("<PHONE>"))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(regexp_extract_all(t, lit(EmailRe), lit(0))).as("n_email"),
        size(regexp_extract_all(t, lit(Ipv4Re), lit(0))).as("n_ip"),
        size(regexp_extract_all(t, lit(PhoneRe), lit(0))).as("n_phone"),
        length(redacted).as("redacted_len"),
        md5(redacted).as("redacted_md5"))
      .orderBy(col("doc_id"))
  }

  /** t8: EXACT corpus heavy hitters (terms with count ≥ N/`phiInv`)
    * via the two-pass Misra-Gries scheme — the 100-TB shape for
    * "which terms dominate the corpus": a full `groupBy(term)` makes
    * the shuffle ∝ DISTINCT TERMS (billions on web text); here pass 1
    * aggregates a width-bounded MG sketch (each map-side partial ≤
    * `width` counters, the shuffle carries one sketch per partition)
    * whose invariant — counter ≥ true − N/(width+1) — guarantees
    * every true heavy hitter survives; pass 2 exact-counts ONLY the ≤
    * `width` candidates (an `isin` filter compiles to a codegen'd
    * InSet probe; map-side combine caps the second shuffle at width
    * rows/task). Output is EXACT and deterministic even though the
    * sketch itself is partition-order-dependent: extra candidates are
    * removed by the exact-count threshold, and the MG bound proves no
    * true hitter is missing (width=1024 » phiInv=256, so the max MG
    * undercount N/1025 < the N/256 threshold). Driver state is the
    * one bounded sketch — same class as the IVF centroid collects.
    * The threshold compare is integer (`cnt·phiInv ≥ N`), so the
    * DuckDB oracle is bit-exact.
    */
  def heavyHitters(s: SparkSession, dir: String, phiInv: Long = 256,
      width: Int = 1024): DataFrame = {
    require(width > phiInv, "MG no-miss guarantee needs width > phiInv")
    val toks = Tables.documents(s, dir)
      .select(explode(words(col("text"))).as("w"))
    // ONE lazy DAG, no driver-side collect and no job at frame
    // construction (the d2/d4 static-plan discipline): the sketch is
    // a broadcast subtree — ≤ width (candidate, N) rows, N riding
    // every entry row so a single broadcast carries both the
    // candidate set and the threshold input — and pass 2 is a
    // broadcast-hash semi join + map-side-combined count.
    val sk = toks
      .agg(org.apache.spark.sql.graft.MisraGries.mg_sketch(col("w"), width).as("mg"))
      .select(col("mg.n").as("n"), explode(col("mg.entries.term")).as("w"))
    toks.join(broadcast(sk), "w")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"), min(col("n")).as("n"))
      .filter(col("cnt") * lit(phiInv) >= col("n"))
      .select(col("w").as("term"), col("cnt"))
      .orderBy(col("cnt").desc, col("term"))
  }

  /** t13: out-of-vocabulary rate — the vocabulary-coverage signal
    * (CCNet's LM-filtering proxy / fastText OOV diagnostics): how
    * much of each document is NOT covered by the corpus's own
    * heavy-hitter vocabulary (t8's EXACT `count·phiInv ≥ N` rule —
    * deterministic, no top-k tie ambiguity). High OOV = junk,
    * boilerplate code, or off-distribution text.
    *
    * Scale shape: the vocabulary is an aggregate-bounded frame
    * (≤ phiInv terms by definition) riding a BROADCAST join — no
    * collect; the per-doc in-vocab count is one token-explode +
    * map-side-combinable groupBy(doc_id); everything integer
    * (per-mille rate by integer division). Composes t8's Misra-Gries
    * candidate machinery unchanged.
    */
  def oovRate(s: SparkSession, dir: String, phiInv: Long = 256,
      width: Int = 1024): DataFrame = {
    val vocab = heavyHitters(s, dir, phiInv, width)
      .select(col("term").as("word"))
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), words(col("text")).as("w"))
    val inv = docs.select(col("doc_id"), explode(col("w")).as("word"))
      .join(broadcast(vocab), Seq("word"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_iv"))
    docs.select(col("doc_id"), size(col("w")).cast("long").as("n_words"))
      .join(inv, Seq("doc_id"), "left")
      .withColumn("n_oov", col("n_words") - coalesce(col("n_iv"), lit(0L)))
      .withColumn("oov_pm",
        when(col("n_words") > 0, expr("n_oov * 1000 div n_words")).otherwise(lit(0L)))
      .select(col("doc_id"), col("n_words"), col("n_oov"), col("oov_pm"))
      .orderBy(col("doc_id"))
  }

  /** Per-doc word-n-gram repetition numerators, computed WITHOUT a
    * shuffle: the gram array is sorted once so equal grams become
    * adjacent runs, and one `aggregate` fold walks the runs tracking
    * (a) the best run by (count, char-length) — strict-better
    * replacement over the ascending-lex walk keeps the
    * lexicographically-smallest gram among full ties, matching the
    * oracle's `ORDER BY cnt DESC, clen DESC, gram` — and (b) the
    * char mass of all runs with count ≥ 2. Char length of a gram
    * excludes its joiner spaces (`length - (n-1)`), so numerators are
    * in the same unit as t2's space-free char count. Emits
    * struct(top_num = bestCount·bestClen, dup_num = Σ_{c≥2} c·clen) —
    * both integers, so the DuckDB comparison is bit-exact.
    */
  private[operators] def gramRepNums(w: Column, n: Int): Column = {
    val grams = when(size(w) < n, array().cast("array<string>"))
      .otherwise(array_sort(transform(sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", slice(w, i, lit(n))))))
    val init = struct(
      lit("").as("prev"), lit(0L).as("run"),
      lit(0L).as("bestCnt"), lit(0L).as("bestClen"),
      lit(0L).as("bestNum"), lit(0L).as("dupNum"))
    // close the open run into (best*, dup*); a zero-length run (empty
    // array / first element) is a no-op because 0 > bestCnt is false
    // and run >= 2 is false
    def closed(acc: Column) = {
      val cl = (length(acc("prev")) - lit(n - 1)).cast("long")
      val better = (acc("run") > acc("bestCnt")) ||
        (acc("run") === acc("bestCnt") && cl > acc("bestClen"))
      (when(better, acc("run")).otherwise(acc("bestCnt")),
        when(better, cl).otherwise(acc("bestClen")),
        when(better, acc("run") * cl).otherwise(acc("bestNum")),
        acc("dupNum") +
          when(acc("run") >= 2, acc("run") * cl).otherwise(lit(0L)))
    }
    aggregate(grams, init,
      (acc, g) => {
        val same = acc("prev") === g
        val (bc, bl, bn, dn) = closed(acc)
        struct(
          g.as("prev"),
          when(same, acc("run") + 1).otherwise(lit(1L)).as("run"),
          when(same, acc("bestCnt")).otherwise(bc).as("bestCnt"),
          when(same, acc("bestClen")).otherwise(bl).as("bestClen"),
          when(same, acc("bestNum")).otherwise(bn).as("bestNum"),
          when(same, acc("dupNum")).otherwise(dn).as("dupNum"))
      },
      acc => {
        val (_, _, bn, dn) = closed(acc)
        struct(bn.as("top_num"), dn.as("dup_num"))
      })
  }

  /** t9: within-document repetition signals — the Gopher "repetition
    * removal" quality rules (Rae et al. 2021, Table A1; also Dolma
    * and RedPajama-v2 quality signals): the fraction of a document's
    * characters covered by its most frequent word 2-gram / 3-gram and
    * by all duplicated 5-grams. Complements t2 (length/stopword/TTR
    * statics) and d6 (CROSS-document spans) — this is the
    * within-document boilerplate/loop detector every pretraining
    * pipeline runs. One scan, pure column expressions, no shuffle but
    * the final order; per-row cost is O(L log L) in doc length, so
    * the operator is trivially corpus-linear at 100 TB. Integer
    * numerators ride next to the r6-rounded fractions so the oracle
    * hash never depends on float formatting alone.
    */
  def repSignals(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), normalize(col("text")).as("nrm"))
      .select(col("doc_id"), col("nrm"), split(col("nrm"), " ").as("w"))
      .select(col("doc_id"), size(col("w")).as("n_words"),
        (length(col("nrm")) - (size(col("w")) - 1)).cast("long").as("n_chars"),
        gramRepNums(col("w"), 2).as("g2"),
        gramRepNums(col("w"), 3).as("g3"),
        gramRepNums(col("w"), 5).as("g5"))
    def frac(num: Column) =
      when(col("n_chars") > 0,
        e6(num.cast("double") / col("n_chars"))).otherwise(lit(0L))
    base.select(col("doc_id"), col("n_words"), col("n_chars"),
      col("g2.top_num").as("top2_num"),
      col("g3.top_num").as("top3_num"),
      col("g5.dup_num").as("dup5_num"),
      frac(col("g2.top_num")).as("top2_cfrac_e6"),
      frac(col("g3.top_num")).as("top3_cfrac_e6"),
      frac(col("g5.dup_num")).as("dup5_cfrac_e6"))
      .orderBy(col("doc_id"))
  }

  /** t10: per-host corpus mix report — the domain-level audit every
    * web-corpus pipeline publishes (CCNet's per-domain stats, Dolma's
    * domain mix tables, RefinedWeb §3.1): docs, distinct canonical
    * URLs, languages, token volume, and mean document length per
    * registrable host. Composes d10's canonicalization chain (the
    * Spark side goes through the real string extraction; the oracle
    * derives host and URL identity from the generating formulas, so
    * the chain is independently re-proven). Scale shape: stateless
    * per-row projection → one group-by on the skinny host key with
    * map-side partial aggregation; distinct counts are exact
    * (two-phase expand) — at 100 TB the host cardinality (~10^7) is
    * trivially reducer-sized, and a skew-heavy host (a crawl
    * dominated by one domain) still partial-aggregates map-side.
    */
  def domainStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"),
        Curation.syntheticUrl.as("url"))
      .select(Curation.urlHost(col("url")).as("host"),
        Curation.canonicalUrl(col("url")).as("canonical_url"),
        col("lang"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("toks"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("canonical_url")).as("n_urls"),
        count_distinct(col("lang")).as("n_langs"),
        sum(col("toks")).as("tok_sum"),
        e6(avg(col("n_chars"))).as("avg_chars_e6"))
      .orderBy(col("host"))

  /** Engine-portable hashed-feature weight for the t11 linear scorer:
    * the feature's bucket is the p2 md5-hex fold (first 8 hex digits
    * of md5(salt ++ feature) as an integer) mod `buckets`, and its
    * weight maps the bucket into [−200, 200] by `bucket mod 401 −
    * 200`. Every step is integer arithmetic on an md5 both engines
    * compute identically, so the DuckDB oracle reproduces each weight
    * bit-exactly.
    */
  private def featWeight(g: Column, buckets: Int): Column =
    pmod(conv(substring(md5(concat(lit("qm"), g)), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong)) % 401 - 200

  /** t11: quality-classifier scoring — the hashed-feature linear
    * classifier stage of GPT-3's pipeline (Brown et al. 2020,
    * Appendix A: a classifier scores every web document against a
    * curated target, and the score gates inclusion) and CCNet's
    * fastText step. Features are word bigrams WITH multiplicity
    * hashed into `buckets` (the fastText/Vowpal hashing trick —
    * fixed-width model state regardless of vocabulary); the model is
    * a sparse linear scorer `score = Σ w[h(g)]`. Coefficients here
    * are a deterministic integer function of the bucket (the
    * container ships no trained artifacts) — the SHAPE is the real
    * stage: at 100 TB a trained weight vector rides the closure as a
    * `buckets`-sized broadcast array and nothing else changes.
    *
    * Scale: scoring is a pure per-row fold over the doc's bigram
    * array (one `aggregate` higher-order function) — zero shuffle,
    * zero model-lookup join, corpus-linear, and it shares the one
    * documents scan with t2/t9. Integer score and feature count ride
    * beside the r6-rounded per-feature mean so the oracle hash never
    * rests on float formatting.
    */
  def qualityModel(s: SparkSession, dir: String, buckets: Int = 4096): DataFrame = {
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), words(col("text")).as("w"))
      .select(col("doc_id"),
        when(size(col("w")) < 2, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), size(col("w")) - 1),
            i => concat_ws(" ", slice(col("w"), i, lit(2))))).as("g"))
    base.select(col("doc_id"),
        size(col("g")).cast("long").as("n_feats"),
        aggregate(col("g"), lit(0L), (acc, x) => acc + featWeight(x, buckets))
          .as("score"))
      .withColumn("keep", col("score") > 0)
      .withColumn("score_per_feat_e6",
        when(col("n_feats") > 0, e6(col("score").cast("double") / col("n_feats")))
          .otherwise(lit(0L)))
      .orderBy(col("doc_id"))
  }

  /** t12: the remaining Gopher quality-rule set (Rae et al. 2021,
    * Table A1) beside t2's statics and t9's repetition signals —
    * word-count bounds, mean-word-length bounds, alphabetic-word
    * fraction, symbol-to-word ratio, and the stopword-presence rule,
    * each as an INTEGER-numerator flag (cross-multiplied comparisons,
    * no float thresholds anywhere) plus the conjunction `gopher_pass`.
    *
    * The fixture corpus carries no symbol words, so the symbol rule's
    * input is PLANTED by doc_id arithmetic (§3 / t7's discipline):
    * `doc_id mod 13` literal `#` words append to the word array in
    * both engines, giving a genuine fail set at every sf. Everything
    * is a stateless per-row projection sharing the one documents
    * scan — zero shuffle before the final order, corpus-linear.
    */
  /** t15: language-ID confusion MATRIX — t3's per-doc predictions
    * aggregated to the (label × prediction) table a langid deployment
    * monitors (the per-pair error mass tells which language pairs the
    * profile method confuses); one skinny group-by over t3's
    * projection, cells carry counts + label-marginal per-mille rates
    * (integer division — float-free).
    */
  def langConfusion(s: SparkSession, dir: String): DataFrame = {
    val pred = langId(s, dir).select(col("lang"), col("pred_lang"))
    val cells = pred.groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
    val marg = cells.groupBy(col("lang")).agg(sum(col("n")).as("n_label"))
    cells.join(marg, "lang")
      .withColumn("rate_pm", expr("(n * 1000) div n_label"))
      .select(col("lang"), col("pred_lang"), col("n"), col("n_label"), col("rate_pm"))
      .orderBy(col("lang"), col("pred_lang"))
  }

  /** t14: n-gram NOVELTY attribution — how much of each document is
    * textually NEW relative to everything ingested before it (docs
    * ordered by id = arrival order): a doc's novelty is the fraction
    * of its distinct word-3-shingles whose FIRST corpus occurrence is
    * this doc. The redundancy-growth curve this yields is the
    * standard diminishing-returns diagnostic for continued crawling
    * (each marginal crawl batch contributes less novel text), and
    * per-doc novelty is a dedup-adjacent quality signal (a doc with
    * near-zero novelty is recombined boilerplate even if no single
    * pair passes d2's threshold).
    *
    * Scale shape: one shingle explode → min-doc attribution on the
    * 8-byte hash key (map-side-combinable min), one join back on the
    * same key, one per-doc count — shuffle ∝ corpus shingles, all
    * skinny keys, corpus-linear. Integer numerators beside the
    * rounded fraction keep the oracle hash float-free.
    */
  def ngramNovelty(s: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(org.apache.spark.sql.graft.ArrayExprs
          .word_shingle_hashes(normalize(col("text")), 3)).as("h"))
    // the kernel emits DISTINCT hashes per doc (its Scaladoc contract),
    // so (doc_id, h) needs no dedup exchange; hashes are engine-
    // internal (xxhash64) and never reach the output — the oracle
    // attributes first-occurrence on the shingle STRINGS, identical
    // unless xxhash64 collides inside the corpus (≈ n²/2⁶⁵)
    val firstSeen = sh.groupBy(col("h")).agg(min(col("doc_id")).as("first_doc"))
    sh.join(firstSeen, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty_e6",
        e6(col("n_novel").cast("double") / col("n_shingles")))
      .orderBy(col("doc_id"))
  }

  def gopherGate(s: SparkSession, dir: String): DataFrame =
    gopherGateFrame(Tables.documents(s, dir)).orderBy(col("doc_id"))

  /** The t12 rule set over any (doc_id, text) frame — stateless pure
    * projection, so the SAME transform runs on a batch table and on a
    * readStream/MemoryStream frame unchanged (no sort, no state;
    * StreamingSpec asserts streamed ≡ batch row-for-row). This is the
    * deployment shape of a quality gate: score documents as they
    * arrive, not in a nightly rescan.
    */
  def gopherGateFrame(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        concat(words(col("text")),
          array_repeat(lit("#"), (col("doc_id") % 13).cast("int"))).as("w"))
      .select(col("doc_id"),
        size(col("w")).as("n_words"),
        aggregate(col("w"), lit(0L), (acc, x) => acc + length(x)).as("sum_chars"),
        size(filter(col("w"), x => x.rlike("[a-z]"))).as("n_alpha"),
        size(filter(col("w"), x => x.contains("#"))).as("n_symbol"),
        size(array_intersect(array_distinct(col("w")),
          array(Stopwords.map(lit): _*))).as("n_stop"))
      .withColumn("wc_ok", col("n_words") >= 50 && col("n_words") <= 100000)
      .withColumn("mwl_ok",
        col("sum_chars") >= col("n_words") * 3L && col("sum_chars") <= col("n_words") * 10L)
      .withColumn("alpha_ok", col("n_alpha") * 10 >= col("n_words") * 8)
      .withColumn("sym_ok", col("n_symbol") * 10 <= col("n_words"))
      .withColumn("stop_ok", col("n_stop") >= 2)
      .withColumn("gopher_pass",
        col("wc_ok") && col("mwl_ok") && col("alpha_ok") && col("sym_ok") && col("stop_ok"))

  /** t16: bigram LM-coverage — the CCNet/fastText-era language-model
    * coverage proxy beside t13's unigram OOV: a document whose word
    * BIGRAMS rarely occur anywhere else in the corpus is boilerplate,
    * gibberish, or template noise even when its individual words are
    * common (the signal an n-gram LM's perplexity carries, reduced to
    * exact counts — no floats cross the oracle hash). Per doc: bigram
    * occurrences, occurrences of "common" bigrams (corpus count ≥
    * `minCount`), and the integer per-mille coverage.
    *
    * Scale shape: per-occurrence bigrams hash to 8 bytes BEFORE the
    * exchange (xxhash64 — the t14 discipline; the oracle counts the
    * strings, identical short of an in-corpus 64-bit collision), the
    * corpus count table is a skinny hash-keyed group-by with map-side
    * combine, and the join-back is hash-key equi — corpus-linear,
    * nothing wider than (hash, count) shuffles. Single-word docs keep
    * a row (0 bigrams, coverage 0) via the left join-back.
    */
  /** t17: WEAKEST-LINK bigram fluency — the LM-filter proxy (CCNet
    * scores documents with a KenLM perplexity; Wenzek et al. 2020
    * §4.3) re-expressed so it is integer-EXACT: a log-prob sum is
    * engine-divergent (libm log, float accumulation order), but the
    * corpus-conditional probability of each bigram is a RATIONAL —
    * p(w2|w1) = count(w1 w2) / count(w1 as a prefix) — and a
    * document's weakest transition (its MIN conditional probability,
    * in integer ppm by `(cnt_bg·1e6) div cnt_ug`) is an order-free
    * aggregate of exact integers. Surfaces per doc: bigram count,
    * the weakest-transition ppm, and how many transitions fall under
    * 1/100 (`cnt_bg·100 < cnt_ug`, cross-multiplied — no float
    * threshold). Low min_ppm = a transition the corpus has almost
    * never seen after that prefix — gibberish, boilerplate splices,
    * wrong-language spans; the doc-level gate a fluency filter reads.
    * Bigram-less docs (< 2 words) surface the vacuous 1e6.
    *
    * Scale shape (t16's discipline): transitions shuffle as 8-byte
    * xxhash64 keys (bigram strings never cross an exchange), two
    * map-side-combinable count aggs, join-backs on the same hashes,
    * one per-doc agg. Oracle counts the STRINGS — identical short of
    * a 64-bit collision (t14's argument).
    */
  def lmFluency(s: SparkSession, dir: String, weakDen: Long = 100L): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), words(col("text")).as("w"))
    val big = docs.filter(size(col("w")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("w")) - 2), i =>
          struct(element_at(col("w"), i + 1).as("u"),
            concat(element_at(col("w"), i + 1), lit(" "),
              element_at(col("w"), i + 2)).as("g")))).as("p"))
      .select(col("doc_id"), xxhash64(col("p.u")).as("hu"), xxhash64(col("p.g")).as("hg"))
    val bgc = big.groupBy(col("hg")).agg(count(lit(1)).as("cnt_bg"))
    val ugc = big.groupBy(col("hu")).agg(count(lit(1)).as("cnt_ug"))
    val scored = big.join(bgc, "hg").join(ugc, "hu")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nb"),
        min(expr("(cnt_bg * 1000000) div cnt_ug")).as("mp"),
        sum(when(col("cnt_bg") * weakDen < col("cnt_ug"), 1L).otherwise(0L)).as("nw"))
    docs.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("nb"), lit(0L)).as("n_bigrams"),
        coalesce(col("mp"), lit(1000000L)).as("min_ppm"),
        coalesce(col("nw"), lit(0L)).as("n_weak"))
      .orderBy(col("doc_id"))
  }

  def bigramCoverage(s: SparkSession, dir: String, minCount: Long = 5L): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), words(col("text")).as("w"))
    val big = docs.filter(size(col("w")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("w")) - 2), i =>
          concat(element_at(col("w"), i + 1), lit(" "),
            element_at(col("w"), i + 2)))).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("h"))
    val counts = big.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
    val cov = big.join(counts, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nb"),
        sum(when(col("cnt") >= minCount, 1L).otherwise(0L)).as("nc"))
    docs.select(col("doc_id"))
      .join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("nb"), lit(0L)).as("n_bigrams"),
        coalesce(col("nc"), lit(0L)).as("n_common"))
      .withColumn("cover_pm",
        when(col("n_bigrams") === 0, 0L)
          .otherwise(expr("(n_common * 1000) div n_bigrams")))
      .orderBy(col("doc_id"))
  }

  /** t18: READABILITY signals per document — the grade-level /
    * complexity axis every quality-filter stack carries beside t2's
    * lexical stats and t12's Gopher gates (Flesch 1948 / LIX, Björnsson
    * 1968). All counts are non-overlapping regex-run counts on
    * lowercased text — sentences as [.!?]+ runs, words as ASCII-letter
    * runs, long words as 7+-letter runs, syllables proxied by vowel
    * groups (the standard dictionary-free estimator) — and the two
    * composite indexes surface as INTEGER ratios (LIX split into its
    * words-per-sentence ×100 and long-word per-mille terms; vowel
    * groups per word per-mille as the Flesch syllable term), so no
    * float exists anywhere: integer-exact in any engine. Zero-sentence
    * and zero-word docs surface 0, stated.
    *
    * Scale: stateless per-row projection — whole-stage codegen'd,
    * shuffle-free but for the final presentation sort.
    */
  def readability(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        expr("cast(size(regexp_extract_all(lower(text), '[.!?]+', 0)) as bigint)").as("n_sentences"),
        expr("cast(size(regexp_extract_all(lower(text), '[a-z]+', 0)) as bigint)").as("n_words"),
        expr("cast(size(regexp_extract_all(lower(text), '[a-z]{7,}', 0)) as bigint)").as("n_long_words"),
        expr("cast(size(regexp_extract_all(lower(text), '[aeiouy]+', 0)) as bigint)").as("n_vowel_groups"))
      .withColumn("wps_x100", when(col("n_sentences") === 0, 0L)
        .otherwise(expr("(n_words * 100) div n_sentences")))
      .withColumn("longword_pm", when(col("n_words") === 0, 0L)
        .otherwise(expr("(n_long_words * 1000) div n_words")))
      .withColumn("syllable_pm", when(col("n_words") === 0, 0L)
        .otherwise(expr("(n_vowel_groups * 1000) div n_words")))
      .orderBy(col("doc_id"))

  /** t19: SCRIPT-MIX census per document — the character-class
    * composition gate (the "mostly-punctuation / digit-soup / wrong
    * script" filters in CCNet-family stacks, and the cheap precursor
    * to t3's language ID): letters, digits and whitespace counted by
    * stripping their complements (counts over pure-ASCII residues —
    * cross-engine safe regardless of the corpus's unicode content),
    * everything else derived by subtraction from the total; ratios as
    * integer per-mille. Stateless codegen'd projection, shuffle-free.
    */
  def scriptMix(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars_total"),
        expr("cast(length(regexp_replace(text, '[^a-zA-Z]', '')) as bigint)").as("n_letter"),
        expr("cast(length(regexp_replace(text, '[^0-9]', '')) as bigint)").as("n_digit"),
        expr("cast(length(regexp_replace(text, '[^ \\t\\n\\r]', '')) as bigint)").as("n_space"))
      .withColumn("n_other",
        col("n_chars_total") - col("n_letter") - col("n_digit") - col("n_space"))
      .withColumn("letter_pm", when(col("n_chars_total") === 0, 0L)
        .otherwise(expr("(n_letter * 1000) div n_chars_total")))
      .withColumn("other_pm", when(col("n_chars_total") === 0, 0L)
        .otherwise(expr("(n_other * 1000) div n_chars_total")))
      .orderBy(col("doc_id"))

  /** t20: VOCABULARY CENSUS per (lang, source) slice — the
    * corpus-level diversity/concentration report a mixing decision
    * reads before weighting a source (t2 measures diversity per
    * DOCUMENT; this measures it per CORPUS SLICE, where Zipf
    * concentration and template vocab actually show): total tokens,
    * distinct types, hapax count (types seen once — the productive-
    * vocabulary signal), top-token share, and the Simpson repeat-
    * probability Σnₜ(nₜ−1)/(N(N−1)) — the chance two random tokens
    * from the slice are the same type. Everything integer-exact: the
    * Simpson ratio ships as its (num, den) pair PLUS a ppm computed
    * by integer division (the q45 lesson — no float ratio is ever
    * hash-compared).
    *
    * Scale shape: explode → (slice, token) counts is map-side
    * combinable and the only corpus-sized shuffle (skinny 8-byte-ish
    * keys); the second level aggregates types per slice (output ∝
    * vocabulary, not corpus); top-token by max(struct) — no window
    * funnel. Overflow honesty: the PPM columns are exact at any
    * slice size — the Simpson numerator is SUMMED in DECIMAL(38,0)
    * (each nₜ(nₜ−1) product is a decimal multiply, never a long one)
    * and the denominator rebuilds N·(N−1) in decimal inside the
    * division. The RAW (simpson_num, simpson_den) long pair is a
    * convenience surface derived by casting the decimals down: below
    * ~3·10⁹ tokens per slice it is the exact rational; past that the
    * cast goes NULL on the Spark side (non-ANSI decimal→long) while
    * DuckDB errors on the same cast — a stated divergence (the Det.e6
    * contract class), never a silent wrap, and the ppm column stays
    * correct either way.
    */
  /** t21: TERM BURSTINESS for the corpus's top terms — Church &
    * Gale's repeat-rate diagnostic (CSL 1995; a bursty term repeats
    * within the documents that contain it, a dispersed term spreads
    * across many): for the top-50 terms by collection frequency,
    * cf (total occurrences), df (containing docs), burstiness
    * cf/df as exact integer ppm, and doc coverage df/n_docs likewise.
    * High burstiness at low coverage flags template/boilerplate
    * vocabulary that t5's plain df ranking misses — the signal a
    * mixing decision reads beside t20's slice census.
    *
    * Scale shape: per-(doc, term) counts first (map-side combinable,
    * the one corpus-sized shuffle, skinny keys); term-level cf/df is
    * a vocabulary-sized agg; the top-50 selection is the bounded-heap
    * TopKLabeled aggregate (never a corpus-wide window), whose 50
    * winners broadcast back onto the term table for df; n_docs is a
    * 1-row broadcast.
    */
  def termBurstiness(s: SparkSession, dir: String, k: Int = 50): DataFrame = {
    val docs = Tables.documents(s, dir)
    val nd = docs.agg(count(lit(1)).as("n_docs"))
    val dt = docs.select(col("doc_id"), explode(words(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("n"))
    val terms = graft.Caches.track(
      dt.groupBy(col("w")).agg(sum(col("n")).as("cf"), count(lit(1)).as("df")))
    val top = terms.groupBy()
      .agg(org.apache.spark.sql.graft.TopKLabeled
        .top_k_labeled(col("cf").cast("double"), col("w"), k).as("tk"))
      .select(posexplode(col("tk")))
      .select((col("pos") + 1).cast("long").as("rank"), col("col.label").as("w"))
    terms.join(broadcast(top), Seq("w"))
      .crossJoin(broadcast(nd))
      // ppm through DECIMAL(38,0): a stop-word-class cf can exceed
      // 2^63/1e6 ≈ 9.2e12 at 1e13-token corpora — the t20 discipline
      .select(col("rank"), col("w").as("term"), col("cf"), col("df"),
        expr("cast((cast(cf as decimal(38,0)) * 1000000) div df as bigint)")
          .as("burst_ppm"),
        expr("cast((cast(df as decimal(38,0)) * 1000000) div n_docs as bigint)")
          .as("coverage_ppm"))
      .orderBy(col("rank"))
  }

  /** t23: ZIPF RANK-FREQUENCY audit — the corpus-health fingerprint
    * (a natural-language corpus follows cf(r) ≈ cf(1)/r; template
    * spam, boilerplate floods and deduplication bugs all bend the
    * curve, so rank·cf/cf(1) per rank is the one-glance diagnostic
    * corpus reports publish). Top-k terms by collection frequency
    * ride the bounded-heap TopKLabeled aggregate — never a
    * vocabulary-wide window (at 10^10-type vocabularies a global
    * rank window funnels every (term, cf) pair through one reducer;
    * the heap shuffles ≤ k candidates per task). The Zipf deviation
    * `(rank·cf·10^6) div cf(1)` routes through DECIMAL(38,0) (the
    * t20/t21 overflow discipline — a stop-word cf at 10^13 tokens
    * crosses 2^63 inside the ppm numerator), surfaced as an exact
    * BIGINT; `zipf_prod = rank·cf` stays long (≤ k·cf, stated bound
    * k·2^63/10^2 — fine until a single term holds ~10^17
    * occurrences). cf(1) re-attaches via a broadcast 1-row frame
    * (the t21/q61 class).
    */
  def zipfCensus(s: SparkSession, dir: String, k: Int = 100): DataFrame = {
    // cached: both the rank-1 probe and the output side consume it —
    // uncached, the full token explode + vocab groupBy would run twice
    val top = graft.Caches.track(Tables.documents(s, dir)
      .select(explode(words(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cf"))
      .groupBy()
      .agg(org.apache.spark.sql.graft.TopKLabeled
        .top_k_labeled(col("cf").cast("double"), col("w"), k).as("tk"))
      .select(posexplode(col("tk")))
      .select((col("pos") + 1).cast("long").as("rank"),
        col("col.label").as("term"), col("col.score").cast("long").as("cf")))
    val f1 = top.filter(col("rank") === 1).select(col("cf").as("cf1"))
    top.crossJoin(broadcast(f1))
      .select(col("rank"), col("term"), col("cf"),
        (col("rank") * col("cf")).as("zipf_prod"),
        expr("cast((cast(rank as decimal(38,0)) * cf * 1000000) div cf1 as bigint)")
          .as("zipf_ppm"))
      .orderBy(col("rank"))
  }

  /** t22: EFFECTIVE DATASET SIZE per source — the number a mixing
    * decision actually reads: raw token mass next to the token mass
    * that SURVIVES exact-dup down-weighting (each doc weighted
    * 1000/f per-mille where f is its exact-duplicate family size —
    * d1's md5-of-normalized-text family, p12's soft-dedup rule
    * applied at TOKEN grain instead of doc grain). A source whose
    * crawl is 40% boilerplate re-posts contributes far fewer
    * effective tokens than its raw count suggests; savings_ppm makes
    * the gap explicit, through DECIMAL(38,0) (the t20/t21 overflow
    * discipline — raw_pm is tokens×1000 and crosses 2⁶³ at ~10¹⁶
    * raw tokens only in the ppm numerator, which is decimal).
    *
    * Scale shape: ONE corpus-sized shuffle keyed by the 128-bit
    * content hash (md5 — skinny, the d1 working representation) to
    * size families; family sizes re-attach by the same key (AQE
    * broadcasts while small); the rollup is sources-sized with
    * map-side partials. No strings cross an exchange except the
    * 32-char hash.
    */
  def effectiveSize(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        md5(normalize(col("text"))).as("content_hash"),
        size(words(col("text"))).cast("long").as("n_toks"))
    val fam = d.groupBy(col("content_hash")).agg(count(lit(1)).as("f"))
    d.join(fam, Seq("content_hash"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("raw_tokens"),
        sum(expr("(n_toks * 1000) div f")).as("eff_tokens_pm"))
      .withColumn("savings_ppm", expr(
        """cast(((cast(raw_tokens as decimal(38,0)) * 1000 - eff_tokens_pm)
           * 1000000) div (cast(raw_tokens as decimal(38,0)) * 1000) as bigint)"""))
      .orderBy(col("source"))
  }

  def vocabCensus(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("lang"), col("source"),
        explode(split(normalize(col("text")), " ")).as("tok"))
    val counts = toks.groupBy(col("lang"), col("source"), col("tok"))
      .agg(count(lit(1)).as("n"))
    counts.groupBy(col("lang"), col("source"))
      .agg(sum(col("n")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("n_hapax"),
        max(col("n")).as("top_token_n"),
        // every n(n−1) product AND the sum live in DECIMAL(38,0) —
        // the long surface below derives from this, never vice versa
        sum(col("n").cast("decimal(38,0)") * (col("n") - 1)).as("simpson_dec"))
      .withColumn("simpson_num", col("simpson_dec").cast("long"))
      .withColumn("simpson_den",
        (col("n_tokens").cast("decimal(38,0)") * (col("n_tokens") - 1)).cast("long"))
      .withColumn("ttr_ppm",
        expr("cast((cast(n_types as decimal(38,0)) * 1000000) div n_tokens as bigint)"))
      // numerator and denominator both decimal — exact at any slice
      // size (see the overflow-honesty note above)
      .withColumn("simpson_ppm", when(col("n_tokens") <= 1, 0L)
        .otherwise(expr(
          """cast((simpson_dec * 1000000)
             div (cast(n_tokens as decimal(38,0)) * (n_tokens - 1)) as bigint)""")))
      .select(col("lang"), col("source"), col("n_tokens"), col("n_types"),
        col("n_hapax"), col("top_token_n"), col("simpson_num"),
        col("simpson_den"), col("ttr_ppm"), col("simpson_ppm"))
      .orderBy(col("lang"), col("source"))
  }
}
