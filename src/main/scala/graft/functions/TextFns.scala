package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-data-pipeline operators. Everything is
  * a pure `Column` expression built from codegen'd built-ins and
  * higher-order array functions — no Scala UDFs — so these stay
  * inside whole-stage codegen and scale linearly with the corpus.
  */
object TextFns {

  /** Lowercased, whitespace-normalized text (dedup canonical form). */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Whitespace word array of normalized text. */
  def words(text: Column): Column = split(normalize(text), " ")

  /** BPE-ish token count: alpha runs, digit runs, and single
    * punctuation marks each count as one token (the common pre-BPE
    * pretokenizer split).
    */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Distinct word-k-shingles (default k=3), the MinHash feature set.
    * `w` must be a materialized word-array attribute (see charGrams on
    * the lambda-inlining pitfall); docs shorter than k yield one
    * whole-doc shingle.
    */
  def wordShingles(w: Column, k: Int = 3): Column =
    when(size(w) < k, array(concat_ws(" ", w)))
      .otherwise(array_distinct(
        transform(sequence(lit(0), size(w) - k),
          i => concat_ws(" ", slice(w, i + 1, lit(k))))))

  /** Distinct character n-grams (default n=4) of an ALREADY-NORMALIZED
    * string column. The input must be a materialized attribute (its
    * own projection), not an inline `normalize(...)` expression — an
    * expression inlined into the per-index lambda is re-evaluated per
    * gram (measured: 17s → 1s at sf0.1 for the normalize regex).
    */
  def charGrams(nrm: Column, n: Int = 4): Column =
    when(length(nrm) < n, array(nrm))
      .otherwise(array_distinct(
        transform(sequence(lit(1), length(nrm) - (n - 1)),
          i => nrm.substr(i, lit(n)))))

  /** Exact Jaccard similarity of two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** Stopword list shared with the DuckDB oracle. */
  val Stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in")

  /** Fraction of words that are stopwords. */
  def stopwordRatio(w: Column): Column =
    size(filter(w, x => x.isInCollection(Stopwords))).cast("double") /
      size(w).cast("double")

  /** Type-token ratio (lexical diversity). */
  def typeTokenRatio(w: Column): Column =
    size(array_distinct(w)).cast("double") / size(w).cast("double")

  /** Marker-word profiles for the n-gram/stopword language-ID
    * heuristic. Synthetic corpus ⇒ the profiles are drawn from its
    * vocabulary; the operator shape (per-language profile score +
    * deterministic argmax) is the real-data design.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("window", "group", "merge"),
    "en" -> Seq("the", "data", "query"),
    "es" -> Seq("table", "row", "scan"),
    "fr" -> Seq("join", "filter", "sort"),
    "zh" -> Seq("spark", "batch", "stream"))

  /** Profile score: number of word occurrences matching the profile. */
  def langScore(w: Column, profile: Seq[String]): Column =
    size(filter(w, x => x.isInCollection(profile)))

  /** Predicted language: argmax profile score, ties → alphabetical
    * (profiles are iterated in sorted order, strict `>` keeps the
    * earliest max).
    */
  def langPredict(w: Column): Column = {
    val scores = LangProfiles.map { case (lang, prof) => lang -> langScore(w, prof) }
    scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore, lang).otherwise(bestLang),
          when(score > bestScore, score).otherwise(bestScore))
    }._1
  }

  /** 60-bit fingerprint from the md5 of the canonical form: identical
    * in any engine with md5 (DuckDB twin: hex-digit fold). 15 hex
    * digits keeps it inside a signed 64-bit int.
    */
  def fingerprint64(text: Column): Column =
    conv(substring(md5(normalize(text)), 1, 15), 16, 10).cast("long")
}
