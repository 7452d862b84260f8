package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
        round(col("ttr"), 6).as("ttr"))
      .orderBy(col("doc_id"))
  }
}
