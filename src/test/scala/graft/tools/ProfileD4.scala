package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFns._
import graft.operators.Dedup
import org.apache.spark.sql.graft.ArrayExprs

/** Dev profiling main for the d4 pipeline stages (not part of the API). */
object ProfileD4 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosConf._1, Tables.NanosConf._2)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    t("warmup")(spark.read.parquet(dir + "/documents.parquet").count())
    t("featurize_nocache")(Tables.documents(spark, dir)
      .repartition(32)
      .select(col("doc_id"),
        ArrayExprs.char_gram_hashes(normalize(col("text")), 4).as("fh"))
      .select(org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.size(col("fh")))).collect())
    val hashed = Tables.documents(spark, dir)
      .repartition(32)
      .select(col("doc_id"),
        ArrayExprs.char_gram_hashes(normalize(col("text")), 4).as("fh")).cache()
    t("featurize+hash64")(hashed.count())
    val h32 = hashed.select(col("doc_id"), Dedup.fold32(col("fh")).as("h32")).cache()
    t("fold32")(h32.count())
    // mirrors the shipped d4 parameters: 128 bands × 8 rows + the
    // PPJoin size-compatibility prune in the candidate join
    val sig = h32.select(col("doc_id"),
      ArrayExprs.oph_sig(col("h32"), 1024, Dedup.permA(0), Dedup.permB(0), Dedup.P32, Dedup.DensifyC).as("sig")).cache()
    t("minhash_sig 1024")(sig.count())
    val banded = sig
      .join(hashed.select(col("doc_id"), size(col("fh")).as("sz")), "doc_id")
      .select(col("doc_id"), col("sz"), posexplode(Dedup.bandKeys(col("sig"), 128, 8)))
      .select(col("doc_id"), col("sz"), col("pos").as("band"), col("col").as("bkey")).cache()
    t("bandKeys+explode")(banded.count())
    val cands = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id") &&
          least(col("x.sz"), col("y.sz")).cast("double") >= lit(0.7) * greatest(col("x.sz"), col("y.sz")))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b")).distinct().cache()
    val nc = t("candidate join")(cands.count())
    println(s"candidates: $nc")
    val fa = hashed.select(col("doc_id").as("id_a"), col("fh").as("fa"))
    val fb = hashed.select(col("doc_id").as("id_b"), col("fh").as("fb"))
    val out = t("verify")(cands.join(fa, "id_a").join(fb, "id_b")
      .select(col("id_a"), col("id_b"),
        round(ArrayExprs.jaccard_sets(col("fa"), col("fb")), 6).as("j"))
      .filter(col("j") >= 0.7).count())
    println(s"pairs: $out")
    spark.stop()
  }
}
