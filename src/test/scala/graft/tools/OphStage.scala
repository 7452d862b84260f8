package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFns._
import graft.operators.Dedup
import org.apache.spark.sql.graft.ArrayExprs

/** Dev stage-timing for the OPH experiment (not part of the API). */
object OphStage {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosConf._1, Tables.NanosConf._2)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    t("warmup")(spark.read.parquet(dir + "/documents.parquet").count())
    val h32 = Tables.documents(spark, dir).repartition(32)
      .select(col("doc_id"),
        ArrayExprs.char_gram_hashes(normalize(col("text")), 4).as("fh"))
      .select(col("doc_id"), Dedup.fold32(col("fh")).as("h32")).cache()
    t("featurize+fold32")(h32.count())
    for (i <- 1 to 2) {
      t(s"minhash_sig 1024 #$i")(h32.select(
        ArrayExprs.minhash_sig(col("h32"), Dedup.permA.take(1024),
          Dedup.permB.take(1024), Dedup.P32).as("sig"))
        .select(sum(size(col("sig")))).collect())
      t(s"oph_sig 1024 #$i")(h32.select(
        ArrayExprs.oph_sig(col("h32"), 1024, Dedup.permA(0), Dedup.permB(0),
          Dedup.P32, Dedup.DensifyC).as("sig"))
        .select(sum(size(col("sig")))).collect())
      t(s"oph_sig+bands #$i")(h32.select(
        ArrayExprs.oph_sig(col("h32"), 1024, Dedup.permA(0), Dedup.permB(0),
          Dedup.P32, Dedup.DensifyC).as("sig"))
        .select(posexplode(Dedup.bandKeys(col("sig"), 128, 8))).count())
      t(s"minhash+bands #$i")(h32.select(
        ArrayExprs.minhash_sig(col("h32"), Dedup.permA.take(1024),
          Dedup.permB.take(1024), Dedup.P32).as("sig"))
        .select(posexplode(Dedup.bandKeys(col("sig"), 128, 8))).count())
    }
    // candidate counts: the banding quality signal
    def candidates(sig: org.apache.spark.sql.Column): Long = {
      val banded = h32.select(col("doc_id"), sig.as("sig"))
        .select(col("doc_id"), posexplode(Dedup.bandKeys(col("sig"), 128, 8)))
        .select(col("doc_id"), col("pos").as("band"), col("col").as("bkey"))
      banded.as("x").join(banded.as("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id"), col("y.doc_id")).distinct().count()
    }
    // long-doc regime: same corpus with text ×20 (~5-6k grams/doc) —
    // the shape of a real web-crawl document, where the per-doc
    // signature scan dominates featurization.
    // distinct content matters: grams are deduped, so the long text is
    // a hash chain (80 × 64 hex chars ≈ 5k distinct grams per doc)
    val h32Long = Tables.documents(spark, dir).repartition(32)
      .select(col("doc_id"),
        ArrayExprs.char_gram_hashes(normalize(
          concat_ws("", (0 until 80).map(i =>
            sha2(concat(col("text"), lit(i.toString)), 256)): _*)), 4).as("fh"))
      .select(col("doc_id"), Dedup.fold32(col("fh")).as("h32")).cache()
    t("longdoc featurize")(h32Long.count())
    for (i <- 1 to 2) {
      t(s"longdoc minhash #$i")(h32Long.select(
        ArrayExprs.minhash_sig(col("h32"), Dedup.permA.take(1024),
          Dedup.permB.take(1024), Dedup.P32).as("sig"))
        .select(sum(size(col("sig")))).collect())
      t(s"longdoc oph #$i")(h32Long.select(
        ArrayExprs.oph_sig(col("h32"), 1024, Dedup.permA(0), Dedup.permB(0),
          Dedup.P32, Dedup.DensifyC).as("sig"))
        .select(sum(size(col("sig")))).collect())
    }
    val cClassic = t("cands classic")(candidates(
      ArrayExprs.minhash_sig(col("h32"), Dedup.permA.take(1024),
        Dedup.permB.take(1024), Dedup.P32)))
    val cOph = t("cands oph")(candidates(
      ArrayExprs.oph_sig(col("h32"), 1024, Dedup.permA(0), Dedup.permB(0),
        Dedup.P32, Dedup.DensifyC)))
    println(s"candidates classic=$cClassic oph=$cOph")
    spark.stop()
  }
}
