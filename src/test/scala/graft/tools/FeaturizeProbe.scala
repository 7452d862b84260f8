package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFns._
import org.apache.spark.sql.graft.ArrayExprs

/** Dev breakdown of d4's featurize stage cost (not part of the API). */
object FeaturizeProbe {
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
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    t("warmup")(spark.read.parquet(dir + "/documents.parquet").count())
    for (i <- 1 to 3) {
      t(s"scan only #$i")(Tables.documents(spark, dir).select(col("text")).count())
      t(s"scan+normalize #$i")(Tables.documents(spark, dir)
        .select(length(normalize(col("text"))).as("l")).agg(sum("l")).collect())
      t(s"scan+grams #$i")(Tables.documents(spark, dir)
        .select(ArrayExprs.char_gram_hashes(normalize(col("text")), 4).as("fh"))
        .select(sum(size(col("fh")))).collect())
      t(s"repart+grams #$i")(Tables.documents(spark, dir)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(ArrayExprs.char_gram_hashes(normalize(col("text")), 4).as("fh"))
        .select(sum(size(col("fh")))).collect())
    }
    spark.stop()
  }
}
