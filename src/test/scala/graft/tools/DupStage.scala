package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dev stage-timing for d8 (not part of the API): pair generation vs
  * connected-components cost, warm second run for the bench-relevant
  * number. Numbers quoted in the dupClusters/connectedComponents
  * Scaladoc.
  */
object DupStage {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.Tables.NanosConf._1, graft.Tables.NanosConf._2)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-20s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    t("warmup")(spark.read.parquet(dir + "/documents.parquet").count())
    val pairs = t("d2 pairs")(graft.Caches.track(
      Dedup.minhashLsh(spark, dir).select(col("id_a"), col("id_b"))))
    println(s"pairs: ${t("pairs count")(pairs.count())}")
    t("cc")(Dedup.connectedComponents(spark, pairs, 1).count())
    t("cc multi-part")(Dedup.connectedComponents(spark, pairs, 4).count())
    graft.Caches.clear()
    t("d8 cold")(Dedup.dupClusters(spark, dir).count())
    graft.Caches.clear()
    t("d8 warm")(Dedup.dupClusters(spark, dir).count())
    spark.stop()
  }
}
