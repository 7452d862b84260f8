package graft.tools

import org.apache.spark.sql.SparkSession

/** Measurement harness: where does s5 (IVF-PQ) spend its time at a
  * given sf? Separates index build from repeated query cost — the
  * bench's per-run number should approach the query-only cost after
  * the first run's build. Run:
  * `sbt "runMain graft.tools.TryIvfPq /root/testdata/sf0.01"`.
  */
object TryIvfPq {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .master("local[16]").config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.Tables.NanosConf._1, graft.Tables.NanosConf._2)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"$label%-30s ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    val idx = java.nio.file.Files.createTempDirectory("ivfpq").toString
    t("build")(graft.operators.Ann.buildIvfPqIndex(spark, dir, idx))
    graft.Caches.clear()
    for (i <- 1 to 3)
      t(s"query$i") {
        graft.operators.Ann.ivfPqTopKIndexed(spark, dir, idx).collect()
        graft.Caches.clear()
      }
    spark.stop()
  }
}
