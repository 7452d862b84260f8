package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{Tables, SparkEntry}
import graft.operators.Ann

/** Dev utility: print s2 sketch-LSH recall vs s1 and candidate
  * fraction at the given sf dirs (the numbers quoted in Ann.lshTopK's
  * Scaladoc and SURVEY.md).
  */
object TuneS2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config(Tables.NanosConf._1, Tables.NanosConf._2)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.1")) {
      val exact = Ann.bruteForceTopK(spark, dir)
        .select("q_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val approx = Ann.lshTopK(spark, dir)
        .select("q_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (exact & approx).size.toDouble / exact.size
      val n = Tables.embeddings(spark, dir).count()
      val frac = Ann.sketchCandidates(spark, dir).count().toDouble / (20.0 * n)
      println(f"$dir: recall=$recall%.3f candidate_fraction=$frac%.4f n=$n")
    }
    spark.stop()
  }
}
