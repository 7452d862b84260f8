package graft.tools
import org.apache.spark.sql.SparkSession
import graft.Tables
import graft.operators.Dedup

/** Dev measurement main for the d4 OPH experiment (not part of the
  * API): runs the banded pipeline with the classic 1024-permutation
  * MinHash signature and with the one-permutation (OPH + rotation
  * densification) signature on the same corpus, compares the verified
  * output pair sets (both verify exact Jaccard, so equal outputs ==
  * equal candidate coverage at the threshold), and prints per-variant
  * wall times (median of `runs`).
  */
object TryOph {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosConf._1, Tables.NanosConf._2)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(dir + "/documents.parquet").count()

    def timed(oph: Boolean): (Double, Set[(Long, Long, Double)]) = {
      var result = Set.empty[(Long, Long, Double)]
      val times = (0 until runs).map { _ =>
        val t0 = System.nanoTime()
        result = Dedup.ngramJaccard(spark, dir, oph = oph).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        val dt = (System.nanoTime() - t0) / 1e9
        graft.Caches.clear()
        dt
      }.sorted
      (times(times.length / 2), result)
    }

    val (tClassic, classic) = timed(oph = false)
    val (tOph, oph) = timed(oph = true)
    val missing = classic -- oph
    val extra = oph -- classic
    println(f"classic: $tClassic%.2f s  ${classic.size} pairs")
    println(f"oph:     $tOph%.2f s  ${oph.size} pairs")
    println(s"missing_vs_classic: ${missing.size}  extra_vs_classic: ${extra.size}")
    if (missing.nonEmpty) println(s"sample missing: ${missing.take(5)}")
    spark.stop()
  }
}
