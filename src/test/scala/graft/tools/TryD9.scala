package graft.tools
import org.apache.spark.sql.SparkSession
import graft.operators.Dedup

/** Dev: measure d9 semdedup recall vs d5 exact at a given sf. */
object TryD9 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config(graft.Tables.NanosConf._1, graft.Tables.NanosConf._2)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val th = args.lift(2).map(_.toDouble).getOrElse(0.4)
    val exact = Dedup.embedNearDup(spark, dir, threshold = th).select("id_a", "id_b", "cosine_e6")
    for (pa <- Seq(2, 3)) {
      val t0 = System.nanoTime()
      val sem = Dedup.semDedup(spark, dir, threshold = th, passign = pa, iters = args.lift(1).map(_.toInt).getOrElse(3)).select("id_a", "id_b", "cosine_e6")
      val hit = sem.join(exact, Seq("id_a", "id_b")).count()
      val ne = exact.count(); val ns = sem.count()
      println(f"passign=$pa sem=$ns exact=$ne hit=$hit recall=${hit.toDouble/ne}%.3f precision=${hit.toDouble/ns}%.3f  ${(System.nanoTime()-t0)/1e9}%.1f s")
      graft.Caches.clear()
    }
    spark.stop()
  }
}
