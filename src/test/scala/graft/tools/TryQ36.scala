package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Dev A/B (not part of the API): quantifies q36's sharded two-pass
  * prefix against the naive global running window on a replicated
  * events corpus. The GenScale proxies carry no events table, so this
  * probe builds its own: sf0.1 events replicated `R` times with
  * disjoint user ranges and day-shifted timestamps (each replica is a
  * plausible extra week of traffic; session structure per user is
  * preserved, so the delta volume scales exactly ×R).
  *
  * The naive form IS q36 with one shard (`shardSec` past the data's
  * time span ⇒ a single window partition = the classic global ORDER
  * BY running sum); identical results are asserted before timing.
  * Usage: runMain graft.tools.TryQ36 [replicas] [runs]
  */
object TryQ36 {
  def main(args: Array[String]): Unit = {
    val replicas = args.headOption.map(_.toInt).getOrElse(10)
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosConf._1, Tables.NanosConf._2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = s"/tmp/graft_q36_scale_x$replicas"
    if (!new java.io.File(s"$out/events.parquet/_SUCCESS").exists) {
      val base = Tables.events(spark, "/root/testdata/sf0.1")
      val reps = (0 until replicas).map { k =>
        base.select(
          (col("event_id") + lit(k * 100000000L)).as("event_id"),
          (col("ts") + expr(s"INTERVAL ${k * 7} DAYS")).as("ts"),
          (col("user_id") + lit(k * 10000000L)).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }.reduce(_ unionByName _)
      reps.write.mode("overwrite").parquet(s"$out/events.parquet")
    }

    def run(shardSec: Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = graft.operators.Relational.q36Concurrency(spark, out, shardSec).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // identity first
    val a = graft.operators.Relational.q36Concurrency(spark, out).collect().toSeq
    val b = graft.operators.Relational
      .q36Concurrency(spark, out, shardSec = 1000000000000L).collect().toSeq
    require(a.map(_.toSeq) == b.map(_.toSeq), "sharded != naive")
    println(s"[q36probe] identity OK, ${a.length} hourly rows, events x$replicas")
    for (r <- 1 to runs) {
      val (ts, _) = run(86400L)
      val (tn, _) = run(1000000000000L)
      println(f"[q36probe] run $r: sharded(86400s) $ts%.2f s   naive(global) $tn%.2f s")
    }
    spark.stop()
  }
}
