package graft.tools
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Joins

/** Dev measurement main for skewed-join mitigation (not part of the
  * API): on the skewed events variant (graft.bench.GenScale.buildSkewedEvents —
  * one hot user owns 20% of the fact table), joins events ⋈ users and
  * measures three strategies under forced shuffle-join conditions
  * (auto-broadcast OFF, the 100-TB regime where the dim doesn't fit
  * an executor):
  *
  *   plain/noaqe — sort-merge join, AQE disabled: the hot key's rows
  *                 land on ONE reducer; its task is the straggler.
  *   plain/aqe   — AQE skew-join enabled with thresholds lowered to
  *                 this corpus' scale (the default 256 MB gate is
  *                 sized for real clusters): runtime partition split.
  *   salted      — Joins.saltedJoin (narrow deterministic salt), AQE
  *                 disabled: the compile-time mitigation for when AQE
  *                 can't see the skew (e.g. the skewed side is
  *                 mid-pipeline, not a shuffle AQE can re-plan).
  *
  * At local-mode corpus sizes the straggler costs a fraction of a
  * second of wall-clock, so the headline metric is the per-task time
  * DISTRIBUTION (max/p50 over the run's tasks, captured by listener):
  * on a cluster the max task IS the stage time — a 32-thread local
  * run hides the straggler behind 31 idle-at-the-end threads. A
  * warmup pass runs every variant once first (codegen dominates cold
  * runs); medians of `runs` after that. Every variant computes the
  * same segment-level aggregate with integer-cent sums
  * (order-independent), asserted IDENTICAL — a variant that wins by
  * dropping rows is a bug, not a win. Results in SURVEY.md §6.
  */
object TrySkew {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(100)
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val salt = args.lift(3).map(_.toInt).getOrElse(32)
    val outDir = s"/root/repo/.data/skew$replicas"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosConf._1, Tables.NanosConf._2)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.bench.GenScale.buildSkewedEvents(spark, srcDir, outDir, replicas)

    val events = spark.read.parquet(s"$outDir/events.parquet")
    val users = spark.read.parquet(s"$outDir/users.parquet")
    val nHot = events.filter(col("user_id") === graft.bench.GenScale.HotUser).count()
    val nAll = events.count()
    println(f"[skew] events=$nAll hot=$nHot (${100.0 * nHot / nAll}%.1f%%), users=${users.count()}")

    val taskMs = ArrayBuffer[Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        taskMs.synchronized { taskMs += t.taskInfo.duration }
    })

    // order-independent check aggregate: integer cents, exact sums
    def agg(joined: DataFrame): Array[(Int, Long, Long)] = joined
      .groupBy("segment")
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)

    def withConf[A](conf: Map[String, String])(body: => A): A = {
      val prev = conf.keys.map(k => k -> spark.conf.get(k)).toMap
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
    }

    def timed(label: String, conf: Map[String, String])(
        run: () => Array[(Int, Long, Long)]): (Double, Array[(Int, Long, Long)]) =
      withConf(conf) {
        run() // warmup: codegen + page cache, not measured
        var result: Array[(Int, Long, Long)] = Array.empty
        var dist = ""
        val times = (0 until runs).map { _ =>
          taskMs.synchronized(taskMs.clear())
          val t0 = System.nanoTime()
          result = run()
          val dt = (System.nanoTime() - t0) / 1e9
          Thread.sleep(300) // listener bus drains async
          val ts = taskMs.synchronized(taskMs.toArray.sorted)
          if (ts.nonEmpty) dist =
            f"task p50=${ts(ts.length / 2)}%d ms max=${ts.last}%d ms (${ts.length}%d tasks)"
          dt
        }.sorted
        val t = times(times.length / 2)
        println(f"$label%-12s $t%6.2f s  (${times.map(x => f"$x%.2f").mkString(", ")})  $dist")
        (t, result)
      }

    val noBroadcast = Map("spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val aqeOff = noBroadcast + ("spark.sql.adaptive.enabled" -> "false")
    val aqeSkew = noBroadcast ++ Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // default gates (256 MB / 5x median) are sized for real
      // clusters; scale them to this corpus so the optimization fires
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8m",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4m")

    val (tPlain, rPlain) = timed("plain/noaqe", aqeOff)(() => agg(events.join(users, Seq("user_id"))))
    val (tAqe, rAqe) = timed("plain/aqe", aqeSkew)(() => agg(events.join(users, Seq("user_id"))))
    val (tSalt, rSalt) = timed("salted", aqeOff)(() =>
      agg(Joins.saltedJoin(events, users, "user_id", salt, saltCols = Seq("event_id"))))

    require(rPlain.sameElements(rAqe) && rPlain.sameElements(rSalt),
      "variant results differ — mitigation changed the join semantics")
    println(f"[skew] identical results; wall speedup salted=${tPlain / tSalt}%.2fx aqe=${tPlain / tAqe}%.2fx")
    spark.stop()
  }
}
