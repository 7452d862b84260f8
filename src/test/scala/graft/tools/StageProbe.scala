package graft.tools
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import graft.Tables

/** Dev profiling main (not part of the API): runs one named driver
  * query against a data dir with a stage-metrics listener and prints
  * every stage's wall time, task count, shuffle read/write and
  * memory/disk spill — the view that locates an I/O-bound stage that
  * per-stage wall-clock timing (ProfileD4-style) can't separate from
  * CPU. Usage: runMain graft.tools.StageProbe <query> <dir>.
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("d4_ngram_jaccard")
    val dir = args.lift(1).getOrElse("/root/repo/.data/sf10")
    val spark = SparkSession.builder()
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosConf._1, Tables.NanosConf._2)
      // A/B dials for probing scheduler/optimizer overhead on a query
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_PARFIRST", "true"))
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_PROBE_INITPART", "32"))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class St(id: Int, nm: String, ms: Long, tasks: Int,
      shRead: Long, shWrite: Long, memSpill: Long, diskSpill: Long,
      input: Long, cpuMs: Long, submitted: Long = 0L, completed: Long = 0L)
    val stages = ArrayBuffer[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        stages.synchronized { stages += St(si.stageId,
          si.name.take(40), si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          si.numTasks, m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten,
          m.memoryBytesSpilled, m.diskBytesSpilled, m.inputMetrics.bytesRead,
          m.executorCpuTime / 1000000,
          si.submissionTime.getOrElse(0L), si.completionTime.getOrElse(0L)) }
      }
    })

    // runs > 1: later runs are JIT/codegen-warm — the stage table
    // resets per run, so the LAST run's stages print (the view
    // comparable to a Bench median, where run 1 absorbs warmup)
    val nRuns = args.lift(2).map(_.toInt).getOrElse(1)
    var n = 0L
    var wall = 0.0
    for (r <- 1 to nRuns) {
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val tBuilt = System.nanoTime()
      n = df.count()
      wall = (System.nanoTime() - t0) / 1e9
      graft.Caches.clear()
      println(f"[stageprobe] $name run $r/$nRuns rows=$n wall=$wall%.1f s " +
        f"(construct+analyze=${(tBuilt - t0) / 1e9}%.2f s, " +
        f"execute=${(System.nanoTime() - tBuilt) / 1e9}%.2f s)")
    }
    Thread.sleep(500)
    val gb = 1024.0 * 1024 * 1024
    val all = stages.synchronized(stages.sortBy(-_.ms).toSeq)
    println(f"[stageprobe] last run: ${all.size} stages, " +
      f"sum-of-stage-wall=${all.map(_.ms).sum / 1000.0}%.1f s, " +
      f"sum-cpu=${all.map(_.cpuMs).sum / 1000.0}%.1f s")
    all.take(15).foreach { s =>
      println(f"stage ${s.id}%4d ${s.ms / 1000.0}%7.1f s tasks=${s.tasks}%3d " +
        f"cpu=${s.cpuMs / 1000.0}%7.1f s in=${s.input / gb}%6.2f GB " +
        f"shR=${s.shRead / gb}%6.2f shW=${s.shWrite / gb}%6.2f " +
        f"spillM=${s.memSpill / gb}%6.2f spillD=${s.diskSpill / gb}%6.2f GB  ${s.nm}")
    }
    // timeline view: stages in submission order, with the idle gap
    // since the previous stage's completion — locates DRIVER-side
    // time (planning, AQE re-optimization, broadcast waits) that
    // per-stage metrics can't see
    val tl = stages.synchronized(stages.sortBy(_.submitted).toSeq)
    if (tl.nonEmpty) {
      val t00 = tl.head.submitted
      var prevEnd = t00
      println("[stageprobe] timeline (submission order):")
      tl.foreach { s =>
        val gap = s.submitted - prevEnd
        println(f"  +${(s.submitted - t00) / 1000.0}%6.2f s gap=${gap / 1000.0}%5.2f " +
          f"dur=${s.ms / 1000.0}%5.2f tasks=${s.tasks}%3d  ${s.nm}")
        prevEnd = math.max(prevEnd, s.completed)
      }
    }
    spark.stop()
  }
}
