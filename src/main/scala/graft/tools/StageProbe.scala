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
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class St(id: Int, nm: String, ms: Long, tasks: Int,
      shRead: Long, shWrite: Long, memSpill: Long, diskSpill: Long,
      input: Long, cpuMs: Long)
    val stages = ArrayBuffer[St]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        stages.synchronized { stages += St(si.stageId,
          si.name.take(40), si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          si.numTasks, m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten,
          m.memoryBytesSpilled, m.diskBytesSpilled, m.inputMetrics.bytesRead,
          m.executorCpuTime / 1000000) }
      }
    })

    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries(name)(spark, dir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"[stageprobe] $name rows=$n wall=$wall%.1f s")
    val gb = 1024.0 * 1024 * 1024
    stages.synchronized(stages.sortBy(-_.ms)).take(15).foreach { s =>
      println(f"stage ${s.id}%4d ${s.ms / 1000.0}%7.1f s tasks=${s.tasks}%3d " +
        f"cpu=${s.cpuMs / 1000.0}%7.1f s in=${s.input / gb}%6.2f GB " +
        f"shR=${s.shRead / gb}%6.2f shW=${s.shWrite / gb}%6.2f " +
        f"spillM=${s.memSpill / gb}%6.2f spillD=${s.diskSpill / gb}%6.2f GB  ${s.nm}")
    }
    spark.stop()
  }
}
