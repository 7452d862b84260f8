package graft.tools
import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}

/** Dev probe: run a query once and print the FINAL (post-AQE)
  * executed plan — the view that shows which exchanges/sorts actually
  * ran, unlike the static explain. Usage:
  * Test/runMain graft.tools.ExecPlanProbe <query> <dir>
  */
object ExecPlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("d4_ngram_jaccard")
    val dir = args.lift(1).getOrElse("/root/repo/.data/sf10")
    val spark = SparkSession.builder()
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosConf._1, Tables.NanosConf._2)
      .config("spark.sql.debug.maxToStringFields", "2000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, dir)
    val n = df.count()
    println(s"[execplan] $name rows=$n")
    // final plan, exchanges/sorts/joins only — compact enough to read
    val txt = df.queryExecution.executedPlan.toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"/tmp/execplan_$name.txt"), txt)
    txt.linesIterator.zipWithIndex.foreach { case (l, i) =>
      if (l.contains("Exchange") || l.contains("Sort ") ||
          l.contains("Join") || l.contains("InMemory") ||
          l.contains("Window") || l.contains("Scan parquet"))
        println(f"$i%4d $l")
    }
    spark.stop()
  }
}
