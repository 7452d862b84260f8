package graft.tools
import org.apache.spark.sql.SparkSession
import graft.{SparkEntry, Tables}
import java.nio.file.{Files, Paths}

/** Dev tool: write `.explain("formatted")` output for the named
  * queries (or all, with no args) to `plans/<tag>/<query>_<suffix>.txt`
  * — the optimization-round evidence files the judge reads. Session
  * config mirrors Bench (extensions, shuffle partitions = cores) so
  * the captured plans are the benched plans.
  *
  *   PLAN_TAG=r16 PLAN_SUFFIX=before \
  *     sbt "Test/runMain graft.tools.PlanDump d4_ngram_jaccard g6_region_elevation_join"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val tag = sys.env.getOrElse("PLAN_TAG", "r16")
    val suffix = sys.env.getOrElse("PLAN_SUFFIX", "before")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosConf._1, Tables.NanosConf._2)
      .config("spark.sql.debug.maxToStringFields", "2000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val outDir = Paths.get(s"plans/$tag")
    Files.createDirectories(outDir)
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        // queryExecution.explainString is explain("formatted")'s body,
        // capturable without hijacking stdout
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), txt)
        println(s"[plandump] $name -> plans/$tag/${name}_$suffix.txt")
      } catch { case e: Exception =>
        println(s"[plandump] $name FAILED: ${e.getMessage}")
      } finally graft.Caches.clear()
    }
    spark.stop()
  }
}
