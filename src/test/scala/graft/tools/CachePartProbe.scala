package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: does a cached repartition+sortWithinPartitions frame
  * satisfy a downstream join's distribution/ordering (no Exchange/Sort
  * above the InMemoryTableScan), and under which value of
  * spark.sql.optimizer.canChangeCachedPlanOutputPartitioning?
  */
object CachePartProbe {
  def main(args: Array[String]): Unit = {
    val flag = args.headOption.getOrElse("false")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", flag)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(0, 100000)
      .select(col("id"), pmod(col("id"), lit(977)).as("k"))
      .repartition(col("k")).sortWithinPartitions("k")
      .cache()
    df.count()
    val j = df.as("x").join(df.as("y"),
      col("x.k") === col("y.k") && col("x.id") < col("y.id"))
    val plan = j.queryExecution.executedPlan.toString
    val nEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    val nSort = raw"\+\- Sort ".r.findAllIn(plan).size
    println(s"[cacheprobe] flag=$flag exchanges=$nEx sorts=$nSort")
    println(plan.linesIterator.take(25).mkString("\n"))
    spark.stop()
  }
}
