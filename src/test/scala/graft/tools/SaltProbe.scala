package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Dev measurement main (not part of the API): isolates WHY a salted
  * join can lose to the plain join it mitigates — the salt
  * expression's determinism decides whether Catalyst can still prune
  * the fact table's unused columns below the salting projection.
  * Compares salt variants on the skewed corpus (AQE off, broadcast
  * off), printing each plan's fact-scan ReadSchema width and the
  * end-to-end median. Findings drive Joins.saltedJoin's salt choice.
  */
object SaltProbe {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(100)
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val salt = 32
    val outDir = s"/root/repo/.data/skew$replicas"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosConf._1, Tables.NanosConf._2)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.bench.GenScale.buildSkewedEvents(spark, srcDir, outDir, replicas)
    val events = spark.read.parquet(s"$outDir/events.parquet")
    val users = spark.read.parquet(s"$outDir/users.parquet")

    def salted(saltExpr: org.apache.spark.sql.Column): DataFrame = {
      val l = events.withColumn("_salt", pmod(saltExpr, lit(salt)).cast("int"))
      val r = users.withColumn("_salt", explode(sequence(lit(0), lit(salt - 1))))
      l.join(r, Seq("user_id", "_salt")).drop("_salt")
    }

    def agg(j: DataFrame): DataFrame = j.groupBy("segment")
      .agg(count(lit(1)).as("n"), sum(round(col("value") * 100).cast("long")).as("cents"))

    def measure(label: String, j: DataFrame): Unit = {
      val a = agg(j)
      val scans = a.queryExecution.executedPlan.toString.linesIterator
        .filter(_.contains("ReadSchema")).map(_.replaceAll(".*ReadSchema: ", "").take(120))
      println(s"$label scans: ${scans.mkString(" | ")}")
      val times = (0 until runs).map { _ =>
        val t0 = System.nanoTime(); a.collect(); (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$label%-14s ${times(times.length / 2)}%6.2f s  (${times.map(x => f"$x%.2f").mkString(", ")})")
    }

    measure("plain", events.join(users, Seq("user_id")))
    measure("mono_id", salted(xxhash64(col("user_id"), monotonically_increasing_id())))
    measure("rand", salted((rand(42) * salt).cast("long")))
    measure("allcols", salted(xxhash64(events.columns.map(col).toIndexedSeq: _*)))
    measure("narrowhash", salted(xxhash64(col("user_id"), col("event_id"))))
    spark.stop()
  }
}
