package graft.tools
import org.apache.spark.sql.SparkSession
import graft.{Tables}
import graft.operators.Ann
object TryIvf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosConf._1, Tables.NanosConf._2)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val r = Ann.ivfTopK(spark, "/root/testdata/sf0.001")
      r.show(5)
      println("ROWS " + r.count())
    } catch { case e: Throwable =>
      var c: Throwable = e
      while (c != null) { println("CAUSE: " + c.getClass + ": " + String.valueOf(c.getMessage).take(400)); c = c.getCause }
    }
    spark.stop()
  }
}
