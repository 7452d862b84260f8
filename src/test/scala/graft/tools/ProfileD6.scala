package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFns._

/** Dev profiling main for the d6 repeated-spans stages (not API). */
object ProfileD6 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val width = 50
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config(Tables.NanosConf._1, Tables.NanosConf._2)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.graft.ArrayExprs
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    t("warmup")(spark.read.parquet(dir + "/documents.parquet").count())
    val h = Tables.documents(spark, dir)
      .select(col("doc_id"), normalize(col("text")).as("nrm"))
      .filter(length(col("nrm")) >= width)
      .select(col("doc_id"), col("nrm"),
        ArrayExprs.char_gram_hashes(col("nrm"), width).as("hs")).cache()
    t("featurize")(h.count())
    val hot = h.select(explode(col("hs")).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c")).filter(col("c") >= 2)
      .select(col("g")).cache()
    t("hot hashes")(hot.count())
    val candDocs = h.select(col("doc_id"), col("nrm"), explode(col("hs")).as("g"))
      .join(hot, "g")
      .select(col("doc_id"), col("nrm")).distinct().cache()
    t("candidate docs")(candDocs.count())
    val out = candDocs
      .select(col("doc_id"), explode(array_distinct(
        transform(sequence(lit(1), length(col("nrm")) - (width - 1)),
          i => col("nrm").substr(i, lit(width))))).as("span"))
      .groupBy(col("span"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .filter(col("n_docs") >= 2)
    t("span verify+agg")(out.count())
    spark.stop()
  }
}
