package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFns._
import graft.operators.Dedup
import org.apache.spark.sql.graft.ArrayExprs

/** Dev measurement main for d4 candidate-join variants (not part of
  * the API): the candidate stage dominates d4's cost, so compare
  * (a) the shipped (band, bkey) self-join, (b) a bkey-only self-join
  * (the band index is already hashed into the key), and (c) one-
  * shuffle bucket grouping with in-bucket pair generation.
  */
object TuneD4 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosConf._1, Tables.NanosConf._2)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    t("warmup")(spark.read.parquet(dir + "/documents.parquet").count())
    val banded = Tables.documents(spark, dir).repartition(32)
      .select(col("doc_id"),
        ArrayExprs.char_gram_hashes(normalize(col("text")), 4).as("fh"))
      .select(col("doc_id"), size(col("fh")).as("sz"), Dedup.fold32(col("fh")).as("h32"))
      .select(col("doc_id"), col("sz"),
        ArrayExprs.oph_sig(col("h32"), 1024, Dedup.permA(0), Dedup.permB(0),
          Dedup.P32, Dedup.DensifyC).as("sig"))
      .select(col("doc_id"), col("sz"), posexplode(Dedup.bandKeys(col("sig"), 128, 8)))
      .select(col("doc_id"), col("sz"), col("pos").as("band"), col("col").as("bkey"))
      .cache()
    t("banded materialize")(banded.count())
    val thr = 0.7
    for (i <- 1 to 2) {
      val a = t(s"(band,bkey) self-join #$i")(banded.as("x").join(banded.as("y"),
          col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
            col("x.doc_id") < col("y.doc_id") &&
            least(col("x.sz"), col("y.sz")).cast("double") >=
              lit(thr) * greatest(col("x.sz"), col("y.sz")))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
        .distinct().count())
      val b = t(s"bkey-only self-join #$i")(banded.as("x").join(banded.as("y"),
          col("x.bkey") === col("y.bkey") && col("x.doc_id") < col("y.doc_id") &&
            least(col("x.sz"), col("y.sz")).cast("double") >=
              lit(thr) * greatest(col("x.sz"), col("y.sz")))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
        .distinct().count())
      val c = t(s"bucket groupBy #$i")(banded
        .groupBy(col("bkey")).agg(collect_list(struct(col("doc_id"), col("sz"))).as("ds"))
        .filter(size(col("ds")) > 1)
        .select(explode(flatten(transform(col("ds"), (x, ix) =>
          filter(transform(col("ds"), y => struct(x.getField("doc_id").as("id_a"),
              y.getField("doc_id").as("id_b"), x.getField("sz").as("sa"),
              y.getField("sz").as("sb"))),
            p => p.getField("id_a") < p.getField("id_b") &&
              least(p.getField("sa"), p.getField("sb")).cast("double") >=
                lit(thr) * greatest(p.getField("sa"), p.getField("sb")))))).as("p"))
        .select(col("p.id_a"), col("p.id_b")).distinct().count())
      println(s"counts: a=$a b=$b c=$c")
    }
    spark.stop()
  }
}
