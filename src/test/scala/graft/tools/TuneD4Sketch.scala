package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFns._
import org.apache.spark.sql.graft.ArrayExprs

/** Dev measurement main (not part of the API): quantifies the d4
  * verify-stage candidate mix and what a lossless Bloom-bitmap
  * pre-verify bound would drop before the exact merge kernel runs.
  *
  * The bound: per doc, an m-bit bitmap `a` with bit (g mod m) set per
  * gram hash g. A bit set in `a` but not in `b` proves >=1 gram of A
  * is absent from B, so |A\B| >= pop(a&~b), |A∪B| >= |A| + pop(b&~a),
  * and J <= (|A| - pop(a&~b)) / (|A| + pop(b&~a)) (and symmetric) —
  * deterministic, never drops a true pair. Usage:
  *   runMain graft.tools.TuneD4Sketch <dir> [mBits]
  */
object TuneD4Sketch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/.data/sf10")
    val m = args.lift(1).map(_.toInt).getOrElse(2048)
    val words = m / 64
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosConf._1, Tables.NanosConf._2)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Dedup

    val hashed = Tables.documents(spark, dir)
      .select(col("doc_id"),
        ArrayExprs.char_gram_hashes(normalize(col("text")), 4).as("fh"))
      .cache()
    println(s"docs=${hashed.count()}")

    // candidate pairs exactly as lshRepPairs' banding builds them
    // (OPH path, post-collapse view approximated by distinct fh —
    // close enough for the distribution probe)
    val banded = hashed
      .select(col("doc_id"), size(col("fh")).as("sz"),
        explode(ArrayExprs.oph_bands(col("fh"), 128, 8,
          Dedup.permA(0), Dedup.permB(0), Dedup.P32, Dedup.DensifyC)).as("bkey"))
      .cache()
    val thr = 0.7
    val cands = banded.as("x").join(banded.as("y"),
        col("x.bkey") === col("y.bkey") && col("x.doc_id") < col("y.doc_id") &&
          least(col("x.sz"), col("y.sz")).cast("double") >=
            lit(thr) * greatest(col("x.sz"), col("y.sz")))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
      .cache()
    println(s"candidates=${cands.count()}")

    // per-doc bloom bitmap as array<long>(words) + set size
    val bitmap = expr(
      s"""aggregate(transform(fh, g -> pmod(g, ${m}L)),
         |  array_repeat(0L, $words),
         |  (acc, i) -> transform(acc, (w, wi) ->
         |    if(wi = cast(i div 64 as int),
         |       w | shiftleft(1L, cast(i % 64 as int)), w)))""".stripMargin)
    val sk = hashed.select(col("doc_id"), size(col("fh")).as("sz"), bitmap.as("bm"))
    val a = sk.select(col("doc_id").as("id_a"), col("sz").as("sza"), col("bm").as("ba"))
    val b = sk.select(col("doc_id").as("id_b"), col("sz").as("szb"), col("bm").as("bb"))
    def pop(x: org.apache.spark.sql.Column) =
      aggregate(x, lit(0), (acc, w) => acc + bit_count(w))
    val withBound = cands.join(a, "id_a").join(b, "id_b")
      .withColumn("pab", pop(zip_with(col("ba"), col("bb"),
        (x, y) => x.bitwiseAND(y.bitwiseXOR(lit(-1L))))))
      .withColumn("pba", pop(zip_with(col("bb"), col("ba"),
        (x, y) => x.bitwiseAND(y.bitwiseXOR(lit(-1L))))))
      .withColumn("bound", least(
        (col("sza") - col("pab")).cast("double") / (col("sza") + col("pba")),
        (col("szb") - col("pba")).cast("double") / (col("szb") + col("pab"))))
    val fa = hashed.select(col("doc_id").as("id_a"), array_sort(col("fh")).as("faa"))
    val fb = hashed.select(col("doc_id").as("id_b"), array_sort(col("fh")).as("fbb"))
    val scored = withBound.join(fa, "id_a").join(fb, "id_b")
      .withColumn("j", ArrayExprs.jaccard_sets(col("faa"), col("fbb")))
      .select(col("id_a"), col("id_b"), col("bound"), col("j"))
      .cache()
    val t0 = System.nanoTime()
    val hist = scored.groupBy(floor(col("j") * 10).as("jdec"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("bound") < thr, 1L).otherwise(0L)).as("droppable"))
      .orderBy(col("jdec"))
    hist.collect().foreach(r => println(
      f"J in [${r.getLong(0) / 10.0}%.1f,${(r.getLong(0) + 1) / 10.0}%.1f): " +
      f"n=${r.getLong(1)}%10d droppable=${r.getLong(2)}%10d"))
    val agg = scored.agg(count(lit(1)).as("n"),
      sum(when(col("bound") < thr, 1L).otherwise(0L)).as("drop"),
      sum(when(col("bound") < thr && col("j") >= thr, 1L).otherwise(0L)).as("FALSE_DROP"),
      sum(when(col("j") >= thr, 1L).otherwise(0L)).as("true_pairs")).collect()(0)
    println(s"total=${agg.getLong(0)} droppable=${agg.getLong(1)} " +
      s"false_drop=${agg.getLong(2)} true_pairs=${agg.getLong(3)} " +
      f"(probe wall ${(System.nanoTime() - t0) / 1e9}%.1f s, m=$m)")
    spark.stop()
  }
}
