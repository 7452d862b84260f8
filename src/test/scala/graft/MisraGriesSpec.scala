package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.{MisraGries, MisraGriesBuffer}
import graft.functions.TextFns._
import graft.operators.TextAnalysis

class MisraGriesSpec extends SparkSpec {

  private def utf8(s: String) = UTF8String.fromString(s)

  test("mg buffer: exact when width exceeds distinct count") {
    val b = new MisraGriesBuffer(64)
    val stream = Seq("a", "b", "a", "c", "a", "b")
    stream.foreach(t => b.add(utf8(t), 1L))
    assert(b.n == 6)
    assert(b.counts.get(utf8("a")) == 3L)
    assert(b.counts.get(utf8("b")) == 2L)
    assert(b.counts.get(utf8("c")) == 1L)
  }

  test("mg buffer: no-miss guarantee on adversarial streams (counter >= true - n/(width+1))") {
    // heavy term among a churn of unique fillers — the stream shape
    // that forces maximal decrements
    val rnd = new scala.util.Random(42)
    for (width <- Seq(8, 32, 128)) {
      val b = new MisraGriesBuffer(width)
      val trueCounts = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
      var i = 0
      while (i < 20000) {
        val t = if (rnd.nextInt(10) == 0) "heavy" else s"u${rnd.nextInt(5000)}"
        trueCounts(t) += 1
        b.add(utf8(t), 1L)
        i += 1
      }
      val bound = b.n / (width + 1)
      trueCounts.foreach { case (t, c) =>
        val est = if (b.counts.containsKey(utf8(t))) b.counts.get(utf8(t)) else 0L
        assert(est <= c, s"MG must never overcount: $t est=$est true=$c")
        assert(est >= c - bound, s"width=$width $t est=$est true=$c bound=$bound")
      }
      assert(b.counts.containsKey(utf8("heavy")), s"width=$width lost the heavy hitter")
      assert(b.counts.size <= width)
    }
  }

  test("mg buffer: merge preserves totals and the mergeable-summaries bound") {
    val rnd = new scala.util.Random(7)
    val stream = (0 until 30000).map { _ =>
      if (rnd.nextInt(20) == 0) "hh" else s"x${rnd.nextInt(3000)}"
    }
    val trueCounts = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(2, 7)) {
      val merged = stream.grouped((stream.size + parts - 1) / parts).toSeq
        .map { chunk =>
          val b = new MisraGriesBuffer(64)
          chunk.foreach(t => b.add(utf8(t), 1L))
          b
        }
        .reduce { (a, b) => a.mergeFrom(b); a }
      assert(merged.n == stream.size.toLong)
      val bound = merged.n / 65
      trueCounts.foreach { case (t, c) =>
        val est = if (merged.counts.containsKey(utf8(t))) merged.counts.get(utf8(t)) else 0L
        assert(est <= c && est >= c - bound, s"parts=$parts $t est=$est true=$c")
      }
      assert(merged.counts.containsKey(utf8("hh")))
    }
  }

  test("mg_sketch aggregate: n and surviving counters match a driver-side MG over the same rows") {
    import spark.implicits._
    val terms = (0 until 5000).map(i => s"t${i % 37}") ++ Seq.fill(500)("dom")
    val df = terms.toDF("w").repartition(8)
    val row = df.agg(MisraGries.mg_sketch(col("w"), 64).as("mg"))
      .select(col("mg.n"), col("mg.entries")).collect()(0)
    assert(row.getLong(0) == terms.size.toLong)
    // width 64 > 38 distinct terms: the sketch is exact regardless of
    // partitioning/merge order
    val entries = row.getSeq[org.apache.spark.sql.Row](1)
      .map(e => e.getString(0) -> e.getLong(1)).toMap
    val exact = terms.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(entries == exact)
  }

  test("t8: two-pass heavy hitters equal the exact groupBy result") {
    val exact = Tables.documents(spark, Sf)
      .select(explode(words(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(Tables.documents(spark, Sf)
        .select(explode(words(col("text"))).as("w")).agg(count(lit(1)).as("n"))))
      .filter(col("cnt") * 256 >= col("n"))
      .select(col("w").as("term"), col("cnt"))
      .collect().map(_.toSeq).toSet
    val got = TextAnalysis.heavyHitters(spark, Sf).collect()
    assert(got.map(_.toSeq).toSet == exact && got.nonEmpty)
    // presentation order: cnt desc, term asc
    val pairs = got.map(r => (r.getLong(1), r.getString(0)))
    assert(pairs.sameElements(pairs.sortBy { case (c, t) => (-c, t) }))
  }
}
