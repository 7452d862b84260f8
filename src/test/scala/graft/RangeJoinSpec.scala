package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = Seq((1L, 5.0), (2L, 15.0), (3L, 25.0), (4L, 999.0), (5L, 10.0))
    .toDF("id", "p")
  private lazy val intervals = Seq(("a", 0.0, 10.0), ("b", 10.0, 20.0), ("c", 5.0, 25.0))
    .toDF("name", "lo", "hi")

  test("custom range join equals the nested-loop join, including overlaps and misses") {
    val custom = RangeJoin.pointInInterval(points, intervals, col("p"), col("lo"), col("hi"))
      .select("id", "name").as[(Long, String)].collect().toSet
    val bnl = points.join(intervals, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("id", "name").as[(Long, String)].collect().toSet
    assert(custom == bnl)
    assert(custom.contains((5L, "a")) && custom.contains((5L, "b")) && custom.contains((5L, "c")))
    assert(!custom.exists(_._1 == 4L)) // out of all intervals
  }

  test("null points and null bounds drop out like the nested-loop") {
    val p = Seq((1L, Some(5.0)), (2L, None)).toDF("id", "p")
    val iv = Seq(("a", Some(0.0), Some(10.0)), ("b", None, Some(10.0))).toDF("name", "lo", "hi")
    val custom = RangeJoin.pointInInterval(p, iv, col("p"), col("lo"), col("hi"))
      .select("id", "name").as[(Long, String)].collect().toSet
    val bnl = p.join(iv, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("id", "name").as[(Long, String)].collect().toSet
    assert(custom == bnl && custom == Set((1L, "a")))
  }

  test("the custom exec is planned (no BroadcastNestedLoopJoin)") {
    val df = RangeJoin.pointInInterval(points, intervals, col("p"), col("lo"), col("hi"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PointIntervalJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("interval side goes through a BroadcastExchange (limits, metrics, reuse)") {
    val df = RangeJoin.pointInInterval(points, intervals, col("p"), col("lo"), col("hi"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan)
  }

  test("oversized interval side falls over to the partitioned range join, same rows") {
    val prev = spark.conf.getOption(RangeJoin.MaxBuildBytesKey)
    spark.conf.set(RangeJoin.MaxBuildBytesKey, "1")
    try {
      val df = RangeJoin.pointInInterval(points, intervals, col("p"), col("lo"), col("hi"))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("PointIntervalJoin"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        plan) // the fallback is a bucket equi-join, never a nested loop
      val got = df.select("id", "name").as[(Long, String)].collect().toSet
      val bnl = points.join(intervals, col("p") >= col("lo") && col("p") <= col("hi"))
        .select("id", "name").as[(Long, String)].collect().toSet
      assert(got == bnl)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(RangeJoin.MaxBuildBytesKey, v)
        case None    => spark.conf.unset(RangeJoin.MaxBuildBytesKey)
      }
    }
  }

  test("partitioned range join equals the nested loop on randomized data, any buckets") {
    val rnd = new scala.util.Random(23)
    val pts = (1 to 300).map(i => (i.toLong, rnd.nextDouble() * 1000 - 200)).toDF("id", "p")
    val ivs = (1 to 150).map { i =>
      val a = rnd.nextDouble() * 1000 - 250
      (s"iv$i", a, a + rnd.nextDouble() * 120) // narrow and wide bands, some out of range
    }.toDF("name", "lo", "hi")
    val exp = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("id", "name").as[(Long, String)].collect().toSet
    for (b <- Seq(1, 7, 64)) {
      val got = RangeJoin.pointInIntervalPartitioned(pts, ivs,
          col("p"), col("lo"), col("hi"), buckets = b)
        .select("id", "name").as[(Long, String)].collect().toSet
      assert(got == exp, s"buckets=$b")
    }
    // null handling matches the nested loop
    val np = Seq((1L, Some(5.0)), (2L, None)).toDF("id", "p")
    val ni = Seq(("a", Some(0.0), Some(10.0)), ("b", None, Some(10.0))).toDF("name", "lo", "hi")
    val got = RangeJoin.pointInIntervalPartitioned(np, ni, col("p"), col("lo"), col("hi"))
      .select("id", "name").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a")))
  }

  test("q20 matches the plain non-equi join on real data") {
    val got = graft.operators.Relational.q20RangeJoin(spark, Sf).collect()
    val bands = Tables.nation(spark, Sf).select(col("n_name"),
      (col("n_nationkey") * lit(20.0)).as("lo"),
      (col("n_nationkey") * lit(20.0) + lit(19.99)).as("hi"))
    val exp = Tables.events(spark, Sf)
      .join(bands, col("value") >= col("lo") && col("value") <= col("hi"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .orderBy(col("n_name")).collect()
    assert(got.map(_.toSeq).toSeq == exp.map(_.toSeq).toSeq)
  }
}
