package graft

import org.apache.spark.sql.functions._
import graft.operators.Joins

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join is row-identical to the plain join on skewed data") {
    // 10k rows of hot key 0 + uniform tail
    val skewed = (Seq.fill(10000)(0L) ++ (1L to 500L)).toDF("k")
      .withColumn("v", monotonically_increasing_id())
    val small = (0L to 500L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain  = skewed.join(small, "k").select("k", "v", "name")
    val salted = Joins.saltedJoin(skewed, small, "k").select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("q69: AQE skew split marks the PLAIN join under lowered thresholds; results match the salted form") {
    // the AQE alternative to q69's salted path: same skewed frame,
    // plain shuffle join, skew thresholds lowered to fixture scale —
    // OptimizeSkewedJoin must mark the join (skew=true) and the
    // result must equal the salted execution (both equal the oracle)
    // thresholds scaled to the fixture corpus; the fact repartitions
    // to 16 map tasks first — AQE splits a skewed REDUCE partition at
    // map-output-block granularity, so a single-file fixture scan
    // (one mapper) is structurally unsplittable however skewed the
    // key is. At 100 TB the mapper count is never the binding side.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1k",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1k",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")
    val prev = confs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).getOrElse(null) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = graft.operators.Relational.skewedFact(spark, Sf)
      val dim = graft.operators.Relational.skewedDim(spark, Sf)
      val plain = fact.repartition(16, col("l_orderkey")).join(dim, "sk")
        .groupBy(col("nk")).agg(sum(col("cents")).as("revenue_cents"),
          count(lit(1)).as("n_lines"))
      plain.collect() // materialize so AQE finalizes the plan
      val executed = plain.queryExecution.executedPlan.toString
      assert(executed.contains("skew=true"),
        s"AQE skew split did not fire:\n$executed")
      val salted = graft.operators.Relational.q69SkewJoin(spark, Sf)
        .select(col("nation_key").as("nk"), col("revenue_cents"), col("n_lines"))
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    } finally prev.foreach { case (k, v) =>
      if (v == null) spark.conf.unset(k) else spark.conf.set(k, v) }
  }

  test("bucketed tables join without a shuffle") {
    val li = Tables.lineitem(spark, Sf).select("l_orderkey", "l_quantity")
    val o  = Tables.orders(spark, Sf).select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    Joins.writeBucketed(li, "li_b", "l_orderkey", 8)
    Joins.writeBucketed(o, "o_b", "l_orderkey", 8)
    val j = spark.table("li_b").join(spark.table("o_b"), "l_orderkey")
      .groupBy("l_orderkey").agg(sum("l_quantity"))
    // force the sort-merge path so bucketing (not a broadcast) carries it
    val noBroadcast = spark.table("li_b").hint("merge").join(spark.table("o_b"), "l_orderkey")
    val plan = noBroadcast.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
    assert(j.count() > 0)
  }
}
