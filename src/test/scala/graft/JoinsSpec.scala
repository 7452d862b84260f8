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
