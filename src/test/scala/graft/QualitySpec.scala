package graft

import org.apache.spark.sql.functions._
import graft.operators.Quality
import graft.operators.Quality.Expectation

/** The DQ audit's one-scan contract: every expectation over a table
  * evaluates in a single aggregate, and misuse fails fast.
  */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("audit evaluates all expectations in ONE aggregate over one scan") {
    val df = Seq((1, 10.0), (2, -1.0), (3, 0.0)).toDF("id", "v")
    val out = Quality.audit("t", df, Seq(
      Expectation("v_positive", col("v") > 0),
      Expectation("id_range", col("id").between(1, 2))))
    // plan shape: exactly one Aggregate node — the per-expectation
    // rows come from exploding the single aggregate row, not from
    // unioning N copies of the aggregate subtree
    val aggs = out.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.size == 1, out.queryExecution.optimizedPlan.toString)
    val rows = out.orderBy("check").collect().map(_.toSeq)
    assert(rows.toSeq == Seq(
      Seq("t", "id_range", 1L, 3L, false),      // id=3 out of range
      Seq("t", "v_positive", 2L, 3L, false)))   // -1.0 and 0.0 violate
  }

  test("null predicate results count as violations") {
    val df = Seq[(Int, Option[Double])]((1, Some(1.0)), (2, None)).toDF("id", "v")
    val out = Quality.audit("t", df, Seq(Expectation("v_positive", col("v") > 0)))
      .collect().head
    assert(out.getLong(2) == 1L && !out.getBoolean(4))
  }

  test("empty expectations fail fast instead of throwing from reduce") {
    val df = Seq((1, 2)).toDF("a", "b")
    val err = intercept[IllegalArgumentException] {
      Quality.audit("t", df, Seq.empty)
    }
    assert(err.getMessage.contains("non-empty"))
  }
}
