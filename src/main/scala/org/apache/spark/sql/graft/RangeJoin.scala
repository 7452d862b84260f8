package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.classic.{Dataset, ExpressionUtils}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Custom whole-operator implementation of a broadcast
  * point-in-interval join (SURVEY.md §4 tier (c): LogicalPlan +
  * Strategy + SparkPlan, registered through GraftExtensions).
  *
  * `left JOIN right ON lo <= point AND point <= hi` is a non-equi
  * join, which vanilla Spark can only plan as a nested-loop scanning
  * every interval for every probe row. This operator collects the
  * (dim-sized) interval side once, sorts it by `lo` with a running
  * max-of-`hi` prefix (a flattened interval tree), broadcasts it, and
  * probes each left row in O(log n + matches): binary-search the last
  * interval with lo <= p, then walk back while the prefix max-hi can
  * still cover p. Inner-join semantics; null points/bounds produce no
  * match — exactly the nested-loop's behavior (asserted in
  * RangeJoinSpec).
  */
object RangeJoin {

  /** Public API: inner-join `left` to `right` on
    * `right.lo <= left.point <= right.hi` (all compared as doubles).
    */
  def pointInInterval(left: DataFrame, right: DataFrame,
      point: Column, lo: Column, hi: Column): DataFrame = {
    val spark = left.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // spark.expression converts the Column's node tree into a real
    // catalyst Expression (UnresolvedAttribute leaves); the analyzer
    // then resolves them against this node's children like any join
    // condition.
    val plan = PointIntervalJoin(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      spark.expression(point.cast("double")),
      spark.expression(lo.cast("double")),
      spark.expression(hi.cast("double")))
    Dataset.ofRows(spark, plan)
  }
}

case class PointIntervalJoin(left: LogicalPlan, right: LogicalPlan,
    point: Expression, lo: Expression, hi: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): PointIntervalJoin =
    copy(left = l, right = r)
}

object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PointIntervalJoin(l, r, p, lo, hi) =>
      PointIntervalJoinExec(planLater(l), planLater(r), p, lo, hi) :: Nil
    case _ => Nil
  }
}

case class PointIntervalJoinExec(left: SparkPlan, right: SparkPlan,
    point: Expression, lo: Expression, hi: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  protected override def doExecute(): RDD[InternalRow] = {
    // build side: evaluate + sort intervals once on the driver (the
    // interval side is dim-sized, like a broadcast-hash build side)
    val loB = BindReferences.bindReference(lo, right.output)
    val hiB = BindReferences.bindReference(hi, right.output)
    val intervals = right.executeCollect().flatMap { row =>
      val l = loB.eval(row)
      val h = hiB.eval(row)
      if (l == null || h == null) None
      else Some((l.asInstanceOf[Double], h.asInstanceOf[Double], row.copy()))
    }.sortBy(_._1)
    val los = intervals.map(_._1)
    val maxHiPrefix = new Array[Double](intervals.length)
    var runMax = Double.NegativeInfinity
    var i = 0
    while (i < intervals.length) {
      runMax = math.max(runMax, intervals(i)._2)
      maxHiPrefix(i) = runMax
      i += 1
    }
    val bc = sparkContext.broadcast((intervals, los, maxHiPrefix))

    val pointExpr  = point
    val leftOutput = left.output
    val allOutput  = output
    left.execute().mapPartitionsInternal { iter =>
      val (ivs, loArr, maxHi) = bc.value
      val pB     = BindReferences.bindReference(pointExpr, leftOutput)
      val joined = new JoinedRow
      val proj   = UnsafeProjection.create(allOutput, allOutput)
      iter.flatMap { lrow =>
        val pv = pB.eval(lrow)
        if (pv == null || ivs.isEmpty) Iterator.empty
        else {
          val p = pv.asInstanceOf[Double]
          // last index with lo <= p
          var lb = 0; var ub = loArr.length
          while (lb < ub) {
            val mid = (lb + ub) >>> 1
            if (loArr(mid) <= p) lb = mid + 1 else ub = mid
          }
          var idx = lb - 1
          val out = Seq.newBuilder[InternalRow]
          while (idx >= 0 && maxHi(idx) >= p) {
            val (_, h, rrow) = ivs(idx)
            if (h >= p) out += proj(joined(lrow, rrow)).copy()
            idx -= 1
          }
          out.result().iterator
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): PointIntervalJoinExec =
    copy(left = l, right = r)
}
