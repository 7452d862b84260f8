package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, UnspecifiedDistribution}
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Custom whole-operator implementation of a broadcast
  * point-in-interval join (SURVEY.md §4 tier (c): LogicalPlan +
  * Strategy + SparkPlan, registered through GraftExtensions).
  *
  * `left JOIN right ON lo <= point AND point <= hi` is a non-equi
  * join, which vanilla Spark can only plan as a nested-loop scanning
  * every interval for every probe row. This operator broadcasts the
  * (dim-sized) interval side through a regular `BroadcastExchange`
  * (so the exchange is reused across plan subtrees, carries metrics,
  * and enforces Spark's broadcast size limits with a clear error
  * instead of silently OOMing the driver), sorts it by `lo` with a
  * running max-of-`hi` prefix (a flattened interval tree), and probes
  * each left row in O(log n + matches): binary-search the last
  * interval with lo <= p, then walk back while the prefix max-hi can
  * still cover p. Inner-join semantics; null points/bounds produce no
  * match — exactly the nested-loop's behavior (asserted in
  * RangeJoinSpec).
  *
  * SIZE GUARD: the interval side must be broadcast-sized. When its
  * optimizer statistics exceed `spark.graft.rangeJoin.maxBuildBytes`
  * (default 256 MiB), `pointInInterval` falls back to the plain
  * non-equi join (Spark's nested loop) rather than planning a
  * broadcast that would not fit; past the stats check, the exchange's
  * own hard limits (512M rows / 8 GiB) still apply.
  */
object RangeJoin {

  val MaxBuildBytesKey = "spark.graft.rangeJoin.maxBuildBytes"
  val MaxBuildBytesDefault: Long = 256L * 1024 * 1024

  /** Public API: inner-join `left` to `right` on
    * `right.lo <= left.point <= right.hi` (all compared as doubles).
    * Plans the custom broadcast-index exec when the interval side's
    * stats fit under [[MaxBuildBytesKey]]; otherwise falls over to
    * the PARTITIONED range join — never a nested loop.
    */
  def pointInInterval(left: DataFrame, right: DataFrame,
      point: Column, lo: Column, hi: Column): DataFrame = {
    val spark = left.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val maxBytes = spark.conf.getOption(MaxBuildBytesKey)
      .map(_.toLong).getOrElse(MaxBuildBytesDefault)
    val rightBytes = right.queryExecution.optimizedPlan.stats.sizeInBytes
    if (rightBytes > maxBytes) {
      logWarning(s"range-join interval side estimated at $rightBytes bytes " +
        s"(> $MaxBuildBytesKey=$maxBytes); using the partitioned range join")
      pointInIntervalPartitioned(left, right, point, lo, hi)
    } else {
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

  /** Partitioned range join — the shape for a FACT-SIZED interval
    * side, where neither broadcasting nor a nested loop survives:
    * the point domain splits into `buckets` equal-width ranges (the
    * two-double min/max aggregate is the only driver-side data);
    * each point keys by its bucket, each interval REPLICATES to every
    * bucket it overlaps (replication ∝ interval width / bucket width
    * — bounded for the narrow-band intervals range joins see), and a
    * plain shuffled equi-join on the bucket id meets exactly the
    * pairs that can match, with the precise bounds check applied
    * inside the join. Every pair meets in exactly one bucket (a
    * point has one bucket), so no distinct is needed.
    */
  def pointInIntervalPartitioned(points: DataFrame, intervals: DataFrame,
      point: Column, lo: Column, hi: Column, buckets: Int = 64): DataFrame = {
    import org.apache.spark.sql.functions._
    val p = point.cast("double")
    val bounds = points.select(min(p).as("mn"), max(p).as("mx")).collect()(0)
    if (bounds.isNullAt(0))
      return points.join(intervals, point >= lo && point <= hi) // no valid points: empty, any plan
    val (mn, mx) = (bounds.getDouble(0), bounds.getDouble(1))
    if (mn == mx) // degenerate domain: one bucket — join condition does the work
      return points.join(intervals, lo.cast("double") <= p && p <= hi.cast("double"))
    // NULL routing: width_bucket(null) is null and greatest() SKIPS
    // nulls, so a null point lands in bucket 1 — harmless, because the
    // final precise bounds filter rejects it (null comparison).
    def bucketOf(v: Column): Column =
      least(greatest(width_bucket(v.cast("double"), lit(mn), lit(mx), lit(buckets)),
        lit(1L)), lit(buckets.toLong))
    // uniquified helper-column name: a caller frame that already has a
    // column of the same name must not collide
    val rb = s"_rb_${RangeJoin.helperColId.incrementAndGet()}"
    val l = points.withColumn(rb, bucketOf(point))
    val r = intervals
      .filter(lo.cast("double") <= hi.cast("double"))
      .withColumn(rb, explode(sequence(bucketOf(lo), bucketOf(hi))))
    l.join(r, Seq(rb))
      .filter(lo.cast("double") <= p && p <= hi.cast("double"))
      .drop(rb)
  }

  private val helperColId = new java.util.concurrent.atomic.AtomicLong()

  private def logWarning(msg: String): Unit =
    org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)
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

  /** EnsureRequirements inserts a BroadcastExchange over the interval
    * side: identity mode (the row array as-is), shared/reused across
    * subtrees, with Spark's broadcast limits and metrics.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(UnspecifiedDistribution, BroadcastDistribution(IdentityBroadcastMode))

  protected override def doExecute(): RDD[InternalRow] = {
    val bc = right.executeBroadcast[Array[InternalRow]]()
    val pointExpr   = point
    val loExpr      = lo
    val hiExpr      = hi
    val leftOutput  = left.output
    val rightOutput = right.output
    val allOutput   = output
    left.execute().mapPartitionsInternal { iter =>
      // Build the sorted interval index from the broadcast rows once
      // per partition: O(m log m) on the dim-sized m — cheap relative
      // to the probe scan, and avoids a second driver-side broadcast
      // of derived state.
      val loB = BindReferences.bindReference(loExpr, rightOutput)
      val hiB = BindReferences.bindReference(hiExpr, rightOutput)
      val intervals = bc.value.flatMap { row =>
        val l = loB.eval(row)
        val h = hiB.eval(row)
        if (l == null || h == null) None
        else Some((l.asInstanceOf[Double], h.asInstanceOf[Double], row))
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

      val pB     = BindReferences.bindReference(pointExpr, leftOutput)
      val joined = new JoinedRow
      val proj   = UnsafeProjection.create(allOutput, allOutput)
      iter.flatMap { lrow =>
        val pv = pB.eval(lrow)
        if (pv == null || intervals.isEmpty) Iterator.empty
        else {
          val p = pv.asInstanceOf[Double]
          // last index with lo <= p
          var lb = 0; var ub = los.length
          while (lb < ub) {
            val mid = (lb + ub) >>> 1
            if (los(mid) <= p) lb = mid + 1 else ub = mid
          }
          // Lazy descending walk: no per-probe builder and no per-match
          // copy — the projected UnsafeRow is reused, which is safe
          // because each emitted row is consumed before the next
          // `next()` (rows never outlive one step of the iterator).
          new Iterator[InternalRow] {
            private[this] var idx = lb - 1
            seek()
            // advance idx to the next interval containing p, or stop
            // (-1) once the running-max prefix proves none remain.
            private def seek(): Unit = {
              while (idx >= 0 && maxHiPrefix(idx) >= p && intervals(idx)._2 < p) idx -= 1
              if (idx >= 0 && maxHiPrefix(idx) < p) idx = -1
            }
            override def hasNext: Boolean = idx >= 0
            override def next(): InternalRow = {
              val r = proj(joined(lrow, intervals(idx)._3))
              idx -= 1; seek()
              r
            }
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): PointIntervalJoinExec =
    copy(left = l, right = r)
}
