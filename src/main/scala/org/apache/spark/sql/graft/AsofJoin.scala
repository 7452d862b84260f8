package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Custom whole-operator as-of join (SURVEY.md §4 tier (c), the r2
  * generalization of the q14 sorted-union window trick).
  *
  * `asofBackward(left, right, lk, rk, lt, rt)` attaches to every left
  * row the LATEST right row of the same key with `rt <= lt`
  * (backward-looking, inclusive), or nulls when none exists —
  * left-outer semantics, exactly one output row per left row.
  * `asofForward` is the mirror: the EARLIEST right row with
  * `rt >= lt` ("next event at or after") — same plan shape, and the
  * merge is strictly simpler (the lookahead row is the candidate;
  * nothing is carried).
  *
  * Physical strategy: a PARTITIONED SORT-MERGE — both sides hash-
  * shuffle on their key (ClusteredDistribution) and sort within
  * partitions by (key, time) (requiredChildOrdering, so
  * EnsureRequirements plans exactly one exchange + one sort per
  * side), then a single forward merge pass per partition carries the
  * most recent matching right row. No window over unioned rows, no
  * range cross-join, no per-key state beyond one carried row — the
  * shape that scales to fact-×-fact as-of joins (trades×quotes,
  * events×orders) where neither side broadcasts.
  *
  * Vanilla-Spark alternatives and why they lose: the sorted-union
  * window trick needs both sides reshaped into one schema and only
  * works when the carried payload is a single column family; a range
  * join (`rt <= lt`) plans as a nested loop and explodes on matches.
  *
  * Semantics notes: null keys and null times never match (on either
  * side). Ties on `rt` within a key resolve to the right row latest
  * in the right side's (key, time) sort — callers wanting a
  * deterministic tiebreak pre-aggregate right to one row per
  * (key, time), as q14 does.
  */
object AsofJoin {

  /** Public API: backward (most-recent-≤) as-of join. Key columns
    * must share a data type, as must time columns; right columns keep
    * their names and become nullable.
    */
  def asofBackward(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column): DataFrame =
    build(left, right, leftKey, rightKey, leftTime, rightTime, forward = false)

  /** Public API: forward (earliest-≥) as-of join — "next event at or
    * after": attaches the EARLIEST right row of the same key with
    * `rt >= lt`. Same partitioned sort-merge, same single forward
    * pass; the merge needs no carried row at all (the lookahead row
    * IS the candidate), so forward is the cheaper direction.
    */
  def asofForward(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column): DataFrame =
    build(left, right, leftKey, rightKey, leftTime, rightTime, forward = true)

  private def build(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column, forward: Boolean): DataFrame = {
    val spark = left.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val plan = AsofJoinPlan(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      spark.expression(leftKey), spark.expression(rightKey),
      spark.expression(leftTime), spark.expression(rightTime), forward)
    Dataset.ofRows(spark, plan)
  }
}

case class AsofJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    forward: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsofJoinPlan =
    copy(left = l, right = r)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt0, rt0, fwd) =>
      // NTZ/LTZ timestamp pairs coerce softly: both are micros-since-
      // epoch longs at the physical layer, so an explicit Cast of the
      // NTZ side to the session-zoned type is value-identical in a UTC
      // session and keeps the operator usable when one input's parquet
      // writer dropped (or added) the timezone annotation — the exact
      // failure a testdata regeneration produced in r6.
      val (lt, rt) = coerceTimes(lt0, rt0)
      // the merge loop compares left values against right values
      // directly, so mismatched types would surface as a mid-execution
      // ClassCastException — fail at planning with a clear message.
      require(lk.dataType == rk.dataType,
        s"as-of join key columns must share a data type, got ${lk.dataType.sql} vs ${rk.dataType.sql}")
      require(lt.dataType == rt.dataType,
        s"as-of join time columns must share a data type, got ${lt.dataType.sql} vs ${rt.dataType.sql}")
      AsofMergeJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, fwd) :: Nil
    case _ => Nil
  }

  private def coerceTimes(lt: Expression, rt: Expression): (Expression, Expression) = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    (lt.dataType, rt.dataType) match {
      case (TimestampNTZType, TimestampType) => (Cast(lt, TimestampType), rt)
      case (TimestampType, TimestampNTZType) => (lt, Cast(rt, TimestampType))
      case _                                 => (lt, rt)
    }
  }
}

case class AsofMergeJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    forward: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Hash-shuffle both sides on their key: like a shuffled join,
    * EnsureRequirements plans ONE exchange per side (or none when a
    * side is already partitioned on the key, e.g. bucketed input).
    */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKey :: Nil), ClusteredDistribution(rightKey :: Nil))

  /** Within-partition (key, time) sort on both sides: ONE SortExec
    * per side, inserted by EnsureRequirements.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  /** One row out per left row in, partitioning preserved. */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    AsofMergeJoinExec.longGetter(leftKey.dataType)
      .zip(AsofMergeJoinExec.longGetter(leftTime.dataType)) match {
      case Some((kGet, tGet)) => executePrimitive(kGet, tGet)
      case None               => executeGeneric()
    }
  }

  /** Fast path for integer-backed key AND time types (the trades ×
    * quotes shape: long/int keys, timestamp times): key/time evaluate
    * through ONE code-generated UnsafeProjection per side and compare
    * as unboxed longs — no per-row interpreted Expression.eval, no
    * boxing, no ordering objects in the merge loop.
    */
  private def executePrimitive(
      kGet: (InternalRow, Int) => Long,
      tGet: (InternalRow, Int) => Long): RDD[InternalRow] = {
    val lkExpr = leftKey; val rkExpr = rightKey
    val ltExpr = leftTime; val rtExpr = rightTime
    val leftOutput = left.output; val rightOutput = right.output
    val allOutput  = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lProj = UnsafeProjection.create(
        Seq(BindReferences.bindReference(lkExpr, leftOutput),
          BindReferences.bindReference(ltExpr, leftOutput)))
      val rProj = UnsafeProjection.create(
        Seq(BindReferences.bindReference(rkExpr, rightOutput),
          BindReferences.bindReference(rtExpr, rightOutput)))
      val joined    = new JoinedRow
      val nullRight = new GenericInternalRow(rightOutput.size)
      val proj      = UnsafeProjection.create(allOutput, allOutput)

      var rRow: InternalRow = null       // lookahead right row
      var rKeyV = 0L; var rTimeV = 0L
      var carriedRow: InternalRow = null // copy — iterators reuse rows
      var carriedKey = 0L
      def advanceRight(): Unit = {
        rRow = null
        while (rRow == null && rIter.hasNext) {
          val row = rIter.next()
          val kt = rProj(row)
          if (!kt.isNullAt(0) && !kt.isNullAt(1)) {
            rRow = row; rKeyV = kGet(kt, 0); rTimeV = tGet(kt, 1)
          }
        }
      }
      advanceRight()

      if (forward) lIter.map { lrow =>
        // forward: skip right rows strictly before (k, t); the
        // lookahead row itself is then the earliest candidate — no
        // carried copy needed (left times only grow within a key, so
        // skipped rows can never match a later left row)
        val kt = lProj(lrow)
        var matched = false
        if (!kt.isNullAt(0) && !kt.isNullAt(1)) {
          val k = kGet(kt, 0); val t = tGet(kt, 1)
          var more = rRow != null
          while (more) {
            if (rKeyV < k || (rKeyV == k && rTimeV < t)) {
              advanceRight()
              more = rRow != null
            } else more = false
          }
          matched = rRow != null && rKeyV == k
        }
        proj(joined(lrow, if (matched) rRow else nullRight))
      }
      else lIter.map { lrow =>
        val kt = lProj(lrow)
        var matched = false
        if (!kt.isNullAt(0) && !kt.isNullAt(1)) {
          val k = kGet(kt, 0); val t = tGet(kt, 1)
          var more = rRow != null
          while (more) {
            if (rKeyV < k || (rKeyV == k && rTimeV <= t)) {
              if (rKeyV == k) { carriedRow = rRow.copy(); carriedKey = rKeyV }
              advanceRight()
              more = rRow != null
            } else more = false
          }
          matched = carriedRow != null && carriedKey == k
        }
        proj(joined(lrow, if (matched) carriedRow else nullRight))
      }
    }
  }

  /** Generic path: any orderable key/time types (string keys, decimal
    * times) through interpreted orderings.
    */
  private def executeGeneric(): RDD[InternalRow] = {
    val keyOrd  = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val lkExpr = leftKey; val rkExpr = rightKey
    val ltExpr = leftTime; val rtExpr = rightTime
    val leftOutput = left.output; val rightOutput = right.output
    val allOutput  = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lk = BindReferences.bindReference(lkExpr, leftOutput)
      val lt = BindReferences.bindReference(ltExpr, leftOutput)
      val rk = BindReferences.bindReference(rkExpr, rightOutput)
      val rt = BindReferences.bindReference(rtExpr, rightOutput)
      val joined    = new JoinedRow
      val nullRight = new GenericInternalRow(rightOutput.size)
      val proj      = UnsafeProjection.create(allOutput, allOutput)

      // single forward merge: rows on both sides arrive sorted by
      // (key, time); `carriedRow` is the latest right row whose
      // (key, time) is <= the current left (key, time)
      var rRow: InternalRow = null      // lookahead right row
      var rKeyV: Any = null; var rTimeV: Any = null
      var carriedRow: InternalRow = null // copy — iterators reuse rows
      var carriedKey: Any = null
      def advanceRight(): Unit = {
        rRow = null
        while (rRow == null && rIter.hasNext) {
          val row = rIter.next()
          val k = rk.eval(row); val t = rt.eval(row)
          if (k != null && t != null) { rRow = row; rKeyV = k; rTimeV = t }
        }
      }
      advanceRight()

      if (forward) lIter.map { lrow =>
        // forward: skip strictly-before rows; lookahead is the match
        val k = lk.eval(lrow); val t = lt.eval(lrow)
        var matched = false
        if (k != null && t != null) {
          var more = rRow != null
          while (more) {
            val c = keyOrd.compare(rKeyV, k)
            if (c < 0 || (c == 0 && timeOrd.compare(rTimeV, t) < 0)) {
              advanceRight()
              more = rRow != null
            } else more = false
          }
          matched = rRow != null && keyOrd.compare(rKeyV, k) == 0
        }
        proj(joined(lrow, if (matched) rRow else nullRight))
      }
      else lIter.map { lrow =>
        val k = lk.eval(lrow); val t = lt.eval(lrow)
        if (k != null && t != null) {
          // consume all right rows at-or-before (k, t); the last one
          // with the same key becomes the carried match
          var more = rRow != null
          while (more) {
            val c = keyOrd.compare(rKeyV, k)
            if (c < 0 || (c == 0 && timeOrd.compare(rTimeV, t) <= 0)) {
              // copy both row and key value: the row buffer (and any
              // object key pointing into it) is reused by the iterator
              if (c == 0) {
                carriedRow = rRow.copy()
                carriedKey = InternalRow.copyValue(rKeyV)
              }
              advanceRight()
              more = rRow != null
            } else more = false
          }
        }
        val matched = carriedRow != null && k != null &&
          keyOrd.compare(carriedKey, k) == 0
        proj(joined(lrow, if (matched) carriedRow else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsofMergeJoinExec =
    copy(left = l, right = r)
}

object AsofMergeJoinExec {
  import org.apache.spark.sql.types._

  /** Unboxed accessor for integer-backed atomic types whose natural
    * ordering equals signed-long ordering (the fast-path precondition).
    */
  private[graft] def longGetter(dt: DataType): Option[(InternalRow, Int) => Long] = dt match {
    case LongType | TimestampType | TimestampNTZType => Some((r, i) => r.getLong(i))
    case IntegerType | DateType                      => Some((r, i) => r.getInt(i).toLong)
    case ShortType                                   => Some((r, i) => r.getShort(i).toLong)
    case ByteType                                    => Some((r, i) => r.getByte(i).toLong)
    case _                                           => None
  }
}
