package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused set-Jaccard over two `array<long>` columns: one hash-set
  * pass computing |A∩B| and |A∪B| together. Result is bit-identical
  * to `size(array_intersect(a,b))/size(array_union(a,b))` on the
  * same inputs (both built-ins dedup; the ratio is an exact small-int
  * division), including two empty arrays → null (the composed form's
  * non-ANSI 0/0 Divide) — asserted in ExprSpec.
  */
case class JaccardSets(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  // null even for non-null inputs: two empty arrays → null (0/0)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val setA = new java.util.HashSet[java.lang.Long]()
    var i = 0
    while (i < xs.numElements()) { setA.add(xs.getLong(i)); i += 1 }
    val union = new java.util.HashSet[java.lang.Long](setA)
    var inter = 0
    val seenB = new java.util.HashSet[java.lang.Long]()
    var j = 0
    while (j < ys.numElements()) {
      val v = java.lang.Long.valueOf(ys.getLong(j))
      if (seenB.add(v)) {
        union.add(v)
        if (setA.contains(v)) inter += 1
      }
      j += 1
    }
    if (union.size() == 0) null else inter.toDouble / union.size().toDouble
  }

  override def prettyName: String = "jaccard_sets"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSets =
    copy(left = l, right = r)
}

/** Merge-based set Jaccard over two SORTED-distinct `array<long>`
  * inputs with a threshold abort — the verify kernel for candidate
  * pairs at scale. A two-pointer merge computes |A∩B| with zero
  * allocation and zero boxing (JaccardSets builds two boxed HashSets
  * PER PAIR — at 39M sf10 candidates that is the dominant d4 cost);
  * |A∪B| = |A|+|B|−|A∩B| because each input is itself a set. The
  * merge ABORTS returning −1 as soon as the best-possible Jaccard
  * (inter + min(rem_a, rem_b) matched from here on) falls below
  * `tau − 1e-6`: candidates destined for the ≥ τ filter's floor are
  * rejected in O(prefix), and the 1e-6 margin guarantees no pair
  * whose ROUNDED (r6) value reaches τ is ever aborted — so outputs
  * are bit-identical to JaccardSets + filter (asserted in ExprSpec).
  * Callers MUST pass sorted inputs (Dedup.verifyJaccard sorts once
  * per doc, before the candidate fan-out). Same null semantics as
  * JaccardSets: two empty sets → null.
  */
case class SortedJaccardGe(left: Expression, right: Expression, tau: Double)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private val bound = tau - 1e-6

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val la = xs.numElements()
    val lb = ys.numElements()
    if (la == 0 && lb == 0) return null
    var i = 0
    var j = 0
    var inter = 0
    while (i < la && j < lb) {
      val maxInter = inter + math.min(la - i, lb - j)
      if (maxInter < bound * (la + lb - maxInter)) return -1.0
      val x = xs.getLong(i)
      val y = ys.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (la + lb - inter).toDouble
  }

  override def prettyName: String = "jaccard_sorted_ge"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedJaccardGe =
    copy(left = l, right = r)
}

/** Merge-based set-overlap COUNTS over two SORTED-distinct
  * `array<long>` inputs with an EXACT integer threshold abort — the
  * integer-form successor to [[SortedJaccardGe]] for hash-compared
  * surfaces. Returns `struct<inter: long, un: long>` when
  * `inter·tauDen ≥ un·tauNum` (i.e. J ≥ tauNum/tauDen exactly as a
  * rational — no float threshold, no 6dp rounding, hence no decimal
  * midpoint ties ever), and NULL otherwise (below threshold, aborted
  * early, or both-empty). The early abort is the same best-possible-
  * Jaccard bound as SortedJaccardGe but cross-multiplied in integers:
  * reject as soon as `maxInter·tauDen < tauNum·minUnion` — exact, so
  * no epsilon margin is needed and output membership is EXACTLY
  * {pairs with J ≥ tauNum/tauDen}. Callers MUST pass sorted-distinct
  * inputs (same contract as SortedJaccardGe).
  */
case class SortedJaccardCounts(left: Expression, right: Expression,
    tauNum: Int, tauDen: Int)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = StructType(Seq(
    StructField("inter", LongType, nullable = false),
    StructField("un", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val la = xs.numElements()
    val lb = ys.numElements()
    if (la == 0 && lb == 0) return null
    var i = 0
    var j = 0
    var inter = 0L
    while (i < la && j < lb) {
      val maxInter = inter + math.min(la - i, lb - j)
      if (maxInter * tauDen < tauNum * (la + lb - maxInter)) return null
      val x = xs.getLong(i)
      val y = ys.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val un = la + lb - inter
    if (inter * tauDen >= tauNum * un)
      org.apache.spark.sql.catalyst.InternalRow(inter, un)
    else null
  }

  override def prettyName: String = "jaccard_counts_ge"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedJaccardCounts =
    copy(left = l, right = r)
}

/** Optimizer rule: rewrite the composed HOF form
  * `cast(size(array_intersect(a,b)) as double) /
  *  cast(size(array_union(a,b)) as double)`
  * into the fused one-pass JaccardSets when both sides reference the
  * same pair of long-array expressions. Injected via
  * GraftExtensions.injectOptimizerRule — queries written against the
  * composable built-ins silently get the fused kernel.
  */
object FuseJaccardRule extends Rule[LogicalPlan] {
  // containsNull must be false: array_intersect/array_union treat a
  // null element as a set member, but JaccardSets.getLong would read
  // it as 0 — fusing such inputs would change the result.
  private def longArrays(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, false) => true
    case _                          => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case Divide(
        Cast(Size(ArrayIntersect(a1, b1), _), DoubleType, _, _),
        Cast(Size(ArrayUnion(a2, b2), _), DoubleType, _, _), _)
        if a1.semanticEquals(a2) && b1.semanticEquals(b2) &&
          longArrays(a1) && longArrays(b1) =>
      JaccardSets(a1, b1)
  }
}
