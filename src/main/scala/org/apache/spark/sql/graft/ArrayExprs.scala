package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hot loops the built-in
  * higher-order functions evaluate interpretively (SURVEY.md §4):
  * whole-stage-codegen'd, allocation-free inner loops. Each keeps
  * bit-identical semantics with the HOF formulation it replaces
  * (sequential left-to-right double folds), so oracle parity is
  * unaffected.
  */
object ArrayExprs {
  /** Codegen'd float-array dot product in double precision. */
  def float_dot(a: Column, b: Column): Column =
    ExpressionUtils.column(FloatDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Codegen'd MinHash signature over 32-bit-folded feature hashes. */
  def minhash_sig(hashes: Column, a: Array[Long], b: Array[Long], p: Long): Column =
    ExpressionUtils.column(MinHashSig(ExpressionUtils.expression(hashes), a, b, p))
}

/** Sequential-fold dot product of two `array<float>` columns in
  * double precision — bit-identical to
  * `aggregate(zip_with(a, b, (x, y) -> double(x)*double(y)), 0d, +)`
  * and to DuckDB's `list_dot_product` on `DOUBLE[]`.
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $s = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
        |}
        |${ev.value} = $s;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): FloatDot =
    copy(left = l, right = r)
}

/** MinHash signature: for permutation j, `min_h((a(j)*h + b(j)) % p)`
  * over an `array<long>` of 32-bit-folded feature hashes. Constants
  * satisfy a < 2^31, h < 2^32, so the product never overflows a
  * signed long — identical to the ANSI-safe HOF formulation.
  */
case class MinHashSig(child: Expression, a: Array[Long], b: Array[Long], p: Long)
    extends UnaryExpression with ExpectsInputTypes {

  require(a.length == b.length)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(in: Any): Any = {
    val hs  = in.asInstanceOf[ArrayData]
    val n   = hs.numElements()
    val out = new Array[Long](a.length)
    var j   = 0
    while (j < a.length) {
      var m = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = (a(j) * hs.getLong(i) + b(j)) % p
        if (v < m) m = v
        i += 1
      }
      out(j) = m
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("permA", a, "long[]")
    val bRef = ctx.addReferenceObj("permB", b, "long[]")
    nullSafeCodeGen(ctx, ev, in => {
      val n   = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i   = ctx.freshName("i")
      val j   = ctx.freshName("j")
      val m   = ctx.freshName("m")
      val v   = ctx.freshName("v")
      s"""
        |int $n = $in.numElements();
        |long[] $out = new long[${a.length}];
        |for (int $j = 0; $j < ${a.length}; $j++) {
        |  long $m = Long.MAX_VALUE;
        |  for (int $i = 0; $i < $n; $i++) {
        |    long $v = ($aRef[$j] * $in.getLong($i) + $bRef[$j]) % ${p}L;
        |    if ($v < $m) $m = $v;
        |  }
        |  $out[$j] = $m;
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}
