package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Exposes graft's native expressions to SQL.
  *
  * Either install at session build time:
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
  * }}}
  * or register into an existing session with
  * `GraftExtensions.register(spark)`. Afterwards:
  * {{{
  * SELECT float_dot(a.embedding, b.embedding) FROM ...
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      e.injectFunction((ident, info, builder))
    }
    e.injectOptimizerRule(_ => FuseJaccardRule)
    e.injectPlannerStrategy(_ => RangeJoinStrategy)
    e.injectPlannerStrategy(_ => AsofJoinStrategy)
  }
}

object GraftExtensions {
  private def floatDotBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "float_dot(arrayA, arrayB)")
    FloatDot(exprs(0), exprs(1))
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "float_dot"),
      floatDotBuilder _))

  /** Register into an already-built session (tests, shells). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(ident.funcName, builder, "scala_udf")
    }
}
