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

  private def jaccardSetsBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "jaccard_sets(arrayA, arrayB)")
    JaccardSets(exprs(0), exprs(1))
  }

  private def simhash64Builder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "simhash64(words)")
    SimHash64(exprs(0))
  }

  /** Gram-size arguments must be foldable int literals — the kernel
    * compiles the size into its loop.
    */
  private def litInt(e: Expression, fn: String): Int = {
    require(e.foldable, s"$fn: gram size must be a literal")
    e.eval(null).asInstanceOf[Number].intValue()
  }

  private def charGramBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "char_gram_hashes(normalizedText, n)")
    GramHashes(exprs(0), litInt(exprs(1), "char_gram_hashes"), byWord = false)
  }

  private def wordShingleBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "word_shingle_hashes(normalizedText, k)")
    GramHashes(exprs(0), litInt(exprs(1), "word_shingle_hashes"), byWord = true)
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("float_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "float_dot"),
      floatDotBuilder _),
    (FunctionIdentifier("jaccard_sets"),
      new ExpressionInfo(classOf[JaccardSets].getName, "jaccard_sets"),
      jaccardSetsBuilder _),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      simhash64Builder _),
    (FunctionIdentifier("char_gram_hashes"),
      new ExpressionInfo(classOf[GramHashes].getName, "char_gram_hashes"),
      charGramBuilder _),
    (FunctionIdentifier("word_shingle_hashes"),
      new ExpressionInfo(classOf[GramHashes].getName, "word_shingle_hashes"),
      wordShingleBuilder _))

  /** Register into an already-built session (tests, shells). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(ident.funcName, builder, "scala_udf")
    }
}
