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

  private def litLong(e: Expression, fn: String): Long = {
    require(e.foldable, s"$fn: argument must be a literal")
    e.eval(null).asInstanceOf[Number].longValue()
  }

  private def ophSigBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 6, "oph_sig(hashes32, k, a, b, p, c)")
    OphSig(exprs(0), litInt(exprs(1), "oph_sig"), litLong(exprs(2), "oph_sig"),
      litLong(exprs(3), "oph_sig"), litLong(exprs(4), "oph_sig"), litLong(exprs(5), "oph_sig"))
  }

  private def ophBandsBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 7, "oph_bands(hashes64, bands, rows, a, b, p, c)")
    OphBands(exprs(0), litInt(exprs(1), "oph_bands"), litInt(exprs(2), "oph_bands"),
      litLong(exprs(3), "oph_bands"), litLong(exprs(4), "oph_bands"),
      litLong(exprs(5), "oph_bands"), litLong(exprs(6), "oph_bands"))
  }

  private def rasterDecodeBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "raster_decode(content)")
    RasterDecode(exprs(0))
  }

  private def tiffDecodeBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "tiff_decode(content)")
    TiffDecode(exprs(0))
  }

  private def mgSketchBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "mg_sketch(term, width)")
    MisraGries(exprs(0), litInt(exprs(1), "mg_sketch")).toAggregateExpression()
  }

  private def flowAccumBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "flow_accum(elevations, n)")
    FlowAccum(exprs(0), exprs(1))
  }

  private def watershedBuilder(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "watershed(elevations, n)")
    Watershed(exprs(0), exprs(1))
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("mg_sketch"),
      new ExpressionInfo(classOf[MisraGries].getName, "mg_sketch"),
      mgSketchBuilder _),
    (FunctionIdentifier("oph_sig"),
      new ExpressionInfo(classOf[OphSig].getName, "oph_sig"),
      ophSigBuilder _),
    (FunctionIdentifier("oph_bands"),
      new ExpressionInfo(classOf[OphBands].getName, "oph_bands"),
      ophBandsBuilder _),
    (FunctionIdentifier("raster_decode"),
      new ExpressionInfo(classOf[RasterDecode].getName, "raster_decode"),
      rasterDecodeBuilder _),
    (FunctionIdentifier("tiff_decode"),
      new ExpressionInfo(classOf[TiffDecode].getName, "tiff_decode"),
      tiffDecodeBuilder _),
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
      wordShingleBuilder _),
    (FunctionIdentifier("flow_accum"),
      new ExpressionInfo(classOf[FlowAccum].getName, "flow_accum"),
      flowAccumBuilder _),
    (FunctionIdentifier("watershed"),
      new ExpressionInfo(classOf[Watershed].getName, "watershed"),
      watershedBuilder _))

  /** Register into an already-built session (tests, shells). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(ident.funcName, builder, "scala_udf")
    }
}
