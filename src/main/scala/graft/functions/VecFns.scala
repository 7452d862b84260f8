package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over `array<float>` embedding columns. All pure
  * higher-order `Column` expressions (codegen'd): elements are cast
  * to double before any arithmetic and folded sequentially in list
  * order, which makes the result bit-identical to the DuckDB oracle's
  * `list_dot_product(a::DOUBLE[], b::DOUBLE[])`.
  */
object VecFns {

  /** Sequential-fold dot product in double precision — the native
    * codegen'd expression (graft.functions.expr.FloatDot); the HOF
    * `aggregate(zip_with(...))` form computes the same bits ~10×
    * slower (interpreted, allocating).
    */
  def dot(a: Column, b: Column): Column = org.apache.spark.sql.graft.ArrayExprs.float_dot(a, b)

  /** Euclidean norm. */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity (unrounded; round with Det.r6 at output). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine given precomputed norms — the form the pairwise operators
    * use so each vector's norm is computed once, not once per pair.
    */
  def cosinePre(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)
}
