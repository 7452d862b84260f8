package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic-arithmetic helpers for oracle parity.
  *
  * Floating-point SUM is order-sensitive, and Spark's partial
  * aggregation makes the order nondeterministic — so any money
  * aggregate is computed as per-row `round(x*100)` (pure IEEE ops,
  * bit-identical in any engine) followed by an exact integer sum
  * (< 2^53, no error). Ratios/cosines are rounded to 6dp after
  * double-exact arithmetic.
  */
object Det {
  /** Per-row conversion to integer cents; safe to SUM exactly. */
  def cents(c: Column): Column = round(c * lit(100)).cast("long")

  /** Exact money sum in cents (bigint). */
  def sumCents(c: Column): Column = sum(cents(c))

  /** 6-decimal rounding for derived doubles (ratios, cosines, avgs). */
  def r6(c: Column): Column = round(c, 6)
}
