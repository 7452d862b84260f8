package graft

import org.apache.spark.sql.{Column, DataFrame}

/** Fluent entry points for the engine's custom operators — `import
  * graft.syntax._` and compose them like built-in DataFrame methods:
  *
  * {{{
  * import graft.syntax._
  * events.asofJoinBackward(orders,
  *     col("user_id"), col("o_custkey"), col("ts"), col("o_orderdate"))
  *   .pointInIntervalJoin(bands, col("value"), col("lo"), col("hi"))
  * manifest.fetchPayloads("tile_key", maxConcurrent = 64)(s3Get)
  * }}}
  */
object syntax {

  implicit class GraftOps(private val left: DataFrame) extends AnyVal {

    /** Backward (most-recent-≤) as-of join through the custom
      * partitioned sort-merge operator; see
      * [[org.apache.spark.sql.graft.AsofJoin.asofBackward]].
      */
    def asofJoinBackward(right: DataFrame, leftKey: Column, rightKey: Column,
        leftTime: Column, rightTime: Column): DataFrame =
      org.apache.spark.sql.graft.AsofJoin
        .asofBackward(left, right, leftKey, rightKey, leftTime, rightTime)

    /** Point-in-interval range join through the custom broadcast
      * interval-index operator (stats-guarded); see
      * [[org.apache.spark.sql.graft.RangeJoin.pointInInterval]].
      */
    def pointInIntervalJoin(right: DataFrame, point: Column, lo: Column,
        hi: Column): DataFrame =
      org.apache.spark.sql.graft.RangeJoin.pointInInterval(left, right, point, lo, hi)

    /** Bounded-concurrency payload fetch over this manifest; see
      * [[graft.operators.Ingest.fetch]].
      */
    def fetchPayloads(keyCol: String, maxConcurrent: Int)(
        fetcher: String => Array[Byte]): DataFrame =
      graft.operators.Ingest.fetch(left, keyCol, maxConcurrent)(fetcher)

    /** Skew-spreading join against a small table; row-identical to
      * `left.join(small, key)`; see [[graft.operators.Joins.saltedJoin]].
      */
    def saltedJoinOn(small: DataFrame, key: String, salt: Int): DataFrame =
      graft.operators.Joins.saltedJoin(left, small, key, salt)
  }
}
