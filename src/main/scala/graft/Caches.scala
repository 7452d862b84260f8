package graft

import org.apache.spark.sql.DataFrame

/** Explicit lifecycle for per-query caches. Operators that cache an
  * intermediate (Dedup's hashed feature sets, Ann's normed corpus)
  * register it here; long-lived sessions that run many queries
  * back-to-back (Bench, Verify) call `clear()` between queries so
  * cached corpora don't accumulate in executor storage memory. A
  * single interactive query can skip `clear()` — Spark's LRU eviction
  * handles one query's worth of cache.
  */
object Caches {

  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Cache `df` and register it for the next `clear()`. */
  private[graft] def track(df: DataFrame): DataFrame = {
    val cached = df.cache()
    live.add(cached)
    cached
  }

  /** Unpersist every tracked cache (non-blocking). */
  def clear(): Unit = {
    var df = live.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = live.poll()
    }
  }
}
