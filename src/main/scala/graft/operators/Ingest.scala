package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed twin of the reference's bounded-concurrency download
  * pipeline (main.rs:334-349): the reference bounds in-flight S3 GETs
  * with an async buffer; the Spark-native bound is the SCHEDULER —
  * repartition the manifest into exactly `maxConcurrent` partitions
  * and fetch inside mapPartitions, so at most `maxConcurrent` fetch
  * workers run cluster-wide regardless of executor count, each
  * streaming rows (no per-partition buffering). Retries with
  * exponential backoff replace the reference's per-object error
  * handling.
  *
  * The fetch stage composes with the rest of the engine: g8's listing
  * manifest supplies the keys, the fetched binary column feeds
  * RasterDecode (g7) or the multimodal decode path — asserted
  * end-to-end in IngestSpec.
  */
object Ingest {

  /** Run `f`, retrying `attempts-1` times with exponential backoff.
    * Only NonFatal failures retry: fatal JVM errors propagate
    * immediately, and an interrupt (Spark task kill) re-sets the
    * thread's interrupt flag and aborts instead of sleeping through
    * backoff.
    */
  def withRetry[T](attempts: Int, baseDelayMs: Long)(f: => T): T = {
    var left = attempts
    var delay = baseDelayMs
    while (true) {
      try return f
      catch {
        case e: InterruptedException =>
          Thread.currentThread().interrupt()
          throw e
        case scala.util.control.NonFatal(e) =>
          left -= 1
          if (left <= 0) throw e
          try Thread.sleep(delay)
          catch {
            case ie: InterruptedException =>
              Thread.currentThread().interrupt()
              throw ie
          }
          delay *= 2
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Fetch the payload for every key in `manifest(keyCol)` with at
    * most `maxConcurrent` fetches in flight cluster-wide. Returns
    * (keyCol string, content binary). `fetcher` must be serializable
    * (it runs in tasks).
    */
  def fetch(manifest: DataFrame, keyCol: String, maxConcurrent: Int,
      attempts: Int = 3, baseDelayMs: Long = 100)(fetcher: String => Array[Byte]): DataFrame = {
    val spark = manifest.sparkSession
    import spark.implicits._
    // Dataset[(String, Array[Byte])] keeps the whole path on the
    // internal-row encoders — no external Row construction and no
    // RowEncoder conversion layer on the fetch hot path.
    manifest.select(col(keyCol).cast("string")).as[String]
      .repartition(maxConcurrent) // the concurrency bound: one worker per partition
      .mapPartitions(_.map(k => (k, withRetry(attempts, baseDelayMs)(fetcher(k)))))
      .toDF(keyCol, "content")
  }
}
