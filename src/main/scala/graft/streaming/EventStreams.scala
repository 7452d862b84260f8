package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming operators over the events stream. Each
  * transform takes a DataFrame so the same logic runs on a batch
  * frame (oracle-checked via Relational.q12EventsWindow) and on a
  * `readStream`/MemoryStream frame (asserted in StreamingSpec).
  */
object EventStreams {

  /** Tumbling 1-hour window per event type with a 1-hour watermark —
    * the streaming twin of q12. State is bounded by the watermark;
    * partial aggregation keeps the shuffle to one round per trigger.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(unix_timestamp(col("w.start")).as("hour_epoch"), col("event_type"),
        col("n_events"), col("value_cents"))
}
