package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming tumbling window equals the batch result on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val streamDf = mem.toDF().toDF("ts", "event_type", "value")

    val q = EventStreams.tumblingCounts(streamDf)
      .writeStream.outputMode("complete").format("memory").queryName("tumbling_out").start()
    val rows = Seq(
      (Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
      (Timestamp.valueOf("2024-01-01 10:55:00"), "click", 2.0),
      (Timestamp.valueOf("2024-01-01 11:05:00"), "click", 4.0),
      (Timestamp.valueOf("2024-01-01 10:30:00"), "view", 8.0))
    mem.addData(rows: _*)
    q.processAllAvailable()
    val streamed = spark.table("tumbling_out")
      .orderBy("hour_epoch", "event_type").collect().toSeq
    q.stop()

    val batch = EventStreams.tumblingCounts(rows.toDF("ts", "event_type", "value"))
      .orderBy("hour_epoch", "event_type").collect().toSeq
    assert(streamed == batch)
    // spot-check: 10:00 click bucket has 2 events, 300 cents
    val b10 = batch.find(r => r.getString(1) == "click" &&
      r.getLong(0) == Timestamp.valueOf("2024-01-01 10:00:00").getTime / 1000).get
    assert(b10.getLong(2) == 2 && b10.getLong(3) == 300)
  }
}
