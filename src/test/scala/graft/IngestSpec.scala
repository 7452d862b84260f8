package graft

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.functions._
import graft.operators.Ingest

/** In-flight concurrency probe shared across tasks (local mode = one
  * JVM, so statics are executor-visible).
  */
object FetchProbe {
  val cur = new AtomicInteger(0)
  val max = new AtomicInteger(0)
  val calls = new AtomicInteger(0)
  def reset(): Unit = { cur.set(0); max.set(0); calls.set(0) }
  def enter(): Unit = {
    val c = cur.incrementAndGet()
    max.accumulateAndGet(c, Math.max(_, _))
  }
  def exit(): Unit = cur.decrementAndGet()
}

class IngestSpec extends SparkSpec {
  import spark.implicits._

  test("fetch bounds in-flight concurrency to maxConcurrent") {
    FetchProbe.reset()
    val manifest = (1 to 64).map(i => s"key_$i").toDF("k")
    val out = Ingest.fetch(manifest, "k", maxConcurrent = 3) { k =>
      FetchProbe.enter()
      try { Thread.sleep(20); k.getBytes("UTF-8") }
      finally FetchProbe.exit()
    }
    val rows = out.collect()
    assert(rows.length == 64)
    assert(rows.forall(r => new String(r.getAs[Array[Byte]]("content"), "UTF-8") == r.getString(0)))
    // the session has 8 cores, but only 3 partitions → ≤3 in flight
    assert(FetchProbe.max.get() <= 3, s"max in-flight ${FetchProbe.max.get()}")
    assert(FetchProbe.max.get() >= 2, "fetches should actually overlap")
  }

  test("fetch retries transient failures with backoff and then succeeds") {
    FetchProbe.reset()
    val manifest = Seq("a", "b").toDF("k")
    val out = Ingest.fetch(manifest, "k", maxConcurrent = 2, attempts = 3, baseDelayMs = 1) { k =>
      // every key fails on its first attempt, succeeds on retry
      if (FetchProbe.calls.getAndIncrement() < 2) sys.error(s"transient $k")
      k.getBytes("UTF-8")
    }
    assert(out.count() == 2)
    intercept[org.apache.spark.SparkException] {
      Ingest.fetch(manifest, "k", 1, attempts = 2, baseDelayMs = 1) { _ =>
        sys.error("permanent")
      }.count()
    }
  }

  test("manifest → fetch → RasterDecode composes end-to-end (the reference pipeline)") {
    import org.apache.spark.sql.graft.RasterExprs
    val fixture = graft.geo.Fixtures.ensureRasters(spark, Sf)
    val manifest = graft.geo.Geo.tiles(spark, Sf)
      .filter(col("tile_id") < graft.geo.Fixtures.RasterLimit)
      .select(col("tile_key"))
    val fetched = Ingest.fetch(manifest, "tile_key", maxConcurrent = 4) { key =>
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(fixture, s"$key.grft"))
    }
    val pixels = fetched
      .select(RasterExprs.raster_decode(col("content")).as("r"))
      .select(explode(col("r.points")))
      .count()
    val tiles = manifest.count()
    assert(pixels == tiles * 64)
  }
}
