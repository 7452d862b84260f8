package org.apache.spark.sql.graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Task-metric accumulator for the bench artifact (r15 VERDICT #1: the
  * driver/builder split on spill-heavy rows — d4 226 s vs 28-45 s on
  * the same data with the same plans — was invisible to every probe
  * the artifact carried, because the probes measure CPU contention and
  * memory bandwidth while the differing axis is heap ceiling, GC, and
  * spill volume). Summing `SparkListenerTaskEnd` task metrics between
  * per-run snapshots attributes shuffle-write and spill bytes to the
  * query that paid them, so an inflated row carries its own diagnosis:
  * same spill bytes + higher wall = environment (bandwidth, disk);
  * more spill bytes = a smaller execution-memory ceiling forcing
  * extra spills; flat spill + high process GC = heap inheritance.
  *
  * Lives in `org.apache.spark.sql.graft` because draining the
  * `private[spark]` listener bus before a snapshot is the only way a
  * snapshot taken right after `count()` returns is complete — task-end
  * events are delivered asynchronously.
  */
final class BenchMetricsListener extends SparkListener {
  private val gcMs = new AtomicLong
  private val spillDisk = new AtomicLong
  private val spillMem = new AtomicLong
  private val shufWrite = new AtomicLong
  private val shufRead = new AtomicLong

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val m = e.taskMetrics
    if (m != null) {
      gcMs.addAndGet(m.jvmGCTime)
      spillDisk.addAndGet(m.diskBytesSpilled)
      spillMem.addAndGet(m.memoryBytesSpilled)
      shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
    }
  }

  /** Drain the listener bus (bounded — a wedged queue must not hang
    * the bench), then snapshot the running totals.
    */
  def snapshot(sc: SparkContext): BenchMetricsListener.Snap = {
    try sc.listenerBus.waitUntilEmpty(2000L)
    catch { case _: java.util.concurrent.TimeoutException => () }
    BenchMetricsListener.Snap(gcMs.get, spillDisk.get, spillMem.get,
      shufWrite.get, shufRead.get)
  }
}

object BenchMetricsListener {
  final case class Snap(gcMs: Long, spillDiskBytes: Long, spillMemBytes: Long,
      shuffleWriteBytes: Long, shuffleReadBytes: Long) {
    def minus(o: Snap): Snap = Snap(gcMs - o.gcMs,
      spillDiskBytes - o.spillDiskBytes, spillMemBytes - o.spillMemBytes,
      shuffleWriteBytes - o.shuffleWriteBytes, shuffleReadBytes - o.shuffleReadBytes)
  }

  /** The cgroup memory ceiling, if one is imposed and readable —
    * cgroup v2 (`memory.max`) first, v1 fallback. A container cap
    * below the JVM's -Xmx is exactly the invisible-to-probes
    * environment difference r15 could not name.
    */
  def cgroupMemMaxBytes(): Option[Long] = {
    def rd(p: String): Option[String] =
      try Some(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)), "UTF-8").trim)
      catch { case _: Exception => None }
    rd("/sys/fs/cgroup/memory.max")
      .orElse(rd("/sys/fs/cgroup/memory/memory.limit_in_bytes"))
      .filter(_ != "max")
      .flatMap(s => scala.util.Try(s.toLong).toOption)
  }
}
