package graft.bench

import org.apache.spark.sql.SparkSession

/** Mechanism probe for the g6 IN-SUITE anomaly (r13 VERDICT #2: at
  * the 100x proxy, `g6_region_elevation_join` measured ~40 s in every
  * interleaved in-suite pass — rotation-independent — vs 5.5 s in a
  * fresh JVM on the same data; every other sf10 query's in-suite time
  * tracked its fresh time). The candidate mechanisms and how this
  * probe separates them:
  *
  *  - PAGE CACHE / tmpfs residue: ruled out by polluting with the
  *    sf0.01 suite — it touches ~100 MB against a 128 GiB box, so if
  *    g6 still collapses afterwards, cache eviction cannot be why.
  *  - MEMORY/GC pressure: the probe reports per-run GC seconds; the
  *    collapse reproduces with gc_sec ≈ flat.
  *  - SESSION state (AQE stats carryover, cached plans): the probe
  *    re-times after building a FRESH SparkSession in the same JVM —
  *    the collapse survives a session swap (the r9 finding, now
  *    instrumented), so session state is not the carrier.
  *  - MEGAMORPHIC JIT CALL SITES: the one thing a new session cannot
  *    reset. Running hundreds of DISTINCT whole-stage-codegen classes
  *    trains the JVM's inline caches at the shared iterator/row-access
  *    call sites (BufferedRowIterator.hasNext, UnsafeRow accessors,
  *    TaskMemoryManager paths) from monomorphic to megamorphic;
  *    C2-compiled loops that inlined through those sites recompile
  *    with virtual dispatch and stay that way for the JVM's lifetime.
  *    g6 is the suite's most DISPATCH-DENSE pure-CPU query — a
  *    per-pixel generator fan-out (explode) into a hash aggregate,
  *    ~10^9 iterator steps at sf10 with almost no I/O or shuffle to
  *    hide latency — so it amplifies the dispatch tax ~7x while the
  *    shuffle/spill-bound d-family (whose in-suite ≈ fresh) buries
  *    the same tax under I/O waits.
  *
  * The probe's CPU-seconds column is the discriminator for the JIT
  * claim: megamorphic dispatch burns CPU, so wall and process-CPU
  * inflate TOGETHER (an I/O stall would inflate wall with CPU flat).
  *
  * Usage: `JitProbe <scaleDir> <polluteDir> [query]` — times the
  * query fresh (BenchOne protocol: untimed warm, then timed), runs
  * the full SparkEntry suite once at `polluteDir` (sf0.01: ~2 min,
  * data too small to move any cache), re-times, swaps in a fresh
  * session, times again. Output: one `JITPROBE` line per phase with
  * wall/gc/cpu seconds.
  *
  * Consequence for the BENCH DESIGN (why the published numbers are
  * sound): the sf10 primaries are FRESH-JVM child processes
  * (Bench.benchOneProc) precisely because in-suite numbers measure
  * JIT history, not the query; the in-suite columns stay in the
  * artifact as witnesses of exactly this effect.
  */
object JitProbe {
  def main(args: Array[String]): Unit = {
    val scaleDir = args(0)
    val polluteDir = args(1)
    val q = if (args.length > 2) args(2) else "g6_region_elevation_join"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    def newSession(): SparkSession = {
      val s = graft.BenchLocal.configure(SparkSession.builder()
        .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
        .master(s"local[$cpus]"))
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config(graft.Tables.NanosConf._1, graft.Tables.NanosConf._2)
        .config("spark.sql.debug.maxToStringFields", "2000")
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      s
    }
    var spark = newSession()
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime.max(0L)).sum
    }
    def cpuNs(): Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
        case _ => -1L
      }
    def time1(label: String): Double = {
      graft.Caches.clear()
      System.gc()
      val g0 = gcMs(); val c0 = cpuNs(); val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, scaleDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = if (c0 < 0) Double.NaN else (cpuNs() - c0) / 1e9
      println(f"JITPROBE $label wall=$wall%.2f gc=${(gcMs() - g0) / 1e3}%.2f cpu=$cpu%.1f")
      graft.Caches.clear()
      wall
    }
    // fresh-JVM cost, BenchOne protocol: untimed warm then timed
    try spark.read.parquet(s"$scaleDir/documents.parquet").count()
    catch { case _: Exception => () }
    graft.SparkEntry.queries(q)(spark, scaleDir).count()
    graft.Caches.clear()
    time1("fresh")
    // pollute: ONE pass of the full suite at the tiny dir — hundreds
    // of distinct codegen classes through the shared call sites,
    // negligible data volume
    val t0 = System.nanoTime()
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, polluteDir).count()
      catch { case _: Throwable => () }
      finally graft.Caches.clear()
    }
    println(f"JITPROBE polluted-suite-pass ${(System.nanoTime() - t0) / 1e9}%.0f s")
    time1("post-pollution-1")
    time1("post-pollution-2")
    // fresh SESSION, same JVM: resets every Spark-level carrier (AQE
    // stats, plan/codegen caches, broadcast state); only JVM-level
    // state (JIT profiles) survives this swap
    spark.stop()
    spark = newSession()
    time1("fresh-session-same-jvm")
    spark.stop()
  }
}
