package graft

/** Shuffle/spill local-dir policy for BENCH JVMs (Bench and its
  * BenchOne children; Verify and the test suites are untouched — they
  * gate correctness, not time).
  *
  * Why: the r12→r13 precision chase bottomed out in the HOST DISK,
  * not the queries. d4 at the 100× proxy writes ~9 GB shuffle +
  * ~8.7 GB sort spill per run (event-log task metrics), twice per
  * BenchOne child (warm + timed); on this sandbox's single virtio
  * disk the OS writeback of one run's dirty pages stalls the next
  * run's spill writes nondeterministically (`/proc/pressure/io` full
  * avg10 ≈ 23% during the section), which is the measured 1.3–3.4×
  * fresh-run spread — GC was 0.6–2.2 s/run and CPU-seconds were flat
  * across slow and fast runs, so nothing in the JVM explains it.
  * Pointing `spark.local.dir` at tmpfs removes the stall: d4 fresh
  * runs land [25.5, 25.6, 23.1] s (1.10× spread) vs [23.3, 44.3,
  * 32.3] on the virtio disk. A production executor shuffles to local
  * NVMe at GB/s — the virtio disk is the sandbox's distortion, so
  * tmpfs is the FAIRER stand-in for the cost model being measured,
  * not a cheat: the bench should price the engine, not the
  * hypervisor's writeback queue.
  *
  * Policy: `SPARK_GRAFT_LOCAL_DIR` overrides (value `none` disables —
  * the resolveScaleDir convention); otherwise a per-process subdir
  * under /dev/shm when it is a writable mount (126 GiB here — d4's
  * ~18 GB/child peak fits with wide margin, and sequential children
  * each clean up on exit); otherwise Spark's default. The subdir is
  * per-pid and removed by a shutdown hook, so a crashed child's
  * orphan is the only leak and the next full run's hook discipline
  * cannot compound it.
  */
object BenchLocal {
  def dir(): Option[String] = sys.env.get("SPARK_GRAFT_LOCAL_DIR") match {
    case Some("none") => None
    case Some(d) => Some(d)
    case None =>
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite)
        Some(s"/dev/shm/graft-bench-${ProcessHandle.current().pid()}")
      else None
  }

  /** Apply the policy to a session builder and arm the cleanup hook. */
  def configure(b: org.apache.spark.sql.SparkSession.Builder)
      : org.apache.spark.sql.SparkSession.Builder = dir() match {
    case Some(d) =>
      val f = new java.io.File(d)
      f.mkdirs()
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(f)))
      b.config("spark.local.dir", d)
    case None => b
  }

  private def deleteRec(f: java.io.File): Unit = {
    val cs = f.listFiles()
    if (cs != null) cs.foreach(deleteRec)
    f.delete(): Unit
  }
}
