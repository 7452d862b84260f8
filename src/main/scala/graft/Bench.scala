package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entrypoint: times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Each query runs
  * SPARK_GRAFT_BENCH_RUNS times (default 3) and reports the MEDIAN —
  * first runs absorb JIT/codegen/page-cache warmup and local[n] timing
  * noise is ±15%, so single-shot numbers are not comparable across
  * rounds. Caches are released between runs so every run pays the
  * query's true cost.
  *
  * The JSON is built to be AUDITABLE after the fact: alongside each
  * median it carries the raw per-run times (`runs_raw`) and the
  * 1-minute system load average at start and end (`load_start`/
  * `load_end`), so a reader can tell a contended-machine artifact
  * from a real regression without re-executing (a median hides which
  * runs were polluted; the raw array + load do not).
  *
  * Scale decades: if a 10x dir exists (default `.data/sf1`,
  * overridable via SPARK_GRAFT_BENCH_SCALE_DIR, auto-built when the
  * main run is sf0.1) the heaviest queries run there as
  * median-of-SPARK_GRAFT_BENCH_SCALE_RUNS (default 3 — a single run
  * has no median to absorb a load spike, which is exactly how
  * BENCH_r04's sf1 section got polluted) and the output gains an
  * `sf1` section; a 100x dir (default `.data/sf10`,
  * SPARK_GRAFT_BENCH_SCALE10_DIR) adds an `sf10` section. Every
  * scale entry's `exponent` is normalized PER DECADE —
  * log10(t/t_base)/decades — so sf1 and sf10 exponents are directly
  * comparable (~1.0 = linear in data size).
  *
  * Contention gate: if the 1-minute load average exceeds
  * SPARK_GRAFT_BENCH_LOAD_GATE (default 2.5) at start, Bench waits
  * up to 3 minutes for a quiet box; if the load never drops the run
  * proceeds but the JSON is stamped `"contended": true` — a
  * contended artifact self-declares it cannot be compared across
  * rounds.
  *
  * MID-RUN pollution (r5 lesson: the start gate passed, then the box
  * loaded up and t6's raws read [1.38, 2.22, 3.26]): the loadavg
  * can't police the run it is part of, but the raw arrays can — any
  * query whose runs_raw max/min exceeds 2.5x lands in
  * `"spread_flags"`, and `queries_min` carries each query's MINIMUM
  * run, the most contention-resistant point estimate for cross-round
  * comparison. The full JSON is also written to `target/bench.json`
  * so the artifact of record survives driver-side stdout truncation.
  */
object Bench {
  /** Queries measured at the 10x scale dir: the suite's top cost
    * drivers, the documented-quadratic d5, and (r6) one query per
    * previously-uncovered cost family — d2 (collapse-bearing LSH),
    * t6 (three joins), s5 (partition-pruned ADC), m3 (codec-bound) —
    * so no family's scaling rests on extrapolation.
    */
  private val ScaleQueries = Seq("d4_ngram_jaccard", "d5_embed_neardup",
    "d6_repeated_spans", "d8_dup_clusters", "d9_semdedup",
    "g6_region_elevation_join", "s3_ann_ivf", "d2_minhash_lsh",
    "t6_tfidf", "s5_ann_ivfpq", "m3_audio_manifest",
    "t8_heavy_hitters", "d11_line_dedup", "m5_audio_neardup",
    "p7_dsir_select", "m6_image_neardup", "p8_web_pipeline",
    // r7 third-session additions with a measured first decade: p9
    // (cluster-select composition, exp 0.27), s7 (kNN graph —
    // adaptive nlist pins list size, see Ann.knnJoin), m7/m8
    // (codec-bound). q36/q37 stay sf0.1-only: the proxy carries no
    // events table.
    "p9_cluster_select", "s7_knn_join", "m7_scene_cuts", "m8_vad_segments",
    // r10 additions: the new document/part-based operators with real
    // cost (d14/d15/s12 ride d2/d8 pair machinery, p13 two-pass
    // prefix, q55 frontier reduction, m11 codec-bound); q56-q59 stay
    // sf0.1-only — the proxy carries no lineitem/events tables.
    "d14_source_overlap", "d15_cluster_purity", "s12_pair_rescore",
    "p13_curriculum", "q55_skyline", "m11_clipping_audit",
    // r10 fourth-session additions (document/embedding-based — the
    // lineitem/orders-based q60-q68 stay sf0.1-only, same proxy
    // reason): t20/t21 explode the whole token stream, s13 fuses two
    // corpus-sized candidate passes, m13 is a full-pixel decode sweep
    "t20_vocab_census", "t21_burstiness", "s13_hybrid_rrf",
    "m13_pixel_stats",
    // r12 additions (document/embedding-based): q72 shuffles a
    // corpus-sized distinct into the edge frame, t23 explodes the
    // whole token stream, s15 runs all three index searches. The
    // events/orders-based q71/q73 and the fixture-bound g38/g39/j6
    // stay sf0.1-only (proxy carries neither table, fixtures are
    // size-capped).
    "q72_pagerank", "t23_zipf", "s15_recall_audit")

  /** The 100x decade keeps the original six cost drivers: d5 is the
    * documented-quadratic exactness oracle (capped at sf1 by design;
    * d9 is its scale path), and the r6 sf1 additions stay sf1-only —
    * their first decade bounds the exponent at a fraction of the
    * 100x wall-clock.
    */
  private val Scale10Queries = Seq("d4_ngram_jaccard", "d6_repeated_spans",
    "d8_dup_clusters", "d9_semdedup", "g6_region_elevation_join", "s3_ann_ivf")

  /** Fresh-JVM single-query measurement: spawn [[BenchOne]] as a
    * CHILD PROCESS (same classpath, same JDK-17 add-opens as
    * build.sbt's forked run) and parse its `BENCHONE <q> <sec>`
    * marker line. A child process — not an in-JVM restartSession —
    * because megamorphic JIT call-site profiles survive any in-JVM
    * reset (r9: g6 at sf10 ~46 s in a fresh SESSION late in the full
    * bench vs ~5 s in a fresh JVM on the same data); the honest
    * standalone cost requires a new JVM. NaN on any spawn/parse
    * failure — an isolated number must never abort the suite.
    */
  private def benchOneProc(dir: String, name: String): Double = {
    val javaBin = new java.io.File(new java.io.File(
      sys.props("java.home"), "bin"), "java").getAbsolutePath
    val opens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val xmx = s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}"
    val cmd = Seq(javaBin) ++ opens ++ Seq(xmx, "-cp",
      sys.props("java.class.path"), "graft.BenchOne", dir, name)
    try {
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
      p.waitFor()
      out.linesIterator.collectFirst {
        // line shape: BENCHONE <name> <sec> [gc=<sec>] — index, not
        // last, so diagnostic tail tokens never break the parse
        case l if l.startsWith(s"BENCHONE $name ") => l.split(' ')(2).toDouble
      }.getOrElse {
        System.err.println(s"[bench] BenchOne $name: no marker line; tail: ${out.takeRight(300)}")
        Double.NaN
      }
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] BenchOne $name spawn failed: ${e.getMessage}")
      Double.NaN
    }
  }

  private def loadAvg(): Double = {
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.getLines().next().split(" ")(0).toDouble finally src.close()
    } catch { case _: Exception =>
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    }
  }

  /** Core-saturating contention probe: every hardware thread spins a
    * FIXED deterministic xorshift loop and the probe reports the wall
    * seconds for all of them to finish. On a quiet box this is a
    * stable constant (~0.2-0.4 s, recorded per round in SURVEY §7);
    * under co-tenant load the scheduler time-slices the spinners and
    * the probe inflates by roughly the contention factor. Sampled at
    * scale-section pass boundaries (while Spark is idle) it dates
    * contention that arrives MID-run — the r7 failure mode, where
    * both interleaved sf10 passes ran 3-5x their quiet cost and
    * nothing in the artifact could say whether the box or the engine
    * was slow. loadavg alone cannot: it lags a minute and counts our
    * own just-finished executor threads.
    */
  private def probeSec(): Double = {
    val nThreads = Runtime.getRuntime.availableProcessors()
    val work = 150000000L
    val t0 = System.nanoTime()
    val ts = (0 until nThreads).map { i =>
      val t = new Thread(() => {
        var x = 0x9E3779B97F4A7C15L + i
        var n = 0L
        while (n < work) {
          x ^= x << 13; x ^= x >>> 7; x ^= x << 17
          n += 1
        }
        // publish so the loop cannot be elided
        if (x == 42L) System.err.println("")
      })
      t.setDaemon(true); t.start(); t
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  private def jnum(v: Double): String = if (v.isNaN) "null" else v.toString

  private def jarr(xs: Seq[Double]): String = xs.map(jnum).mkString("[", ",", "]")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    def newSession(): SparkSession = {
      // tmpfs shuffle/spill when available (BenchLocal: the r13
      // precision fix — the virtio disk's writeback stall was the
      // measured 1.3-3.4x fresh-run spread, not the queries)
      val s = BenchLocal.configure(SparkSession.builder()
        .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
        .master(s"local[$cpus]"))
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config(Tables.NanosConf._1, Tables.NanosConf._2)
        // wide schemas (m-family structs) otherwise spam truncation
        // WARNings into the artifact log on every plan print
        .config("spark.sql.debug.maxToStringFields", "2000")
        .getOrCreate()
      // ERROR, not WARN: bench stderr is part of the audited artifact;
      // per-query WARN noise (codegen fallbacks, AQE notices) buries
      // the gate/failure lines a reader actually needs
      s.sparkContext.setLogLevel("ERROR")
      s
    }
    // (r9 ADVICE: the in-JVM restartSession reset that used to live
    // here is gone — isolated numbers now come from BenchOne child
    // JVMs, the only reset that also clears JIT call-site profiles.)
    val spark = newSession()
    // contention gate: wait (bounded) for a quiet box; stamp the
    // artifact if it never quiets down rather than committing numbers
    // that only reproduce under the same background load.
    val loadGate = sys.env.getOrElse("SPARK_GRAFT_BENCH_LOAD_GATE", "2.5").toDouble
    var loadStart = loadAvg()
    var waitedSec = 0
    while (loadStart > loadGate && waitedSec < 180) {
      System.err.println(f"[bench] 1-min load $loadStart%.2f > gate $loadGate%.1f; waiting for a quiet box (${waitedSec}s)")
      Thread.sleep(10000); waitedSec += 10; loadStart = loadAvg()
    }
    val contended = loadStart > loadGate
    val probeStart = probeSec()
    // warm up the JVM/codegen/parquet paths so the first timed query
    // doesn't absorb session startup. (The scale-proxy dir carries
    // only documents/embeddings/part — fall back for direct runs
    // against it.)
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Exception => spark.read.parquet(s"$sfDir/documents.parquet").count() }
    // optional comma-separated subset for local iteration
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    var failed = List.empty[String]

    /** Total JVM GC milliseconds so far (all collectors). */
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime.max(0L)).sum
    }
    // per-query GC seconds (summed over runs) — the r7 sf10 finding:
    // late-suite queries inflated up to 10x over their isolated cost
    // (g6: 53-82 s in-suite vs 4.6-10.7 isolated) and nothing in the
    // artifact said WHY. GC time riding next to wall time makes a
    // JVM-state artifact self-diagnosing: slow + high gc_sec = heap
    // inheritance, slow + low gc_sec = the query itself.
    val gcByQuery = scala.collection.mutable.LinkedHashMap[String, Double]()

    def time(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String, n: Int, gcFirst: Boolean = false): Seq[Double] =
      (0 until n).flatMap { _ =>
        // scale sections opt in to a pre-run System.gc(): hundreds of
        // earlier query executions leave the old gen full of dead
        // cache blocks, and a 20-80 s scale query otherwise pays the
        // inherited collection mid-measurement
        if (gcFirst) System.gc()
        val g0 = gcMs()
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, dir).count(); true }
          catch { case e: Throwable =>
            if (!failed.contains(name)) failed ::= name
            System.err.println(s"[bench] $name failed: ${e.getMessage.take(200)}")
            false
          }
          finally Caches.clear() // release per-query caches between runs
        gcByQuery(name) = gcByQuery.getOrElse(name, 0.0) + (gcMs() - g0) / 1e3
        if (ok) Some((System.nanoTime() - t0) / 1e9) else None
      }

    def median(times: Seq[Double]): Double =
      if (times.isEmpty) Double.NaN
      else {
        val s = times.sorted
        if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
      }

    /** A runs_raw array whose max/min exceeds 2.5x — with the maximum
      * NOT in the first run — means load arrived MID-run: JIT/codegen
      * warmup only ever makes run 0 the slowest, so a later run being
      * the outlier is the contention signature (r5's polluted t6 read
      * [1.38, 2.22, 3.26]). The median of such an array is not
      * comparable across rounds and must self-declare. Sub-second
      * absolute spreads are exempt (the 0.75 s floor): scheduler
      * jitter on a 0.2 s query trips the ratio on a QUIET box — a
      * quiet r6 run flagged 10 such queries — and a flag that fires
      * without pollution can't adjudicate anything; cross-round
      * regressions that matter move seconds, not fractions.
      */
    def spreadPolluted(times: Seq[Double]): Boolean =
      times.size >= 2 && times.min > 0 && times.max / times.min > 2.5 &&
        times.indexOf(times.max) != 0 && times.max - times.min > 0.75

    /** The r6 miss (VERDICT #4a): p1 ran [22.7, 10.0, 14.5] — run 0
      * looked like JIT warmup (max at index 0 is exempt above), but
      * the POST-warmup runs disagreed by 1.45x / 4.5 s, which warmup
      * cannot explain: after run 0 the JVM is warm, so runs 1..n on a
      * quiet box sit within ~±15%. A wide post-warmup spread means
      * load arrived (or left) mid-run and the median is polluted even
      * though no single ratio tripped 2.5x. Thresholds: ratio ≥ 1.4
      * with ≥ 1.5 s absolute delta — quiet-box jitter stays under
      * both, and sub-second scheduler noise can't fire it.
      */
    def postWarmupPolluted(times: Seq[Double]): Boolean = {
      val later = times.drop(1)
      later.size >= 2 && later.min > 0 && later.max / later.min >= 1.4 &&
        later.max - later.min >= 1.5
    }

    def polluted(times: Seq[Double]): Boolean =
      spreadPolluted(times) || postWarmupPolluted(times)

    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) => (name, time(name, fn, sfDir, runs)) }
    // an all-failed query would render NaN (invalid JSON); it is
    // already listed in `failed`, so its median renders as null.
    val qs = results.map { case (k, t) => "\"" + k + "\":" + jnum(median(t)) }
      .mkString("{", ",", "}")
    val raw = results.map { case (k, t) => "\"" + k + "\":" + jarr(t) }
      .mkString("{", ",", "}")
    val mins = results.map { case (k, t) =>
      "\"" + k + "\":" + jnum(if (t.isEmpty) Double.NaN else t.min) }
      .mkString("{", ",", "}")
    val spreadFlags = new scala.collection.mutable.ArrayBuffer[String]()
    results.foreach { case (k, t) => if (polluted(t)) spreadFlags += k }
    val total = results.map(r => median(r._2)).filterNot(_.isNaN).sum

    // Scale sections: median-of-n per heavy query at each scale dir,
    // plus the per-decade exponent vs this run's sf0.1 median. An
    // ONLY subset gates these too — a local-iteration run must not
    // build the proxies or time excluded queries (their exponents
    // would be meaningless anyway with no base median).

    /** Resolve (and build-once if absent) a scale-proxy dir; None
      * disables the section. The _COMPLETE marker records the built
      * row counts — validated against the CURRENT source corpus, or
      * a proxy built from older/different testdata would produce
      * plausible-looking but meaningless exponents in the JSON.
      */
    def resolveScaleDir(envKey: String, default: String, replicas: Int,
        wanted: Seq[String]): Option[String] = Some(())
      .filter(_ => wanted.nonEmpty)
      .flatMap(_ => sys.env.get(envKey)
        .orElse(Some(default).filter(_ => sfDir.contains("sf0.1"))))
      .filter(d => d.nonEmpty && d != "none")
      .flatMap { d =>
        val marker = java.nio.file.Paths.get(d, "_COMPLETE")
        try {
          if (java.nio.file.Files.exists(marker)) {
            val expected = Seq("documents", "embeddings", "part").map { t =>
              s"$t=${spark.read.parquet(s"$sfDir/$t.parquet").count() * replicas}"
            } :+ bench.GenScale.CipherTag
            val recorded = new String(
              java.nio.file.Files.readAllBytes(marker), "UTF-8").linesIterator.toSeq
            if (recorded != expected) {
              System.err.println(s"[bench] scale dir $d is stale vs $sfDir; rebuilding")
              java.nio.file.Files.delete(marker)
            }
          }
          if (!java.nio.file.Files.exists(marker))
            bench.GenScale.build(spark, sfDir, d, replicas)
        } catch { case e: Exception =>
          System.err.println(s"[bench] scale-dir build failed: ${e.getMessage}") }
        // gate on the build's completion marker, not one table: a
        // half-built dir would yield unexplained per-query failures
        Some(d).filter(_ => java.nio.file.Files.exists(marker))
      }

    /** One scale section: `,"<label>":{...}` or "" when disabled.
      * `exponent` is log10(t/t_base)/decades — normalized per decade
      * so sf1 and sf10 entries compare directly; raw per-run times
      * ride along for the same auditability as the main suite.
      */
    /** `interleave`: run the section as runsN PASSES over the query
      * list, each pass's order rotated by pass×(size/runsN), instead
      * of n consecutive runs per query (VERDICT r6 #4c). With the
      * consecutive shape a query inherits whatever page-cache /
      * memory-store pressure the queries before it left behind — r6's
      * g6 measured 56.4 s in-suite vs 7.9 s isolated purely from
      * running after the d-family — and no amount of per-query runs
      * reveals it because every run sits in the same neighborhood.
      * Rotation gives each query runs in different neighborhoods
      * (including one near the front for queries mid-list), so its
      * MIN approximates the isolated cost and an ordering-inherited
      * median self-declares through the spread flags. Deterministic
      * (no RNG): artifacts stay reproducible.
      */
    val scaleTotals = scala.collection.mutable.LinkedHashMap[String, Double]()

    /** `freshPrimary` (r10 VERDICT #1; estimator per r12 VERDICT #1):
      * the section's PRIMARY numbers (`sec` = MIN of the fresh runs,
      * plus `min`/`runs_raw`/`exponent`; `fresh_median` is the old
      * estimator, kept as a column) come from runsN FRESH-JVM
      * child processes per query (benchOneProc → BenchOne: untimed
      * warm run, then one timed run, in a JVM that has executed
      * nothing else) — one JVM running 185 queries back-to-back
      * megamorphizes the codegen call sites, so in-suite sf10 numbers
      * measure JIT pollution, not the queries (r10: g6 72.6 s
      * in-suite vs 9.6 s fresh; a real regression would be equally
      * invisible). The in-suite interleaved passes are KEPT as the
      * secondary `in_suite`/`in_suite_min`/`in_suite_raw` columns —
      * they still witness suite-ordering/memory-pressure effects —
      * and pollution flags arm on both arrays (`label:q` fresh,
      * `label-insuite:q` in-suite). r9 ADVICE history: the first
      * "isolated" cut used an in-JVM restartSession, which resets
      * Spark state but NOT megamorphic JIT profiles; the child
      * process replaced it, and this round it became the primary.
      */
    def scaleSection(label: String, envKey: String, default: String,
        replicas: Int, decades: Double, runsN: Int, queries: Seq[String],
        interleave: Boolean = false, freshPrimary: Boolean = false): String = {
      val wanted = queries
        .filter(SparkEntry.queries.contains)
        .filter(name => only.forall(_.contains(name)))
      resolveScaleDir(envKey, default, replicas, wanted).map { d =>
        // quiet-wait gate per SECTION (the start-of-bench gate cannot
        // police load that arrives during the main suite), then a
        // loadavg + saturating-probe sample at every pass boundary so
        // mid-section contention is DATED in the artifact, not
        // inferred from query spreads after the fact (r7: both sf10
        // passes ran 3-5x quiet cost, flags silent on the uniform
        // slowdown).
        var sl = loadAvg(); var w = 0
        while (sl > loadGate && w < 120) { Thread.sleep(10000); w += 10; sl = loadAvg() }
        val loadPasses = scala.collection.mutable.ArrayBuffer[Double]()
        val probePasses = scala.collection.mutable.ArrayBuffer[Double]()
        def sample(): Unit = { loadPasses += loadAvg(); probePasses += probeSec() }
        val byName = scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
        wanted.foreach(byName(_) = Vector.empty)
        if (interleave && wanted.size > 1) {
          val step = math.max(1, wanted.size / math.max(1, runsN))
          for (pass <- 0 until runsN) {
            sample()
            val off = (pass * step) % wanted.size
            val rotated = wanted.drop(off) ++ wanted.take(off)
            // odd passes also reverse: rotation alone can keep the
            // same heavy→light adjacency (d9 preceded g6 in both
            // rotations of the r6 list); reversal guarantees each
            // pair's order flips at least once across passes
            val order = if (pass % 2 == 1) rotated.reverse else rotated
            order.foreach { name =>
              byName(name) ++= time(name, SparkEntry.queries(name), d, 1, gcFirst = true)
            }
          }
        } else {
          sample()
          wanted.foreach { name =>
            byName(name) = time(name, SparkEntry.queries(name), d, runsN, gcFirst = true).toVector
          }
        }
        sample()
        val freshByName = scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
        if (freshPrimary) {
          // runsN independent fresh-JVM points per query, interleaved
          // across queries (pass-major) so no query's fresh runs sit
          // in one thermal/page-cache neighborhood; probe before each
          // pass dates any contention
          wanted.foreach(freshByName(_) = Vector.empty)
          for (_ <- 0 until runsN) {
            sample()
            wanted.foreach { name =>
              val v = benchOneProc(d, name)
              if (!v.isNaN) freshByName(name) ++= Vector(v)
            }
          }
        }
        val entries = wanted.map { name =>
          val suite = byName(name)
          val primary = if (freshPrimary) freshByName(name) else suite
          /** r12 VERDICT #1: fresh-JVM medians were IMPRECISE — two
            * runs of identical code disagreed up to 3.4x (d4 raw
            * [100.1, 29.7] vs 31.9 s quiet) because independent child
            * processes land in different OS page-cache neighborhoods
            * (the interleaved passes evict each other's parquet
            * pages), so mean/median measure cache state, not the
            * query. The MIN of the fresh runs is the page-cache-warm
            * cost — SURVEY §7's "the warm run IS the signal" — and is
            * the estimator that two consecutive bench runs agree on.
            * Fresh sections therefore promote MIN to `sec` (the
            * cross-round primary); the median stays alongside as
            * `fresh_median` so the old column remains auditable.
            */
          val pmin = if (primary.isEmpty) Double.NaN else primary.min
          val t = if (freshPrimary) pmin else median(primary)
          val base = median(results.collectFirst { case (`name`, r) => r }.getOrElse(Nil))
          val exp = if (t.isNaN || base.isNaN || base <= 0) Double.NaN
                    else math.log10(t / base) / decades // ~1.0 = linear
          if (polluted(primary)) spreadFlags += s"$label:$name"
          if (freshPrimary && polluted(suite)) spreadFlags += s"$label-insuite:$name"
          val secondary = if (freshPrimary)
            ",\"fresh_median\":" + jnum(median(primary)) +
            ",\"in_suite\":" + jnum(median(suite)) +
            ",\"in_suite_min\":" + jnum(if (suite.isEmpty) Double.NaN else suite.min) +
            ",\"in_suite_raw\":" + jarr(suite)
          else ""
          "\"" + name + "\":{\"sec\":" + jnum(t) +
            ",\"min\":" + jnum(pmin) +
            ",\"exponent\":" + jnum(exp) + secondary +
            ",\"runs_raw\":" + jarr(primary) + "}"
        }
        scaleTotals(label) = wanted.map { n =>
          val p = if (freshPrimary) freshByName(n) else byName(n)
          if (freshPrimary) { if (p.isEmpty) Double.NaN else p.min } else median(p)
        }.filterNot(_.isNaN).sum
        s""","$label":{"dir":"$d","runs":$runsN,"interleaved":$interleave,"load_passes":${jarr(loadPasses.toSeq)},"probe_sec":${jarr(probePasses.toSeq)},"queries":${entries.mkString("{", ",", "}")}}"""
      }.getOrElse("")
    }

    val scaleRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_SCALE_RUNS", "3").toInt
    // default 3 at 100x (r12 VERDICT #1 — was 2): the fresh-primary
    // estimator is now MIN, and min-of-2 has a coin-flip chance both
    // runs land page-cache cold (d4's r12 raws [100.1, 29.7] were one
    // cold + one warm); a third interleaved pass makes at least one
    // warm-neighborhood run near-certain at ~2-4 min extra wall
    val scale10Runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_SCALE10_RUNS", "3").toInt
    val sf1 = scaleSection("sf1", "SPARK_GRAFT_BENCH_SCALE_DIR",
      "/root/repo/.data/sf1", bench.GenScale.Replicas, 1.0, scaleRuns, ScaleQueries)
    val sf10 = scaleSection("sf10", "SPARK_GRAFT_BENCH_SCALE10_DIR",
      "/root/repo/.data/sf10", 100, 2.0, scale10Runs, Scale10Queries,
      interleave = true, freshPrimary = true)

    // serialized AFTER the scale runs so their failures are recorded
    val fs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val sfl = spreadFlags.map("\"" + _ + "\"").mkString("[", ",", "]")
    val loadEnd = loadAvg()
    // per-query GC seconds summed over every run of that query (main
    // suite + scale sections share keys with "sf1:"/"sf10:" prefixes
    // absent — scale runs accumulate into the same key; the DELTA a
    // reader needs is gc vs wall within one artifact)
    val gcs = gcByQuery.map { case (k, v) =>
      "\"" + k + "\":" + jnum(math.rint(v * 1000) / 1000) }.mkString("{", ",", "}")
    // start probe runs before the first timed query would be ideal,
    // but probing here (after the suite) still brackets the run: a
    // quiet probe_end with a quiet probe in every scale section means
    // no co-tenant arrived during the measured windows
    val probeEnd = probeSec()
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_min":$mins,"runs_raw":$raw,"gc_sec":$gcs,"spread_flags":$sfl,"failed":$fs,"runs":$runs,"contended":$contended,"load_start":$loadStart,"load_end":$loadEnd,"probe_start":${jnum(probeStart)},"probe_end":${jnum(probeEnd)},"sf":"$sfDir"$sf1$sf10}"""
    println(json)
    // the artifact of record, immune to stdout capture truncation.
    // ONLY-subset runs write a stamped side file instead (VERDICT r6
    // #4b): a local spot-bench must never overwrite the full-suite
    // artifact — in r6 a judge subset run clobbered the round's
    // bench.json and the real numbers survived only in quoted text.
    val artifact = if (only.isEmpty) "target/bench.json"
      else s"target/bench-subset-${System.currentTimeMillis()}.json"
    try java.nio.file.Files.write(java.nio.file.Paths.get(artifact),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write $artifact: ${e.getMessage}") }
    // COMPACT summary as the FINAL stdout line (r8 VERDICT #5): the
    // round driver captures only the last ~2000 chars of stdout, and
    // the full JSON's 143-query maps overflow that (BENCH_r08 landed
    // `parsed: null`). Totals + per-scale totals + flags fit with
    // room; the full artifact lives one line up and in $artifact.
    val medQ = median(results.map(r => median(r._2)).filterNot(_.isNaN))
    val scaleQs = scaleTotals.map { case (l, v) =>
      "\"" + l + "_total\":" + jnum(v) }.mkString(",")
    val compactQueries = ("\"" + sfDir.split('/').last + "_total\":" + jnum(total)) +
      (if (scaleQs.nonEmpty) "," + scaleQs else "")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":{$compactQueries},"n_queries":${results.size},"median_query_sec":${jnum(medQ)},"spread_flags":$sfl,"failed":$fs,"contended":$contended,"probe_start":${jnum(probeStart)},"probe_end":${jnum(probeEnd)},"sf":"$sfDir","artifact":"$artifact"}""")
    spark.stop()
  }
}
