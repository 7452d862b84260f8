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
  * If a 10x scale directory exists (default `.data/sf1`, overridable
  * via SPARK_GRAFT_BENCH_SCALE_DIR, only auto-enabled when the main
  * run is sf0.1) the heaviest queries also run there once and the
  * output gains an `sf1` section with the measured per-query scaling
  * exponent log10(t_sf1 / t_sf0.1) — ~1.0 means linear in data size.
  */
object Bench {
  /** Queries measured at the 10x scale dir; the suite's top cost
    * drivers plus the documented-quadratic d5.
    */
  private val ScaleQueries = Seq("d4_ngram_jaccard", "d5_embed_neardup",
    "d6_repeated_spans", "d8_dup_clusters", "d9_semdedup",
    "g6_region_elevation_join", "s3_ann_ivf")

  private def loadAvg(): Double = {
    try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.getLines().next().split(" ")(0).toDouble finally src.close()
    } catch { case _: Exception =>
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    }
  }

  private def jnum(v: Double): String = if (v.isNaN) "null" else v.toString

  private def jarr(xs: Seq[Double]): String = xs.map(jnum).mkString("[", ",", "]")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Runtime.getRuntime.availableProcessors().toString)
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosConf._1, Tables.NanosConf._2)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val loadStart = loadAvg()
    // warm up the JVM/codegen/parquet paths so the first timed query
    // doesn't absorb session startup. (The scale-proxy dir carries
    // only documents/embeddings/part — fall back for direct runs
    // against it.)
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Exception => spark.read.parquet(s"$sfDir/documents.parquet").count() }
    // optional comma-separated subset for local iteration
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    var failed = List.empty[String]

    def time(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String, n: Int): Seq[Double] =
      (0 until n).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, dir).count(); true }
          catch { case e: Throwable =>
            if (!failed.contains(name)) failed ::= name
            System.err.println(s"[bench] $name failed: ${e.getMessage.take(200)}")
            false
          }
          finally Caches.clear() // release per-query caches between runs
        if (ok) Some((System.nanoTime() - t0) / 1e9) else None
      }

    def median(times: Seq[Double]): Double =
      if (times.isEmpty) Double.NaN
      else {
        val s = times.sorted
        if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
      }

    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) => (name, time(name, fn, sfDir, runs)) }
    // an all-failed query would render NaN (invalid JSON); it is
    // already listed in `failed`, so its median renders as null.
    val qs = results.map { case (k, t) => "\"" + k + "\":" + jnum(median(t)) }
      .mkString("{", ",", "}")
    val raw = results.map { case (k, t) => "\"" + k + "\":" + jarr(t) }
      .mkString("{", ",", "}")
    val total = results.map(r => median(r._2)).filterNot(_.isNaN).sum

    // 10x-scale section: one run per heavy query at the scale dir,
    // plus the exponent vs this run's sf0.1 median. An ONLY subset
    // gates this section too — a local-iteration run must not build
    // the proxy or time excluded queries (their exponents would be
    // meaningless anyway with no base median).
    val scaleWanted = ScaleQueries
      .filter(SparkEntry.queries.contains)
      .filter(name => only.forall(_.contains(name)))
    val scaleDir = Some(())
      .filter(_ => scaleWanted.nonEmpty)
      .flatMap(_ => sys.env.get("SPARK_GRAFT_BENCH_SCALE_DIR")
        .orElse(Some("/root/repo/.data/sf1").filter(_ => sfDir.contains("sf0.1"))))
      .filter(d => d.nonEmpty && d != "none")
      .flatMap { d =>
        // build-once: generate the 10x scale proxy if absent (fresh
        // checkout); non-fatal — a failed build just skips the section
        val marker = java.nio.file.Paths.get(d, "_COMPLETE")
        try {
          // the marker records the built row counts — validate them
          // against the CURRENT source corpus, or a proxy built from
          // older/different testdata would produce plausible-looking
          // but meaningless exponents in the auditable JSON
          if (java.nio.file.Files.exists(marker)) {
            val expected = Seq("documents", "embeddings", "part").map { t =>
              s"$t=${spark.read.parquet(s"$sfDir/$t.parquet").count() * tools.GenScale.Replicas}"
            }
            val recorded = new String(
              java.nio.file.Files.readAllBytes(marker), "UTF-8").linesIterator.toSeq
            if (recorded != expected) {
              System.err.println(s"[bench] scale dir $d is stale vs $sfDir; rebuilding")
              java.nio.file.Files.delete(marker)
            }
          }
          if (!java.nio.file.Files.exists(marker)) tools.GenScale.build(spark, sfDir, d)
        } catch { case e: Exception =>
          System.err.println(s"[bench] scale-dir build failed: ${e.getMessage}") }
        // gate on the build's completion marker, not one table: a
        // half-built dir would yield unexplained per-query failures
        Some(d).filter(_ => java.nio.file.Files.exists(marker))
      }
    val sf1 = scaleDir.map { d =>
      val byName = SparkEntry.queries
      val entries = scaleWanted.map { name =>
        val t = median(time(name, byName(name), d, 1))
        val base = median(results.collectFirst { case (`name`, ts) => ts }.getOrElse(Nil))
        val exp = if (t.isNaN || base.isNaN || base <= 0) Double.NaN
                  else math.log10(t / base) // 10x data => exponent ~1.0 is linear
        "\"" + name + "\":{\"sec\":" + jnum(t) + ",\"exponent\":" + jnum(exp) + "}"
      }
      s""","sf1":{"dir":"$d","runs":1,"queries":${entries.mkString("{", ",", "}")}}"""
    }.getOrElse("")

    // serialized AFTER the scale runs so their failures are recorded
    val fs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val loadEnd = loadAvg()
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs_raw":$raw,"failed":$fs,"runs":$runs,"load_start":$loadStart,"load_end":$loadEnd,"sf":"$sfDir"$sf1}""")
    spark.stop()
  }
}
