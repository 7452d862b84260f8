package graft

import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** The commit protocol's three guarantees, asserted directly:
  * exclusive version publication under concurrent writers (no lost
  * commit), snapshot isolation / time travel for pinned readers, and
  * replace-vs-append manifest semantics.
  */
class SnapshotTableSpec extends SparkSpec {
  import spark.implicits._

  test("concurrent writers win distinct versions; no commit is lost") {
    val table = scratchDir("graft_snap_race")
    val nWriters = 8
    val results = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nWriters)
    try {
      val latch = new java.util.concurrent.CountDownLatch(1)
      val futures = (0 until nWriters).map { w =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            latch.await()
            val df = Seq.tabulate(10)(i => (w.toLong, i.toLong)).toDF("writer", "i")
            results.add((w, SnapshotTable.commit(spark, table, df)))
          }
        })
      }
      latch.countDown() // release all writers at once
      futures.foreach(_.get())
    } finally pool.shutdown()
    import scala.jdk.CollectionConverters._
    val versions = results.asScala.toSeq.map(_._2).sorted
    // exactly one winner per version — the exclusive publish held
    assert(versions == (0L until nWriters.toLong))
    // no lost commit: the FINAL version (all appends) holds every
    // writer's rows exactly once
    val fin = SnapshotTable.read(spark, table)
    assert(fin.count() == nWriters * 10L)
    val perWriter = fin.groupBy("writer").count().as[(Long, Long)].collect().toMap
    assert(perWriter == (0 until nWriters).map(w => w.toLong -> 10L).toMap)
    // every intermediate manifest is a strict prefix-superset chain:
    // version v holds exactly v+1 writers' worth of rows
    (0L until nWriters.toLong).foreach { v =>
      assert(SnapshotTable.readVersion(spark, table, v).count() == (v + 1) * 10)
    }
  }

  test("snapshot isolation: a pinned version is undisturbed by later REPLACE commits") {
    val table = scratchDir("graft_snap_pin")
    SnapshotTable.commit(spark, table, (1L to 100L).toDF("x"))
    val v0 = SnapshotTable.latestVersion(table)
    val pinnedFiles = SnapshotTable.manifest(table, v0)
    val before = SnapshotTable.readVersion(spark, table, v0)
      .agg(sum("x"), count(lit(1))).as[(Long, Long)].head()
    // a replace commit rewrites the visible table to the even rows
    SnapshotTable.commit(spark, table,
      SnapshotTable.read(spark, table).filter(pmod(col("x"), lit(2)) === 0),
      replace = true)
    // latest moved; the pinned version reads bit-identically
    assert(SnapshotTable.latestVersion(table) == v0 + 1)
    val after = SnapshotTable.readVersion(spark, table, v0)
      .agg(sum("x"), count(lit(1))).as[(Long, Long)].head()
    assert(after == before && before == ((5050L, 100L)))
    assert(SnapshotTable.manifest(table, v0) == pinnedFiles)
    // the new latest is the replaced view
    assert(SnapshotTable.read(spark, table).count() == 50)
    // replace manifests share no files with the replaced version
    assert(SnapshotTable.manifest(table, v0 + 1).toSet
      .intersect(pinnedFiles.toSet).isEmpty)
  }

  test("vacuum reclaims only unreferenced files; retained versions stay readable, expired fail loudly") {
    val table = scratchDir("graft_snap_vac")
    SnapshotTable.commit(spark, table, (1L to 50L).toDF("x"))              // v0
    SnapshotTable.commit(spark, table, (51L to 100L).toDF("x"))           // v1 (append)
    SnapshotTable.commit(spark, table,
      SnapshotTable.read(spark, table).filter(col("x") <= 60), replace = true) // v2
    val v0Files = SnapshotTable.manifest(table, 0)
    val removed = SnapshotTable.vacuum(table, retainLast = 2)
    // retainLast=2 keeps {v1, v2}; v1's manifest is the append chain
    // and still references every v0 file, so nothing is reclaimable —
    // only files referenced by NO retained manifest may die
    assert(removed == 0)
    assert(SnapshotTable.readVersion(spark, table, 1).count() == 100)
    SnapshotTable.vacuum(table, retainLast = 1) // only v2 survives
    // v2's replaced view reads fully
    assert(SnapshotTable.read(spark, table).as[Long].collect().sorted.toSeq ==
      (1L to 60L))
    // v0's files are physically gone and its manifest unresolvable
    assert(v0Files.forall(f => !new java.io.File(f).exists()))
    intercept[IllegalArgumentException](SnapshotTable.manifest(table, 0))
  }

  test("commitOnce: an epoch replay returns the same version and never double-counts") {
    val table = scratchDir("graft_snap_once")
    val v1 = SnapshotTable.commitOnce(spark, table, (1L to 10L).toDF("x"), "epoch-0")
    val v2 = SnapshotTable.commitOnce(spark, table, (11L to 20L).toDF("x"), "epoch-1")
    // replay epoch-1 (foreachBatch's at-least-once contract) — same
    // version back, no new rows
    val v2b = SnapshotTable.commitOnce(spark, table, (11L to 20L).toDF("x"), "epoch-1")
    assert(v1 == 0 && v2 == 1 && v2b == v2)
    assert(SnapshotTable.read(spark, table).count() == 20)
    // idempotence survives vacuum (markers are not reclaimed)
    SnapshotTable.vacuum(table, retainLast = 1)
    assert(SnapshotTable.commitOnce(spark, table, (11L to 20L).toDF("x"), "epoch-1") == v2)
    assert(SnapshotTable.read(spark, table).count() == 20)
  }

  test("commitOnce: a crash between manifest publish and marker write does not double-apply") {
    val table = scratchDir("graft_snap_once_crash")
    SnapshotTable.commitOnce(spark, table, (1L to 10L).toDF("x"), "e-0")
    // simulate the crash window: the epoch's commit PUBLISHED (txn
    // header rides in the manifest) but the process died before the
    // side-channel marker was written — exactly the foreachBatch
    // replay scenario ADVICE r13 flagged as double-applying
    val v = SnapshotTable.commit(spark, table, (11L to 20L).toDF("x"),
      txnId = Some("e-1"))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(table, "_graft_log", "txn", "e-1")))
    // the replay must find the manifest header, NOT re-commit
    val vb = SnapshotTable.commitOnce(spark, table, (11L to 20L).toDF("x"), "e-1")
    assert(vb == v && SnapshotTable.latestVersion(table) == v)
    assert(SnapshotTable.read(spark, table).count() == 20)
    // and the marker is repaired — the next replay takes the fast path
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(table, "_graft_log", "txn", "e-1")))
    assert(SnapshotTable.commitOnce(spark, table, (11L to 20L).toDF("x"), "e-1") == v)
  }

  test("commit stats: an all-NULL stats column emits no entry instead of aborting the commit") {
    val table = scratchDir("graft_snap_nullstats")
    val df = spark.range(0, 100).toDF("id")
      .withColumn("v", org.apache.spark.sql.functions.lit(null).cast("long"))
    // v is all-NULL → min/max are null; the commit must still land,
    // recording stats for id and NOTHING for v
    val v = SnapshotTable.commit(spark, table, df, statsCols = Seq("id", "v"))
    assert(v == 0L)
    val stats = SnapshotTable.fileStats(table)
    assert(stats.nonEmpty && stats.values.forall(m => m.contains("id") && !m.contains("v")))
    // stat-less column prunes conservatively: every file is kept
    assert(SnapshotTable.readPruned(spark, table, "v", 0L, 1L).count() == 100)
  }

  test("streaming foreachBatch lands exactly-once in the snapshot table across a replay") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val table = scratchDir("graft_snap_stream")
    val in = MemoryStream[Long]
    val q = in.toDF().toDF("x").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
        SnapshotTable.commitOnce(spark, table, batch, s"epoch-$epoch"); ()
      }
      .start()
    in.addData(1L to 10L: _*); q.processAllAvailable()
    in.addData(11L to 20L: _*); q.processAllAvailable()
    q.stop()
    val epochs = SnapshotTable.latestVersion(table)
    // replay the LAST epoch by hand — the crash-between-sink-and-
    // offset-commit case — content unchanged
    SnapshotTable.commitOnce(spark, table,
      (11L to 20L).toDF("x"), s"epoch-$epochs")
    assert(SnapshotTable.read(spark, table).as[Long].collect().sorted.toSeq ==
      (1L to 20L))
  }

  test("file-stats skipping: tight ranges prune files, stat-less files read conservatively") {
    val table = scratchDir("graft_stats_prune")
    // 8 range-clustered files over ids [0, 800): each file's recorded
    // [min, max] id range is tight, so a 50-id probe prunes hard
    val df = spark.range(0, 800).toDF("id")
      .withColumn("v", col("id") * 3 + 1)
      .repartitionByRange(8, col("id"))
    SnapshotTable.commit(spark, table, df, statsCols = Seq("id"))
    val full = SnapshotTable.read(spark, table)
    val pruned = SnapshotTable.readPruned(spark, table, "id", 100L, 149L)
    // pruning is real: a strict subset of the manifest opens
    assert(pruned.inputFiles.toSet.subsetOf(full.inputFiles.toSet))
    assert(pruned.inputFiles.length < full.inputFiles.length,
      s"no pruning: ${pruned.inputFiles.length} of ${full.inputFiles.length}")
    // and invisible to the rows: the caller's predicate decides
    def census(d: org.apache.spark.sql.DataFrame) =
      d.filter(col("id").between(100, 149))
        .agg(count(lit(1)), sum(col("v"))).collect()(0)
    assert(census(pruned) == census(full))
    // recorded stats are the files' true min/max
    val stats = SnapshotTable.fileStats(table)
    assert(stats.nonEmpty)
    full.inputFiles.foreach { uri =>
      val fp = new java.net.URI(uri).getPath
      val (mn, mx) = stats(fp)("id")
      val r = spark.read.parquet(fp)
        .agg(min(col("id")), max(col("id"))).collect()(0)
      assert(mn == r.getLong(0) && mx == r.getLong(1))
    }
    // conservative arm: a later commit WITHOUT stats — its files must
    // always open, whatever the probe (no stats → no opinion)
    SnapshotTable.commit(spark, table,
      spark.range(5000, 5010).toDF("id").withColumn("v", col("id")))
    val pruned2 = SnapshotTable.readPruned(spark, table, "id", 100L, 149L)
    val statless = SnapshotTable.read(spark, table).inputFiles.toSet --
      full.inputFiles.toSet
    assert(statless.nonEmpty && statless.subsetOf(pruned2.inputFiles.toSet))
    // a probe hitting NO recorded range still returns the stat-less
    // rows (and nothing else qualifies after the caller's filter)
    val far = SnapshotTable.readPruned(spark, table, "id", 5000L, 5009L)
    assert(far.filter(col("id") >= 5000).count() == 10L)
  }

  test("append manifests extend; data files are never rewritten in place") {
    val table = scratchDir("graft_snap_append")
    SnapshotTable.commit(spark, table, (1L to 10L).toDF("x"))
    val m0 = SnapshotTable.manifest(table, 0)
    val sizes0 = m0.map(f => f -> new java.io.File(f).length()).toMap
    SnapshotTable.commit(spark, table, (11L to 20L).toDF("x"))
    val m1 = SnapshotTable.manifest(table, 1)
    assert(m0.toSet.subsetOf(m1.toSet) && m1.size > m0.size)
    // immutability: version 0's bytes did not move under version 1
    m0.foreach(f => assert(new java.io.File(f).length() == sizes0(f)))
    assert(SnapshotTable.read(spark, table).as[Long].collect().sorted.toSeq ==
      (1L to 20L))
  }

  test("merge: only files containing matched keys rewrite; carried files are path-identical bytes") {
    val table = scratchDir("graft_merge_prune")
    // 100 keys range-partitioned into ~8 files so the update's key
    // range provably misses most files
    val base = (0L until 100L).map(k => (k, k * 10L, 0L)).toDF("k", "v", "gen")
      .repartitionByRange(8, col("k"))
    SnapshotTable.commit(spark, table, base)
    val m0 = SnapshotTable.manifest(table, 0)
    val sizes0 = m0.map(f => f -> new java.io.File(f).length()).toMap
    // update keys 40..44, insert keys 200..202
    val source = ((40L to 44L).map(k => (k, k * 10L + 1L, 1L)) ++
      (200L to 202L).map(k => (k, k, 1L))).toDF("k", "v", "gen")
    val st = SnapshotTable.merge(spark, table, source, Seq("k"))
    assert(st.version == 1L)
    // the pruning contract: strictly fewer files rewrite than exist,
    // and the carried list is exactly the untouched complement
    assert(st.rewritten.nonEmpty && st.rewritten.size < m0.size)
    assert(st.carried.toSet == m0.toSet -- st.rewritten.toSet)
    // carried files appear in the new manifest BY PATH, bytes unmoved
    val m1 = SnapshotTable.manifest(table, 1)
    st.carried.foreach { f =>
      assert(m1.contains(f) && new java.io.File(f).length() == sizes0(f))
    }
    st.rewritten.foreach(f => assert(!m1.contains(f)))
    // MERGE semantics: updates applied, inserts present, rest carried
    val got = SnapshotTable.read(spark, table).as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    val exp = (0L until 100L).map(k =>
      if (k >= 40L && k <= 44L) (k, k * 10L + 1L, 1L) else (k, k * 10L, 0L)) ++
      (200L to 202L).map(k => (k, k, 1L))
    assert(got == exp)
    // snapshot isolation: version 0 reads the pre-merge content
    assert(SnapshotTable.readVersion(spark, table, 0).count() == 100L)
    assert(SnapshotTable.readVersion(spark, table, 0)
      .filter(col("gen") === 1L).count() == 0L)
  }

  test("merge: non-leading key keeps the table's column order; the change feed stays exact") {
    // the r12 ADVICE latent bug: merge used to write rewritten files
    // keys-FIRST while carried files keep the table order — changeStep's
    // positional exceptAll then diffed v against k (both long, no
    // analysis error), silently corrupting the feed. Key 'k' is the
    // SECOND column here, so this fails on the old projection.
    val table = scratchDir("graft_merge_colorder")
    val base = (0L until 100L).map(k => (k * 10L, k, 0L)).toDF("v", "k", "gen")
      .repartitionByRange(8, col("k"))
    SnapshotTable.commit(spark, table, base)
    val source = (40L to 44L).map(k => (k * 10L + 1L, k, 1L)).toDF("v", "k", "gen")
    val st = SnapshotTable.merge(spark, table, source, Seq("k"))
    // physical schema order preserved in the rewritten files
    assert(spark.read.parquet(st.added: _*).columns.toSeq == Seq("v", "k", "gen"))
    val rows = SnapshotTable.changes(spark, table, 0, 1, Seq("k"), cache = false)
      .select("k", "v", "gen", "_change_type").as[(Long, Long, Long, String)]
      .collect().toSet
    val expected =
      (40L to 44L).map(k => (k, k * 10L, 0L, "update_preimage")).toSet ++
      (40L to 44L).map(k => (k, k * 10L + 1L, 1L, "update_postimage"))
    assert(rows == expected)
  }

  test("merge: duplicate source keys fail loudly, never fan out rows") {
    val table = scratchDir("graft_merge_dupkeys")
    SnapshotTable.commit(spark, table,
      (0L until 10L).map(k => (k, k * 10L)).toDF("k", "v"))
    val dup = Seq((5L, 1L), (5L, 2L)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.merge(spark, table, dup, Seq("k"))
    }
    assert(e.getMessage.contains("duplicate keys"))
    // the failed merge published nothing
    assert(SnapshotTable.latestVersion(table) == 0L)
  }

  test("changes: toggled-files-only scan, apply law, layout-invariant deletes") {
    val table = scratchDir("graft_cdf")
    val base = (0L until 100L).map(k => (k, k * 10L, 0L)).toDF("k", "v", "gen")
      .repartitionByRange(8, col("k"))
    SnapshotTable.commit(spark, table, base)
    val source = ((40L to 44L).map(k => (k, k * 10L + 1L, 1L)) ++
      (200L to 202L).map(k => (k, k, 1L))).toDF("k", "v", "gen")
    val st = SnapshotTable.merge(spark, table, source, Seq("k"))
    SnapshotTable.commit(spark, table,
      SnapshotTable.read(spark, table).filter(col("k") < 90), replace = true)

    // commit 1 (the merge): the feed's scan set is EXACTLY the
    // toggled files — the carried files are never opened (asserted on
    // the uncached plan: InMemoryRelation hides files from inputFiles)
    val c1 = SnapshotTable.changes(spark, table, 0, 1, Seq("k"), cache = false)
    val toggled = (st.rewritten ++ st.added).map(new java.io.File(_).getCanonicalPath).toSet
    val scanned = c1.inputFiles.map(f =>
      new java.io.File(new java.net.URI(f).getPath).getCanonicalPath).toSet
    assert(scanned.nonEmpty && scanned.subsetOf(toggled),
      s"CDF scanned beyond toggled files: ${(scanned -- toggled).take(3)}")
    val rows1 = c1.select("k", "v", "gen", "_change_type").as[(Long, Long, Long, String)]
      .collect().toSet
    val expected1 =
      (40L to 44L).map(k => (k, k * 10L, 0L, "update_preimage")).toSet ++
      (40L to 44L).map(k => (k, k * 10L + 1L, 1L, "update_postimage")) ++
      (200L to 202L).map(k => (k, k, 1L, "insert"))
    assert(rows1 == expected1)

    // APPLY LAW: v0 − preimages − deletes + postimages + inserts ≡ v1
    // as multisets — the whole point of an incremental consumer
    def img(t: String) = c1.filter(col("_change_type") === t).select("k", "v", "gen")
    val applied = SnapshotTable.readVersion(spark, table, 0)
      .exceptAll(img("update_preimage")).exceptAll(img("delete"))
      .unionByName(img("update_postimage")).unionByName(img("insert"))
    val v1 = SnapshotTable.readVersion(spark, table, 1)
    assert(applied.exceptAll(v1).isEmpty && v1.exceptAll(applied).isEmpty)

    // commit 2 (the REPLACE): every file toggled, yet the row-level
    // feed shows exactly the dropped keys — layout invariance
    val rows2 = SnapshotTable.changes(spark, table, 1, 2, Seq("k"))
      .select("k", "_change_type").as[(Long, String)].collect().toSet
    val expected2 = ((90L to 99L) ++ (200L to 202L)).map(k => (k, "delete")).toSet
    assert(rows2 == expected2)

    // INCREMENTAL MAINTENANCE LAW (g41's kernel): at every step, the
    // previous version's aggregate plus signed change deltas equals
    // the next version's aggregate recomputed from scratch — count
    // and sum are abelian-group aggregates, so the identity is exact
    def agg(v: Long): Map[Long, (Long, Long)] =
      SnapshotTable.readVersion(spark, table, v)
        .groupBy((col("k") / 10).cast("long").as("b"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    (0L until 2L).foreach { v =>
      val deltas = SnapshotTable.changes(spark, table, v, v + 1, Seq("k"))
        .select(col("k"), col("v"), col("_change_type")).as[(Long, Long, String)]
        .collect()
      val maintained = scala.collection.mutable.Map(agg(v).toSeq: _*)
      deltas.foreach { case (k, value, t) =>
        val s = if (t == "insert" || t == "update_postimage") 1L else -1L
        val b = k / 10
        val (n0, sv0) = maintained.getOrElse(b, (0L, 0L))
        val next = (n0 + s, sv0 + s * value)
        if (next._1 == 0L) maintained.remove(b) else maintained(b) = next
      }
      assert(maintained.toMap == agg(v + 1), s"IVM drift at step $v -> ${v + 1}")
    }
  }
}
