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
}
