package graft

import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** The write-side bloom-filter contract, proved on the written bytes
  * via parquet-hadoop's own reader (not through Spark): the filter
  * exists exactly for the enabled column, never misses a written key
  * (bloom filters have NO false negatives), and holds absent-key
  * false positives to the designed rate.
  */
class ParquetSinkSpec extends SparkSpec {

  test("bloom sink: filter present only for the enabled column; no false negatives") {
    val dir = scratchDir("graft_bloom")
    // coalesce(1): ONE file/row group, so the present-key probe below
    // interrogates the row group that actually holds each key — with
    // multiple groups a false positive elsewhere could mask a genuine
    // false negative in the containing group
    val keys = Tables.orders(spark, Sf)
      .select(col("o_orderkey"), col("o_custkey")).coalesce(1)
    graft.sources.ParquetSink.writeWithBloom(keys, dir, Seq("o_orderkey"), ndv = 10000L)

    val present = keys.select(col("o_orderkey")).collect().map(_.getLong(0)).toSet
    val conf = new org.apache.hadoop.conf.Configuration()
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.nonEmpty)

    var absentHits = 0L
    var absentProbes = 0L
    var sawOrderkeyFilter = false
    files.foreach { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getPath), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        reader.getFooter.getBlocks.asScala.foreach { rg =>
          val bfr = reader.getBloomFilterDataReader(rg)
          val okCol = rg.getColumns.asScala
            .find(_.getPath.toDotString == "o_orderkey").get
          val ckCol = rg.getColumns.asScala
            .find(_.getPath.toDotString == "o_custkey").get
          // enabled column carries a filter; the other column none
          assert(bfr.readBloomFilter(ckCol) == null)
          val bf = bfr.readBloomFilter(okCol)
          assert(bf != null)
          sawOrderkeyFilter = true
          // absent keys: far outside the key domain
          (1L to 2000L).map(_ + 1000000000L).foreach { k =>
            absentProbes += 1
            if (bf.findHash(bf.hash(k))) absentHits += 1
          }
        }
      } finally reader.close()
    }
    assert(sawOrderkeyFilter)

    // no false negatives: with the coalesce(1) write there is exactly
    // one file (asserted) so every present key's containing row group
    // is probed — a hit here is the containing group, not a masking
    // false positive from a sibling
    assert(files.length == 1, s"coalesce(1) write produced ${files.length} files")
    val hitSomewhere = scala.collection.mutable.Set.empty[Long]
    files.foreach { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getPath), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      // one row group at this write size — the containment argument
      // above needs it (a multi-group file would re-open the masking
      // window within the file)
      assert(reader.getFooter.getBlocks.size == 1)
      try reader.getFooter.getBlocks.asScala.foreach { rg =>
        val bf = reader.getBloomFilterDataReader(rg)
          .readBloomFilter(rg.getColumns.asScala
            .find(_.getPath.toDotString == "o_orderkey").get)
        present.foreach(k => if (bf.findHash(bf.hash(k))) hitSomewhere += k)
      } finally reader.close()
    }
    assert(hitSomewhere == present)

    // absent keys stay near the designed false-positive rate (1% at
    // the default parquet sizing; allow generous headroom for the
    // small ndv undershoot)
    assert(absentProbes > 0 && absentHits.toDouble / absentProbes < 0.1,
      s"fp rate ${absentHits.toDouble / absentProbes}")
  }
}
