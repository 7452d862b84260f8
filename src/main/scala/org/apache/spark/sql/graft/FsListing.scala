package org.apache.spark.sql.graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.util.SerializableConfiguration

/** Distributed object listing: the scale form of the reference's
  * driver-side ListObjectsV2 pager (main.rs:266-331). The key space
  * is sharded into prefixes; each TASK issues one prefix-scoped
  * listing through the Hadoop FileSystem API (`globStatus` — the
  * same interface S3A implements with real server-side prefix
  * pushdown) and emits its (name, size) rows, so the full manifest
  * is never materialized on the driver. A 100M-object bucket lists
  * in parallel across however many prefixes the key scheme offers.
  */
object FsListing {

  /** List `dir` in parallel, one task per key prefix. The prefix set
    * must COVER the key space — a file matching no prefix is silently
    * missed (callers derive prefixes from their key format; g8's tile
    * keys enumerate hemisphere × leading lat digit).
    */
  def listByPrefix(s: SparkSession, dir: String, prefixes: Seq[String],
      suffix: String): DataFrame = {
    import s.implicits._
    val conf = new SerializableConfiguration(s.sparkContext.hadoopConfiguration)
    s.createDataset(prefixes)
      .repartition(prefixes.size)
      .mapPartitions { it =>
        it.flatMap { p =>
          val base = new Path(dir)
          val fs = base.getFileSystem(conf.value)
          Option(fs.globStatus(new Path(base, p + "*" + suffix)))
            .getOrElse(Array.empty)
            .iterator
            .map(st => (st.getPath.getName, st.getLen))
        }
      }
      .toDF("name", "size_bytes")
  }
}
