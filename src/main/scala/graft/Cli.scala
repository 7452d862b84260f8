package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.geo.Geo

/** CLI twin of the reference binary (/root/reference/src/main.rs
  * main + Opt): `graft.Cli [--input DIR] [--parquet DIR] <set>` with
  * sets netherlands|france|europe|world. Where the reference
  * downloads GeoTIFF tiles and writes one parquet per tile, this
  * derives the tile universe from the input star schema, filters it
  * by the chosen region set (main.rs:56-88), expands the per-tile
  * grid (main.rs:163-191) and writes a snappy parquet dataset
  * partitioned by tile (main.rs:272-296) — distributed instead of
  * file-at-a-time.
  */
object Cli {
  def main(args: Array[String]): Unit = {
    var input   = "/root/testdata/sf0.001"
    var out     = "/tmp/graft_parquet"
    var set     = Option.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--input" | "-t"   => input = args(i + 1); i += 2
        case "--parquet" | "-p" => out = args(i + 1); i += 2
        case s                  => set = Some(s); i += 1
      }
    }
    val setName = set.getOrElse {
      System.err.println("usage: graft.Cli [--input DIR] [--parquet DIR] <netherlands|france|europe|world>")
      sys.exit(2)
    }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosConf._1, Tables.NanosConf._2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val n = run(spark, input, out, setName)
      println(s"wrote $n rows for set '$setName' to $out")
    } finally spark.stop()
  }

  /** The reference pipeline for one set; returns rows written. */
  def run(spark: SparkSession, input: String, out: String, setName: String): Long = {
    val t = Geo.tiles(spark, input)
    val inSet = setName match {
      case "netherlands" => Geo.inNetherlands(col("lat0"), col("lon0"))
      case "france"      => Geo.inFrance(col("lat0"), col("lon0"))
      case "europe"      => Geo.inEurope(col("lat0"), col("lon0"))
      case "world"       => lit(true)
      case other         => throw new IllegalArgumentException(s"unknown set: $other")
    }
    val grid = Geo.gridExpand(t.filter(inSet))
      .select(col("lat"), col("lon"), col("elevation"), col("tile_key"))
      .cache()
    Geo.writeTiled(grid, out)
    // count the written frame directly — an empty set writes only
    // _SUCCESS, which a schema-inferring re-read would choke on
    grid.count()
  }
}
