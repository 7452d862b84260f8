package graft.geo

import java.io.File
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic on-disk fixtures standing in for the reference's
  * external world (the `raster` S3 bucket): binary GRFT tiles for the
  * byte-level ingest path (g7) and a listable directory of
  * partially-downloaded tiles for the FS-listing manifest (g8). Both
  * derive every byte from the same integer formulas the DuckDB oracle
  * evaluates, so query results are oracle-exact while the Spark side
  * genuinely reads files. Generation is idempotent (skipped when the
  * directory already holds the expected file count) and bounded
  * (≤ RasterLimit / ListingLimit tiles, collected driver-side only to
  * WRITE the fixture — the queries themselves never collect).
  */
object Fixtures {

  val RasterLimit  = 50
  val ListingLimit = 500
  val GridN        = 8

  /** Fixtures live under the build's target/ dir (gitignored, inside
    * the repo) — keyed by the sf dir so scale factors don't collide.
    */
  private def fixtureRoot(kind: String, dir: String): File =
    new File(new File(sys.props("user.dir"), "target/fixtures"),
      s"graft_${kind}_" + dir.replaceAll("[^A-Za-z0-9.]", "_"))

  /** Marker file recording the file count a complete fixture holds. */
  private val CompleteMarker = "_COMPLETE"

  private def deleteRecursively(f: File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }

  /** Build-once guard with ATOMIC publication: a fixture is complete
    * iff its `_COMPLETE` marker holds the expected file count — a file
    * count alone cannot distinguish a finished build from a torn one
    * (a killed previous run can leave exactly N stale files).
    * Rebuilds write every file into a fresh sibling temp dir, stamp
    * the marker LAST, then swap the temp dir into place with a
    * same-directory rename — readers only ever see no dir, a stale
    * complete dir, or the new complete dir, never a half-written one.
    * The guarantee is JVM-level only (`synchronized` + rename): two
    * concurrent PROCESSES could interleave the delete/rename. Fine
    * here — this repo runs a single sbt instance by constraint; a
    * cross-process deployment would need Files.move(ATOMIC_MOVE)
    * under a file lock.
    */
  private def ensureAtomic(out: File, expected: Int)(write: File => Unit): String = {
    val marker = new File(out, CompleteMarker)
    val complete = marker.exists() &&
      new String(Files.readAllBytes(marker.toPath)).trim == expected.toString
    if (!complete) {
      val tmp = new File(out.getParentFile, out.getName + ".tmp")
      deleteRecursively(tmp)
      tmp.mkdirs()
      write(tmp)
      Files.write(Paths.get(tmp.toString, CompleteMarker),
        expected.toString.getBytes("UTF-8"))
      deleteRecursively(out)
      if (!tmp.renameTo(out))
        throw new java.io.IOException(s"fixture rename failed: $tmp -> $out")
    }
    out.toString
  }

  private def tileRows(s: SparkSession, dir: String, limit: Int): Array[(Int, Int, Int, String)] =
    Geo.tiles(s, dir).filter(col("tile_id") < limit)
      .select(col("tile_id").cast("int"), col("lat0").cast("int"),
        col("lon0").cast("int"), col("tile_key"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3)))

  /** GRFT payload for one tile: header + n·n big-endian i32
    * elevations from the same congruential formula as Geo.gridExpand.
    */
  private[graft] def rasterBytes(tileId: Int, lat0: Int, lon0: Int, n: Int = GridN): Array[Byte] = {
    val buf = ByteBuffer.allocate(20 + 4 * n * n).order(ByteOrder.BIG_ENDIAN)
    buf.put('G'.toByte).put('R'.toByte).put('F'.toByte).put('T'.toByte)
    buf.putInt(tileId).putInt(lat0).putInt(lon0).putInt(n)
    var y = 0
    while (y < n) {
      var x = 0
      while (x < n) {
        buf.putInt((((tileId.toLong * 131 + x * 17 + y * 29) % 8848)).toInt)
        x += 1
      }
      y += 1
    }
    buf.array()
  }

  /** Ensure the GRFT raster directory for `dir` exists; returns its
    * path. One `<tile_key>.grft` file per tile with tile_id <
    * RasterLimit.
    */
  def ensureRasters(s: SparkSession, dir: String): String = synchronized {
    val out = fixtureRoot("rasters", dir)
    val tiles = tileRows(s, dir, RasterLimit)
    ensureAtomic(out, tiles.length) { tmp =>
      tiles.foreach { case (id, lat0, lon0, key) =>
        Files.write(Paths.get(tmp.toString, s"$key.grft"), rasterBytes(id, lat0, lon0))
      }
    }
  }

  /** Expected remote object size for the listing manifest (bytes —
    * small enough to write as real files).
    */
  private[geo] def listingSize(tileId: Int): Int = (tileId * 131) % 4096 + 64

  /** Ensure the partially-downloaded local directory for `dir` exists;
    * returns its path. Tiles with tile_id % 3 == 0 exist locally;
    * those with tile_id % 7 == 0 are one byte SHORT of the expected
    * size (a torn download the manifest must flag for re-fetch).
    */
  def ensureListing(s: SparkSession, dir: String): String = synchronized {
    val out = fixtureRoot("listing", dir)
    val tiles = tileRows(s, dir, ListingLimit).filter(_._1 % 3 == 0)
    ensureAtomic(out, tiles.length) { tmp =>
      tiles.foreach { case (id, _, _, key) =>
        val size = listingSize(id) - (if (id % 7 == 0) 1 else 0)
        Files.write(Paths.get(tmp.toString, s"$key.grft"), new Array[Byte](size))
      }
    }
  }
}
