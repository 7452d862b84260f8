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

  /** Minimal REAL baseline-TIFF payload for one tile: little-endian
    * ("II"), one 32-bit SIGNED-int band (SampleFormat=2), STRIPED with
    * 3 rows per strip (so multi-strip assembly and a short last strip
    * are exercised), uncompressed — the structural subset of the
    * GeoTIFFs the reference opens (main.rs:172-191). Pixel values are
    * the same congruential elevation formula as the GRFT fixture, so
    * the g7/g9 oracles share the grid CTE. Unlike GRFT, a TIFF carries
    * no tile identity — exactly like real AW3D30 tiles, identity comes
    * from the FILENAME.
    */
  private[graft] def tiffBytes(tileId: Int, n: Int = GridN,
      order: ByteOrder = ByteOrder.LITTLE_ENDIAN): Array[Byte] = {
    val rowsPerStrip = 3
    val numStrips = (n + rowsPerStrip - 1) / rowsPerStrip
    val entries = 10
    val ifdOff = 8
    val ifdSize = 2 + entries * 12 + 4
    val offArr = ifdOff + ifdSize          // strip-offsets array
    val cntArr = offArr + 4 * numStrips    // strip-byte-counts array
    val data = cntArr + 4 * numStrips      // first strip payload
    val buf = ByteBuffer.allocate(data + 4 * n * n).order(order)
    val bom = if (order == ByteOrder.LITTLE_ENDIAN) 'I' else 'M'
    buf.put(bom.toByte).put(bom.toByte).putShort(42).putInt(ifdOff)
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
      buf.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
      if (typ == 3) buf.putShort(value.toShort).putShort(0) // SHORT: inline, padded
      else buf.putInt(value)                                // LONG
    }
    buf.putShort(entries.toShort)
    entry(256, 4, 1, n)            // ImageWidth
    entry(257, 4, 1, n)            // ImageLength
    entry(258, 3, 1, 32)           // BitsPerSample
    entry(259, 3, 1, 1)            // Compression: none
    entry(262, 3, 1, 1)            // Photometric: BlackIsZero
    // a count-1 LONG value is INLINE per the TIFF rule (readers,
    // ours included, only dereference when 4·count > 4) — so a
    // single-strip image must carry the offset/count directly, not a
    // pointer; the unused array slots become padding
    entry(273, 4, numStrips, if (numStrips == 1) data else offArr) // StripOffsets
    entry(277, 3, 1, 1)            // SamplesPerPixel
    entry(278, 4, 1, rowsPerStrip) // RowsPerStrip
    entry(279, 4, numStrips, if (numStrips == 1) 4 * n * n else cntArr) // StripByteCounts
    entry(339, 3, 1, 2)            // SampleFormat: signed int
    buf.putInt(0)                  // no next IFD
    var off = data
    for (s <- 0 until numStrips) {
      val rows = math.min(rowsPerStrip, n - s * rowsPerStrip)
      buf.putInt(off); off += 4 * rows * n
    }
    for (s <- 0 until numStrips) {
      val rows = math.min(rowsPerStrip, n - s * rowsPerStrip)
      buf.putInt(4 * rows * n)
    }
    var y = 0
    while (y < n) {
      var x = 0
      while (x < n) {
        buf.putInt(((tileId.toLong * 131 + x * 17 + y * 29) % 8848).toInt)
        x += 1
      }
      y += 1
    }
    buf.array()
  }

  /** Ensure the TIFF raster directory for `dir` exists; one
    * `<tile_key>.tif` per tile with tile_id < RasterLimit.
    */
  def ensureTiffs(s: SparkSession, dir: String): String = synchronized {
    val out = fixtureRoot("tiffs", dir)
    val tiles = tileRows(s, dir, RasterLimit)
    ensureAtomic(out, tiles.length) { tmp =>
      tiles.foreach { case (id, _, _, key) =>
        Files.write(Paths.get(tmp.toString, s"$key.tif"), tiffBytes(id))
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
