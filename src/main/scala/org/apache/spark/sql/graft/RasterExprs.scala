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
