package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Bounded top-k buffer: at most k (score, id) pairs, ordered by
  * (score desc, id asc). O(k) replace-worst per update — k is small.
  */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids    = new Array[Long](k)
  var size   = 0

  @inline private def worseThan(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  def insert(s: Double, id: Long): Unit =
    if (size < k) { scores(size) = s; ids(size) = id; size += 1 }
    else {
      var w = 0
      var j = 1
      while (j < size) { if (worseThan(scores(j), ids(j), scores(w), ids(w))) w = j; j += 1 }
      if (worseThan(scores(w), ids(w), s, id)) { scores(w) = s; ids(w) = id }
    }

  def mergeFrom(o: TopKBuffer): Unit = {
    var j = 0
    while (j < o.size) { insert(o.scores(j), o.ids(j)); j += 1 }
  }

  /** (score, id) pairs sorted best-first. */
  def sorted: Array[(Double, Long)] =
    (0 until size).map(j => (scores(j), ids(j))).toArray
      .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
}

/** Exact per-group top-k as a partial-aggregable function: each map
  * task keeps a bounded k-heap, partials merge associatively, and the
  * final order is (score desc, id asc) — identical output to
  * `row_number().over(Window...)` ≤ k but WITHOUT sorting each
  * partition's full candidate set or shuffling more than k rows per
  * group per map task. This is the top-k the 100 TB ANN path needs.
  */
case class TopKCosine(score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(score, id)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      b.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = { b.mergeFrom(o); b }

  override def eval(b: TopKBuffer): Any =
    new GenericArrayData(b.sorted.map { case (s, i) => InternalRow(s, i) })

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    var j = 0
    while (j < b.size) { out.writeDouble(b.scores(j)); out.writeLong(b.ids(j)); j += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n  = in.readInt()
    val b  = new TopKBuffer(k)
    var j  = 0
    while (j < n) { b.insert(in.readDouble(), in.readLong()); j += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKCosine = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKCosine = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKCosine =
    copy(score = c(0), id = c(1))
  override def prettyName: String = "top_k_cosine"
}

object TopKCosine {
  /** Aggregate Column: array<struct<score,id>> of the k best, best
    * first, ties broken by ascending id.
    */
  def top_k(score: Column, id: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKCosine(ExpressionUtils.expression(score), ExpressionUtils.expression(id), k)
        .toAggregateExpression())
}
