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

/** Bounded top-k buffer over (score, string label) pairs, ordered by
  * (score desc, label asc — binary UTF-8 order, matching DuckDB's
  * default collation for ORDER BY on varchar).
  */
final class TopKLabeledBuffer(val k: Int) {
  import org.apache.spark.unsafe.types.UTF8String
  val scores = new Array[Double](k)
  val labels = new Array[UTF8String](k)
  var size   = 0

  @inline private def worseThan(s1: Double, l1: UTF8String, s2: Double, l2: UTF8String): Boolean =
    s1 < s2 || (s1 == s2 && l1.compareTo(l2) > 0)

  def insert(s: Double, l: UTF8String): Unit =
    if (size < k) { scores(size) = s; labels(size) = l; size += 1 }
    else {
      var w = 0
      var j = 1
      while (j < size) { if (worseThan(scores(j), labels(j), scores(w), labels(w))) w = j; j += 1 }
      if (worseThan(scores(w), labels(w), s, l)) { scores(w) = s; labels(w) = l }
    }

  def mergeFrom(o: TopKLabeledBuffer): Unit = {
    var j = 0
    while (j < o.size) { insert(o.scores(j), o.labels(j)); j += 1 }
  }

  def sorted: Array[(Double, org.apache.spark.unsafe.types.UTF8String)] =
    (0 until size).map(j => (scores(j), labels(j))).toArray
      .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2.compareTo(b._2) < 0))
}

/** TopKCosine's string-labeled sibling: exact per-group top-k of
  * (score, label) with bounded partial buffers — the generic form for
  * "top terms per group"-style rankings where the payload is a string
  * (the long-id specialization avoids the string copies when ids
  * suffice).
  */
case class TopKLabeled(score: Expression, label: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKLabeledBuffer] with ExpectsInputTypes {
  import org.apache.spark.unsafe.types.UTF8String

  override def children: Seq[Expression] = Seq(score, label)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("label", StringType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKLabeledBuffer = new TopKLabeledBuffer(k)

  override def update(b: TopKLabeledBuffer, input: InternalRow): TopKLabeledBuffer = {
    val s = score.eval(input)
    val l = label.eval(input)
    // clone: the UTF8String may point into a reused row buffer
    if (s != null && l != null)
      b.insert(s.asInstanceOf[Double], l.asInstanceOf[UTF8String].clone())
    b
  }

  override def merge(b: TopKLabeledBuffer, o: TopKLabeledBuffer): TopKLabeledBuffer = {
    b.mergeFrom(o); b
  }

  override def eval(b: TopKLabeledBuffer): Any =
    new GenericArrayData(b.sorted.map { case (s, l) => InternalRow(s, l) })

  override def serialize(b: TopKLabeledBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    var j = 0
    while (j < b.size) {
      out.writeDouble(b.scores(j))
      val bytes = b.labels(j).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      j += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKLabeledBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n  = in.readInt()
    val b  = new TopKLabeledBuffer(k)
    var j  = 0
    while (j < n) {
      val s   = in.readDouble()
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      b.insert(s, UTF8String.fromBytes(arr))
      j += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKLabeled = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKLabeled = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKLabeled =
    copy(score = c(0), label = c(1))
  override def prettyName: String = "top_k_labeled"
}

object TopKLabeled {
  /** Aggregate Column: array<struct<score,label>> of the k best, best
    * first, ties broken by ascending (binary UTF-8) label.
    */
  def top_k_labeled(score: Column, label: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKLabeled(ExpressionUtils.expression(score), ExpressionUtils.expression(label), k)
        .toAggregateExpression())
}
