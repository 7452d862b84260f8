package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items buffer: at most `width` (term, count)
  * counters plus the total processed weight `n`.
  *
  * Invariant (Misra-Gries 1982; merge form Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): for every term t,
  * `count(t) ≥ trueCount(t) − n/(width+1)` — so any term with true
  * count > n/(width+1) is guaranteed present. That guarantee is what
  * makes the two-pass heavy-hitters query EXACT: pass 1 can only
  * over-select candidates, never miss one above the threshold, and
  * pass 2 counts the bounded candidate set exactly.
  *
  * The decrement sweep is O(width) but releases ≥ width·d of stored
  * weight (d = the common decrement), and total inserted weight is n,
  * so sweep work amortizes to O(1) per item.
  */
final class MisraGriesBuffer(val width: Int) {
  val counts = new java.util.HashMap[UTF8String, Long](width * 2)
  var n: Long = 0L

  /** Weighted MG update (weight > 0; merge feeds counter weights). */
  def add(term: UTF8String, weight: Long): Unit = {
    n += weight
    var c = weight
    while (c > 0) {
      val cur = counts.get(term)
      if (cur != 0L || counts.containsKey(term)) { counts.put(term, cur + c); c = 0 }
      else if (counts.size < width) { counts.put(term, c); c = 0 }
      else {
        // full, term absent: decrement ALL by d = min(c, min counter);
        // at least one counter hits 0 when d = min, freeing a slot
        var m = Long.MaxValue
        val vit = counts.values().iterator()
        while (vit.hasNext) { val v = vit.next(); if (v < m) m = v }
        val d = math.min(c, m)
        val eit = counts.entrySet().iterator()
        while (eit.hasNext) {
          val e = eit.next()
          val v = e.getValue - d
          if (v == 0L) eit.remove() else e.setValue(v)
        }
        c -= d
      }
    }
  }

  def mergeFrom(o: MisraGriesBuffer): Unit = {
    // counter-weighted adds preserve the n/(width+1) bound under
    // merge (Mergeable Summaries, Thm 1); n sums directly, so bump
    // it by the REMAINDER other's adds won't replay (o.n includes
    // weight its own decrements already dropped).
    val before = n
    val it = o.counts.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); add(e.getKey, e.getValue) }
    n = before + o.n
  }
}

/** `mg_sketch(term, width)` — typed aggregate producing
  * `struct<n: bigint, entries: array<struct<term: string, cnt: bigint>>>`:
  * the total item count and the surviving Misra-Gries counters
  * (entries sorted cnt desc, term asc for determinism). Partial
  * aggregation keeps every map-side buffer at ≤ width counters, so
  * the shuffle carries one ~width-entry sketch per partition — the
  * 100-TB path to frequent terms, vs a groupBy over every distinct
  * term in the corpus.
  */
case class MisraGries(term: Expression, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MisraGriesBuffer] with ExpectsInputTypes {

  override def children: Seq[Expression] = Seq(term)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("entries", ArrayType(
      StructType(Seq(StructField("term", StringType, nullable = false),
        StructField("cnt", LongType, nullable = false))), containsNull = false),
      nullable = false)))

  override def createAggregationBuffer(): MisraGriesBuffer = new MisraGriesBuffer(width)

  override def update(b: MisraGriesBuffer, input: InternalRow): MisraGriesBuffer = {
    val t = term.eval(input)
    // clone: the UTF8String may point into a reused row buffer
    if (t != null) b.add(t.asInstanceOf[UTF8String].clone(), 1L)
    b
  }

  override def merge(b: MisraGriesBuffer, o: MisraGriesBuffer): MisraGriesBuffer = {
    b.mergeFrom(o); b
  }

  override def eval(b: MisraGriesBuffer): Any = {
    val arr = new Array[(UTF8String, Long)](b.counts.size)
    val it = b.counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) { val e = it.next(); arr(j) = (e.getKey, e.getValue); j += 1 }
    val sorted = arr.sortWith((a, c) => a._2 > c._2 || (a._2 == c._2 && a._1.compareTo(c._1) < 0))
    InternalRow(b.n, new GenericArrayData(sorted.map { case (t, c) => InternalRow(t, c) }))
  }

  override def serialize(b: MisraGriesBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(b.n)
    out.writeInt(b.counts.size)
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new MisraGriesBuffer(width)
    val n = in.readLong()
    val sz = in.readInt()
    var j = 0
    while (j < sz) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      b.counts.put(UTF8String.fromBytes(arr), in.readLong())
      j += 1
    }
    b.n = n
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MisraGries =
    copy(term = c(0))
  override def prettyName: String = "mg_sketch"
}

object MisraGries {
  def mg_sketch(term: Column, width: Int): Column =
    ExpressionUtils.column(
      MisraGries(ExpressionUtils.expression(term), width).toAggregateExpression())
}
