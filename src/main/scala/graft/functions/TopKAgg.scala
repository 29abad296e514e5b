package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k as a Catalyst aggregate — the distributed rendering of
  * the reference's `sorted_buffer_gt` per-query result buffer
  * (/root/reference/include/usearch/index.hpp:842-967) for GROUPED
  * top-k: `groupBy(qid).agg(topK(score, id, k))` partial-aggregates
  * map-side (ObjectHashAggregate), so the shuffle carries only
  * O(groups × partitions × k) bounded buffers instead of every scored
  * row — the difference between an O(n·M) and an O(n²) shuffle in the
  * semantic join's preference stage, and the batched exact-kNN path.
  *
  * Deterministic: the kept set is defined by the TOTAL order
  * (score, id) — `largest` keeps the k greatest (score desc, id asc),
  * otherwise the k least (score asc, id asc) — so partial-merge order
  * cannot change the result. Output is the sorted best-first
  * array<struct<score double, id long>>.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    largest: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))))

  /** best-first total order: (score, id) asc, or (score desc, id asc). */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    if (largest) a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    else a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  // heap with the WORST kept element on top (so it pops first)
  private object WorstFirst extends Ordering[(Double, Long)] {
    def compare(a: (Double, Long), b: (Double, Long)): Int =
      if (a == b) 0 else if (better(a, b)) -1 else 1
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    new mutable.PriorityQueue[(Double, Long)]()(WorstFirst)

  private def offer(
      buf: mutable.PriorityQueue[(Double, Long)], e: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(e)
    else if (better(e, buf.head)) { buf.dequeue(); buf.enqueue(e) }
  }

  /** NaN policy: NaN scores are SKIPPED outright (like null). `better`
    * is not a total order once NaN appears — compare(a,b)=compare(b,a)=1
    * — and SQL window oracles disagree between engines on where NaN
    * sorts, so a NaN row never enters the buffer; callers that can
    * produce NaN (e.g. cosine of a zero vector) must guard or accept
    * that NaN-scored candidates are dropped.
    */
  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val sv = s.asInstanceOf[Double]
      if (!sv.isNaN) offer(buf, (sv, i.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sortWith(better)
    new GenericArrayData(sorted.map(p => InternalRow(p._1, p._2): Any))
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAgg {

  /** k least (score asc, id asc), best-first array<struct<score,id>>. */
  def least(score: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKAgg(Bridge.expression(score.cast("double")),
        Bridge.expression(id.cast("long")), k, largest = false)
        .toAggregateExpression())

  /** k greatest (score desc, id asc), best-first array<struct<score,id>>. */
  def greatest(score: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKAgg(Bridge.expression(score.cast("double")),
        Bridge.expression(id.cast("long")), k, largest = true)
        .toAggregateExpression())
}
