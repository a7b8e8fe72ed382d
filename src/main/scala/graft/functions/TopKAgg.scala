package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Exact per-group top-k as a custom TypedImperativeAggregate.
  *
  * The window idiom (`row_number().over(partitionBy(g).orderBy(x)) <= k`)
  * shuffles EVERY row of every group and sorts whole partitions before
  * discarding all but k. This aggregate keeps a bounded k-element
  * min-heap per group instead: partial aggregation caps each map task's
  * state at k rows per local group, the shuffle carries at most
  * k·groups rows, and no sort of the full data ever happens — the
  * per-group top-k shape that survives 100 TB. Returns the k largest
  * values of `child` (by its natural ordering; wrap columns in a struct
  * for composite orderings) in descending order.
  */
case class TopKAgg(child: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[Any]] {

  require(k > 0, "k must be positive")

  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)
  // PriorityQueue dequeues the max of its ordering; reversing keeps the
  // SMALLEST retained value at the head, which is what a top-k evicts
  @transient private lazy val heapOrd: Ordering[Any] = ord.reverse
  @transient private lazy val serProj = UnsafeProjection.create(Array(child.dataType))

  override def createAggregationBuffer(): mutable.PriorityQueue[Any] =
    new mutable.PriorityQueue[Any]()(heapOrd)

  private def offer(buf: mutable.PriorityQueue[Any], v: Any): Unit = {
    if (buf.size < k) buf.enqueue(InternalRow.copyValue(v))
    else if (ord.gt(v, buf.head)) {
      buf.dequeue()
      buf.enqueue(InternalRow.copyValue(v))
    }
  }

  override def update(buf: mutable.PriorityQueue[Any], input: InternalRow): mutable.PriorityQueue[Any] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v)
    buf
  }

  override def merge(buf: mutable.PriorityQueue[Any], other: mutable.PriorityQueue[Any]): mutable.PriorityQueue[Any] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[Any]): Any =
    new GenericArrayData(buf.toArray.sorted(ord.reverse))

  override def serialize(buf: mutable.PriorityQueue[Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { v =>
      val bytes = serProj(InternalRow(v)).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Any] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val row = new UnsafeRow(1)
      row.pointTo(b, len)
      buf.enqueue(InternalRow.copyValue(row.get(0, child.dataType)))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKAgg =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
}

object TopKAgg {
  /** top_k(expr, k): array of the k largest values, descending. */
  def topK(c: Column, k: Int): Column =
    ColumnBridge.column(TopKAgg(ColumnBridge.expression(c), k).toAggregateExpression())
}
