package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** HyperLogLog register vectors as first-class columns — the state
  * HyperBall (Boldi & Vigna 2013, "In-Core Computation of Geometric
  * Centralities with HyperBall") threads through a BSP loop: one m-byte
  * register array per node approximates the node's reachability ball,
  * and the per-step neighborhood union is an elementwise register MAX —
  * associative, commutative, idempotent, so it rides a plain
  * `groupBy(dst)` with map-side partial aggregation absorbing in-degree
  * skew exactly like min-label propagation does.
  *
  * All math is deterministic (integer hashing + double ops in fixed
  * order over fixed-length arrays), so results are reproducible across
  * partitionings — idempotent max makes even double-delivery harmless.
  */
object HllUtil {

  /** SplitMix64 finalizer — the id's register stream. Public-domain
    * constants (Steele et al., "Fast Splittable Pseudorandom Number
    * Generators", OOPSLA 2014). */
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Fresh register vector containing exactly element `id`:
    * low log2(m) hash bits pick the register, the rank of the first
    * high one-bit of the rest is the register value. */
  def init(id: Long, m: Int): Array[Byte] = {
    val regs = new Array[Byte](m)
    val logm = java.lang.Integer.numberOfTrailingZeros(m)
    val h = mix64(id)
    val idx = (h & (m - 1)).toInt
    val w = h >>> logm
    val rho = if (w == 0) (64 - logm + 1) else (java.lang.Long.numberOfLeadingZeros(w) - logm + 1)
    regs(idx) = rho.toByte
    regs
  }

  /** Standard HLL cardinality estimate with the small-range
    * linear-counting correction (balls are far below 2^32, so the
    * large-range correction is irrelevant). Fixed-order loop over a
    * fixed-length array → bit-reproducible doubles. */
  def estimate(regs: Array[Byte]): Double = {
    val m = regs.length
    var sum = 0.0
    var zeros = 0
    var j = 0
    while (j < m) {
      sum += java.lang.Math.scalb(1.0, -regs(j))
      if (regs(j) == 0) zeros += 1
      j += 1
    }
    val alpha =
      if (m == 16) 0.673 else if (m == 32) 0.697 else if (m == 64) 0.709
      else 0.7213 / (1.0 + 1.079 / m)
    val e = alpha * m * m / sum
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
  }

  /** Elementwise max of `other` into `buf` (in place). */
  def unionInto(buf: Array[Byte], other: Array[Byte]): Unit = {
    var j = 0
    while (j < buf.length) {
      if (other(j) > buf(j)) buf(j) = other(j)
      j += 1
    }
  }
}

/** hll_init(long, m) → binary: a register vector containing the id. */
/** Callers pass a LongType id column (this module's node ids are i64;
  * AbstractDataType is private[sql] in Spark 4, so no implicit-cast
  * trait — a wrong input type fails loudly at eval). */
case class HllInit(child: Expression, m: Int) extends UnaryExpression {
  require(m >= 16 && (m & (m - 1)) == 0, "m must be a power of two >= 16")
  override def dataType: DataType = BinaryType
  override def nullSafeEval(id: Any): Any =
    HllUtil.init(id.asInstanceOf[Long], m)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HllUtil.init($c, $m)")
  override protected def withNewChildInternal(newChild: Expression): HllInit =
    copy(child = newChild)
}

/** hll_estimate(binary) → double: cardinality estimate of a vector. */
case class HllEstimate(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(regs: Any): Any =
    HllUtil.estimate(regs.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HllUtil.estimate($c)")
  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
}

/** Register-max union aggregate over binary register vectors. The
  * buffer IS the m-byte array — partial aggregation keeps one vector
  * per (map task, group), the shuffle carries one vector per group per
  * map task, and serialize/deserialize are identity on the raw bytes. */
case class HllUnionAgg(child: Expression, m: Int,
                       mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  require(m >= 16 && (m & (m - 1)) == 0, "m must be a power of two >= 16")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) HllUtil.unionInto(buf, v.asInstanceOf[Array[Byte]])
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    HllUtil.unionInto(buf, other)
    buf
  }

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HllUnionAgg =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): HllUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllUnionAgg =
    copy(inputAggBufferOffset = newOffset)
}

object HllF {
  def hllInit(id: Column, m: Int): Column =
    ColumnBridge.column(HllInit(ColumnBridge.expression(id), m))
  def hllEstimate(regs: Column): Column =
    ColumnBridge.column(HllEstimate(ColumnBridge.expression(regs)))
  def hllUnion(regs: Column, m: Int): Column =
    ColumnBridge.column(HllUnionAgg(ColumnBridge.expression(regs), m).toAggregateExpression())
}
