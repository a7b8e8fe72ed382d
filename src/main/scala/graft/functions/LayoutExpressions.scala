package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Data-layout expressions: space-filling-curve keys for multi-column
  * clustering. Sorting (or range-bucketing) a table by a Z-order key
  * before a partitioned/parquet write gives every file a TIGHT min/max
  * range on ALL interleaved dimensions at once — so predicate pushdown
  * prunes files for filters on either column, where a plain sort by x
  * leaves y's per-file ranges spanning the whole domain. At 100 TB the
  * difference is scanning one z-bucket's files vs the full table. */
object LayoutUtil {

  /** Spread the low 16 bits of v to the even bit positions of a 32-bit
    * result — the "Interleave bits by Binary Magic Numbers" method
    * (public-domain Stanford Bit Twiddling Hacks); inputs above 16 bits
    * are truncated (callers bucket their dimensions first). */
  def spread16(v0: Long): Long = {
    var x = v0 & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** 2-D Morton (Z-order) key: x in the even bits, y in the odd bits. */
  def interleave16(x: Long, y: Long): Long =
    spread16(x) | (spread16(y) << 1)

  /** xy→d on the order-8 Hilbert curve (256×256 grid, d ∈ [0, 65535]):
    * the per-level quadrant walk with rotation (the classic published
    * xy2d formulation; cf. Hamilton's compact Hilbert indices). Every
    * step of the curve moves Manhattan distance 1 — no power-of-two
    * seam jumps like Morton's — so equal-size key ranges have tighter
    * x/y bounding boxes: fewer files scanned per 2-D range predicate
    * (LayoutSpec certifies bijectivity + unit-step adjacency
    * exhaustively). Inputs are masked to 8 bits; the grid flip
    * `255 − v` is an exact full-mask complement, which is what lets
    * the SQL oracle replay the walk with plain arithmetic. */
  def hilbert8(x0: Long, y0: Long): Long = {
    var x = x0 & 0xffL
    var y = y0 & 0xffL
    var d = 0L
    var s = 128L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = 255L - x; y = 255L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** z = interleave16(x, y): codegen'd, null-safe, Long → Long (the
  * [[Layout]] wrapper casts its inputs — AbstractDataType is
  * private[sql], so ExpectsInputTypes isn't available out here). */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(x: Any, y: Any): Any =
    LayoutUtil.interleave16(x.asInstanceOf[Long], y.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.LayoutUtil.interleave16($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): InterleaveBits =
    copy(left = l, right = r)
}

/** d = hilbert8(x, y): codegen'd, null-safe, Long → Long — the
  * locality-tighter sibling of [[InterleaveBits]]. */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(x: Any, y: Any): Any =
    LayoutUtil.hilbert8(x.asInstanceOf[Long], y.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.LayoutUtil.hilbert8($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HilbertIndex =
    copy(left = l, right = r)
}

object Layout {
  def interleave16(x: Column, y: Column): Column =
    ColumnBridge.column(InterleaveBits(
      ColumnBridge.expression(x.cast("long")), ColumnBridge.expression(y.cast("long"))))

  def hilbert8(x: Column, y: Column): Column =
    ColumnBridge.column(HilbertIndex(
      ColumnBridge.expression(x.cast("long")), ColumnBridge.expression(y.cast("long"))))
}
