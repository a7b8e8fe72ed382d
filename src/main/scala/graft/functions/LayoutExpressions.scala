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

object Layout {
  def interleave16(x: Column, y: Column): Column =
    ColumnBridge.column(InterleaveBits(
      ColumnBridge.expression(x.cast("long")), ColumnBridge.expression(y.cast("long"))))
}
