package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal. Highly repetitive or
  * template-generated text deflates far below fluent prose, and
  * near-random noise barely deflates at all — the cheap
  * one-pass quality filter modern corpus pipelines run alongside
  * heuristic rules. DEFLATE (RFC 1951) via `java.util.zip`, level 6,
  * raw mode; the compressor is a thread-local reused across rows
  * (Deflater allocation per row would dominate the kernel). */
object CompressUtil {

  private val local = new ThreadLocal[(Deflater, Array[Byte])] {
    override def initialValue(): (Deflater, Array[Byte]) =
      (new Deflater(6, true), new Array[Byte](64 * 1024))
  }

  /** Deflated byte count of the UTF-8 text. */
  def deflateLen(text: UTF8String): Long = {
    val (d, buf) = local.get()
    d.reset()
    d.setInput(text.getBytes)
    d.finish()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}

case class DeflateLen(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(text: Any): Any =
    CompressUtil.deflateLen(text.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CompressUtil.deflateLen($c)")
  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object Compress {
  def deflateLen(text: Column): Column =
    ColumnBridge.column(DeflateLen(ColumnBridge.expression(text)))
}
