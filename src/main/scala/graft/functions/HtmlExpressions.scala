package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static bridges from generated code into [[HtmlLite]] — the HTML
  * selector family as native Catalyst expressions rather than UDFs.
  * A ScalaUDF pays a catalyst↔Scala converter round-trip per call and
  * blocks none of the surrounding codegen; these inline as static calls
  * like every other kernel, leaving the engine with ZERO UDFs.
  */
object HtmlUtil {

  def tagText(html: UTF8String, tag: String, attr: String, valueRe: String): UTF8String =
    UTF8String.fromString(
      HtmlLite.findFirst(html.toString, tag, attr, valueRe)
        .map(HtmlLite.text).getOrElse(""))

  def byTextText(html: UTF8String, tag: String, textRe: String): UTF8String =
    UTF8String.fromString(
      HtmlLite.findByText(html.toString, tag, textRe)
        .map(HtmlLite.text).getOrElse(""))

  def otherAdsHrefs(html: UTF8String): ArrayData =
    new GenericArrayData(
      HtmlLite.findFirst(html.toString, "div", "id", "OtherAdsByThisUser")
        .map(container => HtmlLite.findAll(container, "div", "class", "cat.*")
          .flatMap(HtmlLite.hrefs))
        .getOrElse(Seq.empty[String])
        .map(UTF8String.fromString).toArray[Any])

  def listingAdUrls(html: UTF8String): ArrayData =
    new GenericArrayData(
      HtmlLite.findAll(html.toString, "div", "class", "cat.*")
        .flatMap(HtmlLite.hrefs)
        .map(UTF8String.fromString).toArray[Any])
}

/** text of first <tag attr~=valueRe>, "" if absent. */
case class HtmlTagText(child: Expression, tag: String, attr: String, valueRe: String)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(html: Any): Any =
    HtmlUtil.tagText(html.asInstanceOf[UTF8String], tag, attr, valueRe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // ship the selector strings as reference objects, never interpolated
    // into the generated Java source: a tag/attr/pattern containing a
    // quote or backslash would otherwise produce uncompilable codegen
    val tagRef = ctx.addReferenceObj("htmlTag", tag, "java.lang.String")
    val attrRef = ctx.addReferenceObj("htmlAttr", attr, "java.lang.String")
    val reRef = ctx.addReferenceObj("htmlValueRe", valueRe, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HtmlUtil.tagText($c, $tagRef, $attrRef, $reRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): HtmlTagText =
    copy(child = newChild)
}

/** text of first <tag> whose text matches textRe, "" if absent. */
case class HtmlByTextText(child: Expression, tag: String, textRe: String)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(html: Any): Any =
    HtmlUtil.byTextText(html.asInstanceOf[UTF8String], tag, textRe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference objects, not string interpolation — see HtmlTagText
    val tagRef = ctx.addReferenceObj("htmlTag", tag, "java.lang.String")
    val reRef = ctx.addReferenceObj("htmlTextRe", textRe, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HtmlUtil.byTextText($c, $tagRef, $reRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): HtmlByTextText =
    copy(child = newChild)
}

/** hrefs under div#OtherAdsByThisUser div.cat* (etl_process.py:68-76). */
case class HtmlOtherAds(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(html: Any): Any =
    HtmlUtil.otherAdsHrefs(html.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlUtil.otherAdsHrefs($c)")
  override protected def withNewChildInternal(newChild: Expression): HtmlOtherAds =
    copy(child = newChild)
}

/** listing-page ad URLs: hrefs of div.cat* anchors (scraper.py:66-67). */
case class HtmlListingUrls(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(html: Any): Any =
    HtmlUtil.listingAdUrls(html.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlUtil.listingAdUrls($c)")
  override protected def withNewChildInternal(newChild: Expression): HtmlListingUrls =
    copy(child = newChild)
}

object HtmlCols {
  def tagText(html: Column, tag: String, attr: String, valueRe: String): Column =
    ColumnBridge.column(HtmlTagText(ColumnBridge.expression(html), tag, attr, valueRe))
  def byTextText(html: Column, tag: String, textRe: String): Column =
    ColumnBridge.column(HtmlByTextText(ColumnBridge.expression(html), tag, textRe))
  def otherAdsHrefs(html: Column): Column =
    ColumnBridge.column(HtmlOtherAds(ColumnBridge.expression(html)))
  def listingAdUrls(html: Column): Column =
    ColumnBridge.column(HtmlListingUrls(ColumnBridge.expression(html)))
}
