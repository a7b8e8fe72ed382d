package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Minimal, dependency-free HTML extraction for the reference's six
  * selector shapes (etl_process.py:31,71,132,144,155,166,177 — all
  * `find(tag, attr)`-shaped, plus one text-match selector). Not a general
  * HTML parser: it tracks nesting depth of a single tag name, which is
  * exactly what the extraction semantics need, and runs on executors
  * inside a UDF (HTML parsing is inherently non-codegen; everything
  * around it stays built-in expressions — SURVEY §2.8).
  */
object HtmlLite {

  private val TagOpen = """(?is)<([a-z][a-z0-9]*)((?:\s[^>]*)?)>""".r
  private val AttrRe = """(?is)([a-z-]+)\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""".r

  private def attrs(attrStr: String): Map[String, String] =
    AttrRe.findAllMatchIn(attrStr).map { m =>
      val v = Option(m.group(3)).orElse(Option(m.group(4))).getOrElse(m.group(5))
      m.group(1).toLowerCase -> v
    }.toMap

  /** Inner HTML of every `tag` element whose attribute `attr` has a value
    * whose whitespace-split tokens include a token matching `valueRe`
    * (class lists behave like BeautifulSoup's class match). Handles
    * nesting of the same tag by depth counting.
    */
  def findAll(html: String, tag: String, attr: String, valueRe: String): Seq[String] = {
    if (html == null) return Nil
    val re = ("""(?i)^""" + valueRe + "$").r
    val out = ArrayBuffer.empty[String]
    for (m <- TagOpen.findAllMatchIn(html) if m.group(1).equalsIgnoreCase(tag)) {
      val a = attrs(m.group(2))
      val hit = attr == null || a.get(attr.toLowerCase).exists(
        _.split("\\s+").exists(tok => re.findFirstIn(tok).isDefined))
      if (hit) innerHtml(html, m.end, tag).foreach(out += _)
    }
    out.toSeq
  }

  /** First match of [[findAll]], or None. */
  def findFirst(html: String, tag: String, attr: String, valueRe: String): Option[String] =
    findAll(html, tag, attr, valueRe).headOption

  /** Inner HTML from `from` to the matching close of `tag` (depth-aware). */
  private def innerHtml(html: String, from: Int, tag: String): Option[String] = {
    val token = ("""(?i)<(/?)""" + tag + """(?=[\s>/])[^>]*>""").r
    var depth = 1
    for (m <- token.findAllMatchIn(html.substring(from))) {
      if (m.group(1).isEmpty) depth += 1 else depth -= 1
      if (depth == 0) return Some(html.substring(from, from + m.start))
    }
    None
  }

  /** All elements of `tag` (any attrs) whose *text* matches `textRe` —
    * the reference's `soup.find('div', text=re.compile('Location:'))`. */
  def findByText(html: String, tag: String, textRe: String): Option[String] = {
    if (html == null) return None
    val re = textRe.r
    TagOpen.findAllMatchIn(html)
      .filter(_.group(1).equalsIgnoreCase(tag))
      .flatMap(m => innerHtml(html, m.end, tag))
      .find(inner => re.findFirstIn(text(inner)).isDefined)
  }

  /** Tag-stripped text with the handful of entities the fixtures use. */
  def text(inner: String): String = {
    if (inner == null) return ""
    inner.replaceAll("(?is)<[^>]*>", "")
      .replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&nbsp;", " ")
  }

  /** All href attribute values of <a> tags inside `html`. */
  def hrefs(html: String): Seq[String] = {
    if (html == null) return Nil
    TagOpen.findAllMatchIn(html)
      .filter(_.group(1).equalsIgnoreCase("a"))
      .flatMap(m => attrs(m.group(2)).get("href"))
      .toSeq
  }
}
