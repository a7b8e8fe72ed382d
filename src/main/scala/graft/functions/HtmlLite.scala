package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Minimal, dependency-free HTML extraction for the reference's six
  * selector shapes (etl_process.py:31,71,132,144,155,166,177 — all
  * `find(tag, attr)`-shaped, plus one text-match selector). Not a general
  * HTML parser: it tracks nesting depth of a single tag name, which is
  * exactly what the extraction semantics need, and runs on executors
  * behind the native Catalyst expressions in [[HtmlExpressions]] (HTML
  * parsing is inherently non-codegen; everything around it stays
  * built-in expressions — SURVEY §2.8).
  *
  * Tag boundaries are found by a quote-aware linear scan, not a `[^>]*`
  * regex: real scraped pages carry `>` inside quoted attribute values
  * (`<div class="a>b">`), which a bare negated class would treat as the
  * end of the tag and mis-parse both the attributes and the element
  * body.
  */
object HtmlLite {

  private val TagStart = """(?i)<([a-z][a-z0-9]*)""".r
  private val AttrRe = """(?is)([a-z-]+)\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""".r

  /** Index of the `>` closing the tag whose name ends at `from`,
    * honoring single- and double-quoted attribute values. A quote only
    * OPENS after `=` (optionally with whitespace), matching the HTML5
    * attribute-value states: an apostrophe in prose that strays into a
    * tag-shaped fragment (`<unit can't beat>`) must not start a quoted
    * region and swallow everything to the next apostrophe. -1 when the
    * tag never closes (truncated or quote-unterminated page — the tag
    * is treated as absent rather than parsed loosely). */
  private def tagEnd(html: String, from: Int): Int = {
    var i = from
    var quote: Char = 0
    var afterEq = false
    while (i < html.length) {
      val c = html.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if ((c == '"' || c == '\'') && afterEq) { quote = c; afterEq = false }
      else if (c == '>') return i
      else if (c == '=') afterEq = true
      else if (!Character.isWhitespace(c)) afterEq = false
      i += 1
    }
    -1
  }

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
    for (m <- TagStart.findAllMatchIn(html) if m.group(1).equalsIgnoreCase(tag)) {
      val end = tagEnd(html, m.end)
      if (end >= 0) {
        val a = attrs(html.substring(m.end, end))
        val hit = attr == null || a.get(attr.toLowerCase).exists(
          _.split("\\s+").exists(tok => re.findFirstIn(tok).isDefined))
        if (hit) innerHtml(html, end + 1, tag).foreach(out += _)
      }
    }
    out.toSeq
  }

  /** First match of [[findAll]], or None. */
  def findFirst(html: String, tag: String, attr: String, valueRe: String): Option[String] =
    findAll(html, tag, attr, valueRe).headOption

  /** Inner HTML from `from` to the matching close of `tag` (depth-aware,
    * quote-aware: a `>` inside a nested tag's quoted attribute must not
    * end that tag early, and close-tag text inside a quoted value must
    * not decrement the depth). */
  private def innerHtml(html: String, from: Int, tag: String): Option[String] = {
    var depth = 1
    var i = from
    val n = html.length
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) return None
      if (html.startsWith("<!--", lt)) {
        // a comment is atomic: '</tag>' inside it is commented-out
        // markup, not a close tag (an unterminated comment truncates
        // the element, like an unterminated quote)
        val cend = html.indexOf("-->", lt + 4)
        if (cend < 0) return None
        i = cend + 3
      } else {
        val isClose = lt + 1 < n && html.charAt(lt + 1) == '/'
        val nameAt = if (isClose) lt + 2 else lt + 1
        val after = nameAt + tag.length
        val named = html.regionMatches(true, nameAt, tag, 0, tag.length) &&
          (after >= n || { val c = html.charAt(after); c == '>' || c == '/' || Character.isWhitespace(c) })
        if (named) {
          val end = tagEnd(html, after)
          if (end < 0) return None
          if (isClose) depth -= 1 else depth += 1
          if (depth == 0) return Some(html.substring(from, lt))
          i = end + 1
        } else {
          // A non-matching tag still owns its quoted attributes: skip the
          // whole tag (quote-aware), or a '</tag>' hiding inside another
          // tag's quoted value (<span title="</div>">) would decrement the
          // depth and truncate the extraction early.
          val isTag = nameAt < n && Character.isLetter(html.charAt(nameAt))
          val end = if (isTag) tagEnd(html, nameAt) else -1
          i = if (end >= 0) end + 1 else lt + 1
        }
      }
    }
    None
  }

  /** All elements of `tag` (any attrs) whose *text* matches `textRe` —
    * the reference's `soup.find('div', text=re.compile('Location:'))`. */
  def findByText(html: String, tag: String, textRe: String): Option[String] = {
    if (html == null) return None
    val re = textRe.r
    TagStart.findAllMatchIn(html)
      .filter(_.group(1).equalsIgnoreCase(tag))
      .flatMap { m =>
        val end = tagEnd(html, m.end)
        if (end < 0) None else innerHtml(html, end + 1, tag)
      }
      .find(inner => re.findFirstIn(text(inner)).isDefined)
  }

  /** Tag-stripped text with the handful of entities the fixtures use.
    * Tags are skipped with the same quote-aware scan as [[tagEnd]]; a
    * `<` that never closes is kept verbatim (truncated page). */
  def text(inner: String): String = {
    if (inner == null) return ""
    val sb = new StringBuilder
    var i = 0
    val n = inner.length
    while (i < n) {
      val c = inner.charAt(i)
      if (c == '<') {
        if (inner.startsWith("<!--", i)) {
          // comments strip atomically — a '>' inside one must not end it
          val cend = inner.indexOf("-->", i + 4)
          if (cend < 0) { sb.append(inner.substring(i)); i = n } else i = cend + 3
        } else {
          val end = tagEnd(inner, i + 1)
          if (end < 0) { sb.append(inner.substring(i)); i = n } else i = end + 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
      .replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&nbsp;", " ")
  }

  /** All href attribute values of <a> tags inside `html`. */
  def hrefs(html: String): Seq[String] = {
    if (html == null) return Nil
    TagStart.findAllMatchIn(html)
      .filter(_.group(1).equalsIgnoreCase("a"))
      .flatMap { m =>
        val end = tagEnd(html, m.end)
        if (end < 0) None else attrs(html.substring(m.end, end)).get("href")
      }
      .toSeq
  }
}
