package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass URL canonicalization kernel — the codegen'd hot-path form
  * of the rules documented (and implemented declaratively, as the
  * cross-checked reference) at
  * [[graft.operators.Dedup.urlNormalizeReference]]:
  * fragment drop → scheme/host lowercase → `www.` / default-port strip →
  * trailing-slash strip → tracking-param (`utm_*`, `ref`, `fbclid`,
  * `gclid`) removal, non-URL inputs passed through unchanged.
  *
  * Why a kernel: the composed-builtin chain is ~7 compiled-regex
  * evaluations per row, and inlined as one Column expression its CASE
  * branches re-derive shared regexp sub-chains ~30× per row (conditional
  * branches are excluded from codegen common-subexpression
  * elimination) — the URL pass is the per-row work of an entire crawl
  * frontier, worth one scan kernel like [[WordShingles]]. Semantics are
  * pinned to the reference chain by UrlDedupSpec (edge-case table + full
  * equality over the synthesized corpus); lowercase goes through
  * `UTF8String.toLowerCase`, the exact routine behind Spark's `lower`.
  */
object UrlUtil {

  private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  // the RFC 3986 scheme body class, [A-Za-z0-9+.-]
  private def isSchemeChar(c: Char): Boolean =
    isAlpha(c) || (c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'

  private def lower(s: String): String =
    UTF8String.fromString(s).toLowerCase.toString

  private def isWordChar(c: Char): Boolean =
    isAlpha(c) || (c >= '0' && c <= '9') || c == '_'

  /** Mirrors `&(utm_[A-Za-z0-9_]*|ref|fbclid|gclid)=[^&]*`: the name
    * must be followed by '=', and a utm_ name must stay inside the word
    * class for its whole length (so `utm_so-urce` survives, exactly as
    * the regex leaves it). */
  private def isTracking(param: String): Boolean = {
    val eq = param.indexOf('=')
    if (eq < 0) return false
    val name = param.substring(0, eq)
    name == "ref" || name == "fbclid" || name == "gclid" ||
      (name.startsWith("utm_") && name.drop(4).forall(isWordChar))
  }

  def normalize(url: UTF8String): UTF8String = {
    val u = url.toString
    // 1. drop the fragment, then split off the query at the FIRST '?'
    val hash = u.indexOf('#')
    val nf = if (hash < 0) u else u.substring(0, hash)
    val qi = nf.indexOf('?')
    val base = if (qi < 0) nf else nf.substring(0, qi)
    val q: String = if (qi < 0) null else nf.substring(qi + 1)
    // 2. scheme: ^[A-Za-z][A-Za-z0-9+.-]*:// — the class run stops at
    //    the first non-class char, which must open "://" (no
    //    backtracking can rescue a shorter run: it would end on a class
    //    char, never ':')
    val n = base.length
    if (n == 0 || !isAlpha(base.charAt(0))) return url
    var i = 1
    while (i < n && isSchemeChar(base.charAt(i))) i += 1
    if (i + 2 >= n || base.charAt(i) != ':' ||
      base.charAt(i + 1) != '/' || base.charAt(i + 2) != '/') return url
    val scheme = lower(base.substring(0, i))
    // 3. host[:port] = chars to the first '/', lowercased; strip one
    //    leading "www."; strip the scheme's default port
    val hostStart = i + 3
    var hostEnd = hostStart
    while (hostEnd < n && base.charAt(hostEnd) != '/') hostEnd += 1
    var host = lower(base.substring(hostStart, hostEnd))
    if (host.startsWith("www.")) host = host.substring(4)
    if (host.isEmpty) return url
    val defPort = if (scheme == "http") ":80"
      else if (scheme == "https") ":443" else ""
    if (defPort.nonEmpty && host.endsWith(defPort))
      host = host.substring(0, host.length - defPort.length)
    // 4. path with its trailing-slash run stripped
    var pathEnd = n
    while (pathEnd > hostEnd && base.charAt(pathEnd - 1) == '/') pathEnd -= 1
    val out = new java.lang.StringBuilder(u.length)
    out.append(scheme).append("://").append(host)
      .append(base, hostEnd, pathEnd)
    // 5. query params minus tracking params, order and empties kept
    //    (split with -1 keeps trailing empties, mirroring the regex
    //    form's remove-matches-then-strip-one-leading-'&')
    if (q != null) {
      val parts = q.split("&", -1)
      val kept = new java.lang.StringBuilder(q.length)
      var j = 0
      var first = true
      while (j < parts.length) {
        if (!isTracking(parts(j))) {
          if (!first) kept.append('&')
          kept.append(parts(j))
          first = false
        }
        j += 1
      }
      if (kept.length > 0) out.append('?').append(kept)
    }
    UTF8String.fromString(out.toString)
  }
}

object RobotsUtil {

  /** RFC 9309 rule match — `pattern` against `target` (a URL path):
    * `*` matches any byte sequence (incl. empty), a TRAILING `$`
    * anchors at end-of-target ('$' elsewhere is literal), every other
    * byte is literal, and an un-anchored pattern matches any PREFIX of
    * the target. Iterative two-pointer glob with backtracking to the
    * last `*` — one linear-ish pass over bytes, no regex compile, no
    * allocation: the per-(url, rule) cost a 100 TB frontier × rules
    * join can afford. */
  def robotsMatch(target: UTF8String, pattern: UTF8String): Boolean = {
    val t = target.getBytes
    val p0 = pattern.getBytes
    val anchored = p0.length > 0 && p0(p0.length - 1) == '$'
    val pLen = if (anchored) p0.length - 1 else p0.length
    var ti = 0; var pi = 0
    var starP = -1; var starT = -1
    while (ti < t.length) {
      if (pi < pLen && (p0(pi) == '*' )) { starP = pi; starT = ti; pi += 1 }
      else if (pi < pLen && p0(pi) == t(ti)) { pi += 1; ti += 1 }
      else if (starP >= 0) { starT += 1; ti = starT; pi = starP + 1 }
      else return !anchored && patternDrained(p0, pi, pLen)
      // un-anchored prefix semantics: the whole pattern consumed means
      // a prefix of the target matched — done, whatever follows
      if (!anchored && patternDrained(p0, pi, pLen)) return true
    }
    // target exhausted: remaining pattern must be all '*'
    patternDrained(p0, pi, pLen)
  }

  /** true iff pattern[pi, pLen) is empty or all '*'. */
  private def patternDrained(p: Array[Byte], pi0: Int, pLen: Int): Boolean = {
    var pi = pi0
    while (pi < pLen && p(pi) == '*') pi += 1
    pi == pLen
  }
}

/** robots_match(path, pattern) → boolean ([[RobotsUtil.robotsMatch]]):
  * codegen'd, null-safe — the regex-free wildcard matcher (a
  * column-side regex pattern would recompile per row). */
case class RobotsMatch(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(t: Any, p: Any): Any =
    RobotsUtil.robotsMatch(t.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.RobotsUtil.robotsMatch($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): RobotsMatch =
    copy(left = l, right = r)
}

/** normalize_url(url) → canonical URL string ([[UrlUtil.normalize]]). */
case class NormalizeUrl(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(url: Any): Any =
    UrlUtil.normalize(url.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlUtil.normalize($c)")
  override protected def withNewChildInternal(newChild: Expression): NormalizeUrl =
    copy(child = newChild)
}

object Urls {
  def normalizeUrl(url: Column): Column =
    ColumnBridge.column(NormalizeUrl(ColumnBridge.expression(url)))
  def robotsMatch(path: Column, pattern: Column): Column =
    ColumnBridge.column(RobotsMatch(
      ColumnBridge.expression(path), ColumnBridge.expression(pattern)))
}
