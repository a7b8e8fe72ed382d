package graft.operators

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Hand-computed fixtures for the Gopher quality gate and the
  * crawl-frontier URL filter — every count and both gates pinned
  * against values worked out by hand, independent of the DuckDB oracle.
  */
class GopherUrlSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def gopher(text: String): Map[String, Long] = {
    val row = Seq((1L, text)).toDF("id", "text")
      .select(col("id"), TextAnalysis.gopherSignals(col("text")).as("g"))
      .select(col("g.*")).collect().head
    row.schema.fieldNames.map(f => f -> row.getAs[Long](f)).toMap
  }

  test("a fluent paragraph passes the gate with the expected counts") {
    // 52 words, all alphabetic, 5 of the 8 stop words present (the,
    // have, with, and, that), mean word length 252/52 in [3, 10], no
    // symbols
    val words = Seq("the", "quick", "brown", "foxes", "have", "been",
      "running", "with", "great", "speed", "over", "those", "green",
      "hills", "and", "valleys", "that", "stretch", "far", "beyond",
      "every", "horizon", "while", "many", "birds", "keep")
    val text = (words ++ words).mkString(" ")   // 52 tokens
    val g = gopher(text)
    assert(g("n_tokens") == 52)
    assert(g("n_alpha_words") == 52)
    assert(g("n_stop_distinct") == 5)
    assert(g("sum_token_len") == 252)
    assert(g("n_hash") == 0 && g("n_ellipsis") == 0)
    assert(g("pass") == 1)
  }

  test("short, symbol-heavy, and alpha-poor documents fail the gate") {
    assert(gopher("too few words here")("pass") == 0)           // n < 50
    val hashy = (1 to 60).map(i => s"#tag$i").mkString(" ")     // 60 hashes / 60 words
    assert(gopher(hashy)("n_hash") == 60)
    assert(gopher(hashy)("pass") == 0)                          // symbol ratio
    val numbers = (1 to 60).map(_.toString).mkString(" ")       // zero alpha words
    assert(gopher(numbers)("n_alpha_words") == 0)
    assert(gopher(numbers)("pass") == 0)
    val longwords = (1 to 60).map(_ => "pneumonoultramicroscopic").mkString(" ")
    assert(gopher(longwords)("pass") == 0)                      // mean len > 10
  }

  test("line signals: bullets and ellipsis lines are counted per line") {
    val text = "intro line\n- first bullet\n* second bullet\nto be continued...\nnormal end"
    val g = gopher(text)
    assert(g("n_lines") == 5)
    assert(g("n_bullet_lines") == 2)
    assert(g("n_ellipsis_lines") == 1)
    assert(g("n_ellipsis") == 1)
  }

  test("URL filter signals and gate, case by case") {
    val cases = Seq(
      // url, scheme, ext, depth, n_params, keep
      ("https://ex.com/a/b/page.html", "https", "html", 3L, 0L, 1L),
      ("https://ex.com/img/photo.JPG", "https", "jpg", 2L, 0L, 0L),   // blocked ext, case-folded
      ("ftp://ex.com/page", "ftp", "", 1L, 0L, 0L),                   // scheme
      ("https://ex.com/a/b/c/d/e/f/g/h/i", "https", "", 9L, 0L, 0L),  // depth > 8
      ("https://ex.com/p?a=1&b=2&c=3", "https", "", 1L, 3L, 1L),
      ("https://ex.com/p?" + (1 to 9).map(i => s"k$i=v").mkString("&"),
        "https", "", 1L, 9L, 0L),                                     // params > 8
      ("https://ex.com/", "https", "", 0L, 0L, 1L),
      ("https://ex.com/style.css?v=3", "https", "css", 1L, 1L, 0L))   // ext wins over params
    val df = cases.zipWithIndex.map { case (c, i) => (i.toLong, c._1) }.toDF("id", "url")
    val got = UrlFilter.crawlFilter(df, "id", "url").orderBy("id").collect()
    cases.zip(got).foreach { case ((url, sch, ext, d, p, k), row) =>
      assert(row.getAs[String]("scheme") == sch, url)
      assert(row.getAs[String]("ext") == ext, url)
      assert(row.getAs[Long]("path_depth") == d, url)
      assert(row.getAs[Long]("n_params") == p, url)
      assert(row.getAs[Long]("keep") == k, url)
    }
  }

  test("robots: longest prefix wins, allow wins ties, no rule defaults to allow") {
    val rules = Seq(
      ("a.com", "/", 1L),
      ("a.com", "/private", 0L),
      ("a.com", "/private/ok", 1L),     // longer override re-allows
      ("b.com", "/x", 0L),
      ("b.com", "/x", 1L)               // same length: allow wins
    ).toDF("host", "path_prefix", "allow")
    val urls = Seq(
      (1L, "https://a.com/public/page"),        // root rule → allow
      (2L, "https://a.com/private/doc"),        // /private → deny
      (3L, "https://a.com/private/ok/doc"),     // /private/ok → allow
      (4L, "https://b.com/x/1"),                // tie → allow
      (5L, "https://c.com/anything")            // no rules → default allow
    ).toDF("id", "url")
    val got = UrlFilter.robotsFilter(urls, "id", "url", rules)
      .orderBy("id")
      .select("id", "matched_prefix", "allowed")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "/", 1L), (2L, "/private", 0L), (3L, "/private/ok", 1L),
      (4L, "/x", 1L), (5L, "", 1L)))
  }

  test("robots wildcards: * and $ patterns, most-specific wins, allow wins wildcard ties") {
    val rules = Seq(
      ("a.com", "/", 1L),
      ("a.com", "/*.pdf$", 0L),       // len 7: block pdfs anywhere
      ("a.com", "/docs*", 1L),        // len 6
      ("a.com", "/d*s", 0L),          // len 4
      ("b.com", "/x*y", 0L),
      ("b.com", "/x*y", 1L),          // same pattern: allow wins the tie
      ("c.com", "/a$", 0L)            // end anchor: exact path only
    ).toDF("host", "path_prefix", "allow")
    val urls = Seq(
      (1L, "https://a.com/docs/manual.pdf"),  // /*.pdf$ (7) beats /docs* (6) → deny
      (2L, "https://a.com/docs/manual.html"), // /docs* (6) beats /d*s (4) → allow
      (3L, "https://b.com/xzzy"),             // wildcard tie → allow
      (4L, "https://c.com/a"),                // anchored exact match → deny
      (5L, "https://c.com/ab")                // anchor misses → crawler default
    ).toDF("id", "url")
    val got = UrlFilter.robotsFilter(urls, "id", "url", rules)
      .orderBy("id")
      .select("id", "matched_prefix", "allowed")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "/*.pdf$", 0L), (2L, "/docs*", 1L), (3L, "/x*y", 1L),
      (4L, "/a$", 0L), (5L, "", 1L)))
    // regex specials stay LITERAL: in a plain rule they never reach a
    // regex engine, and in a wildcard rule they must be quoted —
    // an unquoted '(' would be an invalid (or wrong) pattern
    val weird = Seq(
      ("d.com", "/p(1)+x", 0L),       // plain, specials literal
      ("d.com", "/p(1)*z$", 1L),      // wildcard with quoted specials
      ("d.com", "/", 1L)
    ).toDF("host", "path_prefix", "allow")
    val wUrls = Seq(
      (1L, "https://d.com/p(1)+x?q=2"),  // path '/p(1)+x': plain rule wins
      (2L, "https://d.com/p(1)+xz")      // '/p(1)*z$' (8) beats '/p(1)+x' (7)
    ).toDF("id", "url")
    val w = UrlFilter.robotsFilter(wUrls, "id", "url", weird)
      .orderBy("id").select("id", "matched_prefix", "allowed")
      .as[(Long, String, Long)].collect().toSeq
    assert(w == Seq((1L, "/p(1)+x", 0L), (2L, "/p(1)*z$", 1L)))
  }

  test("robots: match target is path PLUS query (RFC 9309), empty path is '/'") {
    val rules = Seq(
      ("a.com", "/", 1L),
      ("a.com", "/*?sessionid=", 0L),   // query-string deny
      ("a.com", "/login$", 0L),         // anchored: a query breaks the anchor
      ("b.com", "/", 0L)
    ).toDF("host", "path_prefix", "allow")
    val urls = Seq(
      (1L, "https://a.com/page?sessionid=abc"),  // query matched → deny
      (2L, "https://a.com/page?other=1"),        // query present, no sessionid → allow
      (3L, "https://a.com/login"),               // anchored exact → deny
      (4L, "https://a.com/login?next=x"),        // '$' anchor misses past '?' → root allow
      (5L, "https://b.com"),                     // empty path → '/' → root deny
      (6L, "https://b.com?q=1")                  // no path, query only: target '?q=1'…
    ).toDF("id", "url")
    val got = UrlFilter.robotsFilter(urls, "id", "url", rules)
      .orderBy("id").select("id", "matched_prefix", "allowed")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "/*?sessionid=", 0L), (2L, "/", 1L), (3L, "/login$", 0L),
      (4L, "/", 1L), (5L, "/", 0L), (6L, "/", 0L)))
  }

  test("robotsMatch kernel ≡ regex-translated reference on exhaustive small cases") {
    import org.apache.spark.unsafe.types.UTF8String
    def ref(target: String, pattern: String): Boolean = {
      val anchored = pattern.endsWith("$")
      val core = if (anchored) pattern.dropRight(1) else pattern
      val rx = core.split("\\*", -1).map(java.util.regex.Pattern.quote).mkString(".*")
      val full = "^" + rx + (if (anchored) "$" else ".*")
      java.util.regex.Pattern.compile(full).matcher(target).matches()
    }
    def got(t: String, p: String): Boolean =
      graft.functions.RobotsUtil.robotsMatch(
        UTF8String.fromString(t), UTF8String.fromString(p))
    // exhaustive over short strings from a glob-hostile alphabet:
    // every pattern of length <= 3 over {a, b, *, $} against every
    // target of length <= 3 over {a, b, $} — 85 x 40 = 3400 pairs
    // covering star runs, literal '$' mid-pattern, empty both sides
    val pChars = Seq('a', 'b', '*', '$')
    val tChars = Seq('a', 'b', '$')
    def strings(cs: Seq[Char], n: Int): Seq[String] =
      (0 to n).flatMap(k => Seq.fill(k)(cs).foldLeft(Seq(""))((acc, c) =>
        acc.flatMap(s => c.map(s + _))))
    for (p <- strings(pChars, 3); t <- strings(tChars, 3))
      assert(got(t, p) == ref(t, p), s"pattern='$p' target='$t'")
    // plus the shapes the exhaustive lengths can't reach
    val cases = Seq(
      ("/docs/manual.pdf", "/*.pdf$", true),
      ("/docs/manual.pdfx", "/*.pdf$", false),
      ("/docs/manual.pdf", "/*.pdf", true),
      ("/a/b/a/b/c", "/a*b*c$", true),
      ("/a/b/a/b/cx", "/a*b*c$", false),
      ("/abc", "**b*", true),
      ("/x", "", true))
    for ((t, p, want) <- cases)
      assert(got(t, p) == want && ref(t, p) == want, s"'$p' vs '$t'")
  }

  test("robots rules broadcast; no cartesian in the plan") {
    val plan = graft.queries.Extensions.urlRobots(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("declared queries run with the expected shape on sf0.001") {
    val g = graft.queries.Extensions.textGopher(spark, "/root/testdata/sf0.001")
    assert(g.count() > 0)
    assert(g.columns.toSeq == Seq("doc_id", "n_tokens", "sum_token_len",
      "n_alpha_words", "n_stop_distinct", "n_hash", "n_ellipsis",
      "n_lines", "n_bullet_lines", "n_ellipsis_lines", "pass"))
    val u = graft.queries.Extensions.urlFilter(spark, "/root/testdata/sf0.001")
    val rows = u.collect()
    assert(rows.nonEmpty)
    // the synthetic frontier must exercise BOTH gate outcomes
    assert(rows.exists(_.getAs[Long]("keep") == 1L))
    assert(rows.exists(_.getAs[Long]("keep") == 0L))
    // and more than one rejection reason
    assert(rows.exists(r => r.getAs[String]("scheme") == "ftp"))
    assert(rows.exists(r => r.getAs[Long]("path_depth") > 8))
  }
}
