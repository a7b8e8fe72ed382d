package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.queries.Extensions

class UrlDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def norm(u: String): String =
    Seq(u).toDF("url").select(Dedup.urlNormalize(col("url")).as("n"))
      .as[String].head()

  test("case, www, default port, trailing slash, fragment, utm all collapse") {
    assert(norm("HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&id=1#frag")
      == "https://example.com/a/b?id=1")
  }

  test("tracking-only query drops its '?'") {
    assert(norm("https://x.com/p?utm_source=a&utm_campaign=b") == "https://x.com/p")
    assert(norm("https://x.com/p?gclid=1") == "https://x.com/p")
    assert(norm("https://x.com/p?fbclid=1&ref=r") == "https://x.com/p")
  }

  test("non-tracking params keep their order (never reordered)") {
    assert(norm("https://x.com/p?b=2&a=1") == "https://x.com/p?b=2&a=1")
  }

  test("'ref' dies but 'refid' survives — param names are anchored, not prefixes") {
    assert(norm("https://x.com/p?ref=abc&refid=5") == "https://x.com/p?refid=5")
  }

  test("default port stripped per scheme, non-default ports kept") {
    assert(norm("http://x.com:80/p") == "http://x.com/p")
    assert(norm("http://x.com:443/p") == "http://x.com:443/p")
    assert(norm("https://x.com:8080/p") == "https://x.com:8080/p")
  }

  test("bare host, bare host + slash, and www-host all meet") {
    assert(norm("https://www.x.com") == "https://x.com")
    assert(norm("https://x.com/") == "https://x.com")
    assert(norm("https://x.com") == "https://x.com")
  }

  test("path case is preserved (paths are case-sensitive, hosts are not)") {
    assert(norm("https://X.com/CaseSensitive") == "https://x.com/CaseSensitive")
  }

  test("a string that is not scheme://host passes through unchanged") {
    assert(norm("not a url") == "not a url")
    assert(norm("/relative/path?utm_source=x") == "/relative/path?utm_source=x")
  }

  test("urlDedup groups every spelling of one resource under min id") {
    val df = Seq(
      (5L, "https://www.x.com/a?id=1&utm_source=s"),
      (2L, "HTTPS://X.COM:443/a/?id=1"),
      (3L, "https://x.com/a?id=1#top"),
      (4L, "https://x.com/other")
    ).toDF("id", "url")
    val got = Dedup.urlDedup(df, "url", "id").orderBy("norm_url")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("https://x.com/a?id=1", 2L, 3L),
      ("https://x.com/other", 4L, 1L)))
  }

  test("kernel ≡ declarative reference chain on edge cases and hostile inputs") {
    val urls = Seq(
      "HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&id=1#frag",
      "https://x.com/p?utm_source=a&utm_campaign=b",
      "https://x.com/p?b=2&a=1",
      "https://x.com/p?ref=abc&refid=5",
      "http://x.com:80/p", "http://x.com:443/p", "https://x.com:8080/p",
      "https://www.x.com", "https://x.com/", "https://x.com",
      "https://X.com/CaseSensitive", "not a url", "/relative/path?utm_source=x",
      // hostile / boundary inputs: both paths must agree on ALL of them
      "", "https://", "https:///path", "https://www.", "://x.com/a",
      "https://x.com/p#f?notaquery", "https://x.com/p?", "https://x.com/p?&a=1",
      "https://x.com/p?a=1&", "https://x.com/p?utm_x=1&&a=1",
      "https://x.com/p?a=b=c&ref=1", "https://x.com/p?ref&refx=1",
      "https://x.com/p?utm_so-urce=keep", "https://x.com/p?utm_=1&utm=2",
      "https://x.com/p?UTM_source=keep", "ftp://x.com:21/a/",
      "http+x://host/a", "https://x.com///", "https://x.com//a//")
    val df = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }.toDF("id", "url")
    val got = df.select(
        Dedup.urlNormalize(col("url")).as("k"),
        Dedup.urlNormalizeReference(col("url")).as("r"),
        col("url"))
      .collect()
    got.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"kernel='${r.getString(0)}' reference='${r.getString(1)}' url='${r.getString(2)}'")
    }
  }

  test("kernel ≡ reference over the full synthesized URL corpus") {
    val mismatches = Extensions.synthUrls(spark, "/root/testdata/sf0.001")
      .filter(Dedup.urlNormalize(col("url")) =!=
        Dedup.urlNormalizeReference(col("url")))
      .count()
    assert(mismatches == 0)
  }

  test("normalization is pure codegen'd projection — whole-stage, no shuffle") {
    // over a real scan (a local Seq constant-folds to LocalTableScan and
    // has no codegen stage to observe)
    val qe = graft.core.Tables.t(spark, "/root/testdata/sf0.001", "documents")
      .select(Dedup.urlNormalize(col("text"))).queryExecution
    val plan = qe.executedPlan
    assert(plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]),
      plan.toString.take(2000))
    assert(!plan.toString.contains("Exchange"), plan.toString.take(2000))
  }
}
