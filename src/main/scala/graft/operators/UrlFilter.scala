package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Crawl-frontier URL filtering — the pre-fetch screen of a web-scale
  * ingest pipeline. The reference crawls a fixed site list
  * (scraper.py:163-166) so it never needs one; a 100 TB crawl filters
  * its frontier BEFORE any fetch: scheme allowlist, static-asset
  * extension blocklist, path-depth and query-param caps (link-farm /
  * calendar-trap signatures). Pure codegen'd regexp projection over the
  * frontier scan — no shuffle, no UDFs — and the keep gate is integer
  * predicates only, so it is engine-portable bit for bit.
  *
  * Complements [[Dedup.urlDedup]] (canonicalize what you keep) and
  * [[Dedup.domainQuota]] (cap per host): filter → canonicalize → quota
  * is the standard frontier chain.
  */
object UrlFilter {

  /** Static-asset extensions a text-corpus crawl never fetches. */
  val BlockedExts: Seq[String] = Seq(
    "jpg", "jpeg", "png", "gif", "webp", "ico", "svg",
    "css", "js", "woff", "woff2", "ttf",
    "mp3", "mp4", "avi", "mov", "webm",
    "zip", "gz", "tar", "exe", "dmg")

  /** Scheme / extension / path-depth / query-param signals of one URL.
    * Counting stays in codegen'd regexp_count, never a higher-order
    * filter over a split array (CodegenFallback + two allocations per
    * row — measured 3× slower on the sf0.1 frontier): a non-empty path
    * segment is exactly a `/` followed by a non-`/`, and a query with
    * k params has k−1 `&`s. */
  def signals(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val path = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val ext = lower(regexp_extract(path, "\\.([A-Za-z0-9]+)$", 1))
    val depth = regexp_count(path, lit("/[^/]")).cast("long")
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val nParams = when(query === "", lit(0L))
      .otherwise(regexp_count(query, lit("&")).cast("long") + 1L)
    struct(scheme.as("scheme"), ext.as("ext"),
      depth.as("path_depth"), nParams.as("n_params"))
  }

  /** Robots-rules screen — the other half of the frontier gate: apply
    * per-host (path_prefix, allow) rules with MOST-SPECIFIC-MATCH
    * precedence (longest pattern) and allow-wins-ties — RFC 9309's
    * evaluation order, including its `*` (any sequence) and trailing
    * `$` (end anchor) wildcards. A plain rule is a prefix match; a
    * wildcard rule is matched through an RE2-safe regex translated
    * from the pattern (specials quoted, `*` → `.*`, trailing `$` →
    * end anchor). The match target is the PATH PLUS QUERY (RFC 9309
    * §2.2.2 matches the URI from the path onward, so a
    * `Disallow` of `/&#42;?sessionid=` works), with the empty path coalesced
    * to `/` as the RFC requires. A URL whose host has no matching
    * rule is allowed — the crawler default.
    *
    * Shape at scale: the rules table is bounded by hosts × a few rules
    * (a parsed robots corpus is dimension-sized), so it BROADCASTS;
    * the match is a host equi-join plus the codegen'd
    * [[graft.functions.RobotsMatch]] glob predicate — one regex-free
    * byte walk per (url, candidate-rule) pair (a column-side regex
    * pattern would recompile per row), never URL × all-rules; the
    * per-URL argmax rides one `max_by` groupBy with map-side combine
    * over ≤ rules-per-host candidates, ordered by the
    * (len, allow, pattern) struct — a total, engine-portable order
    * with no padded-string key to overflow or collide on delimiters. */
  def robotsFilter(df: DataFrame, idCol: String, urlCol: String,
                   rules: DataFrame): DataFrame = {
    val host = lower(regexp_extract(col(urlCol),
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)", 1))
    // path PLUS query (everything after the authority up to any
    // fragment) — the RFC 9309 match target. A target not starting
    // with '/' (empty path, with or without a query) gets the
    // RFC-mandated leading '/': '' → '/', '?q=1' → '/?q=1'
    val path0 = regexp_extract(col(urlCol),
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val path = when(path0.startsWith("/"), path0)
      .otherwise(concat(lit("/"), path0))
    // materialize: the host/path projection feeds BOTH the match
    // aggregate and the final left side — without the lineage cut the
    // frontier scan and regex extraction run once per consumer (the
    // topTermsTfIdf two-consumer shape)
    val withHp = df.select(col(idCol), col(urlCol),
      host.as("host"), path.as("path"))
      .localCheckpoint()
    val best = withHp.join(broadcast(rules), Seq("host"))
      .filter(graft.functions.Urls.robotsMatch(col("path"), col("path_prefix")))
      .groupBy(col(idCol))
      .agg(max_by(
        struct(col("path_prefix").as("p"), col("allow").as("a")),
        struct(length(col("path_prefix")).as("l"), col("allow").as("a"),
          col("path_prefix").as("p"))).as("_w"))
    withHp.join(best, Seq(idCol), "left")
      .select(col(idCol), col(urlCol), col("host"),
        coalesce(col("_w.p"), lit("")).as("matched_prefix"),
        coalesce(col("_w.a").cast("long"), lit(1L)).as("allowed"))
  }

  /** Per-URL filter report: signals plus the keep gate (0/1). */
  def crawlFilter(df: DataFrame, idCol: String, urlCol: String,
                  maxDepth: Int = 8, maxParams: Int = 8): DataFrame = {
    val s = signals(col(urlCol))
    df.select(col(idCol), col(urlCol),
        s.getField("scheme").as("scheme"), s.getField("ext").as("ext"),
        s.getField("path_depth").as("path_depth"),
        s.getField("n_params").as("n_params"))
      .withColumn("keep",
        (col("scheme").isin("http", "https") &&
          !col("ext").isin(BlockedExts: _*) &&
          col("path_depth") <= maxDepth &&
          col("n_params") <= maxParams).cast("long"))
  }
}
