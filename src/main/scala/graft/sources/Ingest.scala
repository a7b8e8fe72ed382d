package graft.sources

import java.nio.file.{Files, Paths}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter
import java.util.Locale

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.HtmlLite

/** The ingest connector (SURVEY §2.1, §7 module 3): the reference's
  * Tor-proxied crawler (scraper.py:27-119,159-218) re-expressed as a
  * Spark source — a crawl frontier cross join, a paginated listing scan
  * with the "No matches found." stop sentinel, and per-ad fetch into the
  * raw JSON envelope.
  *
  * Spark has no built-in web source, so fetching runs in mapPartitions
  * behind [[PageFetcher]] (one client per task/partition). CI and tests
  * use [[FileStubFetcher]] — the connector logic (pagination, sentinel
  * stop, retry, envelope/uniq_id construction) is fully exercised with
  * zero network.
  *
  * Scale notes: the frontier is repartitioned so each (city×category)
  * walk — inherently sequential because of the stop sentinel — runs in
  * parallel with the others; per-ad fetches are a flat distributed map.
  */
object Ingest {

  final case class FetchedPage(code: Int, body: String)

  /** One HTTP(-ish) client per partition; implementations own retry/
    * backoff/proxy policy (the reference's Tor re-dial at
    * scraper.py:76-81 would live here). */
  trait PageFetcher extends Serializable {
    def fetch(url: String): Option[FetchedPage]
  }

  /** File-backed stub: resolves a URL to `<baseDir>/<sanitized-url>.html`.
    * Missing file = fetch failure (None), mirroring an HTTP error. */
  final case class FileStubFetcher(baseDir: String) extends PageFetcher {
    def fetch(url: String): Option[FetchedPage] = {
      val p = Paths.get(baseDir, FileStubFetcher.sanitize(url) + ".html")
      if (Files.exists(p)) Some(FetchedPage(200, Files.readString(p))) else None
    }
  }
  object FileStubFetcher {
    def sanitize(url: String): String = url.replaceAll("[^A-Za-z0-9]+", "_")
  }

  /** Production HTTP fetcher with the reference's retry/backoff/re-dial
    * contract (scraper.py:27-40,76-81): bounded retries with exponential
    * backoff on 5xx/connection failure, an `onRetry` hook — the seam
    * where the reference re-dials its Tor circuit — and both proxy
    * shapes: `proxy` is an HTTP CONNECT proxy (JDK HttpClient), and
    * `socksProxy` is a SOCKS5 proxy — the reference's actual Tor path
    * (scraper.py:32-40, socks5h://localhost:9050) — routed through
    * `HttpURLConnection.openConnection(Proxy(SOCKS, …))`, the JDK layer
    * that speaks SOCKS natively (HttpClient does not). 2xx–4xx
    * responses are returned as-is (the raw envelope records the code,
    * as the reference's does); exhausted retries → None, dropping the
    * ad like the reference's error path.
    *
    * One client per task: the case class is Serializable, the client is
    * `@transient lazy` — each executor partition builds its own on
    * first use, exactly the per-partition-client shape `scanListings` /
    * `fetchAds` assume.
    */
  final case class HttpPageFetcher(
      timeoutMs: Int = 10000,
      maxRetries: Int = 3,
      backoffMs: Long = 500,
      proxy: Option[(String, Int)] = None,
      socksProxy: Option[(String, Int)] = None,
      onRetry: Int => Unit = _ => ()) extends PageFetcher {

    @transient private lazy val client: java.net.http.HttpClient = {
      val b = java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(timeoutMs.toLong))
        .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      proxy.foreach { case (host, port) =>
        b.proxy(java.net.ProxySelector.of(new java.net.InetSocketAddress(host, port)))
      }
      b.build()
    }

    /** One attempt via HttpClient (direct or HTTP CONNECT proxy). */
    private def sendHttp(req: java.net.http.HttpRequest): Option[FetchedPage] = {
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() < 500) Some(FetchedPage(resp.statusCode(), resp.body()))
      else None                                     // 5xx → retry
    }

    /** One attempt tunneled through the SOCKS5 proxy. */
    private def sendSocks(url: java.net.URL, host: String, port: Int): Option[FetchedPage] = {
      val px = new java.net.Proxy(java.net.Proxy.Type.SOCKS,
        new java.net.InetSocketAddress(host, port))
      val conn = url.openConnection(px).asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      conn.setInstanceFollowRedirects(true)
      try {
        val code = conn.getResponseCode
        val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
        val body = if (is == null) ""
          else try new String(is.readAllBytes(), "UTF-8") finally is.close()
        if (code < 500) Some(FetchedPage(code, body)) else None
      } finally conn.disconnect()
    }

    def fetch(url: String): Option[FetchedPage] = {
      // non-retryable up front: a malformed URL never improves with backoff
      val (req, parsedUrl) =
        try {
          val uri = java.net.URI.create(url)
          (java.net.http.HttpRequest.newBuilder(uri)
            .timeout(java.time.Duration.ofMillis(timeoutMs.toLong))
            .GET().build(), uri.toURL)
        } catch { case _: IllegalArgumentException | _: java.net.MalformedURLException =>
          return None }
      var attempt = 0
      while (attempt <= maxRetries) {
        val got =
          try socksProxy match {
            case Some((h, p)) => sendSocks(parsedUrl, h, p)
            case None         => sendHttp(req)
          } catch {
            // task cancellation must win immediately: restore the
            // interrupt flag and stop — burning retries + sleeps here
            // would pin the executor slot after Spark kills the task
            case _: InterruptedException =>
              Thread.currentThread().interrupt(); return None
            case _: Exception => None               // conn/timeout → retry
          }
        if (got.isDefined) return got
        attempt += 1
        if (attempt <= maxRetries) {
          onRetry(attempt)
          try Thread.sleep(backoffMs * (1L << (attempt - 1)))  // exponential
          catch { case _: InterruptedException =>
            Thread.currentThread().interrupt(); return None }
        }
      }
      None
    }
  }

  /** Param-file scan (scraper.py:159-160): lowercase, trim, dedup. */
  def params(spark: SparkSession, path: String, colName: String): DataFrame =
    spark.read.text(path)
      .select(lower(trim(col("value"))).as(colName))
      .filter(length(col(colName)) > 0)
      .distinct()

  /** Crawl frontier: cities × categories (scraper.py:163-166). */
  def frontier(cities: DataFrame, categories: DataFrame): DataFrame =
    cities.crossJoin(categories)

  final case class ListingHit(city: String, category: String, page: Int, ad_url: String)

  /** Paginated listing scan (scraper.py:43-83): for each frontier pair,
    * fetch pages 1..maxPages, stop on the "No matches found." sentinel
    * or a failed fetch, and explode the div.cat* anchor hrefs. Each
    * pair's walk is sequential (the sentinel forces it); pairs run in
    * parallel across partitions.
    */
  def scanListings(frontierDf: DataFrame, fetcher: PageFetcher,
                   maxPages: Int = 49): Dataset[ListingHit] = {
    implicit val enc = Encoders.product[ListingHit]
    val parallelism = frontierDf.sparkSession.sparkContext.defaultParallelism
    frontierDf.select(col("city"), col("category"))
      .repartition(parallelism)
      .as(Encoders.product[(String, String)])
      .mapPartitions { pairs =>
        pairs.flatMap { case (city, category) =>
          Iterator.range(1, maxPages + 1)
            .map { page =>
              val url = listingUrl(city, category, page)
              (page, fetcher.fetch(url))
            }
            .takeWhile { case (_, fetched) =>
              fetched.exists(p => !p.body.contains("No matches found."))
            }
            .flatMap { case (page, fetched) =>
              HtmlLite.findAll(fetched.get.body, "div", "class", "cat.*")
                .flatMap(HtmlLite.hrefs)
                .map(u => ListingHit(city, category, page, u))
            }
        }
      }
  }

  /** `http://{city}.backpage.com/{category}/` with `?page=N` from page 2
    * (scraper.py:56,175). */
  def listingUrl(city: String, category: String, page: Int): String = {
    val base = s"http://$city.backpage.com/$category/"
    if (page <= 1) base else s"$base?page=$page"
  }

  final case class RawAd(scrape_date: String, code: Int, url: String,
                         read: String, uniq_id: String)

  /** Per-ad fetch → raw envelope (scraper.py:94-119,187-208): wraps the
    * body with scrape_date/code/url and derives uniq_id =
    * post_date-ad_id-site_id-category (create_uniq_id re-parses the
    * HTML, scraper.py:105-119). Ads whose fetch fails are dropped, as in
    * the reference's error path.
    */
  def fetchAds(adUrls: Dataset[ListingHit], fetcher: PageFetcher,
               scrapeDate: String): Dataset[RawAd] = {
    implicit val enc = Encoders.product[RawAd]
    adUrls.mapPartitions { hits =>
      hits.flatMap { hit =>
        fetcher.fetch(hit.ad_url).map { page =>
          RawAd(scrapeDate, page.code, hit.ad_url, page.body,
            uniqId(hit.ad_url, page.body))
        }
      }
    }
  }

  private val inFmt = DateTimeFormatter.ofPattern("MMMM d, yyyy h:mm a", Locale.US)
  private val outFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss", Locale.US)

  /** Plain-Scala twin of the Column-side post-date extraction, for the
    * connector path (create_uniq_id parses HTML outside any DataFrame —
    * scraper.py:105-116). Same semantics: adInfo text → ascii → strip
    * "Posted:" and the weekday prefix → parse → reformat; "" on failure.
    */
  def postDateOf(html: String): String = {
    val txt = HtmlLite.findFirst(html, "div", "class", "adInfo")
      .map(HtmlLite.text).getOrElse("")
    val cleaned = txt.replaceAll("[^\\x00-\\x7F]", "").replaceAll("[\\r\\n]", "")
      .replace("Posted:", "").trim
      .replaceFirst("^[A-Za-z]+,\\s*", "")
    try LocalDateTime.parse(cleaned, inFmt).format(outFmt)
    catch { case _: Exception => "" }
  }

  /** create_uniq_id (scraper.py:105-119): post_date-ad_id-site_id-category. */
  def uniqId(url: String, html: String): String = {
    val parts = url.split("/")
    def part(i: Int) = if (parts.length > i) parts(i) else ""
    val siteId = part(2).split("\\.").headOption.getOrElse("")
    Seq(postDateOf(html), part(5), siteId, part(3)).mkString("-")
  }

  /** Envelope → JSON lines matching the scraper's json.dumps landing
    * format (scraper.py:208), ready for the raw store / EtlStream. */
  def toRawJson(ads: Dataset[RawAd]): DataFrame =
    ads.toDF().select(to_json(struct(
      col("scrape_date"), col("code"), col("url"), col("read"), col("uniq_id")
    )).as("value"))
}
