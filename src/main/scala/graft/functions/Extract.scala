package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SURVEY §2.6 — the reference's scalar extraction library as
  * `Column => Column` functions.
  *
  * Error semantics replicated exactly (SURVEY §1.2): every extractor
  * yields the empty-string sentinel `""` on failure — never null, and no
  * row is ever dropped for a bad field. Spark 4 runs ANSI mode by
  * default, so all potentially-failing operations use the `get`/`try_*`
  * family rather than throwing forms.
  *
  * Everything is expression-level (whole-stage codegen): string/date/
  * regex logic via built-ins, the HTML selectors as native Catalyst
  * expressions over [[HtmlLite]] (SURVEY §2.8) — zero UDFs.
  */
object Extract {

  /** `""` instead of null — the reference's universal failure sentinel. */
  private def sentinel(c: Column): Column = coalesce(c, lit(""))

  /** `.encode('ascii','ignore')` (etl_process.py:31,132,144,155,166,177):
    * drop every non-ASCII char. */
  def asciiOnly(c: Column): Column = regexp_replace(c, "[^\\x00-\\x7F]", "")

  /** `url.split('/')[i]` with `""` on short URLs (etl_process.py:42-59).
    * `get` (not `getItem`) so out-of-bounds is null→"" under ANSI mode. */
  def urlPart(url: Column, i: Int): Column = sentinel(get(split(url, "/"), lit(i)))

  /** `get_ad_id` — etl_process.py:42-49. */
  def adId(url: Column): Column = urlPart(url, 5)

  /** `get_category` — etl_process.py:52-59. */
  def category(url: Column): Column = urlPart(url, 3)

  /** `get_site_id`: subdomain of the host — etl_process.py:62-65. */
  def siteId(url: Column): Column =
    sentinel(get(split(get(split(url, "/"), lit(2)), "\\."), lit(0)))

  /** `create_uniq_id` — scraper.py:105-119 (concat at :117). */
  def uniqId(postDate: Column, adId: Column, siteId: Column, category: Column): Column =
    concat_ws("-", postDate, adId, siteId, category)

  /** drop CR/LF — the `.strip('\r\n')`-ish cleanup applied to every text
    * field (etl_process.py:32,133,145,156,167,178). */
  def dropCrLf(c: Column): Column = regexp_replace(c, "[\\r\\n]", "")

  /** `get_post_date` (etl_process.py:28-39): adInfo text → ascii →
    * drop "Posted:" → trim → parse "%A, %B %d, %Y %I:%M %p" → reformat
    * "%Y-%m-%d %H:%M:%S"; `""` on any failure (try_to_timestamp).
    * Weekday/month names need the US-English formatter, which is Spark's
    * default pattern locale.
    */
  def postDate(adInfoText: Column): Column = {
    val cleaned = trim(regexp_replace(dropCrLf(asciiOnly(adInfoText)), "Posted:", ""))
    // Spark's pattern 'E'/'EEEE' is format-only (parsing throws), so the
    // "%A, " weekday prefix is stripped textually before the parse —
    // same accept/reject behavior as strptime for well-formed inputs.
    val noWeekday = regexp_replace(cleaned, "^[A-Za-z]+,\\s*", "")
    sentinel(date_format(
      try_to_timestamp(noWeekday, lit("MMMM d, yyyy h:mm a")),
      "yyyy-MM-dd HH:mm:ss"))
  }

  /** `phone_extract` (etl_process.py:79-126), zero UDFs: lower → strip
    * string.punctuation minus '$' (comment at :84) → drop spaces →
    * spelled-digit substring replace (the reference loops a py2 dict in
    * nondeterministic order; we fix zero..nine order — the intended
    * "phone"→"ph1"-style corruptions still happen) → digit runs →
    * len∈[7,11] → distinct → sort (reference set order was
    * nondeterministic; we sort) → ';'-join.
    */
  def phoneExtract(text: Column): Column = {
    val punct = "!\"#%&'()*+,-./:;<=>?@[\\]^_`{|}~"
    var c = lower(text)
    c = translate(c, punct, "")
    c = translate(c, " ", "")
    // ten chained regexp_replace calls fused into one codegen'd pass
    // (identical sequential zero..nine literal-replace semantics)
    c = Sketches.spelledDigits(c)
    val runs = regexp_extract_all(c, lit("[0-9]+"), lit(0))
    val kept = filter(runs, x => length(x).between(7, 11))
    array_join(array_sort(array_distinct(kept)), ";")
  }

  /** `get_phone_number` (etl_process.py:129-138): body text → ascii →
    * CR/LF strip → phone chain. */
  def phoneNumber(bodyText: Column): Column =
    phoneExtract(dropCrLf(asciiOnly(bodyText)))

  // ----- HTML selector family (native expressions over HtmlLite;
  //       formerly the engine's only UDFs — now zero UDFs anywhere) -----

  def adInfoText(html: Column): Column       = HtmlCols.tagText(html, "div", "class", "adInfo")
  def postingTitleText(html: Column): Column = HtmlCols.tagText(html, "div", "id", "postingTitle")
  def postingBodyText(html: Column): Column  = HtmlCols.tagText(html, "div", "class", "postingBody")
  def metaInfoText(html: Column): Column     = HtmlCols.tagText(html, "p", "class", "metaInfoDisplay")

  /** div whose *text* contains "Location:" (etl_process.py:141-149). */
  def locationDivText(html: Column): Column  = HtmlCols.byTextText(html, "div", "Location:")

  /** hrefs under div#OtherAdsByThisUser div.cat* (etl_process.py:68-76)
    * — returned as an array; `array_join(";")` at the compat boundary
    * (SURVEY §1.2: ArrayType internally, flattened only for bit-compat).
    */
  def otherAdsHrefs(html: Column): Column    = HtmlCols.otherAdsHrefs(html)

  /** listing-page ad URLs: hrefs of div.cat* anchors (scraper.py:66-67). */
  def listingAdUrls(html: Column): Column    = HtmlCols.listingAdUrls(html)

  /** `get_locations` (etl_process.py:141-149). */
  def locations(html: Column): Column =
    trim(regexp_replace(dropCrLf(asciiOnly(locationDivText(html))), "Location:", ""))

  /** `get_post_body` (etl_process.py:152-160). */
  def postBody(html: Column): Column =
    trim(dropCrLf(asciiOnly(postingBodyText(html))))

  /** `get_poster_age` (etl_process.py:163-171). */
  def posterAge(html: Column): Column =
    trim(regexp_replace(dropCrLf(asciiOnly(metaInfoText(html))), "Poster's age:", ""))

  /** `get_post_title` (etl_process.py:174-182). */
  def postTitle(html: Column): Column =
    trim(regexp_replace(dropCrLf(asciiOnly(postingTitleText(html))), "Report Ad", ""))
}
