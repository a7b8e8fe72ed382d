package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.etl.Pipeline
import graft.sources.Ingest._

class IngestSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def adHtml(id: String) =
    s"""<html><body>
       |<div id="postingTitle">Ad $id Report Ad</div>
       |<div class="adInfo"> Posted: Thursday, May 4, 2017 11:53 PM </div>
       |<div class="postingBody">call 5551234567</div>
       |</body></html>""".stripMargin

  private def listing(urls: Seq[String], sentinel: Boolean = false) = {
    val items = urls.map(u => s"""<div class="cat3"><a href="$u">ad</a></div>""").mkString
    val tail = if (sentinel) "<p>No matches found.</p>" else ""
    s"<html><body>$items$tail</body></html>"
  }

  lazy val base: String = {
    val dir = Files.createTempDirectory("graft_ingest").toString
    def put(url: String, body: String): Unit =
      Files.writeString(Paths.get(dir, FileStubFetcher.sanitize(url) + ".html"), body)
    val ads = (1 to 3).map(i => s"http://birmingham.backpage.com/womenseekmen/ad-$i/1000000$i")
    put(listingUrl("birmingham", "womenseekmen", 1), listing(ads.take(2)))
    put(listingUrl("birmingham", "womenseekmen", 2), listing(ads.drop(2)))
    put(listingUrl("birmingham", "womenseekmen", 3), listing(Nil, sentinel = true))
    // page 4 exists with a poison URL: the sentinel must stop the walk first
    put(listingUrl("birmingham", "womenseekmen", 4),
      listing(Seq("http://birmingham.backpage.com/womenseekmen/poison/99999999")))
    ads.foreach(u => put(u, adHtml(u.split("/").last)))
    Files.writeString(Paths.get(dir, "cities.txt"), " Birmingham \nbirmingham\n")
    Files.writeString(Paths.get(dir, "categories.txt"), "WomenSeekMen\n")
    dir
  }

  lazy val fetcher = FileStubFetcher(base)

  test("params scan lowercases, trims, dedups (reference scraper.py:159-160)") {
    val cities = params(spark, s"$base/cities.txt", "city")
    assert(cities.as[String].collect().toSeq == Seq("birmingham"))
  }

  test("paginated scan stops at the sentinel and collects all ad urls") {
    val f = frontier(params(spark, s"$base/cities.txt", "city"),
      params(spark, s"$base/categories.txt", "category"))
    val hits = scanListings(f, fetcher).collect()
    assert(hits.length == 3)
    assert(hits.map(_.page).sorted.toSeq == Seq(1, 1, 2))
    assert(!hits.exists(_.ad_url.contains("poison")))
  }

  test("fetchAds builds the envelope with the derived uniq_id") {
    val f = frontier(params(spark, s"$base/cities.txt", "city"),
      params(spark, s"$base/categories.txt", "category"))
    val ads = fetchAds(scanListings(f, fetcher), fetcher, "2017-05-06 10:00:00").collect()
    assert(ads.length == 3)
    val one = ads.find(_.url.endsWith("10000001")).get
    assert(one.uniq_id == "2017-05-04 23:53:00-10000001-birmingham-womenseekmen")
    assert(one.code == 200)
  }

  test("connector output flows into the batch pipeline") {
    val f = frontier(params(spark, s"$base/cities.txt", "city"),
      params(spark, s"$base/categories.txt", "category"))
    val raw = toRawJson(fetchAds(scanListings(f, fetcher), fetcher, "2017-05-06 10:00:00"))
    val parsed = Pipeline.dedupIngest(Pipeline.parseRaw(raw), None)
    val clean = Pipeline.cleanData(parsed)
    assert(clean.count() == 3)
    val phones = clean.select("phone").as[String].collect().toSet
    assert(phones == Set("5551234567"))
  }
}
