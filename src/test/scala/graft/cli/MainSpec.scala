package graft.cli

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sources.Ingest.{listingUrl, FileStubFetcher}

/** End-to-end CLI: `ingest` (stub-fetched crawl → raw JSON lines) piped
  * through `etl` (raw → warehouse/quarantine) purely via the
  * filesystem, exactly as the reference's `frontpage scraper` then
  * `frontpage etl` invocations chain (cli.py:5-16).
  */
class MainSpec extends AnyFunSuite with SparkSpec {

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

  test("ingest then etl: crawl fixtures to a state-partitioned warehouse") {
    val fixtures = Files.createTempDirectory("graft_cli_fix").toString
    def put(url: String, body: String): Unit =
      Files.writeString(Paths.get(fixtures, FileStubFetcher.sanitize(url) + ".html"), body)
    val ads = (1 to 3).map(i => s"http://birmingham.backpage.com/womenseekmen/ad-$i/1000000$i")
    put(listingUrl("birmingham", "womenseekmen", 1), listing(ads.take(2)))
    put(listingUrl("birmingham", "womenseekmen", 2), listing(ads.drop(2)))
    put(listingUrl("birmingham", "womenseekmen", 3), listing(Nil, sentinel = true))
    ads.foreach(u => put(u, adHtml(u.split("/").last)))
    Files.writeString(Paths.get(fixtures, "cities.txt"), "Birmingham\n")
    Files.writeString(Paths.get(fixtures, "categories.txt"), "womenseekmen\n")

    val out = Files.createTempDirectory("graft_cli_out").toString
    Main.run(List("ingest", s"$fixtures/cities.txt", s"$fixtures/categories.txt",
      fixtures, out, "2017-05-06 10:00:00"), spark)
    val rawLines = spark.read.text(s"$out/raw")
    assert(rawLines.count() == 3)

    // the raw dir written by ingest is directly consumable by etl
    Main.run(List("etl", s"$out/raw", fixture("site_dim.csv"), out), spark)
    val wh = spark.read.parquet(s"$out/warehouse")
    assert(wh.count() == 3)
    assert(wh.select("state").distinct().collect().map(_.getString(0)).toSeq == Seq("Alabama"))
    assert(wh.select("phone").collect().map(_.getString(0)).forall(_ == "5551234567"))
  }

  test("etl-stream and conform subcommands run end-to-end") {
    val out = Files.createTempDirectory("graft_cli_s").toString
    val rawDir = s"$out/rawdir"
    Files.createDirectories(Paths.get(rawDir))
    Files.copy(Paths.get(fixture("raw_ads.jsonl")), Paths.get(s"$rawDir/batch1.jsonl"))
    Main.run(List("etl-stream", rawDir, fixture("site_dim.csv"), out), spark)
    assert(spark.read.parquet(s"$out/warehouse").count() == 5)
    Main.run(List("conform", s"$out/warehouse", s"$rawDir/batch1.jsonl", out), spark)
    // the fixture ads were all posted 2017-05-04, before the first
    // scrape (2017-05-06): conform's temporal filter (post_date >= min
    // scrape_date, the reference's "drop ads posted before collection
    // began") must drop every row — the empty result IS the semantics
    assert(spark.read.parquet(s"$out/warehouse_conformed").count() == 0)
  }

  test("etl-stream accepts the reference's batch-size/poll-seconds knobs; unknown flags throw") {
    val out = Files.createTempDirectory("graft_cli_k").toString
    val rawDir = s"$out/rawdir"
    Files.createDirectories(Paths.get(rawDir))
    Files.copy(Paths.get(fixture("raw_ads.jsonl")), Paths.get(s"$rawDir/batch1.jsonl"))
    // batch-size 1 = maxFilesPerTrigger 1: same drained result, knob wired
    Main.run(List("etl-stream", rawDir, fixture("site_dim.csv"), out,
      "--batch-size", "1", "--poll-seconds", "60"), spark)
    assert(spark.read.parquet(s"$out/warehouse").count() == 5)
    intercept[IllegalArgumentException](Main.run(
      List("etl-stream", rawDir, fixture("site_dim.csv"), out, "--bogus", "1"), spark))
    intercept[IllegalArgumentException](Main.run(
      List("etl-stream", rawDir, fixture("site_dim.csv"), out, "--batch-size"), spark))
  }

  test("etl --jdbc-url lands the warehouse in an embedded Derby database") {
    val out = Files.createTempDirectory("graft_cli_j").toString
    val url = s"jdbc:derby:memory:graftcli${System.nanoTime()};create=true"
    Main.run(List("etl", fixture("raw_ads.jsonl"), fixture("site_dim.csv"), out,
      "--jdbc-url", url, "--jdbc-table", "warehouse"), spark)
    val wh = graft.sources.JdbcWarehouse.read(spark, url, "warehouse")
    assert(wh.count() == 5)
    assert(wh.select("uniq_id").distinct().count() == 5)
    // replay of the same raw batch appends nothing (dedup insert)
    Main.run(List("etl", fixture("raw_ads.jsonl"), fixture("site_dim.csv"), out,
      "--jdbc-url", url), spark)
    assert(graft.sources.JdbcWarehouse.read(spark, url, "warehouse").count() == 5)
  }

  test("query subcommand runs a declared query") {
    Main.run(List("query", "q5_groupby_agg", "/root/testdata/sf0.001"), spark)
  }

  test("query --prepare builds every stored artifact; a stored probe then runs against it") {
    val dir = "/root/testdata/sf0.001"
    val built = graft.queries.Extensions.prepareStores(spark, dir)
    assert(built.size == 14 && built.map(_._1).distinct.size == 14)
    // each artifact location really exists on disk (bucketed tables are
    // catalog names, not paths — assert via the catalog instead)
    built.foreach { case (name, loc) =>
      if (name.startsWith("bucketed_"))
        assert(spark.catalog.tableExists(loc), s"$name table missing: $loc")
      else
        assert(java.nio.file.Files.exists(java.nio.file.Paths.get(loc)),
          s"$name store missing at $loc")
    }
    // the CLI path prints rather than returns; must not throw, and the
    // second build is the computeIfAbsent no-op (same locations)
    Main.run(List("query", "--prepare", dir), spark)
    assert(graft.queries.Extensions.prepareStores(spark, dir) == built)
    // a stored-probe query served from the prepared artifacts
    Main.run(List("query", "index_bm25_probe", dir), spark)
  }

  test("unknown subcommand and unknown query raise usage errors, not JVM exits") {
    intercept[IllegalArgumentException](Main.run(List("bogus"), spark))
    intercept[IllegalArgumentException](
      Main.run(List("query", "no_such_query", "/tmp"), spark))
  }
}
