package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class PipelineSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  lazy val raw = Pipeline.dedupIngest(
    Pipeline.parseRaw(spark.read.text(fixture("raw_ads.jsonl"))), None)
  lazy val dim = Pipeline.siteDim(spark, fixture("site_dim.csv"))
  lazy val enriched = Pipeline.enrich(Pipeline.cleanData(raw), dim)

  test("dedupIngest drops the duplicate uniq_id (8 raw -> 7)") {
    assert(raw.count() == 7)
  }

  test("dedupIngest is idempotent against existing rows") {
    val again = Pipeline.dedupIngest(
      Pipeline.parseRaw(spark.read.text(fixture("raw_ads.jsonl"))), Some(raw))
    assert(again.count() == 0)
  }

  test("cleanData yields the 13-field projection") {
    val cols = Pipeline.cleanData(raw).columns.toSeq
    assert(cols == Seq("ad_id", "ad_url", "category", "locations", "other_ads",
      "phone", "post_body", "post_date", "poster_age", "post_title",
      "scrape_date", "site_id", "uniq_id"))
  }

  test("enrich: inner-join semantics with quarantine (5 warehouse + 2 quarantined)") {
    assert(enriched.warehouse.count() == 5)
    assert(enriched.quarantine.count() == 2)
    val quarantined = enriched.quarantine.select("ad_id").as[String].collect().toSet
    assert(quarantined == Set("10000004", "10000005")) // bad date, unknown site
  }

  test("golden row for the normal ad") {
    val r = enriched.warehouse.filter($"ad_id" === "10000001").collect()(0)
    def s(c: String) = r.getString(r.fieldIndex(c))
    assert(s("category") == "WomenSeekMen")
    assert(s("city") == "Birmingham")
    assert(s("state") == "Alabama")
    assert(s("region") == "South")
    assert(s("division") == "East South Central")
    assert(s("site_id") == "birmingham")
    assert(s("post_title") == "Sweet deal")
    assert(s("poster_age") == "25")
    assert(s("post_body") == "Call 5551234567 now! $80")
    assert(s("phone") == "5551234567")
    assert(s("locations") == "Downtown, Eastside")
    assert(r.getTimestamp(r.fieldIndex("post_date")).toString == "2017-05-04 23:53:00.0")
  }

  test("spelled digits and corruption semantics survive the pipeline") {
    val phones = enriched.warehouse.filter($"ad_id" === "10000002")
      .select("phone").as[String].collect()(0)
    assert(phones == "5551234567")
    val multi = enriched.warehouse.filter($"ad_id" === "10000007")
      .select("phone").as[String].collect()(0)
    assert(multi == "2565550000;3256201234")
  }

  test("missing postingBody -> '' sentinels, never null, row kept") {
    val r = enriched.warehouse.filter($"ad_id" === "10000006").collect()
    assert(r.length == 1)
    assert(r(0).getString(r(0).fieldIndex("post_body")) == "")
    assert(r(0).getString(r(0).fieldIndex("phone")) == "")
  }

  test("other_ads array is sorted and ';'-joined at the compat boundary") {
    val oa = enriched.warehouse.filter($"ad_id" === "10000007")
      .select("other_ads").as[String].collect()(0)
    assert(oa == "http://huntsville.backpage.com/WomenSeekMen/x/111;" +
      "http://huntsville.backpage.com/WomenSeekMen/x/222")
  }

  test("conform: temporal purge + conform-to-raw") {
    // every fixture ad was posted before the first scrape -> all purged
    assert(Pipeline.conform(enriched.warehouse, raw).count() == 0)
    // a row posted after collection began survives the temporal purge
    val survivor = enriched.warehouse
      .withColumn("post_date", $"scrape_date" + expr("INTERVAL 1 DAY"))
    val kept = Pipeline.conform(survivor, raw)
    assert(kept.count() == survivor.count())
    // ...but is dropped if its uniq_id vanished from raw
    val prunedRaw = raw.filter($"uniq_id" =!= survivor.select("uniq_id").as[String].collect()(0))
    assert(Pipeline.conform(survivor, prunedRaw).count() == survivor.count() - 1)
  }
}
