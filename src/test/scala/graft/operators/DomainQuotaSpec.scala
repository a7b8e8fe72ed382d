package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.queries.Extensions

class DomainQuotaSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("kept set equals the window-rank reference on the synth frontier") {
    val urls = Extensions.synthHostUrls(spark, dir)
    val got = Dedup.domainQuota(urls, "url", "o_orderkey", maxPerHost = 10)
      .select($"host", $"n_urls", $"kept_ids")
      .as[(String, Long, Seq[Long])].collect().sortBy(_._1).toSeq
    // reference: the naive row_number idiom the heap aggregate replaces
    val host = regexp_extract(Dedup.urlNormalize(col("url")),
      "^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)
    val ref = urls.select(col("o_orderkey").as("id"), host.as("host"))
      .withColumn("rn", row_number().over(Window.partitionBy("host").orderBy("id")))
      .withColumn("n_urls", count(lit(1)).over(Window.partitionBy("host")))
      .filter($"rn" <= 10)
      .groupBy($"host", $"n_urls").agg(sort_array(collect_list($"id")).as("kept_ids"))
      .select($"host", $"n_urls", $"kept_ids")
      .as[(String, Long, Seq[Long])].collect().sortBy(_._1).toSeq
    assert(got == ref)
    assert(got.size == 23 && got.forall(_._3.size == 10))
    // ids come out of the negated heap already ascending
    assert(got.forall { case (_, _, ids) => ids == ids.sorted })
  }

  test("hosts below the cap keep everything; canonical host merges spellings") {
    val df = Seq(
      1L -> "https://WWW.A.com/x",   // canonicalizes to a.com
      2L -> "https://a.com:443/y",
      3L -> "https://a.com/z",
      4L -> "https://b.com/only").toDF("id", "url")
    val got = Dedup.domainQuota(df, "url", "id", maxPerHost = 2)
      .as[(String, Long, Seq[Long])].collect().sortBy(_._1).toSeq
    assert(got == Seq(("a.com", 3L, Seq(1L, 2L)), ("b.com", 1L, Seq(4L))))
  }

  test("plan is a heap aggregate, not a per-host window sort") {
    val plan = Dedup.domainQuota(Extensions.synthHostUrls(spark, dir),
      "url", "o_orderkey", maxPerHost = 10).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(1500))
    assert(plan.contains("Aggregate"), plan.take(1500))
  }
}
