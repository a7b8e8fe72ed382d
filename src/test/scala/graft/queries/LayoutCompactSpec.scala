package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[Extensions.layoutCompactStored]]'s compaction contract beyond the
  * oracle row: the range rewrite must leave per-file key ranges
  * DISJOINT (that is what makes footer min/max pruning effective —
  * a round-robin rewrite would shrink the file count but every file
  * would still span the whole key domain), and a key predicate over
  * the compacted store must actually read fewer rows' worth of files.
  */
class LayoutCompactSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("compacted files carry disjoint key ranges; slivers span the domain") {
    Extensions.layoutCompactStored(spark, dir).collect() // force the stores
    val comp = spark.read.parquet(
      Extensions.compactStorePaths(spark, dir)._2)
    val ranges = comp.select(input_file_name().as("f"), col("k"))
      .groupBy("f")
      .agg(min(col("k")).as("lo"), max(col("k")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length == 4)
    ranges.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 < lo2, s"file ranges overlap: $ranges")
    }
    // the sliver regime, by contrast, spreads the key domain over
    // every file — pruning-by-footer can skip nothing there
    val frag = spark.read.parquet(
      Extensions.compactStorePaths(spark, dir)._1)
    val fragSpan = frag.select(input_file_name().as("f"), col("k"))
      .groupBy("f")
      .agg((max(col("k")) - min(col("k"))).as("span"))
      .agg(min(col("span"))).head().getLong(0)
    val domain = frag.agg(max(col("k")) - min(col("k"))).head().getLong(0)
    assert(fragSpan > domain / 2,
      s"slivers unexpectedly clustered: min span $fragSpan of $domain")
  }

  test("a key range predicate on the compacted store scans one file") {
    Extensions.layoutCompactStored(spark, dir).collect()
    val comp = spark.read.parquet(
      Extensions.compactStorePaths(spark, dir)._2)
    // pick the first file's range and query inside it
    val (lo, hi) = comp.select(input_file_name().as("f"), col("k"))
      .groupBy("f")
      .agg(min(col("k")).as("lo"), max(col("k")).as("hi"))
      .orderBy("lo").collect().headOption
      .map(r => (r.getLong(1), r.getLong(2))).get
    val touched = comp.filter(col("k").between(lo, hi))
      .select(input_file_name()).distinct().count()
    assert(touched == 1L,
      s"range [$lo,$hi] touched $touched files; disjoint layout must prune to 1")
  }
}
