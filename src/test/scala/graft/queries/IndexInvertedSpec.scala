package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The inverted-index stored query: answer invariance vs a direct
  * document scan, conjunction semantics, and the partition-prune
  * contract (probe buckets reach the scan as a static partition filter
  * and only the probed directories are read).
  */
class IndexInvertedSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("probe answers match a direct document scan (index invariance)") {
    val got = Extensions.indexInvertedStored(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    val terms = Extensions.InvIndexTerms.toSet
    val want = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.split("[ \\t\\n\\x0B\\f\\r]+")
          .filter(terms.contains))
      .filter(_._2.toSet.size == terms.size)
      .map { case (id, hits) => (id, terms.size.toLong, hits.length.toLong) }
      .sortBy(_._1).toSeq

    assert(got.nonEmpty, "probe found no conjunctive matches on the fixture")
    assert(got == want)
  }

  test("probe buckets reach the scan as a static partition filter") {
    val probe = Extensions.indexInvertedStored(spark, dir)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [tbucket"),
      s"bucket set not pushed as a partition filter:\n${plan.take(3000)}")

    // only the 3 probed directories of 64 are listed/read
    val store = Extensions.invStorePath(spark, dir)
    val dirs = new java.io.File(store).listFiles()
      .filter(_.getName.startsWith("tbucket=")).map(_.getName)
    assert(dirs.length > 3, s"store not bucketed: ${dirs.length} dirs")
    val probeBuckets = Extensions.InvIndexTerms.map { w =>
      val c = new java.util.zip.CRC32()
      c.update(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      (c.getValue % Extensions.InvIndexBuckets).toLong
    }.distinct
    val readBuckets = spark.read.parquet(store)
      .filter(col("tbucket").isin(probeBuckets: _*) &&
        col("term").isin(Extensions.InvIndexTerms: _*))
      .select(input_file_name().as("f")).distinct().collect()
      .map(_.getString(0).split("tbucket=")(1).split("/")(0)).distinct
    assert(readBuckets.length <= Extensions.InvIndexTerms.length,
      s"read ${readBuckets.toSeq} — more directories than probe terms")
  }
}
