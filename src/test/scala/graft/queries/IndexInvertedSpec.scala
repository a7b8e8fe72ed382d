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

  test("phrase probe matches a direct adjacency scan (positional-index invariance)") {
    val got = Extensions.indexPhraseProbe(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    val Seq(w1, w2) = Extensions.PhraseTerms
    val want = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .flatMap { r =>
        val tk = r.getString(1).toLowerCase.split("[ \\t\\n\\x0B\\f\\r]+")
          .filter(_.nonEmpty)
        val hits = tk.indices.dropRight(1)
          .filter(i => tk(i) == w1 && tk(i + 1) == w2)
        if (hits.isEmpty) None
        else Some((r.getLong(0), hits.length.toLong, hits.min.toLong))
      }.sortBy(_._1).toSeq

    assert(got.nonEmpty, "phrase probe found no matches on the fixture")
    assert(got == want)
  }

  test("phrase probe prunes partitions; non-phrase probes never read the positions column") {
    val plan = Extensions.indexPhraseProbe(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [tbucket"),
      s"phrase bucket set not pushed as a partition filter:\n${plan.take(3000)}")
    // the positional upgrade must cost the boolean/BM25 probes nothing:
    // their scans' ReadSchema must exclude the positions column.
    // index_inverted_stored's scan is visible in its final plan;
    // index_bm25_probe's sits behind a localCheckpoint (the text_tfidf
    // situation), so its PRE-checkpoint projection — the exact frame
    // the query checkpoints — is asserted instead
    val store = Extensions.invStorePath(spark, dir)
    val conjScans = Extensions.indexInvertedStored(spark, dir)
      .queryExecution.sparkPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .filter(_.toString.contains("tbucket"))
    assert(conjScans.nonEmpty, "no postings scan in the conjunctive plan")
    conjScans.foreach(sc => assert(!sc.toString.contains("positions"),
      s"conjunctive probe reads positions:\n${sc.toString.take(2000)}"))
    val bm25Pre = spark.read.parquet(store)
      .filter(col("term").isin(Extensions.InvIndexTerms: _*))
      .select(col("term"), col("doc_id"), col("tf"))
    val bm25Scan = bm25Pre.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no scan in the bm25 candidate projection"))
    assert(!bm25Scan.toString.contains("positions"),
      s"bm25 candidate projection reads positions:\n${bm25Scan.toString.take(2000)}")
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

  test("bm25 phrase probe: partition-pruned, ranked by score then doc_id") {
    val df = Extensions.indexBm25Phrase(spark, dir)
    // the stored scan sits behind the candidate localCheckpoint (the
    // text_tfidf situation) — assert the prune on the PRE-checkpoint
    // frame, the exact probe expression the query checkpoints
    val store = Extensions.invStorePath(spark, dir)
    val probeBuckets = Extensions.PhraseTerms.map { w =>
      val c = new java.util.zip.CRC32()
      c.update(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      (c.getValue % Extensions.InvIndexBuckets).toLong
    }.distinct
    val pre = spark.read.parquet(store)
      .filter(col("tbucket").isin(probeBuckets: _*) &&
        col("term").isin(Extensions.PhraseTerms: _*))
    val prePlan = pre.queryExecution.executedPlan.toString
    assert(prePlan.contains("PartitionFilters: [tbucket"),
      s"phrase bucket set not pushed as a partition filter:\n${prePlan.take(2000)}")
    val rows = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty, "phrase scoring found no matches on the fixture")
    assert(rows.map(_._1).toSeq == (1L to rows.length), "ranks must be dense from 1")
    // (score DESC, doc_id ASC) total order
    assert(rows.map(t => (-t._3, t._2)).toSeq ==
      rows.map(t => (-t._3, t._2)).sortBy(identity).toSeq)
    // every ranked doc genuinely contains the phrase (n_occ ≥ 1) and the
    // candidate set equals the boolean phrase probe's doc set (top-20 cap aside)
    assert(rows.forall(_._4 >= 1L))
    val phraseDocs = Extensions.indexPhraseProbe(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(rows.map(_._2).toSet.subsetOf(phraseDocs))
  }

  test("delta probe: merge-on-read over a stale base index equals the full-index answer") {
    val got = Extensions.indexInvertedDelta(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val want = Extensions.indexInvertedStored(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, "base ∪ delta probe must equal the full-index probe")
    // the freshness gate is only meaningful if the delta tail actually
    // contributes matches — otherwise base-only would pass vacuously
    assert(want.exists(_._1 % 8 == 7),
      "fixture has no conjunctive match in the unindexed tail — gate is vacuous")
    // and the base arm stays partition-pruned
    val plan = Extensions.indexInvertedDelta(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [tbucket"),
      s"delta probe's base arm lost the partition filter:\n${plan.take(3000)}")
  }
}
