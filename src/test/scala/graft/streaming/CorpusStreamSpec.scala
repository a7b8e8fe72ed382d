package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.core.Tables.t

/** The ingest-time corpus operators: drained streaming state must equal
  * the batch aggregate bit-for-bit, and multi-file staging must MERGE
  * state across micro-batches rather than re-initialize it. */
class CorpusStreamSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def stage(copies: Int): java.nio.file.Path = {
    val d = Files.createTempDirectory("graft_cstream")
    (1 to copies).foreach { i =>
      Files.copy(Paths.get(s"$dir/documents.parquet"), d.resolve(s"docs_$i.parquet"))
    }
    d
  }

  test("lsh index: drained stream state equals the batch-built index exactly") {
    val staged = stage(1)
    val q = CorpusStream.lshIndex(spark, staged.toString, "lsh_idx_one")
    q.awaitTermination()
    val streamed = spark.table("lsh_idx_one")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = CorpusStream.lshIndexBatch(t(spark, dir, "documents"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed == batch)
    assert(batch.nonEmpty)
    spark.catalog.dropTempView("lsh_idx_one")
  }

  test("lsh index: docs re-arriving in a later micro-batch merge into existing buckets") {
    val staged = stage(2)
    // one file per trigger -> the second copy lands in a LATER batch;
    // correct state merge doubles every bucket count and keeps owners
    val q = CorpusStream.lshIndex(spark, staged.toString, "lsh_idx_two",
      maxFilesPerTrigger = Some(1))
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      "staging failed to produce two data micro-batches")
    val streamed = spark.table("lsh_idx_two")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = CorpusStream.lshIndexBatch(t(spark, dir, "documents"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed.keySet == batch.keySet)
    assert(streamed.forall { case (k, (owner, n)) =>
      owner == batch(k)._1 && n == 2 * batch(k)._2
    })
    spark.catalog.dropTempView("lsh_idx_two")
  }

  test("declared stream_decontam equals the batch-side inversion of the decontam join") {
    val out = graft.queries.StreamingQueries.streamDecontam(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // batch reference: train-side distinct shingles joined to the
    // val/test blocklist — same kernels, batch engine
    val spec = graft.queries.Extensions.corpusSplitSpec
    val docs = graft.operators.CorpusSplit.split(t(spark, dir, "documents"), "text", spec)
    val sh = docs.select(col("doc_id"), col("split"),
      explode(array_distinct(
        graft.functions.Sketches.wordShingles(col("text"), 8))).as("g"))
    val bl = sh.filter(col("split").isin("val", "test")).select("g").distinct()
    val expected = sh.filter(col("split") === "train")
      .join(bl, Seq("g"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_flagged"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == expected)
    assert(expected.nonEmpty, "fixture produced no contaminated train docs — gate is vacuous")
  }

  test("stream_curate: dedup-then-aggregate chain equals the batch distinct-by-hash rollup") {
    val out = graft.queries.StreamingQueries.streamCurate(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val spec = graft.queries.Extensions.corpusSplitSpec
    val expected = t(spark, dir, "documents")
      .select(col("text"),
        graft.operators.TextAnalysis.tokenCountWs(col("text")).cast("long").as("n_tok"))
      .filter(col("n_tok") >= 16)
      .withColumn("split", graft.operators.CorpusSplit.assign(col("text"), spec))
      .select(md5(col("text")).as("h"), col("split"), col("n_tok")).distinct()
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tokens"))
      .orderBy("split")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == expected.toSeq)
    assert(expected.map(_._1).toSet == Set("train", "val", "test"),
      "every split must survive the gate at sf0.001 — otherwise the check is weak")
    // the gate and the dedup must both have BITTEN (fixture has planted
    // short docs and exact duplicates)
    val all = t(spark, dir, "documents").count()
    assert(expected.map(_._2).sum < all)
  }

  test("stream_curate: duplicates re-arriving in a later micro-batch are dropped by state") {
    val staged = stage(2)
    val q = CorpusStream.curate(spark, staged.toString, "curate_two",
      graft.queries.Extensions.corpusSplitSpec, maxFilesPerTrigger = Some(1))
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2)
    // the chained-stateful shape must be REAL: dedup state + agg state
    // as two distinct stateful operators in one micro-batch plan
    assert(q.recentProgress.last.stateOperators.length == 2,
      "expected dedup + aggregation state operators in one streaming plan")
    val two = spark.table("curate_two")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    spark.catalog.dropTempView("curate_two")
    val one = graft.queries.StreamingQueries.streamCurate(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(two == one, "cross-batch dedup state failed: doubled corpus changed the rollup")
  }

  test("stream_curate crash recovery: replayed batch reloads dedup+agg state, no double count") {
    // The state-store half of the WAL crash window (EtlStreamSpec
    // covers the foreachBatch-sink half): drain two micro-batches with
    // a durable checkpoint, then resume from a DOCTORED copy whose
    // last commit record is missing — the exact on-disk state of a
    // process that died after the state stores committed but before
    // the WAL commit landed. The engine must replay the batch against
    // the PREDECESSOR state versions; with the doubled corpus staged,
    // any double-counting in the dedup or rollup state would change
    // the complete-mode table.
    val staged = stage(2)
    val out = Files.createTempDirectory("graft_curate_cp")
    val cp = s"$out/cp"
    val q = CorpusStream.curate(spark, staged.toString, "curate_cr1",
      graft.queries.Extensions.corpusSplitSpec, maxFilesPerTrigger = Some(1),
      checkpointDir = Some(cp))
    q.awaitTermination()
    val clean = spark.table("curate_cr1")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    spark.catalog.dropTempView("curate_cr1")

    val cp2 = s"$out/cp_after_crash"
    val src = Paths.get(cp)
    Files.walk(src).forEach { p =>
      val dst = Paths.get(cp2).resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(dst)
      else Files.copy(p, dst)
    }
    val commits = Files.list(Paths.get(s"$cp2/commits")).toArray.map(_.toString)
      .filter(p => Paths.get(p).getFileName.toString.forall(_.isDigit)).sorted
    val last = Paths.get(commits.last)
    Files.delete(last)
    Files.deleteIfExists(last.resolveSibling("." + last.getFileName + ".crc"))

    val q2 = CorpusStream.curate(spark, staged.toString, "curate_cr2",
      graft.queries.Extensions.corpusSplitSpec, maxFilesPerTrigger = Some(1),
      checkpointDir = Some(cp2))
    q2.awaitTermination()
    val resumed = spark.table("curate_cr2")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    spark.catalog.dropTempView("curate_cr2")
    assert(resumed == clean,
      "replayed micro-batch changed the rollup: state recovery double-counted")
    // and the recovered run must still equal the single-shot reference
    val one = graft.queries.StreamingQueries.streamCurate(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(resumed == one)
  }

  test("stream_classify census equals the batch emb_classify report bit-for-bit") {
    val streamed = graft.queries.StreamingQueries.streamClassify(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = graft.queries.Extensions.embClassify(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
    assert(batch.nonEmpty)
    // the report must contain real predictions, not a degenerate
    // single-label collapse
    assert(batch.keys.map(_._2).toSet.size > 1)
  }

  test("declared stream_minhash: oracle-shaped gate row, deterministic, gate 0") {
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    val a = graft.queries.StreamingQueries.streamMinhash(spark, dir).collect()
    assert(a.length == 1)
    assert(a.head.getLong(0) == n, "n_docs_indexed must equal the corpus size")
    assert(a.head.getLong(1) == 32 * n, "every doc contributes exactly 32 band rows")
    assert(a.head.getLong(2) == 0L, "drained state must equal the batch-built index")
    val b = graft.queries.StreamingQueries.streamMinhash(spark, dir).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }
}
