package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.core.Tables.t

class PackingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("every doc assigned; chunks fill in id order; budget overrun ≤ one doc") {
    val packed = Packing.packSequences(
      t(spark, dir, "documents"), "doc_id", "n_chars", budget = 4096L, buckets = 8)
    val rows = packed.select("bucket", "doc_id", "seq_no")
      .as[(Long, Long, Long)].collect()
    assert(rows.length == t(spark, dir, "documents").count())
    // within a bucket, seq_no is monotone in doc_id (greedy in-order)
    rows.groupBy(_._1).foreach { case (b, rs) =>
      val ordered = rs.sortBy(_._2).map(_._3)
      assert(ordered.zip(ordered.tail).forall { case (x, y) => x <= y }, s"bucket $b")
    }
    // a chunk's pre-doc cumulative weight stays under the budget
    // boundary, so total weight overruns by at most its last doc
    val stats = Packing.chunkStats(packed, "n_chars")
      .join(packed.groupBy("bucket", "seq_no").agg(max("n_chars").as("max_w")),
        Seq("bucket", "seq_no"))
      .select("sum_weight", "max_w").as[(Long, Long)].collect()
    stats.foreach { case (sum, maxW) =>
      assert(sum - maxW < 4096L, s"chunk starts past the budget: sum=$sum max=$maxW")
    }
  }

  test("assignment is deterministic and partition-independent") {
    val docs = t(spark, dir, "documents")
    val a = Packing.packSequences(docs, "doc_id", "n_chars", 4096L, 8)
      .select("doc_id", "bucket", "seq_no").as[(Long, Long, Long)].collect().sorted.toSeq
    val b = Packing.packSequences(docs.repartition(13), "doc_id", "n_chars", 4096L, 8)
      .select("doc_id", "bucket", "seq_no").as[(Long, Long, Long)].collect().sorted.toSeq
    assert(a == b)
  }

  test("chunkTokens: window/stride arithmetic, tail coverage, short docs whole") {
    val docs = Seq(
      (1L, "a b c d e"),       // n=5, w=3, s=2: chunks [a b c][c d e] — tail exact
      (2L, "a b c d e f"),     // n=6: [a b c][c d e][e f] — ceil tail window short
      (3L, "a b"),             // n < window: one whole chunk
      (4L, "a b c")            // n == window: exactly one chunk
    ).toDF("doc_id", "text")
    val out = Packing.chunkTokens(docs, "doc_id", "text", window = 3, stride = 2)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "n_tok", "chunk_md5")
      .as[(Long, Long, Long, String)].collect().toSeq
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out == Seq(
      (1L, 0L, 3L, h("a b c")), (1L, 1L, 3L, h("c d e")),
      (2L, 0L, 3L, h("a b c")), (2L, 1L, 3L, h("c d e")), (2L, 2L, 2L, h("e f")),
      (3L, 0L, 2L, h("a b")),
      (4L, 0L, 3L, h("a b c"))))
  }

  test("chunkTokens: every token covered; no shuffle in the plan") {
    val docs = t(spark, dir, "documents")
    val chunks = Packing.chunkTokens(docs, "doc_id", "text", window = 64, stride = 48)
    // the last window always reaches the document tail: per doc, the
    // max slice end (chunk_id*stride + n_tok) equals the token count
    val covered = chunks.groupBy("doc_id")
      .agg(max(col("chunk_id") * 48 + col("n_tok")).as("reach"))
      .join(docs.select(col("doc_id"),
        size(split(trim(col("text")), TextAnalysis.WsClass)).cast("long").as("n")),
        Seq("doc_id"))
      .filter(col("reach") =!= col("n")).count()
    assert(covered == 0L)
    // pure per-row generator: narrow ops only
    val plan = chunks.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
  }

  test("chunkTokens rejects stride > window or non-positive params") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Packing.chunkTokens(docs, "doc_id", "text", window = 3, stride = 4)
    }
    intercept[IllegalArgumentException] {
      Packing.chunkTokens(docs, "doc_id", "text", window = 0, stride = 1)
    }
  }

  test("packing shuffles once on bucket, never a single global partition") {
    val plan = Packing.packSequences(
        t(spark, dir, "documents"), "doc_id", "n_chars", 4096L, 8)
      .queryExecution.executedPlan.toString
    // window partition key is the bucket — a global-order window would
    // show 'Window [...] ORDER BY' with an empty partition spec and a
    // SinglePartition exchange
    assert(plan.contains("hashpartitioning(bucket"), plan.take(2000))
    assert(!plan.contains("SinglePartition"), plan.take(2000))
  }

  test("offsets: two-phase prefix sum equals the naive global window") {
    val docs = t(spark, dir, "documents")
      .select($"doc_id", TextAnalysis.tokenCountWs($"text").cast("long").as("n_tok"))
    val got = Packing.assignOffsets(docs, "doc_id", "n_tok", buckets = 7)
      .select("doc_id", "offset").as[(Long, Long)].collect().sortBy(_._1).toSeq
    val rows = docs.as[(Long, Long)].collect().sortBy(_._1)
    val ref = rows.map(_._1).zip(rows.map(_._2).scanLeft(0L)(_ + _).init).toSeq
    assert(got == ref)
    assert(got.head._2 == 0L)
    // bucket count must be invisible in the result
    val other = Packing.assignOffsets(docs.repartition(13), "doc_id", "n_tok", buckets = 64)
      .select("doc_id", "offset").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(other == ref)
  }

  test("offsets: no single-partition stage in the plan") {
    val docs = t(spark, dir, "documents")
      .select($"doc_id", TextAnalysis.tokenCountWs($"text").cast("long").as("n_tok"))
    val plan = Packing.assignOffsets(docs, "doc_id", "n_tok")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan.take(2000))
    assert(plan.contains("hashpartitioning(_b"), plan.take(2000))
  }

  test("shardByTokens: contiguous spans, token balance within one doc of total/n") {
    val docs = t(spark, dir, "documents")
      .select($"doc_id", TextAnalysis.tokenCountWs($"text").cast("long").as("n_tok"))
    val n = 8
    val sharded = Packing.shardByTokens(docs, "doc_id", "n_tok", nShards = n)
    val rows = sharded.select("doc_id", "n_tok", "offset", "shard")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val total = rows.map(_._2).sum
    val width = total / n + 1
    // every shard id is the integer-span function of the offset
    rows.foreach { case (id, _, off, sh) =>
      assert(sh == off / width, s"doc $id") }
    // shards are contiguous in doc order (offset order = id order)
    val shardSeq = rows.map(_._4)
    assert(shardSeq.zip(shardSeq.tail).forall { case (a, b) => a <= b })
    // token balance: each shard's span is `width` tokens, so its sum
    // can exceed width only by the tail of one straddling document
    val perShard = rows.groupBy(_._4).view.mapValues(_.map(_._2).sum)
    val maxDoc = rows.map(_._2).max
    perShard.foreach { case (sh, sum) =>
      assert(sum <= width + maxDoc, s"shard $sh overfull: $sum > $width + $maxDoc") }
    // determinism under repartitioning
    val again = Packing.shardByTokens(docs.repartition(13), "doc_id", "n_tok", n)
      .select("doc_id", "shard").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(again == rows.map(r => (r._1, r._4)).toSeq)
  }

  test("offsets: empty input yields an empty result, not a crash") {
    val docs = t(spark, dir, "documents")
      .select($"doc_id", $"n_chars").filter(lit(false))
    assert(Packing.assignOffsets(docs, "doc_id", "n_chars").count() == 0)
  }
}
