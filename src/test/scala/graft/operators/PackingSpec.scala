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
}
