package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.core.Tables.t

class CorpusSplitSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"
  private val weights = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)

  test("every row assigned; proportions near weights") {
    val docs = t(spark, dir, "documents")
    val counts = CorpusSplit.split(docs, "text", weights)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    val total = counts.values.sum
    assert(total == docs.count())
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train").toDouble / total > 0.85)
    assert(counts("val").toDouble / total < 0.10)
    assert(counts("test").toDouble / total < 0.10)
  }

  test("assignment is deterministic and partition-independent") {
    val docs = t(spark, dir, "documents")
    val a = CorpusSplit.split(docs, "text", weights)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val b = CorpusSplit.split(docs.repartition(13), "text", weights)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a == b)
  }

  test("no shuffle: split is a projection over the scan") {
    val plan = CorpusSplit.split(t(spark, dir, "documents"), "text", weights)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
  }
}
