package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class DecontamSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("contamination: shared n-grams counted, boilerplate guard, short docs whole") {
    val docs = Seq(
      (1L, "train", "x y z p q r"),      // trigrams incl "x y z"
      (2L, "train", "m n x y z"),        // also "x y z"
      (3L, "train", "c c c"),
      (4L, "train", "c c c"),
      (5L, "train", "c c c"),            // "c c c" in 3 train docs = boilerplate
      (6L, "train", "pq"),               // < n tokens: shingles whole
      (10L, "val",  "k x y z w"),        // shares "x y z" with train docs 1 and 2
      (11L, "test", "c c c"),            // only the boilerplate gram -> no row
      (13L, "val",  "pq")                // whole-doc shingle matches train doc 6
    ).toDF("doc_id", "split", "text")
    val out = Decontam.contamination(docs, "doc_id", "text", "split",
        "train", Seq("val", "test"), n = 3, maxTrainDf = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (10L, 1L, 2L),   // one shared trigram, two train docs carry it
      (13L, 1L, 1L)))
  }

  test("contaminationBloom: bit-identical to contamination (toy + testdata)") {
    // toy corpus: boilerplate gram, short whole-doc shingle, multi-match
    val docs = Seq(
      (1L, "train", "x y z p q r"),
      (2L, "train", "m n x y z"),
      (3L, "train", "c c c"),
      (4L, "train", "c c c"),
      (5L, "train", "c c c"),
      (6L, "train", "pq"),
      (10L, "val",  "k x y z w"),
      (11L, "test", "c c c"),
      (13L, "val",  "pq")
    ).toDF("doc_id", "split", "text")
    val exact = Decontam.contamination(docs, "doc_id", "text", "split",
        "train", Seq("val", "test"), n = 3, maxTrainDf = 2)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    val bloom = Decontam.contaminationBloom(docs, "doc_id", "text", "split",
        "train", Seq("val", "test"), n = 3, maxTrainDf = 2)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(bloom == exact)

    // real corpus: the 90/5/5 split over sf0.001 documents, defaults
    val split = CorpusSplit.split(
      graft.core.Tables.t(spark, "/root/testdata/sf0.001", "documents"),
      "text", Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    val e2 = Decontam.contamination(split, "doc_id", "text", "split",
        "train", Seq("val", "test"))
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    val b2 = Decontam.contaminationBloom(split, "doc_id", "text", "split",
        "train", Seq("val", "test"))
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(e2.nonEmpty)
    assert(b2 == e2)
  }

  test("contaminationBloom plan: might_contain filter ahead of the train join") {
    val docs = CorpusSplit.split(
      graft.core.Tables.t(spark, "/root/testdata/sf0.001", "documents"),
      "text", Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    val plan = Decontam.contaminationBloom(docs, "doc_id", "text", "split",
        "train", Seq("val", "test"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(2000))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.take(2000))
  }

  test("contamination plan: equi-join on the shingle, no doc-by-doc comparison") {
    val docs = graft.core.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val split = CorpusSplit.split(docs, "text", Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
    val plan = Decontam.contamination(split, "doc_id", "text", "split",
        "train", Seq("val", "test"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.take(2000))
  }
}
