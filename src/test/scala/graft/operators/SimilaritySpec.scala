package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.core.Tables.t

class SimilaritySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"
  lazy val emb = t(spark, sf, "embeddings")
  lazy val queries = emb.filter(col("vec_id") < 3)

  test("brute force: each query's rank-1 neighbor is itself at sim 1.0") {
    val top1 = Similarity.bruteForceTopK(emb, queries, "vec_id", "vec_id", "embedding", 1)
      .select("qid", "id", "sim").as[(Long, Long, Double)].collect()
    for ((qid, id, sim) <- top1) {
      assert(qid == id)
      assert(math.abs(sim - 1.0) < 1e-9)
    }
  }

  test("lsh top-k always contains the query itself and respects k") {
    val got = Similarity.lshTopK(emb, queries, "vec_id", "vec_id", "embedding",
      k = 10, nbits = 8)
    val byQ = got.select("qid", "id").as[(Long, Long)].collect().groupBy(_._1)
    for ((qid, rows) <- byQ) {
      assert(rows.length <= 10)
      assert(rows.exists(_._2 == qid), s"query $qid not in own candidates")
    }
  }

  test("lsh candidates re-rank exactly: sims match brute force for shared ids") {
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "vec_id", "embedding", 500)
      .select("qid", "id", "sim").as[(Long, Long, Double)].collect()
      .map { case (q, i, s) => (q, i) -> s }.toMap
    val lsh = Similarity.lshTopK(emb, queries, "vec_id", "vec_id", "embedding",
      k = 10, nbits = 8)
      .select("qid", "id", "sim").as[(Long, Long, Double)].collect()
    for ((q, i, s) <- lsh)
      assert(math.abs(s - bf((q, i))) < 1e-9)
  }

  test("ivfAssign picks the nearest centroid") {
    val c0 = Array.fill(4)(0.0)
    val c1 = Array.fill(4)(10.0)
    val df = Seq(
      (1L, Array(0.1f, 0.2f, 0.0f, 0.1f)),
      (2L, Array(9.8f, 10.1f, 9.9f, 10.0f))).toDF("vec_id", "embedding")
    val got = Similarity.ivfAssign(df, "vec_id", "embedding",
      Array((100L, c0), (200L, c1)))
      .select("vec_id", "list_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 100L, 2L -> 200L))
  }
}
