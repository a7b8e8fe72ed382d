package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Closed-form fixture for [[Extensions.retrieveHybrid]]'s fusion
  * semantics (the oracle proves cross-engine arithmetic; this pins the
  * PROPERTIES): a doc surfaced by BOTH arms must out-fuse every
  * single-arm doc, single-arm docs still score through the full-outer
  * join with the absent arm's rank reported as 0, and the fused ppm
  * values equal the hand-computed RRF integers.
  */
class RetrieveHybridSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("RRF fusion: both-arm doc wins, single-arm docs score, ppm exact") {
    // doc 0 is the query in BOTH arms (0 % 97 == 0).
    //  doc 1: shares terms AND a near vector -> both arms
    //  doc 2: shares terms, orthogonal   -> lexical only
    //  doc 3: no shared terms, near      -> dense only
    //  doc 4: no shared terms, far       -> dense tail (k=10 > corpus)
    val tmp = java.nio.file.Files.createTempDirectory("hybrid_fix").toString
    Seq(
      (0L, "the cat sat on the mat"),
      (1L, "the cat sat on a hat"),
      (2L, "the mat sat flat"),
      (3L, "zq wv xk yj"),
      (4L, "qqq www eee rrr")
    ).toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    Seq(
      (0L, Array(1.0, 0.0, 0.0, 0.0)),
      (1L, Array(0.99, 0.1, 0.0, 0.0)),
      (2L, Array(0.0, 1.0, 0.0, 0.0)),
      (3L, Array(0.9, 0.2, 0.1, 0.0)),
      (4L, Array(0.0, 0.0, 1.0, 0.0))
    ).toDF("vec_id", "embedding").write.parquet(s"$tmp/embeddings.parquet")

    val rows = Extensions.retrieveHybrid(spark, tmp)
      .select("qid", "rank", "id", "rrf_ppm", "r_lex", "r_dense")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.forall(_._1 == 0L))
    val byId = rows.map(r => r._3 -> r).toMap

    // doc 1 carries a rank in BOTH arms and must fuse highest
    assert(rows.head._3 == 1L && rows.head._2 == 1L)
    val (_, _, _, ppm1, rl1, rd1) = byId(1L)
    assert(rl1 > 0 && rd1 > 0)
    assert(ppm1 == 1000000L / (60 + rl1) + 1000000L / (60 + rd1))

    // lexical-only doc 2: dense rank present too (tiny corpus, k=10
    // covers everything), so instead pin the structural zeros on a
    // doc OUTSIDE the lexical arm: doc 4 shares no term with the
    // query -> r_lex = 0, exactly one RRF term
    val (_, _, _, ppm4, rl4, rd4) = byId(4L)
    assert(rl4 == 0L && rd4 > 0L)
    assert(ppm4 == 1000000L / (60 + rd4))

    // every fused score is the exact two-term RRF integer
    rows.foreach { case (_, _, _, ppm, rl, rd) =>
      val expect = (if (rl > 0) 1000000L / (60 + rl) else 0L) +
        (if (rd > 0) 1000000L / (60 + rd) else 0L)
      assert(ppm == expect, s"ppm $ppm != $expect (r_lex=$rl r_dense=$rd)")
    }

    // the dense self-hit is dropped post-rank: doc 0 never appears,
    // and no dense rank is 1 (that slot stays burned by the self-hit)
    assert(!byId.contains(0L))
    assert(rows.forall(_._6 != 1L))
  }
}
