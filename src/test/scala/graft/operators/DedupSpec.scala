package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class DedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  val base = "the quick brown fox jumps over the lazy dog again and again for fun"
  val nearDup = base.replace("lazy", "sleepy")      // one-token edit
  val distinct = "completely unrelated content about spark query planning and shuffles"

  lazy val docs = Seq(
    (1L, base), (2L, base), (3L, nearDup), (4L, distinct)
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val got = Dedup.exact(docs, "text", "doc_id")
      .orderBy("keep_id").select("keep_id", "n_dups").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L), (3L, 1L), (4L, 1L)))
  }

  test("jaccard of identical/disjoint shingle sets") {
    val df = Seq((base, base), (base, distinct)).toDF("a", "b")
      .select(Dedup.jaccard(
        Dedup.wordShingles(col("a"), 3), Dedup.wordShingles(col("b"), 3)).as("j"))
    val js = df.as[Double].collect()
    assert(js(0) == 1.0)
    assert(js(1) == 0.0)
  }

  test("minhashPairs finds exact and near duplicates, not the unrelated doc") {
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))        // exact dup always collides
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("clusters propagates min id through pair chains") {
    val ids = Seq(1L, 2L, 3L, 4L, 9L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = Dedup.clusters(ids, "doc_id", pairs)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (9L, 9L)))
  }

  test("distributed label-propagation fallback ≡ driver union-find on the same edges") {
    // driverEdgeLimit = 0 forces the >10M-edge path — the code that
    // actually runs at 100 TB — on a graph union-find solves exactly:
    // a 5-chain (diameter 4: multiple propagation rounds), a triangle,
    // a 2-cycle with reversed edge direction, and singletons
    val ids = (1L to 15L).toDF("doc_id")
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),   // chain, min id at one end
      (6L, 7L), (7L, 8L), (8L, 6L),             // triangle
      (10L, 9L),                                // reversed: min id on the dst side
      (12L, 13L), (11L, 13L)                    // star joined through its center
    ).toDF("id_a", "id_b")
    val uf = Dedup.clusters(ids, "doc_id", pairs)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val lp = Dedup.clusters(ids, "doc_id", pairs, driverEdgeLimit = 0L)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(lp == uf)
    assert(uf.toMap.apply(5L) == 1L && uf.toMap.apply(9L) == 9L &&
      uf.toMap.apply(11L) == 11L && uf.toMap.apply(13L) == 11L)
    // and with maxIter below the chain diameter the fallback must NOT
    // converge — proving the equality above exercised real propagation
    // rounds, not a one-hop join
    val short = Dedup.clusters(ids, "doc_id", pairs, maxIter = 1, driverEdgeLimit = 0L)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(short != uf)
  }

  test("simhash: equal text -> equal hash; near-dup -> small hamming") {
    val d = Dedup.simhashDocs(docs, "doc_id", "text")
      .select("doc_id", "simhash").as[(Long, Long)].collect().toMap
    assert(d(1L) == d(2L))
    val hammingNear = java.lang.Long.bitCount(d(1L) ^ d(3L))
    val hammingFar = java.lang.Long.bitCount(d(1L) ^ d(4L))
    assert(hammingNear < hammingFar)
    assert(hammingNear <= 16, s"near-dup hamming was $hammingNear")
  }

  test("simhash tokenizer uses the shared whitespace class (\\x0B is a token char)") {
    // Java's \s matches \x0B but TextAnalysis.WsClass (the class every
    // oracle-checked text operator splits on) deliberately does not —
    // simhash must tokenize the same way, so "a\x0Bb" is ONE token and
    // hashes differently from the two-token "a b"
    val d = Dedup.simhashDocs(
      Seq((1L, "a\u000Bb"), (2L, "a b"), (3L, "a\u000Bb extra")).toDF("doc_id", "text"),
      "doc_id", "text")
      .select("doc_id", "simhash").as[(Long, Long)].collect().toMap
    assert(d(1L) != d(2L), "\\x0B was treated as a token separator")
    // and the single token "a\x0Bb" is shared with doc 3 (same feature)
    assert(java.lang.Long.bitCount(d(1L) ^ d(3L)) <=
      java.lang.Long.bitCount(d(2L) ^ d(3L)))
  }

  test("simhashPairs returns the exact-dup pair at hamming 0") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("embeddingPairs finds planted identical vectors") {
    val v1 = Array.tabulate(64)(i => math.sin(i).toFloat)
    val v2 = Array.tabulate(64)(i => math.cos(i * 2).toFloat)
    val emb = Seq((1L, v1), (2L, v1), (3L, v2)).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingPairs(emb, "vec_id", "embedding", threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("semantic dedup: planted twin/organic margins hold and groups are exactly the plant") {
    import graft.core.Tables.t
    val sf = "/root/testdata/sf0.001"
    val emb = t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // margin, organic side: no two DISTINCT fixture vectors are close
    // enough to be semantic dups (the 0.9 bar has ≥ 0.2 clearance)
    val organicMax = emb.as("a").crossJoin(emb.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .agg(max(graft.queries.Inventory.cosineSim(col("a.v"), col("b.v"))))
      .head().getDouble(0)
    assert(organicMax < 0.7, s"organic cosine ceiling drifted: $organicMax")
    // margin, twin side: every planted perturbation stays ≥ 0.99
    val twins = emb.filter(col("vec_id") % 7 === 0)
      .select(col("vec_id"),
        expr("transform(v, (x, i) -> x + (cast((vec_id * 31 + i) % 7 as double) - 3.0d) * 0.003d)")
          .as("tv"), col("v"))
    val twinMin = twins
      .agg(min(graft.queries.Inventory.cosineSim(col("v"), col("tv"))))
      .head().getDouble(0)
    assert(twinMin >= 0.99, s"planted twin cosine floor drifted: $twinMin")
    // end to end: discovered groups == the planted truth
    val got = graft.queries.Extensions.dedupSemantic(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = emb.select("vec_id").as[Long].collect()
      .map(id => id -> (if (id % 7 == 0) 2L else 1L)).toMap
    assert(got == want)
  }

  test("substringDupStats counts cross-document duplicated window positions") {
    val docs = Seq(
      (1L, "a b c d e"),        // windows: "a b c" "b c d" "c d e"
      (2L, "c d e f g"),        // windows: "c d e" "d e f" "e f g"
      (3L, "h i j k l")         // disjoint
    ).toDF("doc_id", "text")
    val got = Dedup.substringDupStats(docs, "doc_id", "text", window = 3)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 1L, 0.3333), (2L, 3L, 1L, 0.3333), (3L, 3L, 0L, 0.0)))
  }

  test("substringDupStats: within-doc repeats are NOT duplication; every position of a cross-doc window counts") {
    val docs = Seq(
      (1L, "x y z x y z"),      // "x y z" twice within one doc: df = 1
      (2L, "p q r s"),
      (3L, "w w p q r s w")     // shares "p q r" and "q r s" with doc 2
    ).toDF("doc_id", "text")
    val got = Dedup.substringDupStats(docs, "doc_id", "text", window = 3)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 0L, 0.0), (2L, 2L, 2L, 1.0), (3L, 5L, 2L, 0.4)))
  }

  test("substringDupStats: a doc shorter than the window shingles whole") {
    val docs = Seq((1L, "tiny doc"), (2L, "tiny doc"), (3L, "other")).toDF("doc_id", "text")
    val got = Dedup.substringDupStats(docs, "doc_id", "text", window = 32)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((1L, 1L, 1L, 1.0), (2L, 1L, 1L, 1.0), (3L, 1L, 0L, 0.0)))
  }

  test("incrementalDedup: exact twins counted, same-length near-dups verified, novel passes clean") {
    val sameLenNear = base.replace("lazy", "cozy") // 4-char edit keeps lb
    val corpus = Seq((1L, base), (2L, base), (3L, distinct)).toDF("doc_id", "text")
    val batch = Seq((10L, base), (11L, sameLenNear),
      (12L, "zz qq ww ee rr")).toDF("doc_id", "text")
    val got = Dedup.incrementalDedup(corpus, batch, "doc_id", "text",
        maxBucket = 100, minJaccard = 0.2)
      .orderBy("doc_id").as[(Long, Long, Long, Option[Double])].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) == Seq((10L, 2L, 2L), (11L, 0L, 2L), (12L, 0L, 0L)))
    assert(got(0)._4.contains(1.0))                  // exact copy: best jaccard 1
    val near = got(1)._4.get
    assert(near > 0.5 && near < 1.0, s"near $near")  // one-word edit: high but < 1
    assert(got(2)._4.isEmpty)                        // novel doc: no candidate at all
  }
}
