package graft.operators

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.BpeUtil

class BpeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("preTokens mirrors the n_bpe regex: letter runs, digit runs, single marks") {
    assert(BpeUtil.preTokens("Don't stop123").asScala.toSeq ==
      Seq("don", "'", "t", "stop", "123"))
    assert(BpeUtil.preTokens("  \t\n ").asScala.isEmpty)
  }

  test("train learns hand-computable merges in frequency order") {
    // words: abab ×2, ab ×1 → pair (a,b) freq 5 wins; then (ab,ab) freq 2
    val docs = Seq((1L, "abab abab ab")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", sampleFrac = 1.0, nMerges = 10)
    assert(merges == Seq(("a", "b"), ("ab", "ab")))
  }

  test("train tie-break is the lexicographically smallest pair") {
    // "ba ba" and "ab ab": pairs (b,a) and (a,b) both freq 2 → (a,b) first
    val docs = Seq((1L, "ba ba ab ab")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", sampleFrac = 1.0, nMerges = 1)
    assert(merges == Seq(("a", "b")))
  }

  test("subCount applies merges greedily, left-to-right, non-overlapping") {
    val flat = Array("a", "b", "ab", "ab") // ranks: (a,b)=0, (ab,ab)=1
    assert(BpeUtil.subCount("ababab", flat) == 2) // ab|ab|ab → abab|ab
    assert(BpeUtil.subCount("aba", flat) == 2)    // ab|a
    assert(BpeUtil.subCount("ba", flat) == 2)     // no merge applies
    assert(BpeUtil.subCount("x", flat) == 1)
  }

  test("NUL-containing symbols cannot collide rank keys or hang the merge loop") {
    // Table where a flat "a<NUL>b" rank key would collide:
    // ("a\u0000","b") and ("a","\u0000b") both flatten to a\0\0b, and
    // the overwritten rank points at a pair that is NOT adjacent after
    // ("a","\u0000") fuses — the old kernel then rewrote nothing and
    // spun forever. The nested map resolves the true pair: a\0 + b.
    val flat = Array("a", "\u0000", "\u0000", "b", "a\u0000", "b", "a", "\u0000b")
    assert(BpeUtil.subCount("a\u0000b", flat) == 1)
    // and through the full stats path (NUL is a single-mark pre-token)
    assert(BpeUtil.bpeStats(
      org.apache.spark.unsafe.types.UTF8String.fromString("x \u0000 y"),
      flat).toLongArray().toSeq == Seq(3L, 3L))
  }

  test("tokenStats: counts on a fixture; codegen kernel matches subCount") {
    val docs = Seq((1L, "abab ab"), (2L, "zzz")).toDF("doc_id", "text")
    val merges = Seq(("a", "b"), ("ab", "ab"))
    val got = Bpe.tokenStats(docs, "doc_id", "text", merges)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 2L), (2L, 1L, 3L)))
  }

  test("byte-budget vocab cut: deterministic, partition-independent, and strict") {
    val docs = graft.core.Tables.t(spark, "/root/testdata/sf0.01", "documents")
    // a budget small enough to truncate the vocab mid-stream: still
    // deterministic (total stream order) and partition-independent
    val m1 = Bpe.train(docs, "text", sampleFrac = 0.2, nMerges = 16, maxVocabBytes = 4096L)
    val m2 = Bpe.train(docs.repartition(11), "text", sampleFrac = 0.2, nMerges = 16, maxVocabBytes = 4096L)
    assert(m1 == m2 && m1.nonEmpty)
    // the truncated vocab differs from the full run's view of the
    // corpus, so the learned merges may differ — but both paths train
    val full = Bpe.train(docs, "text", sampleFrac = 0.2, nMerges = 16)
    assert(full.size == 16)
  }

  test("training is deterministic and the corpus run is partition-independent") {
    val docs = graft.core.Tables.t(spark, "/root/testdata/sf0.01", "documents")
    val m1 = Bpe.train(docs, "text", sampleFrac = 0.2, nMerges = 48)
    val m2 = Bpe.train(docs.repartition(13), "text", sampleFrac = 0.2, nMerges = 48)
    assert(m1 == m2 && m1.size == 48)
    val a = Bpe.tokenStats(docs, "doc_id", "text", m1)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    val b = Bpe.tokenStats(docs.repartition(7), "doc_id", "text", m2)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(a == b)
    // n_pre IS the untrained n_bpe baseline (same pre-tokenizer), and
    // subwords sit between pre-tokens and raw characters
    val base = docs.select($"doc_id",
        TextAnalysis.tokenCountBpe($"text").cast("long")).as[(Long, Long)].collect().toMap
    assert(a.forall { case (id, pre, sub) => pre == base(id) && sub >= pre })
    // the learned merges actually compress: strictly fewer subwords than
    // the no-merge char-level segmentation
    val chars = Bpe.tokenStats(docs, "doc_id", "text", Seq.empty)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().map(_._3).sum
    assert(a.map(_._3).sum < chars)
  }
}
