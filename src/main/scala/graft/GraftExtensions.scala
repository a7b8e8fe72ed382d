package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions._

/** Session-extension entry point: registers every custom Catalyst
  * expression as a SQL function, so a plain SQL user gets the whole
  * kernel surface with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`).
  * Injection happens in the session's function registry — the
  * expressions then participate in optimization and whole-stage
  * codegen exactly like built-ins; nothing here is a UDF.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def strArg(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def reg(name: String, usage: String)(builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, ""),
        builder))

    reg("simhash64", "simhash64(tokens) - 64-bit SimHash of a string array") {
      es => SimHash64(es.head)
    }
    reg("doc_fingerprint", "doc_fingerprint(text[, k]) - winnowing min-hash over k-byte windows") {
      es => DocFingerprint(es.head, if (es.length > 1) intArg(es(1), "k") else 8)
    }
    reg("word_shingles", "word_shingles(text, n) - word n-gram shingles") {
      es => WordShingles(es.head, intArg(es(1), "n"))
    }
    reg("count_in_set", "count_in_set(tokens, word, ...) - occurrences of tokens in the word list") {
      es => CountInSet(es.head, es.tail.map(strArg(_, "word")))
    }
    reg("sum_str_len", "sum_str_len(tokens) - total character count of a string array") {
      es => SumStrLen(es.head)
    }
    reg("cosine_sim", "cosine_sim(a, b) - cosine similarity of two double arrays") {
      es => CosineSim(es.head, es(1))
    }
    reg("dot_product", "dot_product(a, b) - dot product of two double arrays") {
      es => DotProduct(es.head, es(1))
    }
    reg("squared_dist", "squared_dist(a, b) - squared euclidean distance") {
      es => SquaredDist(es.head, es(1))
    }
    reg("sign_bucket", "sign_bucket(vec[, nbits, seed]) - sign-LSH bucket id") {
      es => SignBucket(es.head,
        if (es.length > 1) intArg(es(1), "nbits") else 16,
        if (es.length > 2) longArg(es(2), "seed") else 7L)
    }
    reg("minhash_sig", "minhash_sig(hashes[, numHashes, seed]) - MinHash signature") {
      es => MinHashSig(es.head,
        if (es.length > 1) intArg(es(1), "numHashes") else 128,
        if (es.length > 2) longArg(es(2), "seed") else 42L)
    }
    reg("jaccard_sim", "jaccard_sim(a, b) - distinct-set Jaccard of two string arrays") {
      es => JaccardSim(es.head, es(1))
    }
    reg("containment_sorted_sim",
      "containment_sorted_sim(a, b) - |A∩B|/|B| over sorted-distinct arrays (quote/excerpt detection)") {
      es => ContainmentSortedSim(es.head, es(1))
    }
    reg("char_shingles", "char_shingles(text, n) - character n-gram shingles") {
      es => CharShingles(es.head, intArg(es(1), "n"))
    }
    reg("shingle_md5_bounds", "shingle_md5_bounds(text, n) - (n_grams, min_md5, max_md5) over char n-gram shingles") {
      es => ShingleMd5Bounds(es.head, intArg(es(1), "n"))
    }
    reg("spelled_digits", "spelled_digits(s) - replace spelled zero..nine with digits") {
      es => SpelledDigits(es.head)
    }
    reg("quant_stats", "quant_stats(vec) - int8 quantization checksum + recon cosine") {
      es => QuantStats(es.head)
    }
    reg("top_k", "top_k(expr, k) - aggregate: the k largest values, descending") {
      es => TopKAgg(es.head, intArg(es(1), "k")).toAggregateExpression()
    }
    reg("quantize_i8", "quantize_i8(vec) - symmetric int8 codes of a double array") {
      es => QuantizeI8(es.head)
    }
    reg("cosine_i8", "cosine_i8(a, b) - cosine over int8 codes (integer dot products)") {
      es => CosineI8(es.head, es(1))
    }
    reg("dot_i8", "dot_i8(a, b) - exact integer dot product of int8 code arrays") {
      es => DotI8(es.head, es(1))
    }
    reg("normalize_url", "normalize_url(url) - canonical URL (case/www/port/slash/tracking-param/fragment)") {
      es => NormalizeUrl(es.head)
    }
    reg("interleave_bits", "interleave_bits(x, y) - 2-D Morton (Z-order) key over the low 16 bits") {
      es => InterleaveBits(es.head, es(1))
    }
    reg("hilbert_index", "hilbert_index(x, y) - order-8 Hilbert curve key over the low 8 bits") {
      es => HilbertIndex(es.head, es(1))
    }
    reg("bpe_stats", "bpe_stats(text, a1, b1, a2, b2, ...) - [n_pre, n_sub] under the literal merge table") {
      es => BpeStats(es.head, es.tail.map(strArg(_, "merge symbol")).toArray)
    }
    reg("bpe_pre_tokens", "bpe_pre_tokens(text) - BPE pre-token array (letter runs, digit runs, single marks)") {
      es => BpePreTokens(es.head)
    }
    // optimizer rule: jaccard_sim over provably sorted-distinct inputs
    // strength-reduces to the zero-allocation merge-walk kernel
    ext.injectOptimizerRule(_ => graft.plans.JaccardStrengthReduction)
  }
}
