package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding application kernel. The merge table is TRAINED
  * driver-side on a deterministic sample ([[graft.operators.Bpe]], the
  * IVF-codebook pattern) and shipped to executors through the codegen
  * constant pool; this file is the corpus-wide APPLY side.
  *
  * Pre-tokenization mirrors [[graft.operators.TextAnalysis
  * .tokenCountBpe]]'s regex exactly — lowercased letter runs, digit
  * runs, single non-alnum marks, whitespace dropped — so learned-BPE
  * counts are comparable with the untrained `n_bpe` baseline. Merging
  * is the standard greedy scheme: repeatedly take the PRESENT pair
  * with the lowest merge rank and fuse its occurrences left-to-right
  * without overlap. */
object BpeUtil {

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  private def isLower(c: Char): Boolean = c >= 'a' && c <= 'z'
  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  /** `[a-z]+|[0-9]+|[^a-z0-9\s]` over the lowercased text, one pass. */
  def preTokens(s0: String): java.util.ArrayList[String] = {
    val s = s0.toLowerCase
    val out = new java.util.ArrayList[String]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isWs(c)) i += 1
      else if (isLower(c)) {
        var j = i + 1; while (j < s.length && isLower(s.charAt(j))) j += 1
        out.add(s.substring(i, j)); i = j
      } else if (isDigit(c)) {
        var j = i + 1; while (j < s.length && isDigit(s.charAt(j))) j += 1
        out.add(s.substring(i, j)); i = j
      } else {
        // one mark per CODE POINT (the regex reference matches code
        // points, so an astral char is one token, not two surrogates)
        val w = if (Character.isHighSurrogate(c) && i + 1 < s.length &&
          Character.isLowSurrogate(s.charAt(i + 1))) 2 else 1
        out.add(s.substring(i, i + w)); i += w
      }
    }
    out
  }

  /** Rank lookup as a NESTED map (left symbol → right symbol → rank):
    * symbols may themselves contain any character (a NUL mark is a
    * legal single-code-point pre-token), so a flat "a<sep>b" string key
    * collides for every possible separator; two-level exact-string keys
    * cannot. Weak-keyed because codegen reference objects are
    * deserialized per task binary — a permanent identity-keyed cache
    * would grow for an executor's lifetime; weak keys let each table's
    * entry die with the plan that owns it. */
  private val rankCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[Array[String],
      java.util.HashMap[String, java.util.HashMap[String, Integer]]]())
  // ranksFor runs PER PRE-TOKEN: a synchronized lookup there is a lock
  // convoy across executor threads. Each thread memoizes the last
  // (table → map) pair, so the mutex is taken once per table per
  // thread, then lookups are thread-local. The memo strongly holds at
  // most ONE table per thread — bounded, and the weak cache still
  // reclaims tables no thread is using.
  private val lastRanks = new ThreadLocal[
    (Array[String], java.util.HashMap[String, java.util.HashMap[String, Integer]])]()
  private def ranksFor(flat: Array[String])
      : java.util.HashMap[String, java.util.HashMap[String, Integer]] = {
    val memo = lastRanks.get()
    if (memo != null && (memo._1 eq flat)) return memo._2
    val m = rankCache.computeIfAbsent(flat, f => {
      val built = new java.util.HashMap[String, java.util.HashMap[String, Integer]]()
      var r = 0
      while (r * 2 + 1 < f.length) {
        built.computeIfAbsent(f(r * 2), _ => new java.util.HashMap[String, Integer]())
          .putIfAbsent(f(r * 2 + 1), r)
        r += 1
      }
      built
    })
    lastRanks.set((flat, m))
    m
  }

  /** Subword count of one pre-token under the merge table. */
  def subCount(word: String, flat: Array[String]): Int = {
    if (word.length <= 1) return word.length
    val ranks = ranksFor(flat)
    var syms = new Array[String](word.length)
    var i = 0
    while (i < word.length) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
    var n = word.length
    while (n > 1) {
      // lowest-rank pair present
      var best = Int.MaxValue
      i = 0
      while (i < n - 1) {
        val inner = ranks.get(syms(i))
        if (inner != null) {
          val r = inner.get(syms(i + 1))
          if (r != null && r < best) best = r
        }
        i += 1
      }
      if (best == Int.MaxValue) return n
      val a = flat(best * 2); val b = flat(best * 2 + 1); val ab = a + b
      // fuse occurrences left-to-right, non-overlapping (GPT-2 scheme)
      val out = new Array[String](n)
      var w = 0; i = 0
      while (i < n) {
        if (i < n - 1 && syms(i) == a && syms(i + 1) == b) { out(w) = ab; i += 2 }
        else { out(w) = syms(i); i += 1 }
        w += 1
      }
      if (w == n) return n // progress guard: a selected merge must fuse
      syms = out; n = w
    }
    n
  }

  /** [n_pre, n_sub] for a document. */
  def bpeStats(text: UTF8String, flat: Array[String]): ArrayData = {
    val toks = preTokens(text.toString)
    var sub = 0L
    var i = 0
    while (i < toks.size) { sub += subCount(toks.get(i), flat); i += 1 }
    new GenericArrayData(Array[Any](toks.size.toLong, sub))
  }

  /** The pre-token list itself, for the distributed TRAIN side. */
  def preTokenArray(text: UTF8String): ArrayData = {
    val toks = preTokens(text.toString)
    val out = new Array[Any](toks.size)
    var i = 0
    while (i < toks.size) { out(i) = UTF8String.fromString(toks.get(i)); i += 1 }
    new GenericArrayData(out)
  }
}

/** The shared pre-tokenizer as a column: `array<string>` of lowercased
  * letter runs / digit runs / single marks. Lets [[graft.operators.Bpe
  * .train]] build its word-frequency table with `explode` + `groupBy`
  * instead of collecting corpus text to the driver. */
case class BpePreTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(text: Any): Any =
    BpeUtil.preTokenArray(text.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeUtil.preTokenArray($c)")
  override protected def withNewChildInternal(newChild: Expression): BpePreTokens =
    copy(child = newChild)
}

/** [n_pre, n_sub] per document; merge table rides the constant pool. */
case class BpeStats(child: Expression, mergesFlat: Array[String])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(text: Any): Any =
    BpeUtil.bpeStats(text.asInstanceOf[UTF8String], mergesFlat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", mergesFlat, "java.lang.String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeUtil.bpeStats($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeStats =
    copy(child = newChild)
}

object Bpes {
  def bpeStats(text: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeStats(ColumnBridge.expression(text),
      merges.iterator.flatMap(p => Iterator(p._1, p._2)).toArray))
  def preTokens(text: Column): Column =
    ColumnBridge.column(BpePreTokens(ColumnBridge.expression(text)))
}
