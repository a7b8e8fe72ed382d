package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static helpers referenced from generated code (top-level Scala objects
  * emit static forwarders, so `graft.functions.SketchUtil.simhash(...)`
  * is a plain static call inside whole-stage codegen).
  *
  * Hashing is FNV-1a 64-bit — public-domain, byte-deterministic across
  * JVMs, no dependency.
  */
object SketchUtil {

  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  def fnv1a(bytes: Array[Byte]): Long = {
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** 64-bit SimHash over a token array: per bit, sum +1/-1 weighted by
    * token-hash bit, take signs. Near-duplicate texts land at small
    * Hamming distance. Null tokens are skipped.
    */
  def simhash(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = fnv1a(tokens.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Word n-gram shingles in one pass: lowercase, tokenize on ASCII
    * whitespace runs (the `\s+` class), join each n-token window with a
    * single space. Fewer than n tokens → one shingle of all tokens;
    * no tokens → one empty shingle. Replaces an interpreted
    * transform(sequence)/slice/concat_ws chain that dominated MinHash
    * dedup (each shingle re-sliced the token array per element).
    */
  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val s = text.toLowerCase.toString
    val tokens = new java.util.ArrayList[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(s.charAt(i))) i += 1
      if (i > start) tokens.add(s.substring(start, i))
    }
    val t = tokens.size()
    if (t < math.max(n, 1)) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < t) { if (j > 0) sb.append(' '); sb.append(tokens.get(j)); j += 1 }
      return new GenericArrayData(Array[Any](UTF8String.fromString(sb.toString)))
    }
    val out = new Array[Any](t - n + 1)
    var w = 0
    while (w <= t - n) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) { if (j > 0) sb.append(' '); sb.append(tokens.get(w + j)); j += 1 }
      out(w) = UTF8String.fromString(sb.toString)
      w += 1
    }
    new GenericArrayData(out)
  }

  /** Count of (non-null) tokens present in the word set — the kernel of
    * stopword-ratio scoring and seed-list language ID. Equivalent to
    * size(filter(tokens, isin(words))) with the HOF interpretation cost
    * removed (language ID ran five of those per row). Counts
    * occurrences, not distinct hits. */
  def countInSet(tokens: ArrayData, words: java.util.HashSet[UTF8String]): Int = {
    val n = tokens.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i) && words.contains(tokens.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  /** Jaccard of two sorted-distinct string arrays by a merge walk:
    * O(|a|+|b|) UTF8String binary comparisons, zero allocation. Inputs
    * MUST be sort_array(array_distinct(...)) — sort_array's ordering is
    * UTF8String.compareTo, the same comparator used here, with (at most
    * one) null element first; the null slot counts as one distinct
    * value on each side, matching [[jaccard]]'s hash-set semantics.
    */
  def jaccardSortedDistinct(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0
    // array_distinct keeps at most one null; sort_array(asc) puts it first
    val aNull = na > 0 && a.isNullAt(0)
    val bNull = nb > 0 && b.isNullAt(0)
    if (aNull) i = 1
    if (bNull) j = 1
    if (aNull && bNull) inter = 1
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter).toDouble
  }

  /** Containment |A∩B| / |B| over two sorted-distinct string arrays —
    * the ASYMMETRIC near-dup measure: how much of B (the query/quote)
    * appears in A (the document). Unlike Jaccard it doesn't punish a
    * length mismatch, which is exactly what excerpt/quote detection
    * needs (a 50-token quote inside a 5 000-token article has tiny
    * Jaccard but containment ≈ 1). Same merge-walk as
    * [[jaccardSortedDistinct]]; |B| = 0 → 0.0 (an empty query is
    * contained nowhere rather than everywhere — the caller filters
    * empty queries out, and NaN would poison downstream sorts). */
  def containmentSortedDistinct(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (nb == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    val aNull = na > 0 && a.isNullAt(0)
    val bNull = nb > 0 && b.isNullAt(0)
    if (aNull) i = 1
    if (bNull) j = 1
    if (aNull && bNull) inter = 1
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    inter.toDouble / nb.toDouble
  }

  /** Jaccard similarity of two string arrays under distinct-set
    * semantics: |A∩B| / (|A|+|B|-|A∩B|) with A, B deduplicated — the
    * exact value of the array_distinct/array_intersect Column
    * formulation, in one hash-set pass instead of two distincts plus a
    * twice-referenced intersect. Null elements participate as one
    * distinct value, as array_distinct keeps them. */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val sa = new java.util.HashSet[UTF8String]()
    var aNull = false
    var i = 0
    val na = a.numElements()
    while (i < na) {
      if (a.isNullAt(i)) aNull = true else sa.add(a.getUTF8String(i))
      i += 1
    }
    val sb = new java.util.HashSet[UTF8String]()
    var bNull = false
    i = 0
    val nb = b.numElements()
    while (i < nb) {
      if (b.isNullAt(i)) bNull = true else sb.add(b.getUTF8String(i))
      i += 1
    }
    var inter = 0
    val it = sb.iterator()
    while (it.hasNext) if (sa.contains(it.next())) inter += 1
    if (aNull && bNull) inter += 1
    val da = sa.size + (if (aNull) 1 else 0)
    val db = sb.size + (if (bNull) 1 else 0)
    inter.toDouble / (da + db - inter).toDouble
  }

  /** Sum of (non-null) token character lengths — mean-token-length
    * numerator. Equivalent to aggregate(tokens, 0L, acc + length(t)). */
  def sumStrLen(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) s += tokens.getUTF8String(i).numChars()
      i += 1
    }
    s
  }

  /** Character n-gram shingles over the lowercased text, one pass;
    * texts of ≤ n chars shingle whole. Codepoint-accurate (substring
    * windows count characters, matching substr() in both engines). */
  def charShingles(text: UTF8String, n: Int): ArrayData = {
    val s = text.toLowerCase.toString
    val len = s.codePointCount(0, s.length)
    if (len <= n) return new GenericArrayData(Array[Any](UTF8String.fromString(s)))
    val out = new Array[Any](len - n + 1)
    var w = 0
    var start = 0 // char index of window start
    while (w <= len - n) {
      val end = s.offsetByCodePoints(start, n)
      out(w) = UTF8String.fromString(s.substring(start, end))
      start = s.offsetByCodePoints(start, 1)
      w += 1
    }
    new GenericArrayData(out)
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private def hex32(d: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** (n_grams, min_md5, max_md5) over char n-gram shingles in ONE pass:
    * no shingle array, no per-gram hex strings — md5 bytes compared
    * unsigned (hex encoding preserves byte order), hex-encoded once at
    * the end. Shingle semantics identical to [[charShingles]]
    * (lowercased, codepoint windows, ≤ n chars shingles whole), md5
    * identical to both engines' md5(gram). */
  def shingleMd5Bounds(text: UTF8String, n: Int)
      : org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val md = md5Local.get()
    val s = text.toLowerCase.toString
    val len = s.codePointCount(0, s.length)
    var min: Array[Byte] = null
    var max: Array[Byte] = null
    var count = 0L
    def feed(sub: String): Unit = {
      md.reset()
      val d = md.digest(sub.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (min == null || unsignedLess(d, min)) min = d
      if (max == null || unsignedLess(max, d)) max = d
      count += 1
    }
    if (len <= n) feed(s)
    else {
      var start = 0
      var w = 0
      while (w <= len - n) {
        val end = s.offsetByCodePoints(start, n)
        feed(s.substring(start, end))
        start = s.offsetByCodePoints(start, 1)
        w += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](count, UTF8String.fromString(hex32(min)), UTF8String.fromString(hex32(max))))
  }

  private val digitWords = Array(
    "zero" -> "0", "one" -> "1", "two" -> "2", "three" -> "3",
    "four" -> "4", "five" -> "5", "six" -> "6", "seven" -> "7",
    "eight" -> "8", "nine" -> "9")

  /** The reference's spelled-digit substring replace (etl_process.py:
    * 97-111) in one pass over the expression tree: sequential
    * left-to-right replace of zero..nine in fixed order — identical
    * results to ten chained regexp_replace calls (each pattern is a
    * plain literal), without ten regex-engine invocations and
    * UTF8String round-trips per row. The intended "phone"→"ph1"-style
    * corruptions are preserved. */
  def spelledDigits(s: UTF8String): UTF8String = {
    var t = s.toString
    var i = 0
    while (i < digitWords.length) {
      t = t.replace(digitWords(i)._1, digitWords(i)._2)
      i += 1
    }
    UTF8String.fromString(t)
  }

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** [[isWs]] as an RE2/Java regex class — the character set an external
    * engine must split on to reproduce [[wordShingles]] tokenization
    * (note the vertical tab x0B: this class is ASCII `\s`, WIDER than
    * [[graft.operators.TextAnalysis.WsClass]] — the shingle kernels
    * predate the text operators' narrowed class, and their oracles must
    * match THIS set). Kept adjacent to isWs so the two cannot drift. */
  val WsClassRegex = "[ \\t\\n\\x0B\\f\\r]+"

  /** Winnowing-style document fingerprint: minimum FNV-1a hash over all
    * k-byte windows of the UTF-8 text (k-gram rolling fingerprint,
    * cf. the standard winnowing scheme). Deterministic; equal for equal
    * text; robust to where in the doc the content sits. Texts shorter
    * than k hash whole.
    */
  def fingerprint(text: UTF8String, k: Int): Long = {
    val bytes = text.getBytes
    if (bytes.length <= k) return fnv1a(bytes)
    var min = Long.MaxValue
    var i = 0
    while (i + k <= bytes.length) {
      var h = FnvOffset
      var j = i
      while (j < i + k) {
        h ^= (bytes(j) & 0xffL)
        h *= FnvPrime
        j += 1
      }
      if (h < min) min = h
      i += 1
    }
    min
  }
}

/** simhash64(array<string>) → long. Custom Catalyst expression (not a
  * UDF): participates in whole-stage codegen via a static call, so the
  * surrounding projection never breaks out of Tungsten.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(tokens: Any): Any =
    SketchUtil.simhash(tokens.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchUtil.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** word_shingles(string, n) → array<string> of word n-grams. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(text: Any): Any =
    SketchUtil.wordShingles(text.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchUtil.wordShingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** count_in_set(array<string>) → int occurrences of tokens in a fixed
  * word list (shipped inside the expression, referenced from codegen). */
case class CountInSet(child: Expression, words: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  @transient private lazy val wordSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
  override def nullSafeEval(tokens: Any): Any =
    SketchUtil.countInSet(tokens.asInstanceOf[ArrayData], wordSet)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", wordSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchUtil.countInSet($c, $setRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): CountInSet =
    copy(child = newChild)
}

/** char_shingles(string, n) → array<string> of char n-grams. */
case class CharShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(text: Any): Any =
    SketchUtil.charShingles(text.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchUtil.charShingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}

/** shingle_md5_bounds(text, n) →
  * struct<n_grams: long, min_md5: string, max_md5: string>. */
case class ShingleMd5Bounds(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("min_md5", StringType, nullable = false),
    StructField("max_md5", StringType, nullable = false)))
  override def nullSafeEval(text: Any): Any =
    SketchUtil.shingleMd5Bounds(text.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchUtil.shingleMd5Bounds($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleMd5Bounds =
    copy(child = newChild)
}

/** spelled_digits(string) → string with zero..nine replaced by 0..9. */
case class SpelledDigits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(s: Any): Any =
    SketchUtil.spelledDigits(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchUtil.spelledDigits($c)")
  override protected def withNewChildInternal(newChild: Expression): SpelledDigits =
    copy(child = newChild)
}

/** jaccard_sorted_sim(array<string>, array<string>) → double Jaccard of
  * two SORTED-DISTINCT null-free string arrays (sort_array ∘
  * array_distinct, computed once per document). The merge walk makes
  * the per-pair cost a single allocation-free comparison pass — the
  * hash-set kernel rebuilt both sets on every pair, so a document in b
  * candidate pairs paid b set constructions. Same value as
  * [[JaccardSim]] on the unsorted inputs.
  */
case class JaccardSortedSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    SketchUtil.jaccardSortedDistinct(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SketchUtil.jaccardSortedDistinct($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSortedSim =
    copy(left = l, right = r)
}

/** containment_sorted_sim(array<string>, array<string>) → double
  * |A∩B|/|B| over sorted-distinct arrays ([[SketchUtil
  * .containmentSortedDistinct]]) — the asymmetric quote/excerpt
  * detector beside [[JaccardSortedSim]]. */
case class ContainmentSortedSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    SketchUtil.containmentSortedDistinct(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SketchUtil.containmentSortedDistinct($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ContainmentSortedSim =
    copy(left = l, right = r)
}

/** jaccard_sim(array<string>, array<string>) → double distinct-set Jaccard. */
case class JaccardSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    SketchUtil.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SketchUtil.jaccard($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
    copy(left = l, right = r)
}

/** sum_str_len(array<string>) → long total character count. */
case class SumStrLen(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(tokens: Any): Any =
    SketchUtil.sumStrLen(tokens.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchUtil.sumStrLen($c)")
  override protected def withNewChildInternal(newChild: Expression): SumStrLen =
    copy(child = newChild)
}

/** doc_fingerprint(string, k) → long rolling-hash fingerprint. */
case class DocFingerprint(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(text: Any): Any =
    SketchUtil.fingerprint(text.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchUtil.fingerprint($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): DocFingerprint =
    copy(child = newChild)
}

/** Column-API and SQL registration for the sketch expressions. */
object Sketches {
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
  def docFingerprint(text: Column, k: Int = 8): Column =
    ColumnBridge.column(DocFingerprint(ColumnBridge.expression(text), k))
  def wordShingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))
  def countInSet(tokens: Column, words: Seq[String]): Column =
    ColumnBridge.column(CountInSet(ColumnBridge.expression(tokens), words))
  def sumStrLen(tokens: Column): Column =
    ColumnBridge.column(SumStrLen(ColumnBridge.expression(tokens)))
  def jaccardSim(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def jaccardSortedSim(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardSortedSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def containmentSortedSim(a: Column, b: Column): Column =
    ColumnBridge.column(ContainmentSortedSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  /** sort_array(array_distinct(x)): the once-per-document normalization
    * [[JaccardSortedSim]] expects. */
  def sortedDistinct(a: Column): Column =
    org.apache.spark.sql.functions.sort_array(
      org.apache.spark.sql.functions.array_distinct(a))
  def spelledDigits(s: Column): Column =
    ColumnBridge.column(SpelledDigits(ColumnBridge.expression(s)))
  def charShingles(text: Column, n: Int): Column =
    ColumnBridge.column(CharShingles(ColumnBridge.expression(text), n))
  def shingleMd5Bounds(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleMd5Bounds(ColumnBridge.expression(text), n))

  /** Bloom-filter aggregate over a LONG hash column → filter bytes.
    * Spark's own `BloomFilterAggregate` (the sketch behind runtime
    * row-level filtering), surfaced for explicit semi-join prefilters;
    * `expectedItems`/`numBits` bound the driver artifact exactly like a
    * codebook (numBits/8 bytes regardless of input size). */
  def bloomAgg(hashed: Column, expectedItems: Long, numBits: Long): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    ColumnBridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        ColumnBridge.expression(hashed), Literal(expectedItems), Literal(numBits))
        .toAggregateExpression())
  }

  /** might_contain(bloomBytes, hash): false ⇒ the hash was never added
    * (no false negatives). Codegen'd; the filter rides the constant
    * pool as a literal. */
  def mightContain(bloomBytes: Array[Byte], hashed: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        Literal(bloomBytes, org.apache.spark.sql.types.BinaryType),
        ColumnBridge.expression(hashed)))
  }

  // SQL registration lives in graft.GraftExtensions only — a second
  // registry path here once hardcoded doc_fingerprint's k and silently
  // dropped the argument, diverging from the extension's signature.
}
