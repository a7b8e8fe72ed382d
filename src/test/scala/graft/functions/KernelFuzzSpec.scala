package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Seeded-fuzz equivalence: the native text kernels vs plain-Scala
  * reference implementations, over generated strings that mix unicode,
  * control whitespace, empty/blank and repeated tokens. (Plain
  * ScalaCheck lacks the scalatest bridge in the offline cache, so this
  * uses a fixed-seed generator — same coverage, reproducible failures.)
  */
class KernelFuzzSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(20260812L)
  // whole code points: charAt would split the emoji's surrogate pair and
  // emit invalid UTF-16, which round-trips differently through UTF8String
  private val alphabet: Vector[String] =
    "abcXYZ019 \t\n\f\r$;.é漢🙂".codePoints().toArray.toVector
      .map(cp => new String(Character.toChars(cp)))

  private def randString(): String = {
    val n = rng.nextInt(60)
    val sb = new StringBuilder
    (0 until n).foreach(_ => sb.append(alphabet(rng.nextInt(alphabet.size))))
    sb.toString
  }

  // ---- plain-Scala references (independent formulations) ----

  private def refTokens(s: String): Vector[String] =
    s.toLowerCase.split("[ \t\n\f\r]+").filter(_.nonEmpty).toVector

  private def refShingles(s: String, n: Int): Vector[String] = {
    val t = refTokens(s)
    if (t.length < n) Vector(t.mkString(" "))
    else t.sliding(n).map(_.mkString(" ")).toVector
  }

  private def refJaccard(a: Seq[String], b: Seq[String]): Double = {
    val (sa, sb) = (a.toSet, b.toSet)
    val inter = sa.intersect(sb).size
    inter.toDouble / (sa.size + sb.size - inter).toDouble
  }

  private def refCountInSet(tokens: Seq[String], words: Set[String]): Int =
    tokens.count(words.contains)

  private def refSumLen(tokens: Seq[String]): Long =
    tokens.map(t => t.codePointCount(0, t.length).toLong).sum

  private val cases = (0 until 300).map(i => (i.toLong, randString()))

  test("wordShingles matches the reference tokenizer over fuzzed input") {
    val got = cases.toDF("id", "text")
      .select(col("id"), Sketches.wordShingles(col("text"), 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    cases.foreach { case (id, text) =>
      assert(got(id).toVector == refShingles(text, 3), s"id=$id text=${text.take(40)}")
    }
  }

  test("jaccard kernel matches set-based reference over fuzzed token pairs") {
    val pairs = cases.grouped(2).collect { case Seq(a, b) => (a._1, a._2, b._2) }.toSeq
    val got = pairs.toDF("id", "ta", "tb")
      .select(col("id"), Sketches.jaccardSim(
        split(col("ta"), " "), split(col("tb"), " ")).as("j"))
      .as[(Long, Double)].collect().toMap
    pairs.foreach { case (id, a, b) =>
      val expect = refJaccard(a.split(" ", -1).toSeq, b.split(" ", -1).toSeq)
      val j = got(id)
      assert((j.isNaN && expect.isNaN) || j == expect, s"id=$id")
    }
  }

  test("jaccardSortedSim over sortedDistinct equals the hash-set jaccard") {
    val pairs = cases.zip(cases.drop(7) ++ cases.take(7))
      .map { case ((id, a), (_, b)) => (id, a, b) }
    val got = pairs.toDF("id", "a", "b")
      .select(col("id"),
        Sketches.jaccardSim(
          split(lower(col("a")), "\\s+"), split(lower(col("b")), "\\s+")).as("hash"),
        Sketches.jaccardSortedSim(
          Sketches.sortedDistinct(split(lower(col("a")), "\\s+")),
          Sketches.sortedDistinct(split(lower(col("b")), "\\s+"))).as("merge"))
      .as[(Long, Double, Double)].collect()
    got.foreach { case (id, h, m) =>
      assert((h.isNaN && m.isNaN) || h == m, s"id=$id: hash=$h merge=$m")
    }
    // null elements: array_distinct keeps one null, sort_array puts it
    // first; the null slot must count as one shared distinct value, as
    // the hash-set kernel treats it — never NPE
    val withNull = spark.range(1).select(
      Sketches.jaccardSortedSim(
        Sketches.sortedDistinct(array(lit("a"), lit(null).cast("string"), lit("b"))),
        Sketches.sortedDistinct(array(lit(null).cast("string"), lit("b"), lit("c"))))
        .as("j"),
      Sketches.jaccardSim(
        array(lit("a"), lit(null).cast("string"), lit("b")),
        array(lit(null).cast("string"), lit("b"), lit("c"))).as("h"))
      .collect()(0)
    assert(withNull.getDouble(0) == withNull.getDouble(1))
    assert(withNull.getDouble(0) == 2.0 / 4.0)   // {null,b} of {null,a,b,c}
  }

  test("containmentSortedSim equals set-based |A∩B|/|B| over fuzzed pairs") {
    val pairs = cases.zip(cases.drop(5) ++ cases.take(5))
      .map { case ((id, a), (_, b)) => (id, a, b) }
    val got = pairs.toDF("id", "a", "b")
      .select(col("id"),
        Sketches.containmentSortedSim(
          Sketches.sortedDistinct(split(lower(col("a")), "\\s+")),
          Sketches.sortedDistinct(split(lower(col("b")), "\\s+"))).as("c"))
      .as[(Long, Double)].collect().toMap
    pairs.foreach { case (id, a, b) =>
      val sa = a.toLowerCase.split("\\s+", -1).toSet
      val sb = b.toLowerCase.split("\\s+", -1).toSet
      val expect = if (sb.isEmpty) 0.0 else sa.intersect(sb).size.toDouble / sb.size
      assert(got(id) == expect, s"id=$id")
    }
    // a full quote inside a longer doc: containment 1, jaccard far below
    val r = spark.range(1).select(
      Sketches.containmentSortedSim(
        Sketches.sortedDistinct(split(lit("the quick brown fox jumps over lazy dogs daily"), " ")),
        Sketches.sortedDistinct(split(lit("quick brown fox"), " "))).as("c"))
      .collect()(0)
    assert(r.getDouble(0) == 1.0)
    // empty query side: defined 0.0, never NaN
    val z = spark.range(1).select(
      Sketches.containmentSortedSim(
        Sketches.sortedDistinct(split(lit("a b"), " ")),
        array().cast("array<string>")).as("c")).collect()(0)
    assert(z.getDouble(0) == 0.0)
  }

  test("HTML selector codegen survives quote/backslash patterns") {
    // the selector strings ship as codegen reference objects; a pattern
    // with '"' or '\' must neither break compilation of the generated
    // Java (the old string-interpolation path did) nor change matching
    val html = """<div class="a&quot;b">quoted</div><div>He said "hi\there"</div>"""
    val df = Seq((1L, html)).toDF("id", "x").repartition(1) // force a codegen stage
    val out = df.select(
      HtmlCols.tagText(col("x"), "div", "class", "a\"b|a&quot;b").as("t1"),
      HtmlCols.byTextText(col("x"), "div", """.*"hi\\there".*""").as("t2"))
      .collect()(0)
    assert(out.getString(0) == "quoted")
    assert(out.getString(1) == "He said \"hi\\there\"")
  }

  test("shingleMd5Bounds equals min/max over md5'd charShingles on fuzzed input") {
    val got = cases.toDF("id", "text")
      .select(col("id"), Sketches.shingleMd5Bounds(col("text"), 8).as("b"))
      .select(col("id"), col("b.n_grams"), col("b.min_md5"), col("b.max_md5"))
      .as[(Long, Long, String, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // independent formulation: the declarative shingle array + HOF fold
    val ref = cases.toDF("id", "text")
      .select(col("id"), Sketches.charShingles(col("text"), 8).as("sh"))
      .select(col("id"), size(col("sh")).cast("long"),
        array_min(transform(col("sh"), g => md5(g))),
        array_max(transform(col("sh"), g => md5(g))))
      .as[(Long, Long, String, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    cases.foreach { case (id, text) =>
      assert(got(id) == ref(id), s"id=$id text=${text.take(40)}") }
    // empty text: one whole-text shingle, md5('')
    val e = Seq((0L, "")).toDF("id", "text")
      .select(Sketches.shingleMd5Bounds(col("text"), 8).as("b"))
      .select(col("b.n_grams"), col("b.min_md5")).as[(Long, String)].head()
    assert(e == ((1L, "d41d8cd98f00b204e9800998ecf8427e")))
  }

  test("gopherSignals matches a plain-Scala reference over fuzzed text") {
    import org.apache.spark.sql.Row
    // alphabet biased toward the signal characters: bullets, ellipsis
    // dots, hashes, newlines, mixed whitespace, stop words
    val gAlphabet = Vector("a", "b", "the", "and", "1", "#", ".", "-", "*", "•",
      "\n", " ", "\t", "é", "漢", "...", "to ", "of\n", "- x\n", "c... \n")
    def randText(): String = {
      val n = rng.nextInt(30)
      (0 until n).map(_ => gAlphabet(rng.nextInt(gAlphabet.size))).mkString
    }
    val texts = (0 until 300).map(i => (i.toLong, randText()))
    val stop8 = Set("the", "be", "to", "of", "and", "that", "have", "with")
    def countSub(s: String, sub: String): Long = {
      var c = 0L; var i = s.indexOf(sub)
      while (i >= 0) { c += 1; i = s.indexOf(sub, i + sub.length) }
      c
    }
    // Spark's trim strips SPACES only — Scala's .trim strips every
    // char <= 0x20 and would disagree on tab/newline-padded text
    def sparkTrim(s: String): String =
      s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    def ref(text: String): Seq[Long] = {
      val tokens = sparkTrim(text).toLowerCase.split("[ \t\n\f\r]+", -1).toSeq
      val n = tokens.length.toLong
      val sumLen = tokens.map(t => t.codePointCount(0, t.length).toLong).sum
      val nAlpha = tokens.count(_.exists(c => c >= 'a' && c <= 'z')).toLong
      val nStop = stop8.count(tokens.contains).toLong
      val nHash = text.count(_ == '#').toLong
      val nEll = countSub(text, "...")
      val lines = text.split("\n", -1).toSeq
      val nLines = lines.length.toLong
      val nBullet = lines.count { l =>
        val t = l.dropWhile(_ == ' ')
        t.nonEmpty && "-*•".contains(t.head)
      }.toLong
      val nEllLine = lines.count(_.reverse.dropWhile(_ == ' ').startsWith("...")).toLong
      val pass = if (n >= 50 && n <= 100000 && 3 * n <= sumLen && sumLen <= 10 * n &&
        10 * (nHash + nEll) < n && 5 * nAlpha >= 4 * n && nStop >= 2) 1L else 0L
      Seq(n, sumLen, nAlpha, nStop, nHash, nEll, nLines, nBullet, nEllLine, pass)
    }
    val got = texts.toDF("id", "text")
      .select(col("id"), graft.operators.TextAnalysis.gopherSignals(col("text")).as("g"))
      .select(col("id"), col("g.*")).collect()
      .map(r => r.getLong(0) -> (1 to 10).map(i => r.getLong(i)).toSeq).toMap
    texts.foreach { case (id, text) =>
      assert(got(id) == ref(text),
        s"id=$id text=${text.replace("\n", "\\n").take(60)}\n got=${got(id)}\n ref=${ref(text)}")
    }
    // pin the trim subtlety directly: trim keeps the leading tab, the
    // class split then yields a LEADING EMPTY token — n = 2, not 1
    val Row(hardN: Long) = texts.toDF("id", "text").limit(1)
      .select(graft.operators.TextAnalysis.gopherSignals(lit("\tx")).getField("n_tokens"))
      .collect()(0)
    assert(hardN == 2L)
  }

  test("countInSet and sumStrLen match references over fuzzed tokens") {
    val words = Set("the", "a", "0", "xyz", "é")
    val got = cases.toDF("id", "text")
      .select(col("id"),
        Sketches.countInSet(split(lower(col("text")), "\\s+"), words.toSeq).as("c"),
        Sketches.sumStrLen(split(lower(col("text")), "\\s+")).as("s"))
      .as[(Long, Int, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    cases.foreach { case (id, text) =>
      val tokens = text.toLowerCase.split("\\s+", -1).toSeq
      assert(got(id)._1 == refCountInSet(tokens, words), s"count id=$id")
      assert(got(id)._2 == refSumLen(tokens), s"len id=$id")
    }
  }

  test("UrlUtil kernel matches the regexp reference chain over fuzzed URL-ish strings") {
    // URL metacharacters heavily over-weighted so every branch of the
    // parser (scheme run, ://, host/port, path slashes, ?, &, =, #,
    // www., utm_ names, case) is hit in combination
    val urlAlphabet: Vector[String] =
      ("abzAZ09" + ":/?#&=.-+_%wWuUtTmMrRefé").map(_.toString).toVector
    def randUrlish(): String = {
      val prefix = rng.nextInt(6) match {
        case 0 => "https://" case 1 => "HTTP://www." case 2 => "http://"
        case 3 => "ftp://"   case 4 => ""            case 5 => "hx+p://WWW."
      }
      val n = rng.nextInt(40)
      val sb = new StringBuilder(prefix)
      (0 until n).foreach(_ => sb.append(urlAlphabet(rng.nextInt(urlAlphabet.size))))
      sb.toString
    }
    val urls = (0 until 2000).map(i => (i.toLong, randUrlish()))
    val diff = urls.toDF("id", "url")
      .select(col("id"), col("url"),
        graft.functions.Urls.normalizeUrl(col("url")).as("k"),
        graft.operators.Dedup.urlNormalizeReference(col("url")).as("r"))
      .filter(col("k") =!= col("r"))
      .collect()
    assert(diff.isEmpty, diff.take(5).map(r =>
      s"url='${r.getString(1)}' kernel='${r.getString(2)}' ref='${r.getString(3)}'")
      .mkString("\n"))
  }

  test("BPE subCount matches a naive regex+fold reference over fuzzed words and merges") {
    // naive reference: regex pre-tokenizer + an O(n³) merge fold that
    // rescans from scratch after every single fusion
    def refPre(s: String): Seq[String] =
      "[a-z]+|[0-9]+|[^a-z0-9\\s]".r.findAllIn(s.toLowerCase).toSeq
    def refSub(word: String, merges: Seq[(String, String)]): Int = {
      val rank = merges.zipWithIndex.toMap
      var syms = word.map(String.valueOf(_)).toVector
      var done = false
      while (!done && syms.length > 1) {
        val best = syms.zip(syms.tail).flatMap(p => rank.get(p).map(r => (r, p)))
          .sortBy(_._1).headOption
        best match {
          case None => done = true
          case Some((_, (a, b))) =>
            // fuse all occurrences left-to-right without overlap
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
                out += (a + b); i += 2
              } else { out += syms(i); i += 1 }
            }
            syms = out.result()
        }
      }
      syms.length
    }
    val bpeAlpha = "ab01.".toSeq.map(String.valueOf(_))
    (1 to 400).foreach { _ =>
      // random merge table over 1-2 char symbols of the tiny alphabet
      val syms = bpeAlpha ++ Seq("aa", "ab", "ba", "bb", "a0", "0a", "01")
      val shuffler = new scala.util.Random(rng.nextLong())
      val merges = shuffler.shuffle(
        (for (a <- syms; b <- syms) yield (a, b)).toVector).take(rng.nextInt(8))
      val flat = merges.iterator.flatMap(p => Iterator(p._1, p._2)).toArray
      val text = (0 until rng.nextInt(20)).map(_ =>
        bpeAlpha(rng.nextInt(bpeAlpha.size))).mkString ++ " " ++ randString()
      val gotPre = BpeUtil.preTokens(text)
      val refToks = refPre(text)
      assert(gotPre.size == refToks.size, s"pretokens differ on '$text'")
      refToks.foreach { w =>
        assert(BpeUtil.subCount(w, flat) == refSub(w, merges),
          s"word='$w' merges=$merges")
      }
    }
  }
}
