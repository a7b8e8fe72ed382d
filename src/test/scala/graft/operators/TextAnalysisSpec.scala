package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.Sketches

class TextAnalysisSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, input: String): T =
    Seq(input).toDF("x").select(c.as("y")).collect()(0).getAs[T](0)

  test("token counts") {
    assert(one[Int](TextAnalysis.tokenCountWs(col("x")), "one two  three") == 3)
    assert(one[Int](TextAnalysis.tokenCountWs(col("x")), "") == 0)
    assert(one[Int](TextAnalysis.tokenCountBpe(col("x")), "don't stop123") == 5)
    // don | ' | t | stop | 123
  }

  test("consecutive/mixed whitespace tokenizes as one separator (oracle parity)") {
    // the DuckDB oracles regexp-split on the same explicit class
    // (TextAnalysis.WsClass); a run of mixed whitespace is ONE separator
    // on both sides — the old single-space oracle split counted "a  b"
    // as three tokens and only matched because no fixture had a run
    assert(one[Int](TextAnalysis.tokenCountWs(col("x")), "a \t b\n\n c\r\n d") == 4)
    assert(one[Int](TextAnalysis.tokenCountWs(col("x")), "  padded   out  ") == 2)
    val q = Seq("the\t\tquick   brown\n\nfox").toDF("x")
      .select(TextAnalysis.qualitySignals(col("x")).as("q")).select("q.*").collect()(0)
    assert(q.getAs[Long]("n_tokens") == 4L)
    assert(one[String](TextAnalysis.langId(col("x")),
      "el \t perro  y \n el gato en   la casa que no se mueve") == "es")
  }

  test("lmBigramScore: closed-form conditional probabilities, short docs drop out") {
    // corpus: "a b" x2, "a c", "b" (1 token -> no bigrams), "" (empty)
    //   c(a)=3 c(b)=3 c(c)=1;  c("a b")=2  c("a c")=1
    val docs = Seq(
      (0L, "a b"), (1L, "a  b"), (2L, "a c"), (3L, "b"), (4L, " ")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmBigramScore(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    // p(a b) = 1e6*2 DIV 3 = 666666; p(a c) = 1e6*1 DIV 3 = 333333
    assert(out == Seq(
      (0L, 1L, 666666L), (1L, 1L, 666666L), (2L, 1L, 333333L)))
  }

  test("lmBigramScore: common words in unusual order score below common order") {
    // "x y" dominates the corpus; one doc reverses it — same unigrams,
    // rare bigram, lower score: the conditioning df-signals can't see
    val docs = (0L until 8L).map(i => (i, "x y")) :+ (8L, "y x")
    val out = TextAnalysis.lmBigramScore(docs.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    // c(x)=9 c(y)=9 c("x y")=8 c("y x")=1
    assert(out.take(8).forall(_._3 == 1000000L * 8 / 9))
    assert(out.last == ((8L, 1L, 1000000L / 9)))
    assert(out.last._3 < out.head._3)
  }

  test("lmTrigramScore: each backoff tier hits its closed form") {
    // train: "a b c" x3, "b c d", "d" — so
    //   T = 13 tokens; c(a)=3 c(b)=4 c(c)=4 c(d)=2
    //   c3("a b c")=3, c3("b c d")=1; c2("a b")=3, c2("b c")=4, c2("c d")=1
    //   (the 1-token train doc contributes whole-short entries "d" to
    //   the bi/trigram tables — ≤1-token strings that can never match
    //   a real 2- or 3-token gram)
    val train = (Seq.fill(3)("a b c") ++ Seq("b c d", "d")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val score = Seq(
      (100L, "a b c"),  // seen trigram:     1e6·3 DIV 3           = 1000000
      (101L, "x b c"),  // backoff to "b c": 4e5·4 DIV 4           =  400000
      (102L, "x y d"),  // backoff to "d":   16e4·2 DIV 13         =   24615
      (103L, "x y z"),  // OOV tail                                 =       0
      (104L, "a b")     // < 3 tokens: no row
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmTrigramScore(train, score, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (100L, 1L, 1000000L), (101L, 1L, 400000L),
      (102L, 1L, 24615L), (103L, 1L, 0L)))
  }

  test("lmTrigramScore: shuffle-join path (broadcastLimit 0) is answer-identical") {
    val train = Seq((0L, "a b c d a b c"), (1L, "c d a b")).toDF("doc_id", "text")
    val score = Seq((10L, "a b c x d"), (11L, "d a b")).toDF("doc_id", "text")
    val bc = TextAnalysis.lmTrigramScore(train, score, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    val sh = TextAnalysis.lmTrigramScore(train, score, "doc_id", "text",
        broadcastLimit = 0L)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(bc == sh && bc.nonEmpty)
  }

  test("lmBigramScore: shuffle-join path (broadcastLimit 0) is answer-identical") {
    val docs = Seq((0L, "a b c a b"), (1L, "c c a"), (2L, "b a")).toDF("doc_id", "text")
    val bc = TextAnalysis.lmBigramScore(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    val sh = TextAnalysis.lmBigramScore(docs, "doc_id", "text", broadcastLimit = 0L)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(bc == sh && bc.nonEmpty)
  }

  test("topTermsTfIdf: closed-form scores, term-desc tie-break, empty docs excluded") {
    // N = 5 documents (the blank one still counts toward corpus size);
    // score_ppm = tf * 1e6 * N / df, exact in int64 at this size
    val docs = Seq(
      (0L, "apple banana apple"), (1L, "banana cherry"),
      (2L, "apple date  date date"), (3L, "x y"), (4L, "   ")).toDF("doc_id", "text")
    val out = TextAnalysis.topTermsTfIdf(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank")
      .select("doc_id", "rank", "term", "tf", "df", "score_ppm")
      .as[(Long, Long, String, Long, Long, Long)].collect().toSeq
    def ppm(tf: Long, df: Long) = tf * 1000000L * 5 / df
    assert(out == Seq(
      (0L, 1L, "apple",  2L, 2L, ppm(2, 2)),
      (0L, 2L, "banana", 1L, 2L, ppm(1, 2)),
      (1L, 1L, "cherry", 1L, 1L, ppm(1, 1)),
      (1L, 2L, "banana", 1L, 2L, ppm(1, 2)),
      (2L, 1L, "date",   3L, 1L, ppm(3, 1)),
      (2L, 2L, "apple",  1L, 2L, ppm(1, 2)),
      // equal scores (same tf, df): the larger term takes rank 1 — the
      // heap orders (score, term) structs, mirrored by the oracle's
      // ORDER BY s DESC, term DESC
      (3L, 1L, "y", 1L, 1L, ppm(1, 1)),
      (3L, 2L, "x", 1L, 1L, ppm(1, 1))))
  }

  test("tfPairs scan prunes to doc_id+text (the stage the checkpoint hides)") {
    val plan = TextAnalysis.tfPairs(
        graft.core.Tables.t(spark, "/root/testdata/sf0.001", "documents"),
        "doc_id", "text")
      .queryExecution.executedPlan.toString
    val schemas = plan.linesIterator.filter(_.contains("ReadSchema:")).toSeq
    assert(schemas.nonEmpty && !schemas.exists(_.contains("lang")), schemas.mkString("\n"))
    assert(schemas.exists(_.contains("text")), schemas.mkString("\n"))
  }

  test("repetitionSignals: template spam shows collapsed distinct counts") {
    def sig(s: String) = Seq(s).toDF("x")
      .select(TextAnalysis.repetitionSignals(col("x")).as("r")).select("r.*")
      .as[(Long, Long, Long, Long)].collect()(0)
    assert(sig("a a b") == ((3L, 2L, 2L, 2L)))            // bigrams "a a","a b"
    assert(sig("spam spam spam spam") == ((4L, 1L, 3L, 1L)))
    assert(sig("all words are unique here") == ((5L, 5L, 4L, 4L)))
    assert(sig("") == ((1L, 1L, 1L, 1L)))                 // kernel: one empty shingle
  }

  test("redactPii: emails and IPv4s replaced, counted, non-PII untouched") {
    // note: single-letter TLDs (x@y.z) are NOT matched ({2,} floor)
    val r = Seq("mail a.b+c@ex.co and x@y.io, server 10.0.0.1 or 192.168.1.255; not 1.2.3 nor a@b")
      .toDF("x").select(TextAnalysis.redactPii(col("x")).as("r")).select("r.*").collect()(0)
    assert(r.getAs[String]("redacted") ==
      "mail <EMAIL> and <EMAIL>, server <IP> or <IP>; not 1.2.3 nor a@b")
    assert(r.getAs[Long]("n_emails") == 2L)
    assert(r.getAs[Long]("n_ips") == 2L)
  }

  test("quality signals") {
    val r = Seq("The quick. Brown fox!").toDF("x")
      .select(TextAnalysis.qualitySignals(col("x")).as("q")).select("q.*").collect()(0)
    assert(r.getAs[Long]("n_tokens") == 4L)
    assert(r.getAs[Double]("punct_ratio") > 0)
    assert(r.getAs[Double]("caps_ratio") > 0)
  }

  test("langId picks the dominant stopword language") {
    assert(one[String](TextAnalysis.langId(col("x")),
      "el perro y el gato en la casa que no se mueve") == "es")
    assert(one[String](TextAnalysis.langId(col("x")),
      "the cat and the dog in a house that is big") == "en")
    assert(one[String](TextAnalysis.langId(col("x")), "xyzzy plugh") == "und")
  }

  test("fingerprint: deterministic, equal for equal text") {
    // SQL-surface parity lives in GraftExtensionsSpec (the only
    // registration path)
    val fp1 = one[Long](TextAnalysis.fingerprint(col("x")), "some document text")
    val fp2 = one[Long](TextAnalysis.fingerprint(col("x")), "some document text")
    val fp3 = one[Long](TextAnalysis.fingerprint(col("x")), "different text entirely")
    assert(fp1 == fp2)
    assert(fp1 != fp3)
  }

  test("topNgrams: counts, (n DESC, gram) ordering, short-doc whole-shingle rule") {
    val docs = Seq(
      (1L, "the cat sat"),      // bigrams: "the cat", "cat sat"
      (2L, "the cat ran"),      // bigrams: "the cat", "cat ran"
      (3L, "solo")              // < 2 tokens: one whole-doc gram
    ).toDF("doc_id", "text")
    val got = TextAnalysis.topNgrams(docs, "text", n = 2, k = 3)
      .as[(String, Long)].collect().toSeq
    // "the cat" ×2 first; then count-1 grams in lexicographic order
    assert(got == Seq(("the cat", 2L), ("cat ran", 1L), ("cat sat", 1L)))
  }

  test("topNgrams plans TakeOrderedAndProject, never a global sort") {
    val plan = TextAnalysis.topNgrams(
        graft.core.Tables.t(spark, "/root/testdata/sf0.001", "documents"),
        "text", n = 2, k = 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
    assert(!plan.contains("Sort "), plan.take(1500))
  }

  test("analyze projection over the documents table") {
    val out = TextAnalysis.analyze(
      graft.core.Tables.t(spark, "/root/testdata/sf0.001", "documents"), "doc_id", "text")
    assert(out.count() > 0)
    assert(out.columns.toSeq == Seq("doc_id", "n_tokens_ws", "n_tokens_bpe",
      "quality", "pred_lang", "fingerprint"))
  }

  test("script profile: counts per range class, dominant argmax, ties break lexicographically") {
    val docs = Seq(
      (1L, "hello wörld"),        // latin incl. Latin-Extended ö
      (2L, "漢字漢字 ab"),          // han dominant over 2 latin
      (3L, "мир и abc"),          // cyrillic 4 vs latin 3
      (4L, "مرحبا"),              // arabic only
      (5L, "12345 !!!"),          // no script chars at all
      (6L, "ab 漢字")              // 2 vs 2 tie → 'han' < 'latin' loses: padded
    ).toDF("doc_id", "text")
    val got = TextAnalysis.scriptProfile(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 10L, 0L, 0L, 0L, "latin"),
      (2L, 2L, 4L, 0L, 0L, "han"),
      (3L, 3L, 0L, 4L, 0L, "cyrillic"),
      (4L, 0L, 0L, 0L, 5L, "arabic"),
      (5L, 0L, 0L, 0L, 0L, "none"),
      (6L, 2L, 2L, 0L, 0L, "latin")), got.toString) // tie → lexicographically larger name
  }

  test("compression ratio: repetitive << prose << noise, deterministic, codegen'd") {
    import graft.functions.Compress
    val rep = "spam spam spam spam " * 50
    val prose = "the quick brown fox jumps over the lazy dog and keeps going " * 16
    val noise = new scala.util.Random(7).alphanumeric.take(1000).mkString
    val rows = Seq((1L, rep), (2L, prose), (3L, noise)).toDF("doc_id", "text")
      .select($"doc_id", (Compress.deflateLen($"text").cast("double") /
        octet_length($"text")).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(rows(1L) < rows(2L) && rows(2L) < rows(3L), rows.toString)
    assert(rows(1L) < 0.1 && rows(3L) > 0.5)
    // stable across invocations (thread-local deflater reuse must not leak state)
    val again = Seq((1L, rep)).toDF("doc_id", "text")
      .select(Compress.deflateLen($"text")).as[Long].head()
    val first = Seq((1L, rep)).toDF("doc_id", "text")
      .select(Compress.deflateLen($"text")).as[Long].head()
    assert(again == first)
  }

  test("familiarity: exact integer df sums on a fixture; junk scores below fluent text") {
    // "abcd" trigrams: abc, bcd; "abce": abc, bce; "zq": whole-text shingle
    val docs = Seq((1L, "abcd"), (2L, "abce"), (3L, "zq")).toDF("doc_id", "text")
    val got = TextAnalysis.familiarity(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    // df: abc→2, bcd→1, bce→1, zq→1
    assert(got == Seq(
      (1L, 2L, 3L, 1.5),   // abc(2) + bcd(1)
      (2L, 2L, 3L, 1.5),   // abc(2) + bce(1)
      (3L, 1L, 1L, 1.0)))  // zq(1)
    // corpus-level sanity: shuffled-alphabet junk is less familiar than
    // the fluent corpus median
    val corpus = graft.core.Tables.t(spark, "/root/testdata/sf0.01", "documents")
      .select($"doc_id", $"text")
    val junk = Seq((100000L, "xq zvkw qjzx wvqk zzxj qkwv")).toDF("doc_id", "text")
    val scores = TextAnalysis.familiarity(corpus.union(junk), "doc_id", "text")
      .select($"doc_id", $"familiarity").as[(Long, Double)].collect().toMap
    val real = scores.filter(_._1 != 100000L).values.toSeq.sorted
    assert(scores(100000L) < real(real.size / 2),
      s"junk ${scores(100000L)} vs median ${real(real.size / 2)}")
  }

  test("familiarity: shuffle-join fallback (broadcastDfLimit=0) ≡ broadcast path") {
    // the CJK-scale degradation path: force the size gate to reject the
    // broadcast and assert value equality with the default plan
    val docs = Seq((1L, "abcd"), (2L, "abce"), (3L, "zq"),
      (4L, "the cat sat"), (5L, "the cat spat")).toDF("doc_id", "text")
    val bc = TextAnalysis.familiarity(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    val sh = TextAnalysis.familiarity(docs, "doc_id", "text", broadcastDfLimit = 0L)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(sh == bc)
    // and the fallback genuinely dropped the broadcast HINT (Spark may
    // still auto-broadcast a small table — that's fine; what must go is
    // the unconditional force)
    def hinted(limit: Long) = TextAnalysis
      .familiarity(docs, "doc_id", "text", broadcastDfLimit = limit)
      .queryExecution.optimizedPlan.toString.contains("strategy=broadcast")
    assert(hinted(Long.MaxValue) && !hinted(0L))
  }

  test("bm25MoreLikeThis: shuffle-join fallback (broadcastLimit=0) ≡ broadcast path") {
    // past `broadcastLimit` query terms the query-term and df tables
    // must degrade to shuffle joins on `term` instead of forcing an
    // executor-OOM broadcast; both regimes must score identically
    val docs = Seq(
      (0L, "the cat sat on the mat"),      // query (0 % 2 == 0 below)
      (1L, "the cat spat"), (2L, "a dog ran"), (3L, "the mat sat flat"),
      (4L, "cat cat cat mat"), (5L, "unrelated words entirely here")
    ).toDF("doc_id", "text")
    def run(limit: Long) = TextAnalysis
      .bm25MoreLikeThis(docs, "doc_id", "text", id => id === 0L, k = 3,
        broadcastLimit = limit)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val bc = run(Long.MaxValue)
    val sh = run(0L)
    assert(sh == bc && bc.nonEmpty)
    // ranked by shared-term weight: doc 4 (tf-heavy cat+mat) and doc 3
    // (mat+sat+the) must beat doc 2 (zero shared terms — absent)
    assert(!bc.exists(_._3 == 2L) && !bc.exists(_._3 == 5L))
    // and the fallback really dropped the forced posting-join broadcast
    // hints: the corpus stats ride as LITERALS now (the envelope guard
    // already collects them — no 1-row crossJoin), so the broadcast
    // regime carries the two posting-side hints (qTerms, dfQ) and the
    // fallback carries none
    def hints(limit: Long) = "strategy=broadcast".r.findAllIn(TextAnalysis
      .bm25MoreLikeThis(docs, "doc_id", "text", id => id === 0L, k = 3,
        broadcastLimit = limit)
      .queryExecution.optimizedPlan.toString).size
    assert(hints(Long.MaxValue) >= 2 && hints(0L) == 0)
  }

  test("bm25 i64 envelope: past the documented bounds the guard fails loudly") {
    // the pcaPowerIterate treatment: the scaladoc bounds are enforced,
    // not prose — non-ANSI Long arith would wrap silently past them
    // while the DuckDB oracle errors, silently diverging the scores
    TextAnalysis.bm25RequireI64Envelope(2_000_000L, 400_000_000L, 1000L) // at both bounds: fine
    val eN = intercept[IllegalArgumentException](
      TextAnalysis.bm25RequireI64Envelope(2_000_001L, 1000L, 10L))
    assert(eN.getMessage.contains("overflows"))
    val eS = intercept[IllegalArgumentException](
      TextAnalysis.bm25RequireI64Envelope(1000L, 400_000_000_001L, 1000L))
    assert(eS.getMessage.contains("overflows"))
    // the declared-query fixture must sit comfortably inside the envelope
    val env = TextAnalysis
      .tfPairs(graft.core.Tables.t(spark, "/root/testdata/sf0.01", "documents"),
        "doc_id", "text")
      .groupBy($"doc_id").agg(sum($"tf").as("dl"))
      .agg(count(lit(1)), sum($"dl"), max($"dl")).head()
    TextAnalysis.bm25RequireI64Envelope(env.getLong(0), env.getLong(1), env.getLong(2))
  }
}
