package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Sketches

/** Text-analysis operators for corpus curation: token counting, quality
  * scoring, language ID, and document fingerprinting. All pure built-in
  * expressions (codegen) except the fingerprint, which is a custom
  * Catalyst expression — no UDFs, no shuffles (row-local).
  */
object TextAnalysis {

  /** The one whitespace class the tokenizing operators split on, kept
    * in sync with the DuckDB oracles (regexp_split_to_array on the same
    * class). An explicit class, not `\s`: Java's `\s` also matches
    * vertical tab (\x0B), DuckDB's RE2 `\s` does not — a document with
    * a vertical tab (or any consecutive-whitespace run, under the old
    * single-space oracle split) would silently flip the oracle row red.
    */
  val WsClass = "[ \\t\\n\\f\\r]+"

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(split(trim(text), WsClass)))

  /** BPE-ish subword unit count: letter runs, digit runs, single
    * non-alnum marks — the pre-tokenization shape most BPE vocabularies
    * assume. */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Quality signals: token count, mean token length, stopword ratio,
    * punctuation ratio, all-caps ratio. Returned as a struct. */
  def qualitySignals(text: Column): Column = {
    val tokens = split(lower(trim(text)), WsClass)
    val n = size(tokens).cast("double")
    val stop = Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for")
    val nStop = Sketches.countInSet(tokens, stop)
    val meanLen = Sketches.sumStrLen(tokens).cast("double") / n
    val punct = (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", ""))).cast("double")
    val caps = (length(text) - length(regexp_replace(text, "[A-Z]", ""))).cast("double")
    struct(
      n.cast("long").as("n_tokens"),
      meanLen.as("mean_token_len"),
      (nStop.cast("double") / n).as("stopword_ratio"),
      (punct / length(text).cast("double")).as("punct_ratio"),
      (caps / length(text).cast("double")).as("caps_ratio"))
  }

  /** Tiny per-language function-word seed lists (public common words).
    * The heuristic scores each language by function-word hits and takes
    * the argmax — the classic n-gram/stopword language-ID shape.
    */
  private val langSeeds: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "you", "that", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "se", "no", "los"),
    "fr" -> Seq("le", "de", "un", "et", "les", "en", "que", "pour", "des", "est"),
    "de" -> Seq("der", "die", "und", "in", "den", "von", "zu", "das", "mit", "ist"),
    "zh" -> Seq("的", "一", "是", "不", "了", "人", "我", "在", "有", "他"))

  /** Predicted language code, or "und" when no list scores > 0. */
  def langId(text: Column): Column = {
    val tokens = split(lower(trim(text)), WsClass)
    val scored = langSeeds.map { case (code, words) =>
      struct(Sketches.countInSet(tokens, words).as("score"),
        lit(code).as("code"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("code")).otherwise(lit("und"))
  }

  /** Rolling-hash document fingerprint (custom Catalyst expression). */
  def fingerprint(text: Column, k: Int = 8): Column = Sketches.docFingerprint(text, k)

  /** Intra-document repetition signals — the duplicate-n-gram family of
    * quality rules (boilerplate and template spam repeat tokens and
    * bigrams far above natural text): total vs distinct counts for
    * unigrams and bigrams, from the codegen'd shingle kernel. Pure
    * projection, no shuffle — the ratios (1 − distinct/total) are left
    * to the caller so the outputs stay exact integers. Note the kernel
    * tokenizer (ASCII \s incl. vertical tab, lowercased) — shingle
    * semantics, not [[WsClass]]. */
  def repetitionSignals(text: Column): Column = {
    val uni = Sketches.wordShingles(text, 1)
    val bi = Sketches.wordShingles(text, 2)
    struct(
      size(uni).cast("long").as("n_tokens"),
      size(array_distinct(uni)).cast("long").as("n_uniq_tokens"),
      size(bi).cast("long").as("n_bigrams"),
      size(array_distinct(bi)).cast("long").as("n_uniq_bigrams"))
  }

  /** PII patterns for [[redactPii]], RE2-safe by construction: no
    * backreferences or lookaround, and no alternation whose leftmost
    * match could differ between Java's leftmost-first and RE2's
    * leftmost-longest semantics — so the redaction is reproducible
    * bit-for-bit in any RE2-based engine. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** PII scrub — the redaction pass of a corpus-curation pipeline:
    * emails first, then IPv4s (each a codegen'd regexp_replace; order
    * fixed so the second pass runs over the first's output and the
    * counts are well-defined). Returns
    * struct(redacted, n_emails, n_ips). */
  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    struct(
      regexp_replace(noEmail, Ipv4Re, "<IP>").as("redacted"),
      size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(noEmail, lit(Ipv4Re), lit(0))).cast("long").as("n_ips"))
  }

  /** Per-document top-k salient terms by TF-IDF — the corpus
    * topic/quality signal of a curation pipeline. Every stage is keyed,
    * never all-pairs: (1) per-(doc, term) counts — wordcount-shaped,
    * map-side partial aggregation so the shuffle carries pre-combined
    * pairs, not raw tokens; (2) document frequency per term, derived
    * FROM (1)'s output (already one row per (doc, term) — no second
    * pass over the corpus); (3) a term-keyed join of the two — the df
    * side leaves (2) hash-partitioned by term, so only the pairs side
    * re-shuffles; (4) per-doc top-k via the bounded-heap
    * [[graft.functions.TopKAgg]] — ships ≤ k rows per doc and never
    * sorts a partition. N (corpus size) rides along as a broadcast
    * 1-row cross join, not a driver-side collect.
    *
    * Scoring is linear idf in parts-per-million,
    * `floor(tf·10^6·N / df)`, computed in doubles: IEEE *,/ are
    * correctly rounded, so ranking and values are bit-identical in any
    * engine, whereas ln-idf differs in the last ulp between libm
    * implementations and can flip ranks at exact-equality points like
    * 2·ln(a) vs ln(a²). (Pure int64 would overflow at real corpus
    * scale: tf·10^6·N passes 2^63 near 10^12 documents.) Ties break on
    * term DESCENDING — the top-k heap takes the LARGEST (score, term)
    * structs; the oracle mirrors that ordering.
    */
  /** [[topTermsTfIdf]]'s first stage, pre-materialization: per-(doc,
    * term) counts. Exposed so the scan-pruning audit can assert on THIS
    * plan — the checkpoint in [[topTermsTfIdf]] hides the tokenize scan
    * from the final query's executed plan. */
  def tfPairs(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(split(lower(trim(col(textCol))), WsClass)).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))

  /** Corpus-wide top-k n-gram frequency table — the corpus-analysis
    * staple (vocabulary/boilerplate inspection, contamination triage,
    * tokenizer training diagnostics). One hash aggregate with map-side
    * partial counts over the codegen'd [[graft.functions.WordShingles]]
    * kernel, then sort+limit — Catalyst plans TakeOrderedAndProject, so
    * the global step is O(k) per partition, never a full sort, at any
    * corpus size. Total (count DESC, gram) ordering makes the k-th
    * boundary deterministic under ties. Short-document rule is the
    * shingle kernel's: fewer than n tokens → one whole-document gram. */
  def topNgrams(df: DataFrame, textCol: String, n: Int, k: Int): DataFrame =
    df.select(explode(Sketches.wordShingles(col(textCol), n)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram")).limit(k)

  /** Corpus-familiarity score — the language-model-perplexity-shaped
    * quality signal (CCNet ranks documents by LM score; this is the
    * engine-portable integer form): how "ordinary" a document's
    * character 3-grams are in THIS corpus, as the mean document
    * frequency over the doc's trigram positions. Fluent text built
    * from common trigrams scores high; garbled/ocr-noise/off-charset
    * text scores low. Deliberately integer-exact: per-doc df SUM plus
    * a single rounded division — no log(), whose libm rounding differs
    * across engines.
    *
    * Shape at scale: the trigram projection (codegen'd
    * [[graft.functions.Sketches.charShingles]]) feeds both the df
    * aggregate and the probe side, so it is localCheckpoint'ed to scan
    * once (tfidf precedent). The df table is bounded by the OBSERVED
    * charset cubed — independent of corpus size, ~2M entries for
    * ASCII text — so the join back is normally a broadcast of a
    * dimension table and the per-doc aggregate combines map-side. But
    * "charset cubed" is NOT universally small: on a CJK-heavy corpus
    * observed distinct char-3-grams reach billions, where an
    * unconditional broadcast fails hard. So the df table is counted
    * after its own checkpoint (the count reuses the materialization
    * the join needs anyway) and the probe adaptively degrades to a
    * shuffle join above `broadcastDfLimit` — the [[Dedup.clusters]]
    * size-gated pattern. */
  def familiarity(df: DataFrame, idCol: String, textCol: String,
                  broadcastDfLimit: Long = 2_000_000L): DataFrame = {
    val tri = df.select(col(idCol), explode(Sketches.charShingles(col(textCol), 3)).as("g"))
      .localCheckpoint()
    val dfTab = tri.distinct()
      .groupBy(col("g")).agg(count(lit(1)).as("doc_df"))
      .localCheckpoint()   // materialize once: feeds the size gate AND the join
    val probe =
      if (dfTab.count() <= broadcastDfLimit) tri.join(broadcast(dfTab), "g")
      else tri.join(dfTab, "g")   // charset too rich to broadcast: shuffle both sides
    probe
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tri"), sum(col("doc_df")).as("df_sum"))
      .select(col(idCol), col("n_tri"), col("df_sum"),
        round(col("df_sum").cast("double") / col("n_tri"), 4).as("familiarity"))
  }

  /** Bigram language-model quality score — the CCNet-style "how would
    * a corpus LM rate this document" filter in engine-portable exact
    * integer form, one conditioning rung above [[familiarity]]: where
    * familiarity averages the JOINT document frequency of a doc's
    * char-3-grams, this scores each word-bigram position by the
    * CONDITIONAL probability estimate c(w₁w₂)/c(w₁) over the corpus —
    * template spam full of globally common words in unusual ORDER
    * scores low here while passing a df-based signal. Per position,
    * `p = (10⁶·c(w₁w₂)) DIV c(w₁)` (≤ 10⁶ since every w₁w₂ occurrence
    * consumes a w₁ occurrence); per document, the floored mean over its
    * bigram positions. No log() anywhere — libm rounding differs across
    * engines — so ranks and values reproduce bit-for-bit in SQL.
    * (Overflow bound: 10⁶·c(w₁w₂) passes 2⁶³ only past ~9·10¹² corpus
    * occurrences of one bigram — the tfidf scaling caveat.)
    *
    * Shape at scale: ONE tokenize pass (both shingle kernels run in the
    * same projection over the scan, then `localCheckpoint` — the count
    * tables and the probe all read the materialized arrays, never the
    * corpus again). Unigram and bigram count tables are corpus-derived
    * and unbounded in principle, so each is size-gated after its own
    * checkpoint and the probe degrades from broadcast to shuffle join
    * above `broadcastLimit` — [[familiarity]]'s adaptive pattern, per
    * table. Documents with < 2 kernel tokens have no bigram positions
    * and drop out (identically on the oracle side). */
  def lmBigramScore(df: DataFrame, idCol: String, textCol: String,
                    broadcastLimit: Long = 2_000_000L): DataFrame = {
    val base = df.select(col(idCol),
        Sketches.wordShingles(col(textCol), 1).as("uni"),
        Sketches.wordShingles(col(textCol), 2).as("bi"))
      .localCheckpoint()   // tokenize once; everything below reads arrays
    val pairs = base.filter(size(col("uni")) >= 2)
      .select(col(idCol), explode(col("bi")).as("gram"))
    val cuTab = base.select(explode(col("uni")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cu"))
      .localCheckpoint()   // materialize once: feeds the size gate AND the join
    val cbTab = pairs.groupBy(col("gram")).agg(count(lit(1)).as("cb"))
      .localCheckpoint()
    def gated(probe: DataFrame, tab: DataFrame, key: Seq[String]): DataFrame =
      if (tab.count() <= broadcastLimit) probe.join(broadcast(tab), key)
      else probe.join(tab, key)   // vocabulary too rich to broadcast
    val withCb = gated(pairs, cbTab, Seq("gram"))
      .withColumn("term", substring_index(col("gram"), " ", 1))
    gated(withCb, cuTab, Seq("term"))
      .withColumn("p", expr("(1000000 * cb) DIV cu"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p")).as("sp"))
      .select(col(idCol), col("n_bigrams"),
        expr("sp DIV n_bigrams").as("lm_score_ppm"))
  }

  /** Trigram Stupid-Backoff LM quality score (Brants et al. 2007,
    * "Large Language Models in Machine Translation" — the backoff
    * scheme built for exactly this regime: web-scale counts, no
    * held-out smoothing pass) over a TRAIN/SCORE corpus pair — the
    * held-out form [[lmBigramScore]] isn't: scoring a corpus against
    * its own counts can never miss an n-gram, so backoff would be dead
    * code; training counts on one slice and scoring another is both
    * the honest perplexity-filter shape (CCNet trains on Wikipedia,
    * scores the crawl) and what makes the backoff chain load-bearing.
    *
    * Exact scaled-integer score per trigram position (a b c), α = 0.4:
    * {{{
    *   C(abc) > 0 : p = 10⁶·C(abc)        DIV C(ab)
    *   C(bc)  > 0 : p = 4·10⁵·C(bc)       DIV C(b)     (α·10⁶)
    *   C(c)   > 0 : p = 16·10⁴·C(c)       DIV T        (α²·10⁶)
    *   else       : p = 0                               (OOV)
    * }}}
    * per-document score = Σp DIV n_trigrams — pure integers, so a SQL
    * oracle reproduces the whole chain digit for digit. Guard
    * invariants making the CASE well-defined: C(abc)>0 ⇒ ab appeared
    * in a ≥3-token train doc ⇒ C(ab)>0; C(bc)>0 ⇒ C(b)>0.
    *
    * Scale shape: three count tables keyed by the n-gram string (the
    * [[lmBigramScore]] broadcast-gate pattern — broadcast under the
    * limit, shuffle join above), the scored side exploded ONCE to
    * trigram positions with ab/bc/b/c derived by substring_index (no
    * second tokenize), T as one bounded driver scalar (the pageRank-N
    * class). Tokenization is the shingle kernel on BOTH sides,
    * whole-doc-when-short entries included in the count tables — a
    * ≤2-token entry can never collide with a real 3-token gram, and
    * mirroring the kernel exactly is what keeps the oracle honest. */
  def lmTrigramScore(train: DataFrame, score: DataFrame, idCol: String,
                     textCol: String,
                     broadcastLimit: Long = 2_000_000L): DataFrame = {
    val tBase = train.select(
        Sketches.wordShingles(col(textCol), 1).as("uni"),
        Sketches.wordShingles(col(textCol), 2).as("bi"),
        Sketches.wordShingles(col(textCol), 3).as("tri"))
      .localCheckpoint()
    val c1 = tBase.select(explode(col("uni")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1")).localCheckpoint()
    val c2 = tBase.select(explode(col("bi")).as("g2"))
      .groupBy("g2").agg(count(lit(1)).as("c2")).localCheckpoint()
    val c3 = tBase.select(explode(col("tri")).as("g3"))
      .groupBy("g3").agg(count(lit(1)).as("c3")).localCheckpoint()
    val totalT = c1.agg(coalesce(sum(col("c1")), lit(0L))).collect()(0).getLong(0)
    require(totalT > 0, "empty training slice — no counts to score against")
    // Each count table's cardinality is computed ONCE and reused across
    // the gated joins (c1 and c2 are each joined twice — recounting per
    // join would pay four extra aggregation jobs just to pick a strategy).
    val n1 = c1.count(); val n2 = c2.count(); val n3 = c3.count()
    def gated(probe: DataFrame, tab: DataFrame, key: Seq[String],
              n: Long): DataFrame =
      if (n <= broadcastLimit) probe.join(broadcast(tab), key, "left")
      else probe.join(tab, key, "left")
    val pos = score.select(col(idCol),
        Sketches.wordShingles(col(textCol), 1).as("uni"),
        Sketches.wordShingles(col(textCol), 3).as("tri"))
      .filter(size(col("uni")) >= 3)
      .select(col(idCol), explode(col("tri")).as("g3"))
      .withColumn("g2", substring_index(col("g3"), " ", 2))       // ab
      .withColumn("bc", substring_index(col("g3"), " ", -2))
      .withColumn("b", substring_index(col("bc"), " ", 1))
      .withColumn("c", substring_index(col("g3"), " ", -1))
    val j = gated(
      gated(
        gated(
          gated(pos, c3, Seq("g3"), n3),
          c2, Seq("g2"), n2),
        c2.select(col("g2").as("bc"), col("c2").as("c2bc")), Seq("bc"), n2),
      c1.select(col("w").as("b"), col("c1").as("c1b")), Seq("b"), n1)
    gated(j, c1.select(col("w").as("c"), col("c1").as("c1c")), Seq("c"), n1)
      .withColumn("p", expr(
        s"""CASE WHEN c3 IS NOT NULL THEN (1000000 * c3) DIV c2
           |     WHEN c2bc IS NOT NULL THEN (400000 * c2bc) DIV c1b
           |     WHEN c1c IS NOT NULL THEN (160000 * c1c) DIV ${totalT}L
           |     ELSE 0L END""".stripMargin))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"), sum(col("p")).as("sp"))
      .select(col(idCol), col("n_trigrams"),
        expr("sp DIV n_trigrams").as("lm3_score_ppm"))
  }

  /** Unicode-script profile — the curation filter [[langId]] can't be:
    * stopword language-ID only knows its seeded languages, while script
    * counting classifies ANY text (drop-by-script, mixed-script spam
    * detection, per-script routing). Counts per literal codepoint-range
    * class — deliberately NOT \p{Script} properties, whose definitions
    * shift across regex engines and Unicode versions; a literal range
    * means the same thing in every engine, which is what makes the
    * oracle exact. Codegen'd regexp_count over the scan; dominant
    * script via the padded-sort-key argmax (langId's trick). */
  def scriptProfile(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val classes = Seq(
      "latin" -> "[A-Za-z\\u00C0-\\u024F]",
      "han" -> "[\\u4E00-\\u9FFF]",
      "cyrillic" -> "[\\u0400-\\u04FF]",
      "arabic" -> "[\\u0600-\\u06FF]")
    val counted = classes.foldLeft(df.select(col(idCol), col(textCol))) {
      case (acc, (name, cls)) =>
        acc.withColumn(s"n_$name", regexp_count(col(textCol), lit(cls)).cast("long"))
    }
    val best = classes.map { case (name, _) =>
      format_string("%08d|%s", col(s"n_$name"), lit(name))
    }.reduce((a, b) => greatest(a, b))
    counted.select(col(idCol) +: classes.map(c => col(s"n_${c._1}")) :+
      when(substring(best, 1, 8) === "00000000", lit("none"))
        .otherwise(substring_index(best, "|", -1)).as("script"): _*)
  }

  def topTermsTfIdf(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val total = df.agg(count(lit(1)).as("n_total"))
    val pairs = tfPairs(df, idCol, textCol)
      // materialize: df-counting needs only DISTINCT (doc, term), so
      // Catalyst prunes tf out of that branch, the subtrees stop being
      // equal, and without the lineage cut the corpus would be scanned
      // and tokenized twice (once per branch) instead of once
      .localCheckpoint()
    val dfTab = pairs.groupBy(col("term")).agg(count(lit(1)).as("df"))
    pairs.join(dfTab, "term")
      .crossJoin(broadcast(total))
      .withColumn("score", (col("tf") * lit(1000000.0)) * col("n_total") / col("df"))
      .groupBy(col(idCol))
      .agg(graft.functions.TopKAgg.topK(
        struct(col("score"), col("term"), col("tf"), col("df")), k).as("top"))
      .select(col(idCol), posexplode(col("top")).as(Seq("i", "s")))
      .select(col(idCol), (col("i") + 1).cast("long").as("rank"),
        col("s.term").as("term"), col("s.tf").as("tf"), col("s.df").as("df"),
        floor(col("s.score")).cast("long").as("score_ppm"))
  }

  /** Gopher quality rules (Rae et al. 2021 §A1.1 — the public
    * format/repetition ruleset modern corpus pipelines start from) in
    * engine-portable EXACT INTEGER form: per-document counts plus the
    * gate itself, with every ratio threshold cross-multiplied into an
    * integer predicate (3 ≤ mean word len ≤ 10 → `3n ≤ Σlen ≤ 10n`,
    * symbol ratio < 0.1 → `10·(n_hash+n_ellipsis) < n`, ≥ 80% alpha
    * words → `5·n_alpha ≥ 4n`, ≥ 2 distinct stop words) — no float
    * division anywhere, so the gate bit is identical in any engine.
    * Row-local codegen projection, no shuffle. */
  def gopherSignals(text: Column): Column = {
    val tokens = split(lower(trim(text)), WsClass)
    val stop8 = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val n = size(tokens).cast("long")
    val sumLen = Sketches.sumStrLen(tokens)
    // every count below is a codegen'd regexp_count / array_contains —
    // no higher-order filter (CodegenFallback + per-row allocations)
    // anywhere in this per-document hot path. A token containing a
    // letter is exactly a start-or-separator followed by a non-ws run
    // reaching an [a-z]; WsClass spelled out so the separator set is
    // the tokenizer's, not the regex engine's \s.
    val lower0 = lower(trim(text))
    val nAlpha = regexp_count(lower0,
      lit("(^|[ \\t\\n\\f\\r])[^ \\t\\n\\f\\r]*[a-z]")).cast("long")
    val nStop = stop8.map(w => array_contains(tokens, w).cast("long"))
      .reduce(_ + _)
    val nHash = regexp_count(text, lit("#")).cast("long")
    val nEll = regexp_count(text, lit("\\.\\.\\.")).cast("long")
    // lines = newline count + 1; a bullet line starts with -, * or •
    // after leading SPACES (trim() in both engines strips spaces only,
    // so the line classes must too); an ellipsis line ends with ...
    // before trailing spaces and EOL/EOS
    val nLines = (regexp_count(text, lit("\n")) + 1).cast("long")
    val nBullet = regexp_count(text,
      lit("(^|\\n) *[-*•]")).cast("long")
    val nEllLine = regexp_count(text,
      lit("\\.\\.\\. *(\\n|$)")).cast("long")
    val pass = (n >= 50) && (n <= 100000) &&
      (lit(3L) * n <= sumLen) && (sumLen <= lit(10L) * n) &&
      (lit(10L) * (nHash + nEll) < n) &&
      (lit(5L) * nAlpha >= lit(4L) * n) && (nStop >= 2)
    struct(
      n.as("n_tokens"), sumLen.as("sum_token_len"),
      nAlpha.as("n_alpha_words"), nStop.as("n_stop_distinct"),
      nHash.as("n_hash"), nEll.as("n_ellipsis"),
      nLines.as("n_lines"), nBullet.as("n_bullet_lines"),
      nEllLine.as("n_ellipsis_lines"), pass.cast("long").as("pass"))
  }

  /** One-stop analysis projection over a documents table. */
  def analyze(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      tokenCountWs(col(textCol)).as("n_tokens_ws"),
      tokenCountBpe(col(textCol)).as("n_tokens_bpe"),
      qualitySignals(col(textCol)).as("quality"),
      langId(col(textCol)).as("pred_lang"),
      fingerprint(col(textCol)).as("fingerprint"))

  /** BM25 "more-like-this" retrieval — the lexical ranking that powers
    * retrieval-based decontamination and eval-set leakage triage (find
    * the training documents a benchmark item would retrieve), in
    * engine-portable EXACT INTEGER form. Query docs (selected by
    * `isQuery` over the id column) use their full distinct-term set as
    * the query; every other document sharing ≥1 term is scored
    *
    *   score = Σ_t idf_ppm(t) · sat_ppm(t, d) DIV 10⁶
    *
    * with the two BM25 factors (k1 = 6/5, b = 3/4) cleared to integer
    * rationals — DIV, never float division or log():
    *
    *   idf_ppm = 10⁶·(2(N−df)+1) DIV (2df+1)       — the Robertson–
    *     Spärck-Jones odds ratio with the +0.5 smoothing doubled out;
    *     the usual log() is a monotone damping of exactly this ratio,
    *     dropped so two engines can agree bit-for-bit (libm log
    *     rounding differs). Always positive, unlike log-IDF.
    *   sat_ppm = 10⁶·22·S·tf DIV (10·S·tf + 3·S + 9·dl·N)
    *     — tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) with avgdl = S/N
    *     cross-multiplied by 10·S (S = Σdl, N = docs with ≥1 token).
    *
    * i64 bounds: 10⁶·22·S·tf needs S·tf ≤ 4·10¹¹ (sf0.1: S≈2.7·10⁵,
    * tf ≤ dl ≪ 10⁴ → ~10¹⁵); idf_ppm·sat_ppm ≤ ~2.2·10¹²·(2N+1)/3 —
    * safe to N ≈ 10⁶ docs; past that lift to DECIMAL like
    * graph_pagerank_wide.
    *
    * Shape at scale: one tokenize scan (checkpointed, tfidf precedent);
    * dl attached by a window over the same id-hash shuffle the final
    * per-(query, doc) aggregate needs anyway; the query-term table and
    * the query-vocabulary-restricted df table broadcast (an eval/query
    * set is small by construction) — gated on the counted query-term
    * cardinality like [[familiarity]], degrading to shuffle joins on
    * `term` (the posting-list key) above `broadcastLimit` rather than
    * forcing an executor-OOM broadcast; corpus-wide N and S ride
    * the constant pool via a 1-row cross join. Top-k per query via
    * [[graft.functions.TopKAgg]] — O(k) per partition, never a global
    * sort. Ties: score DESC, then doc_id ASC (negated id in the
    * struct), matching the oracle's row_number order exactly. */
  def bm25MoreLikeThis(df: DataFrame, idCol: String, textCol: String,
                       isQuery: Column => Column, k: Int,
                       broadcastLimit: Long = 2_000_000L): DataFrame = {
    val pairs = tfPairs(df, idCol, textCol)
      .localCheckpoint()   // one tokenize scan feeds 4 consumers
    // loud i64-envelope guard (pcaPowerIterate precedent): one bounded
    // 1-row driver aggregate over the checkpointed pairs — non-ANSI
    // Long arithmetic would wrap SILENTLY past the documented bounds
    // while the DuckDB oracle errors, silently diverging the scores.
    // Its scalars ARE the corpus stats (group count = N, Σdl = S), so
    // they re-enter the scoring plan as LITERALS — the old second
    // stats aggregate and its per-run 1-row BroadcastExchange + cross
    // join are gone. (A doclen-aggregate + equi-join variant that also
    // removed the dl window measured SLOWER at bench scale — the extra
    // materialization and candidate-side join sort cost more than the
    // one window shuffle saves; guide §1.1's revert-to-empirical rule.)
    val env = pairs.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
      .agg(count(lit(1)), sum(col("dl")), max(col("dl"))).head()
    bm25RequireI64Envelope(env.getLong(0), env.getLong(1), env.getLong(2))
    val withDl = pairs.withColumn("dl",
      sum(col("tf")).over(org.apache.spark.sql.expressions.Window.partitionBy(col(idCol))))
    val qTerms = pairs.filter(isQuery(col(idCol)))
      .select(col(idCol).as("query_id"), col("term"))
    val dfQ = pairs.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .join(qTerms.select(col("term")).distinct(), "term")
    // one count over the checkpointed pairs decides both joins: dfQ is
    // ≤ qTerms' distinct-term cardinality, so the one gate bounds both
    val small = qTerms.count() <= broadcastLimit
    def side(t: DataFrame): DataFrame = if (small) broadcast(t) else t
    withDl.join(side(qTerms), "term")
      .filter(col(idCol) =!= col("query_id"))
      .join(side(dfQ), "term")
      .withColumn("n_docs", lit(env.getLong(0)))
      .withColumn("s_tok", lit(env.getLong(1)))
      .withColumn("idf_ppm",
        expr("(1000000 * (2 * (n_docs - df) + 1)) DIV (2 * df + 1)"))
      .withColumn("sat_ppm",
        expr("(1000000 * 22 * s_tok * tf) DIV (10 * s_tok * tf + 3 * s_tok + 9 * dl * n_docs)"))
      .withColumn("contrib", expr("(idf_ppm * sat_ppm) DIV 1000000"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("contrib")).as("bm25_ppm"), count(lit(1)).as("n_terms"))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKAgg.topK(
        struct(col("bm25_ppm"), (-col(idCol)).as("neg_id"), col("n_terms")), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("i", "s")))
      .select(col("query_id"), (col("i") + 1).cast("long").as("rank"),
        (-col("s.neg_id")).as("doc_id"), col("s.bm25_ppm").as("bm25_ppm"),
        col("s.n_terms").as("n_terms"))
  }

  /** The i64 envelope [[bm25MoreLikeThis]]'s ppm arithmetic needs (see
    * its scaladoc bounds): sat_ppm's numerator 10⁶·22·S·tf requires
    * S·max(dl) ≤ 4·10¹¹, and idf_ppm·sat_ppm ≤ 2.2·10¹²·(2N+1)
    * requires N ≤ 2·10⁶ docs. Past either, lift the ppm columns to
    * DECIMAL (the graph_pagerank_wide treatment). Factored out so the
    * guard is unit-testable without a 10¹¹-token fixture. */
  private[graft] def bm25RequireI64Envelope(nDocs: Long, sTok: Long,
                                            maxDl: Long): Unit = {
    require(nDocs <= 2_000_000L,
      s"bm25: idf_ppm*sat_ppm overflows i64 past N = 2e6 docs " +
        s"(n_docs=$nDocs); lift the ppm arithmetic to DECIMAL")
    require(sTok <= 400_000_000_000L / math.max(maxDl, 1L),
      s"bm25: 1e6*22*S*tf overflows i64 (S=$sTok, max dl=$maxDl, " +
        s"S*dl > 4e11); lift the ppm arithmetic to DECIMAL")
  }
}
