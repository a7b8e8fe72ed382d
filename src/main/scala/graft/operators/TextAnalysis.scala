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

  /** One-stop analysis projection over a documents table. */
  def analyze(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      tokenCountWs(col(textCol)).as("n_tokens_ws"),
      tokenCountBpe(col(textCol)).as("n_tokens_bpe"),
      qualitySignals(col(textCol)).as("quality"),
      langId(col(textCol)).as("pred_lang"),
      fingerprint(col(textCol)).as("fingerprint"))
}
