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

  test("analyze projection over the documents table") {
    val out = TextAnalysis.analyze(
      graft.core.Tables.t(spark, "/root/testdata/sf0.001", "documents"), "doc_id", "text")
    assert(out.count() > 0)
    assert(out.columns.toSeq == Seq("doc_id", "n_tokens_ws", "n_tokens_bpe",
      "quality", "pred_lang", "fingerprint"))
  }
}
