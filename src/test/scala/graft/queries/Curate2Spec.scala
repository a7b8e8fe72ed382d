package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.core.Tables.t

/** Structural invariants of the capstone-2 composition (the value-level
  * equality vs an independent engine is the driver's DuckDB gate; these
  * pin the cross-stage bookkeeping the hash can't explain when it
  * breaks).
  */
class Curate2Spec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val out = Extensions.corpusCurate2(spark, dir)
    .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("every row is a declared split and train is non-degenerate") {
    val splits = out.map(_._1).toSet
    assert(splits.subsetOf(Extensions.corpusSplitSpec.map(_._1).toSet))
    val train = out.find(_._1 == "train")
    assert(train.exists(_._2 > 0), s"no surviving train docs: ${out.toSeq}")
  }

  test("doc counts: gated and deduped totals reconcile with the stages run standalone") {
    val tk = split(trim(col("text")), graft.operators.TextAnalysis.WsClass)
    val lined = t(spark, dir, "documents").select(col("doc_id"),
      concat_ws("\n", transform(
        sequence(lit(0), ceil(size(tk) / lit(10.0)).cast("int") - 1),
        i => concat_ws(" ", slice(tk, i * lit(10) + lit(1), lit(10))))).as("text"))
    val gated = graft.operators.LineDedup.cleanLines(lined, "doc_id", "text", maxDocDf = 2)
      .filter(graft.operators.TextAnalysis.tokenCountWs(col("clean_text")) >= 16)
    val nUnique = gated.select(md5(col("clean_text"))).distinct().count()
    assert(out.map(_._2).sum == nUnique,
      s"pipeline kept ${out.map(_._2).sum} docs, standalone stages say $nUnique")
  }

  test("tokens respect the quality gate; contamination only ever hits eval splits") {
    out.foreach { case (split, nDocs, sumTokens, nContam) =>
      assert(sumTokens >= 16L * nDocs, s"$split: sum_tokens below the >=16 gate floor")
      assert(nContam <= nDocs, s"$split: more contaminated docs than docs")
      if (split == "train")
        assert(nContam == 0, "train rows cannot be in the eval contamination report")
    }
  }

  test("capstone 3: gates remove rows, mixture flattens the dominant language") {
    val dir01 = "/root/testdata/sf0.01"
    val out3 = Extensions.corpusCurate3(spark, dir01)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out3.nonEmpty)
    val total = out3.map(_._3).sum
    val docs = t(spark, dir01, "documents").count()
    assert(total < docs, "familiarity/length/dedup/mixture gates removed nothing")
    // the mixture stage flattened en toward its sqrt share: its kept
    // share must sit below its raw corpus share (~44%)
    val enShare = out3.filter(_._2 == "en").map(_._3).sum.toDouble / total
    assert(enShare < 0.40, s"en share $enShare not flattened")
    // every split is populated and token sums are consistent with docs
    assert(out3.map(_._1).distinct.sorted.toSeq == Seq("test", "train", "val"))
    assert(out3.forall { case (_, _, n, tok) => tok >= n * 16 })
  }
}
