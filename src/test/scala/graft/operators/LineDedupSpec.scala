package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.core.Tables.t

class LineDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("dedupLines: boilerplate stripped, order kept, all-boilerplate doc → md5('')") {
    val docs = Seq(
      (1L, "NAV MENU\nunique first body\nCOPYRIGHT FOOTER"),
      (2L, "NAV MENU\nanother body line\nmore body\nCOPYRIGHT FOOTER"),
      (3L, "NAV MENU\nCOPYRIGHT FOOTER"),          // nothing survives
      (4L, "repeated twice\nrepeated twice\nsolo") // within-doc repeat: df=1, kept
    ).toDF("doc_id", "text")
    val out = LineDedup.dedupLines(docs, "doc_id", "text", maxDocDf = 1)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, 3L, 1L, md5hex("unique first body")),
      (2L, 4L, 2L, md5hex("another body line\nmore body")),
      (3L, 2L, 0L, md5hex("")),
      (4L, 3L, 3L, md5hex("repeated twice\nrepeated twice\nsolo"))))
  }

  test("dedupLines: maxDocDf raises the boilerplate bar") {
    val docs = Seq(
      (1L, "shared by two\na"),
      (2L, "shared by two\nb"),
      (3L, "shared by three\nc"),
      (4L, "shared by three\nd"),
      (5L, "shared by three\ne")
    ).toDF("doc_id", "text")
    // df > 2 ⇒ only the three-way line is boilerplate
    val kept = LineDedup.dedupLines(docs, "doc_id", "text", maxDocDf = 2)
      .select("doc_id", "n_kept").as[(Long, Long)].collect().toMap
    assert(kept == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("cleanLines keeps the exact surviving text; dedupLines is its md5 projection") {
    val docs = Seq(
      (1L, "keep one\nBOILER\nkeep two"),
      (2L, "BOILER\nonly mine")
    ).toDF("doc_id", "text")
    val ct = LineDedup.cleanLines(docs, "doc_id", "text", maxDocDf = 1)
      .orderBy("doc_id").select("clean_text").as[String].collect().toSeq
    assert(ct == Seq("keep one\nkeep two", "only mine"))
    val md5s = LineDedup.dedupLines(docs, "doc_id", "text", maxDocDf = 1)
      .orderBy("doc_id").select("clean_md5").as[String].collect().toSeq
    assert(md5s == ct.map(md5hex))
  }

  test("dedupLines plan: broadcast join against the boilerplate set, one content shuffle") {
    val plan = LineDedup.dedupLines(
        t(spark, "/root/testdata/sf0.001", "documents"), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"),
      plan.take(2000))
  }
}
