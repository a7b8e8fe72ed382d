package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite with SparkSpec {

  /** A second session over the same SparkContext, created with the
    * extensions installed (getOrCreate would hand back the suite
    * session and silently skip injection). */
  lazy val extSession: SparkSession = {
    val orig = spark // force the shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    SparkSession.setActiveSession(orig)
    SparkSession.setDefaultSession(orig)
    s
  }

  test("all kernel functions resolve and compute from plain SQL") {
    val row = extSession.sql(
      """SELECT
        |  cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS cos,
        |  dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot,
        |  squared_dist(array(0.0d, 0.0d), array(3.0d, 4.0d)) AS sq,
        |  sign_bucket(array(1.0d, -1.0d)) AS bkt,
        |  size(minhash_sig(array(17L, 99L), 32)) AS sig_len,
        |  simhash64(array('a', 'b')) AS sh,
        |  doc_fingerprint('hello world, a doc long enough to window') AS fp,
        |  word_shingles('a b c d', 3) AS sh3,
        |  count_in_set(array('the', 'cat', 'the'), 'the', 'a') AS stops,
        |  sum_str_len(array('ab', 'cde')) AS chars,
        |  jaccard_sim(array('a', 'b'), array('b', 'c')) AS jac,
        |  containment_sorted_sim(array('a', 'b', 'c'), array('b', 'c')) AS cont,
        |  char_shingles('abcd', 3) AS cs,
        |  spelled_digits('one cat two') AS sd,
        |  quant_stats(array(1.0d, -0.5d)).q_sum AS qsum,
        |  cosine_i8(quantize_i8(array(1.0d, 0.0d)), quantize_i8(array(2.0d, 0.0d))) AS ci8,
        |  dot_i8(quantize_i8(array(1.0d, 0.0d)), quantize_i8(array(1.0d, 0.0d))) AS di8,
        |  interleave_bits(3L, 5L) AS z,
        |  hilbert_index(0L, 1L) AS h,
        |  bpe_stats('abab ab', 'a', 'b', 'ab', 'ab') AS bpe,
        |  bpe_pre_tokens('Ab1 c-d') AS pre,
        |  shingle_md5_bounds('abcd', 3).n_grams AS shb
        |""".stripMargin).collect()(0)
    assert(row.getAs[Double]("cos") == 1.0)
    assert(row.getAs[Double]("dot") == 11.0)
    assert(row.getAs[Double]("sq") == 25.0)
    assert(row.getAs[Int]("sig_len") == 32)
    assert(row.getSeq[String](row.fieldIndex("sh3")).toSeq == Seq("a b c", "b c d"))
    assert(row.getAs[Int]("stops") == 2)
    assert(row.getAs[Long]("chars") == 5L)
    assert(row.getAs[Double]("jac") == 1.0 / 3.0)
    assert(row.getAs[Double]("cont") == 1.0)   // {b,c} fully inside {a,b,c}
    assert(row.getSeq[String](row.fieldIndex("cs")).toSeq == Seq("abc", "bcd"))
    assert(row.getAs[String]("sd") == "1 cat 2")
    assert(row.getAs[Long]("qsum") == 127L - 63L)
    assert(row.getAs[Double]("ci8") == 1.0)   // same direction -> cosine 1 over codes
    assert(row.getAs[Long]("di8") == 127L * 127L)
    assert(row.getAs[Long]("z") == 39L)       // interleave(0b11, 0b101) = 0b100111
    assert(row.getAs[Long]("h") ==
      graft.functions.LayoutUtil.hilbert8(0L, 1L))
    assert(row.getSeq[Long](row.fieldIndex("bpe")).toSeq == Seq(2L, 2L))
    assert(row.getSeq[String](row.fieldIndex("pre")).toSeq ==
      Seq("ab", "1", "c", "-", "d"))
    assert(row.getAs[Long]("shb") == 2L)    // "abc", "bcd"
  }

  test("top_k aggregate works from SQL GROUP BY") {
    extSession.range(0, 100).createOrReplaceTempView("nums")
    val rows = extSession.sql(
      "SELECT id % 3 AS g, top_k(id, 2) AS t FROM nums GROUP BY 1 ORDER BY 1")
      .collect()
    assert(rows.map(r => r.getSeq[Long](1).toSeq).toSeq ==
      Seq(Seq(99L, 96L), Seq(97L, 94L), Seq(98L, 95L)))
  }

  test("doc_fingerprint honors the k argument and matches the Column API") {
    import graft.functions.Sketches
    import org.apache.spark.sql.functions._
    val text = "some document text long enough to have several windows"
    val sql = extSession.sql(
      s"SELECT doc_fingerprint('$text') AS d, doc_fingerprint('$text', 4) AS k4")
      .collect()(0)
    val col8 = extSession.range(1)
      .select(Sketches.docFingerprint(lit(text)).as("d")).collect()(0).getLong(0)
    val col4 = extSession.range(1)
      .select(Sketches.docFingerprint(lit(text), 4).as("d")).collect()(0).getLong(0)
    assert(sql.getLong(0) == col8)
    assert(sql.getLong(1) == col4)
    assert(col4 != col8, "k argument ignored — window size did not change the fingerprint")
  }

  test("SQL and Column-API formulations agree") {
    import graft.functions.{Sketches, Vecs}
    import org.apache.spark.sql.functions._
    val viaSql = extSession.sql(
      "SELECT sign_bucket(array(0.3d, -0.7d, 0.2d)) AS b, simhash64(array('x','y')) AS s")
      .collect()(0)
    val viaCol = extSession.range(1).select(
      Vecs.signBucket(array(lit(0.3), lit(-0.7), lit(0.2))).as("b"),
      Sketches.simhash64(array(lit("x"), lit("y"))).as("s"))
      .collect()(0)
    assert(viaSql.getLong(0) == viaCol.getLong(0))
    assert(viaSql.getLong(1) == viaCol.getLong(1))
  }

  test("optimizer rule strength-reduces jaccard_sim over sorted-distinct inputs") {
    // real columns — literal arrays would constant-fold before the
    // optimized plan can show the rewrite
    extSession.range(2).selectExpr("concat('a b x', id) AS s1", "concat('b c x', id) AS s2")
      .createOrReplaceTempView("jacc_t")
    val df = extSession.sql(
      """SELECT jaccard_sim(sort_array(array_distinct(split(s1, ' '))),
        |                   sort_array(array_distinct(split(s2, ' ')))) AS j,
        |       jaccard_sim(split(s1, ' '), split(s2, ' ')) AS j_raw
        |FROM jacc_t""".stripMargin)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("jaccardsortedsim"), opt)       // canonical shape rewritten
    assert(opt.contains("jaccardsim("), opt)            // raw shape left alone
    // tokens {a,b,xN} vs {b,c,xN}: |∩|=2, |∪|=4 — both kernels agree
    df.collect().foreach(r =>
      assert(r.getDouble(0) == 0.5 && r.getDouble(1) == 0.5))
    extSession.catalog.dropTempView("jacc_t")
  }

  test("normalize_url resolves from plain SQL") {
    val r = extSession.sql(
      "SELECT normalize_url('HTTPS://WWW.X.COM:443/a/?utm_source=s&id=1#f') AS n")
      .collect()(0)
    assert(r.getString(0) == "https://x.com/a?id=1")
  }
}
