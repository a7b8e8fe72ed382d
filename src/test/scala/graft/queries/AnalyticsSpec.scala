package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Brute-force cross-checks for the product-analytics queries
  * (events_retention, text_pmi) on the sf0.001 fixture — the DuckDB
  * oracle proves cross-engine hash equality; these prove the SEMANTICS
  * against an independent straight-line recomputation.
  */
class AnalyticsSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("events_retention matches a driver-side brute-force recount") {
    val got = Extensions.eventsRetention(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))

    val ud = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("user_id", "CAST(ts AS DATE) AS d")
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate)).distinct
    val cohort = ud.groupBy(_._1).map { case (u, ds) => u -> ds.map(_._2).min }
    val want = ud
      .map { case (u, d) =>
        (cohort(u).toString,
          java.time.temporal.ChronoUnit.DAYS.between(cohort(u), d), u) }
      .filter(_._2 <= 7)
      .groupBy(t => (t._1, t._2))
      .map { case ((c, o), us) => (c, o, us.map(_._3).distinct.size.toLong) }
      .toSeq.sortBy(t => (t._1, t._2))

    assert(got.toSeq == want)
    // every cohort's offset-0 row exists and counts the cohort itself
    val day0 = got.filter(_._2 == 0L).map(t => t._1 -> t._3).toMap
    cohort.groupBy(_._2).foreach { case (c, us) =>
      assert(day0(c.toString) == us.size.toLong)
    }
  }

  test("events_retention_weekly matches a driver-side brute-force recount") {
    val got = Extensions.eventsRetentionWeekly(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    val epoch = java.time.LocalDate.of(1970, 1, 1)
    val uw = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("user_id", "CAST(ts AS DATE) AS d")
      .collect().map(r => (r.getLong(0),
        java.time.temporal.ChronoUnit.DAYS.between(
          epoch, r.getDate(1).toLocalDate) / 7)).distinct
    val cohort = uw.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).min }
    val want = uw
      .map { case (u, w) => (cohort(u), w - cohort(u), u) }
      .filter(_._2 <= 8)
      .groupBy(t => (t._1, t._2))
      .map { case ((c, o), us) => (c, o, us.map(_._3).distinct.size.toLong) }
      .toSeq.sortBy(t => (t._1, t._2))

    assert(got.toSeq == want)
    // offset-0 of each cohort counts the whole cohort
    val week0 = got.filter(_._2 == 0L).map(t => t._1 -> t._3).toMap
    cohort.groupBy(_._2).foreach { case (c, us) =>
      assert(week0(c) == us.size.toLong)
    }
  }

  test("text_pmi: scores recompute exactly and the order/floor/limit hold") {
    val rows = Extensions.textPmi(spark, dir).collect()
    assert(rows.length == 50)

    // independent token/bigram census (the kernel's tokenizer: lower,
    // java-\s split, drop empties; docs with <2 tokens contribute no pair)
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val toks = texts.map(t =>
      t.toLowerCase.split("[ \\t\\n\\x0B\\f\\r]+").filter(_.nonEmpty).toSeq)
    val uni = toks.flatMap {
      case s if s.isEmpty => Seq("")   // kernel short-doc rule
      case s => s
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val bi = toks.filter(_.length >= 2)
      .flatMap(s => s.sliding(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val nUni = BigInt(uni.values.sum)
    val nBi = BigInt(bi.values.sum)

    def pmiPpm(cxy: Long, c1: Long, c2: Long): Long =
      ((BigInt(cxy) * nUni * nUni * 1000000) / (BigInt(c1) * c2 * nBi)).toLong

    rows.foreach { r =>
      val Array(w1, w2) = r.getAs[String]("gram").split(" ", 2)
      val (cxy, c1, c2) = (r.getAs[Long]("c_xy"), r.getAs[Long]("c1"), r.getAs[Long]("c2"))
      assert(cxy >= 5, s"floor violated: $w1 $w2")
      assert(cxy == bi((w1, w2)) && c1 == uni(w1) && c2 == uni(w2),
        s"census mismatch for '$w1 $w2'")
      assert(r.getAs[Long]("pmi_ppm") == pmiPpm(cxy, c1, c2))
    }
    // total (pmi DESC, gram) order, and the top-50 boundary is the true one
    val keys = rows.map(r => (-r.getAs[Long]("pmi_ppm"), r.getAs[String]("gram")))
    assert(keys.sameElements(keys.sorted))
    val all = bi.toSeq.filter(_._2 >= 5).map { case ((w1, w2), cxy) =>
      (-pmiPpm(cxy, uni(w1), uni(w2)), s"$w1 $w2")   // toSeq FIRST: ties collapse in a Map
    }.sorted.take(50)
    assert(keys.toSeq == all)
    // collocations beat chance: the top pair is over 1.0 (1e6 ppm)
    assert(rows.head.getAs[Long]("pmi_ppm") > 1000000L)
  }

  test("events_changepoint matches a driver-side brute-force CUSUM") {
    val got = Extensions.eventsChangepoint(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))

    val daily = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("CAST(ts AS DATE) AS d")
      .collect().map(_.getDate(0).toString)
      .groupBy(identity).map { case (d, v) => d -> v.size.toLong }
      .toSeq.sortBy(_._1)
    val dDays = daily.size.toLong
    val total = daily.map(_._2).sum
    val cusums = daily.map(_._2 * dDays - total)
      .scanLeft(0L)(_ + _).tail
    val mx = cusums.map(math.abs).max
    val want = daily.zip(cusums).map { case ((d, n), c) =>
      (d, n, c, if (math.abs(c) == mx) 1L else 0L) }
    assert(got.toSeq == want)
    // telescoping invariant: Σ(nᵢ·D − T) over all days is exactly T·D − D·T = 0
    assert(got.last._3 == 0L)
    assert(got.count(_._4 == 1L) >= 1)
  }

  test("stream_changepoint drain equals the batch events_changepoint bit-for-bit") {
    val batch = Extensions.eventsChangepoint(spark, dir).collect().toSeq
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))
    val drained = StreamingQueries.streamChangepoint(spark, dir).collect().toSeq
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(drained == batch)
  }

  test("corpus_token_budget matches a driver-side greedy prefix fill") {
    val got = Extensions.corpusTokenBudget(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "lang", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    // mirror the engine kernel exactly: Spark trim strips SPACES only,
    // and WsClass is [ \t\n\f\r]+ (no \x0B, unlike java \s)
    def nTok(t: String) = {
      val s = t.replaceAll("^ +| +$", "")
      if (s.isEmpty) 0L else s.split("[ \\t\\n\\f\\r]+").length.toLong
    }
    val want = docs.groupBy(_._2).toSeq.sortBy(_._1).map { case (lang, ds) =>
      var cum = 0L; var kept = 0L; var toks = 0L
      ds.sortBy(_._1).foreach { case (_, _, t) =>
        val n = nTok(t)
        cum += n
        if (cum <= 2000L) { kept += 1; toks += n }
      }
      (lang, kept, toks, toks * 1000000L / 2000L)
    }
    assert(got.toSeq == want)
    // the budget binds for every language at every shipped SF, and no
    // language overshoots it
    assert(got.forall(t => t._3 <= 2000L && t._4 <= 1000000L && t._2 >= 1L))
  }

  test("interval_join matches a driver-side all-pairs overlap scan") {
    val got = Extensions.intervalJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    // Tables.t, not raw parquet: events.ts may be TIMESTAMP_NTZ on disk
    val ev = graft.core.Tables.t(spark, dir, "events")
      .selectExpr("user_id", "event_type", "event_id", "unix_micros(ts) AS s")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    def side(tpe: String, durMod: Long, durMin: Long) = ev.filter(_._2 == tpe)
      .map { case (u, _, id, s) => (u, s, s + (id % durMod + durMin) * 1000000L) }
    val a = side("view", 10800L, 3600L).groupBy(_._1)
    val b = side("click", 9000L, 1800L).groupBy(_._1)
    val want = a.keySet.intersect(b.keySet).toSeq.sorted.flatMap { u =>
      val pairs = for {
        (_, sa, ea) <- a(u); (_, sb, eb) <- b(u)
        if sa < eb && sb < ea
      } yield math.min(ea, eb) - math.max(sa, sb)
      if (pairs.isEmpty) None
      else Some((u, pairs.size.toLong, pairs.sum))
    }
    assert(got.toSeq == want)
    assert(got.nonEmpty)   // the fixture must exercise the join at sf0.001
    // every overlap is positive and capped by the shorter side's max span
    assert(got.forall(t => t._3 > 0L && t._3 <= t._2 * 10799000000L))
  }

  test("driftReport: identical halves score TVD 0, a planted shift trips the flag") {
    import spark.implicits._
    val same = Seq(("a", 400L, 200L), ("b", 600L, 300L))
      .toDF("event_type", "n_ref", "n_cur")
    val s0 = Extensions.driftReport(same).collect()
    // scale-free: halves of different sizes but identical SHAPE → 0
    assert(s0.forall(r => r.getAs[Long]("tvd_ppm") == 0L &&
      r.getAs[Long]("drift_flag") == 0L))
    // 40/60 → 60/40 is TVD 0.2 = 200000 ppm ≥ the 5% flag line
    val shifted = Seq(("a", 400L, 600L), ("b", 600L, 400L))
      .toDF("event_type", "n_ref", "n_cur")
    val s1 = Extensions.driftReport(shifted).collect()
    assert(s1.forall(r => r.getAs[Long]("tvd_ppm") == 200000L &&
      r.getAs[Long]("drift_flag") == 1L))
    // a type present in one half only still lands one row (outer-join
    // shape exercised by the declared query; here: share 0 on one side)
    val oneSided = Seq(("a", 1000L, 0L), ("b", 0L, 1000L))
      .toDF("event_type", "n_ref", "n_cur")
    val s2 = Extensions.driftReport(oneSided).collect()
    assert(s2.length == 2 &&
      s2.forall(_.getAs[Long]("tvd_ppm") == 1000000L))
  }
}
