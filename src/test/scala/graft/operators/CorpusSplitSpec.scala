package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.core.Tables.t

class CorpusSplitSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"
  private val weights = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)

  test("every row assigned; proportions near weights") {
    val docs = t(spark, dir, "documents")
    val counts = CorpusSplit.split(docs, "text", weights)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    val total = counts.values.sum
    assert(total == docs.count())
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train").toDouble / total > 0.85)
    assert(counts("val").toDouble / total < 0.10)
    assert(counts("test").toDouble / total < 0.10)
  }

  test("assignment is deterministic and partition-independent") {
    val docs = t(spark, dir, "documents")
    val a = CorpusSplit.split(docs, "text", weights)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val b = CorpusSplit.split(docs.repartition(13), "text", weights)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a == b)
  }

  test("no shuffle: split is a projection over the scan") {
    val plan = CorpusSplit.split(t(spark, dir, "documents"), "text", weights)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
  }

  test("stratified sample: per-stratum fractions hold, others untouched, no shuffle") {
    val docs = t(spark, dir, "documents")
    val fractions = Map("en" -> 0.25, "zh" -> 0.5)
    val kept = CorpusSplit.sampleStratified(docs, "text", "lang", fractions)
    val keptBy = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    val allBy = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    // capped strata: kept fraction within a loose binomial band
    assert(keptBy("en").toDouble / allBy("en") > 0.15 &&
      keptBy("en").toDouble / allBy("en") < 0.35, s"en: $keptBy vs $allBy")
    assert(keptBy("zh").toDouble / allBy("zh") > 0.35 &&
      keptBy("zh").toDouble / allBy("zh") < 0.65, s"zh: $keptBy vs $allBy")
    // default fraction 1.0: untouched strata keep EVERY row (the 'g'
    // sentinel compares above any hex bucket — no 1/2^32 clip)
    for (l <- Seq("de", "es", "fr")) assert(keptBy(l) == allBy(l), l)
    // deterministic + partition-independent, like split
    val a = kept.select("doc_id").as[Long].collect().sorted.toSeq
    val b = CorpusSplit.sampleStratified(docs.repartition(13), "text", "lang", fractions)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
    // filter over the scan, no shuffle
    val plan = kept.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
  }

  test("interleave: dominant stratum capped near target, tail whole, unlisted dropped") {
    val docs = t(spark, dir, "documents")
    val shares = Seq("de" -> 0.2, "en" -> 0.2, "es" -> 0.2, "fr" -> 0.2, "zh" -> 0.2)
    val kept = CorpusSplit.interleaveToMixture(docs, "text", "lang", shares)
    val keptBy = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    val allBy = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val total = allBy.values.sum.toDouble
    // en sits above its 20% target in the fixture and gets downsampled
    // toward total*0.2 (loose binomial band around the md5 threshold)
    assert(allBy("en") > total * 0.2, s"fixture drifted: $allBy")
    assert(keptBy("en") > total * 0.1 && keptBy("en") < total * 0.3, s"$keptBy")
    // strata at/below target keep EVERY row ('g' sentinel, no clip)
    for (l <- Seq("de", "es", "fr", "zh")) assert(keptBy(l) == allBy(l), l)
    // a mixture spec is exhaustive: strata missing from it are dropped
    val only = CorpusSplit.interleaveToMixture(docs, "text", "lang", Seq("en" -> 1.0))
    assert(only.select("lang").distinct().as[String].collect().toSeq == Seq("en"))
    // deterministic and partition-independent, like the other samplers
    val a = kept.select("doc_id").as[Long].collect().sorted.toSeq
    val b = CorpusSplit.interleaveToMixture(docs.repartition(13), "text", "lang", shares)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("temperature mixture: dominant flattened toward sqrt share, tail kept whole") {
    val docs = t(spark, dir, "documents")
    val allBy = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val total = allBy.values.sum.toDouble
    val kept = CorpusSplit.mixtureByTemperature(docs, "text", "lang", sqrtDepth = 1)
    val keptBy = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    // sqrt-share targets: w_g = sqrt(n_g), share = w/Σw
    val w = allBy.map { case (l, n) => l -> math.sqrt(n.toDouble) }
    val wSum = w.values.sum
    for ((l, n) <- allBy) {
      val target = total * w(l) / wSum
      if (n <= target) assert(keptBy(l) == n, s"$l below target must keep all rows")
      else { // flattened toward target, loose binomial band around the md5 cut
        assert(keptBy(l) < n, s"$l above target must shrink")
        assert(math.abs(keptBy(l) - target) < total * 0.06,
          s"$l: kept ${keptBy(l)} vs target $target")
      }
    }
    // a sampler can only remove rows, so realized share of the dominant
    // stratum strictly falls while every tail stratum's share rises
    val keptTotal = keptBy.values.sum.toDouble
    val dominant = allBy.maxBy(_._2)._1
    assert(keptBy(dominant) / keptTotal < allBy(dominant) / total)
    // deterministic + partition-independent like the other samplers
    val a = kept.select("doc_id").as[Long].collect().sorted.toSeq
    val b = CorpusSplit.mixtureByTemperature(docs.repartition(13), "text", "lang", sqrtDepth = 1)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("reservoir: exactly k per stratum, window-rank equal, no Window in plan") {
    val docs = t(spark, dir, "documents")
    val got = CorpusSplit.reservoirPerStratum(docs, "text", "lang", "doc_id", k = 5)
    val rows = got.select("lang", "rank", "doc_id")
      .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(rows.groupBy(_._1).forall(_._2.size == 5))
    // reference: the window-rank idiom the heap replaces
    import org.apache.spark.sql.expressions.Window
    val ref = docs.select($"lang", $"doc_id", md5($"text").as("h"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("lang").orderBy($"h".desc, $"doc_id".desc)).cast("long"))
      .filter($"rank" <= 5).select("lang", "rank", "doc_id")
      .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(rows == ref)
    // partition-independent, and the plan is heap aggregation, not a sort
    val b = CorpusSplit.reservoirPerStratum(docs.repartition(13), "text", "lang", "doc_id", 5)
      .select("lang", "rank", "doc_id")
      .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(b == ref)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(1500))
  }

  test("leakage audit: content-keyed split is leak-free, id-keyed is not") {
    val rows = graft.queries.Extensions.corpusLeakage(spark, dir)
      .as[(String, Long, Long)].collect().map { case (k, a, b) => k -> ((a, b)) }.toMap
    assert(rows("by_id")._1 == 100 && rows("by_text")._1 == 100)   // 100 twins either way
    assert(rows("by_id")._2 > 0, "id-keyed twins never straddled a split — fixture degenerate")
    assert(rows("by_text")._2 == 0, "content-keyed split leaked")
  }

  test("sampling then splitting: strata stay proportional inside each split") {
    val docs = t(spark, dir, "documents")
    val sampled = CorpusSplit.sampleStratified(docs, "text", "lang", Map("en" -> 0.25))
    val split = CorpusSplit.split(sampled, "text", weights)
    // the train split of the sampled corpus still holds ~90% of it
    val n = sampled.count().toDouble
    val train = split.filter($"split" === "train").count().toDouble
    assert(train / n > 0.8 && train / n <= 1.0)
  }
}
