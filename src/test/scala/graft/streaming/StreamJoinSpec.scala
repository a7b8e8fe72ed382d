package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, unix_micros}

import graft.SparkSpec

class StreamJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("stream-stream attribution join matches the batch range join") {
    val dir = "/root/testdata/sf0.001"
    val streamDir = java.nio.file.Files.createTempDirectory("graft_sjoin")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val q = StreamJoin.attributionJoin(spark, streamDir.toString, "attr_out")
    q.awaitTermination()

    val streamed = spark.table("attr_out")
      .select("purchase_id", "view_id", "lag_us")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val batch = StreamJoin.attributionBatch(spark, dir)
      .select("purchase_id", "view_id", "lag_us")
      .as[(Long, Long, Long)].collect().sorted.toSeq

    assert(streamed.nonEmpty, "stream join emitted nothing")
    assert(streamed == batch)
  }

  test("LEFT OUTER stream-stream join: matched rows = inner join; unmatched = sealed batch leftovers") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val streamDir = java.nio.file.Files.createTempDirectory("graft_sjoin_outer")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    StreamJoin.attributionJoinOuter(spark, streamDir.toString, "attr_outer")
      .awaitTermination()
    val out = spark.table("attr_outer")

    // matched portion is exactly the inner join's pairs
    val matched = out.filter(col("view_id").isNotNull)
      .select("purchase_id", "view_id", "lag_us")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val inner = StreamJoin.attributionBatch(spark, dir)
      .select("purchase_id", "view_id", "lag_us")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(matched == inner)

    // unmatched portion: null view side, exactly once per purchase, and
    // every batch-unmatched purchase sealed by the watermark is present
    // (with a 1 s guard band around the ms-granular watermark boundary)
    val unmatched = out.filter(col("view_id").isNull)
    assert(unmatched.count() == unmatched.select("purchase_id").distinct().count())
    assert(unmatched.filter(col("lag_us").isNotNull).count() == 0)
    val e = graft.core.Tables.t(spark, dir, "events")
    val wmUs = e.filter(col("event_type").isin("view", "purchase"))
      .groupBy(col("event_type")).agg(max(unix_micros(col("ts"))).as("mx"))
      .agg(min(col("mx"))).as[Long].head() - 7200L * 1000000
    val batchUnmatched = e.filter(col("event_type") === "purchase")
      .join(StreamJoin.attributionBatch(spark, dir).select(col("purchase_id")),
        col("event_id") === col("purchase_id"), "left_anti")
      .select(col("event_id"), unix_micros(col("ts")).as("p_ts_us"))
    val mustEmit = batchUnmatched.filter(col("p_ts_us") + 1000000L <= wmUs)
      .select("event_id").as[Long].collect().toSet
    val mustNot = batchUnmatched.filter(col("p_ts_us") - 1000000L > wmUs)
      .select("event_id").as[Long].collect().toSet
    val emitted = unmatched.select("purchase_id").as[Long].collect().toSet
    assert(mustEmit.subsetOf(emitted),
      s"sealed unmatched purchases missing: ${(mustEmit -- emitted).take(5)}")
    assert(emitted.intersect(mustNot).isEmpty,
      s"unsealed purchases emitted early: ${emitted.intersect(mustNot).take(5)}")
    assert(emitted.nonEmpty, "outer join emitted no unmatched purchases")
  }

  test("windowed streaming as-of == unbounded batch as-of restricted to the window") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    // windowed as-of keeps a purchase iff SOME view lands in [p−1h, p],
    // and then its latest in-window view is the overall latest view —
    // so the unbounded as-of filtered to lag ≤ 1h is the same relation
    // (event_id, lag_us) is tie-invariant: equal-ts right rows differ in
    // view_id (streamAsof takes the min id, AsOfJoin whichever sorts
    // last) but never in lag — don't let a testdata regeneration with
    // duplicate (user, ts) views flake this
    val streamed = graft.queries.StreamingQueries.streamAsof(spark, dir)
      .select("event_id", "lag_us").as[(Long, Long)].collect().toSet
    val e = graft.core.Tables.t(spark, dir, "events")
    val batch = graft.operators.AsOfJoin.asof(
      e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts")),
      e.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id").as("view_id"),
          unix_micros(col("ts")).as("v_us")),
      Seq("user_id"), "ts", Seq("view_id", "v_us"))
      .filter(col("asof").isNotNull &&
        unix_micros(col("ts")) - col("asof.v_us") <= 3600L * 1000000)
      .select(col("event_id"),
        (unix_micros(col("ts")) - col("asof.v_us")).as("lag_us"))
      .as[(Long, Long)].collect().toSet
    assert(streamed == batch,
      s"stream-vs-batch asof diff: ${(streamed diff batch).take(3)} / ${(batch diff streamed).take(3)}")
    assert(streamed.nonEmpty)
  }
}
