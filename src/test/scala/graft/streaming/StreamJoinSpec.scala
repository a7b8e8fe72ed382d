package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

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
}
