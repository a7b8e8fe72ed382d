package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class IntervalStreamSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("fold: long interval swallows later short ones; strict-after closes; straggler clamps") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    // empty state: [0,100) swallows [10,20); [100,...] touches end → 100 <= 100 merges
    val st0 = TestGroupState.create[IntervalStream.OpenIsland](
      org.apache.spark.api.java.Optional.empty(),
      GroupStateTimeout.EventTimeTimeout, 0L,
      org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(0L)), false)
    val out0 = IntervalStream.fold(1L, Iterator(
      IntervalStream.Iv(1L, 0L, 100L, ts(0)),
      IntervalStream.Iv(1L, 10L, 20L, ts(10)),
      IntervalStream.Iv(1L, 100L, 150L, ts(100)),
      IntervalStream.Iv(1L, 151L, 160L, ts(151))), st0).toSeq
    assert(out0 == Seq(IntervalStream.Island(1L, 0L, 150L, 3L)),
      s"got $out0")
    assert(st0.get == IntervalStream.OpenIsland(151L, 160L, 1L))

    // straggler re-delivered below the open island's start: island must
    // absorb it (min clamp) and the end never move backward
    val wmMs = 1L
    val st1 = TestGroupState.create[IntervalStream.OpenIsland](
      org.apache.spark.api.java.Optional.of(IntervalStream.OpenIsland(151L, 160L, 1L)),
      GroupStateTimeout.EventTimeTimeout, 0L,
      org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(wmMs)), false)
    val out1 = IntervalStream.fold(1L,
      Iterator(IntervalStream.Iv(1L, 149L, 155L, ts(149))), st1).toSeq
    assert(out1.isEmpty, "an overlapping straggler must not close the island")
    assert(st1.get == IntervalStream.OpenIsland(149L, 160L, 2L))
    assert(st1.getTimeoutTimestampMs.isPresent &&
      st1.getTimeoutTimestampMs.get > wmMs)

    // timeout flushes the island once the watermark passes its end
    val st2 = TestGroupState.create[IntervalStream.OpenIsland](
      org.apache.spark.api.java.Optional.of(IntervalStream.OpenIsland(149L, 160L, 2L)),
      GroupStateTimeout.EventTimeTimeout, 0L,
      org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(1L)), true)
    val out2 = IntervalStream.fold(1L, Iterator.empty, st2).toSeq
    assert(out2 == Seq(IntervalStream.Island(1L, 149L, 160L, 2L)))
    assert(!st2.exists)
  }

  test("streamed closed islands match the batch operator minus each user's last island") {
    val staged = java.nio.file.Files.createTempDirectory("interval_stream_spec")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"), staged.resolve("events.parquet"))
    val name = s"interval_spec_${System.nanoTime()}"
    IntervalStream.run(spark, staged.toString, name).awaitTermination()
    val streamed = spark.table(name)
      .select("user_id", "start_us", "end_us", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet

    val e = graft.core.Tables.t(spark, dir, "events")
    val sUs = unix_micros(col("ts"))
    val eUs = sUs + (col("event_id") % 600 + 60) * lit(1000000L)
    val batch = graft.operators.Temporal.mergeIntervals(e, "user_id", sUs, eUs, "event_id")
    // drop each user's final island — its emission depends on the
    // drain-time timeout, the same exclusion the declared query applies
    val lastNo = batch.groupBy(col("user_id")).agg(max(col("island_no")).as("mx"))
    val expected = batch.join(lastNo, Seq("user_id"))
      .filter(col("island_no") < col("mx"))
      .select(col("user_id"), col("start_us"), col("end_us"), col("n"))
      .as[(Long, Long, Long, Long)].collect().toSet

    // streamed closed islands = exactly the batch non-final islands;
    // timeout-emitted final islands (if the drain's last watermark hop
    // fired them) are the only legal surplus
    val surplus = streamed -- expected
    assert(expected.subsetOf(streamed),
      s"missing islands: ${(expected -- streamed).take(3)}")
    val finals = batch.join(lastNo, Seq("user_id"))
      .filter(col("island_no") === col("mx"))
      .select(col("user_id"), col("start_us"), col("end_us"), col("n"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(surplus.subsetOf(finals),
      s"unexpected non-final surplus: ${(surplus -- finals).take(3)}")
    assert(expected.nonEmpty)
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(staged).iterator().asScala.toSeq
      .sortBy(-_.getNameCount).foreach(p => java.nio.file.Files.deleteIfExists(p))
    spark.catalog.dropTempView(name)
  }
}
