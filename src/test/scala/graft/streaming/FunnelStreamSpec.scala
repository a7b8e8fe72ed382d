package graft.streaming

import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class FunnelStreamSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ev(si: Int, us: Long) =
    FunnelStream.Ev(7L, si, us, new java.sql.Timestamp(us / 1000))

  test("fold buffers until the watermark and folds in event-time order") {
    // batch delivers click-before-view ARRIVAL order; event-time order
    // is view@1s then click@2s, and both are sealed by the watermark
    val state = TestGroupState.create[FunnelStream.FState](
      org.apache.spark.api.java.Optional.empty(),
      GroupStateTimeout.EventTimeTimeout, 0L,
      org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(10_000L)), false)
    val out = FunnelStream.fold(7L,
      Iterator(ev(1, 2_000_000L), ev(0, 1_000_000L)), state, 3).toSeq
    assert(out.map(r => (r.stage_no, r.arr_us, r.prev_us)) ==
      Seq((1, 1_000_000L, None), (2, 2_000_000L, Some(1_000_000L))))
    // stage 3 never arrived: state stays, flush timeout armed
    assert(state.exists && state.get.arr == List(1_000_000L, 2_000_000L))
    assert(state.getTimeoutTimestampMs.isPresent)
  }

  test("fold holds unsealed events; a pre-watermark straggler still folds first") {
    // watermark at 1.5s: view@1s is sealed, click@2s must wait
    val st1 = TestGroupState.create[FunnelStream.FState](
      org.apache.spark.api.java.Optional.empty(),
      GroupStateTimeout.EventTimeTimeout, 0L,
      org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(1_500L)), false)
    val out1 = FunnelStream.fold(7L,
      Iterator(ev(1, 2_000_000L), ev(0, 1_000_000L)), st1, 3).toSeq
    assert(out1.map(_.stage_no) == Seq(1))
    assert(st1.get.pending == List((1, 2_000_000L)))
    // watermark advances; a straggler view@0.5s arrives WITH the seal —
    // it must not rewrite stage 1 (reached stages are immutable), and
    // the held click now qualifies against the original arrival
    val st2 = TestGroupState.create[FunnelStream.FState](
      org.apache.spark.api.java.Optional.of(st1.get),
      GroupStateTimeout.EventTimeTimeout, 0L,
      org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(10_000L)), false)
    val out2 = FunnelStream.fold(7L, Iterator(ev(0, 500_000L)), st2, 3).toSeq
    assert(out2.map(r => (r.stage_no, r.arr_us)) == Seq((2, 2_000_000L)))
    assert(st2.get.arr == List(1_000_000L, 2_000_000L))
  }

  test("out-of-order stages within the sealed set obey strict ordering") {
    // click@1s BEFORE view@2s: the click must not count; purchase@3s
    // requires a qualifying click, so the user stops at stage 1
    val state = TestGroupState.create[FunnelStream.FState](
      org.apache.spark.api.java.Optional.empty(),
      GroupStateTimeout.EventTimeTimeout, 0L,
      org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(10_000L)), false)
    val out = FunnelStream.fold(7L,
      Iterator(ev(1, 1_000_000L), ev(0, 2_000_000L), ev(2, 3_000_000L)), state, 3).toSeq
    assert(out.map(_.stage_no) == Seq(1))
  }

  test("drained streaming report equals the batch q29 funnel exactly") {
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.queries.StreamingQueries.streamFunnel(spark, dir)
      .as[(String, Long, Option[Long])].collect().toSeq
    val batch = graft.queries.Inventory.q29Funnel(spark, dir)
      .as[(String, Long, Option[Long])].collect().toSeq
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    assert(streamed.head._2 > 0)
  }
}
