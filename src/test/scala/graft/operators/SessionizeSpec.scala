package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class SessionizeSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val gapUs = 10L * 1000 * 1000 // 10 s

  // user 1: two sessions (gap of 30s between t=20s and t=50s);
  // user 2: one session; boundary case: exactly-gap spacing stays inside
  lazy val events = Seq(
    (1L, 1L, 0L), (2L, 1L, 5L), (3L, 1L, 20L),
    (4L, 1L, 50L), (5L, 1L, 60L),  // 50->60 is exactly the gap: same session
    (6L, 2L, 7L)
  ).map { case (id, u, sec) => (id, u, sec * 1000000L) }
    .toDF("event_id", "user_id", "ts_us")
    .withColumn("ts", timestamp_micros(col("ts_us")))

  test("assign numbers sessions per user, strictly-greater gap splits") {
    val got = Sessionize.assign(events, "user_id", "ts", "event_id", gapUs)
      .select("event_id", "session_no").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 3L, 6L -> 1L))
  }

  test("sessions rolls up counts and durations") {
    val got = Sessionize.sessions(events, "user_id", "ts", "event_id", gapUs)
      .orderBy("user_id", "session_no")
      .select("user_id", "session_no", "n_events", "duration_us")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 2L, 5000000L), (1L, 2L, 1L, 0L), (1L, 3L, 2L, 10000000L),
      (2L, 1L, 1L, 0L)))
  }

  test("one exchange in the plan: both windows share the shuffle") {
    val plan = Sessionize.sessions(events, "user_id", "ts", "event_id", gapUs)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"expected the windows+agg to share shuffles:\n$plan")
  }
}
