package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.core.Tables.t
import graft.operators.Sessionize

class SessionStreamSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val gapUs = 30L * 60 * 1000 * 1000

  test("straggler merge: session end never moves backward, timeout stays above watermark") {
    // Regression for the out-of-order straggler fix in SessionStream.fold:
    // flatMapGroupsWithState does NOT drop late rows for us, so a
    // pre-watermark event re-delivered in a later micro-batch can carry
    // ts_us < state.last_us. Pre-fix, the merge overwrote last_us with
    // the straggler's (earlier) timestamp — the session end moved
    // BACKWARD and the recomputed timeout (straggler + gap) could land
    // at/below the watermark, which Spark rejects with an
    // IllegalArgumentException that kills the query.
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val t0 = 10_000_000_000_000L                    // session start, us epoch
    val t1 = t0 + 5L * 60 * 1000 * 1000            // session last event
    val straggler = t0 - 60L * 1000 * 1000         // pre-start straggler, within gap
    // watermark already past last+gap: the naive straggler+gap timeout is below it
    val wmMs = t1 / 1000 + gapUs / 1000 + 60_000L
    val state = TestGroupState.create[SessionStream.OpenSession](
      org.apache.spark.api.java.Optional.of(SessionStream.OpenSession(t0, t1, 5L)),
      GroupStateTimeout.EventTimeTimeout, 0L,
      org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(wmMs)), false)
    val out = SessionStream.fold(7L,
      Iterator(SessionStream.Ev(7L, straggler, new java.sql.Timestamp(straggler / 1000))),
      state, gapUs).toSeq
    assert(out.isEmpty, "straggler within gap must not close the session")
    val merged = state.get
    assert(merged.last_us == t1, "session end moved backward on straggler merge")
    assert(merged.start_us == straggler, "session start must absorb an earlier straggler")
    assert(merged.n == 6L)
    assert(state.getTimeoutTimestampMs.isPresent)
    assert(state.getTimeoutTimestampMs.get > wmMs,
      s"timeout ${state.getTimeoutTimestampMs.get} not above watermark $wmMs — " +
        "Spark rejects it and the query dies")
  }

  test("streamed closed sessions match the batch operator exactly") {
    // the streaming file source wants a directory, not a single file
    val streamDir = java.nio.file.Files.createTempDirectory("graft_sessions")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val q = SessionStream.run(spark, streamDir.toString, "sessions_out", gapUs)
    q.awaitTermination()

    // The stream emits every session that CLOSED: either a later event
    // opened the next session (in-batch gap) or its event-time timeout
    // fired once the watermark passed last+gap during the drain. A
    // user's final session may thus be emitted (timed out) or not
    // (still open when input ended) — both are correct. Per user the
    // streamed sessions must equal the batch truth, or the truth minus
    // exactly its final session.
    val truth = Sessionize
      .sessions(t(spark, dir, "events"), "user_id", "ts", "event_id", gapUs)
      .orderBy("user_id", "session_no")
      .select("user_id", "session_no", "n_events", "duration_us")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(s => (s._3, s._4)).toSeq).toMap

    val streamed = spark.table("sessions_out")
      .select(col("user_id"), col("start_us"), col("n_events"),
        (col("end_us") - col("start_us")).as("duration_us"))
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(s => (s._3, s._4)).toSeq).toMap

    assert(streamed.nonEmpty, "stream emitted no sessions")
    assert(streamed.keySet == truth.keySet)
    var fullyEmitted = 0
    truth.foreach { case (user, sessions) =>
      val got = streamed(user)
      if (got == sessions) fullyEmitted += 1
      else assert(got == sessions.dropRight(1),
        s"user $user: streamed $got vs batch $sessions")
    }
    assert(fullyEmitted > 0, "no final session ever timed out — timeout path untested")
  }

  test("built-in session_window twin equals batch islands (>= split) on the sealed region") {
    val dir = "/root/testdata/sf0.001"
    val streamDir = java.nio.file.Files.createTempDirectory("graft_sess_native")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    SessionStream.runNative(spark, streamDir.toString, "sessions_native")
      .awaitTermination()
    val gapUs = 30L * 60 * 1000 * 1000
    val e = graft.core.Tables.t(spark, dir, "events")
    val maxUs = e.agg(max(unix_micros(col("ts")))).as[Long].head()
    val sealedUs = maxUs - 3600L * 1000000

    val streamed = spark.table("sessions_native")
      .filter(col("end_us") + gapUs + 1000000L <= sealedUs)
      .select("user_id", "start_us", "end_us", "n_events")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq

    // batch truth with session_window's half-open split rule (diff >= gap)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val batch = e.select(col("user_id"), col("ts"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("new_s",
        when(lag(col("us"), 1).over(w).isNull ||
          col("us") - lag(col("us"), 1).over(w) >= gapUs, 1).otherwise(0))
      .withColumn("session_no", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_no")
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"),
        count(lit(1)).as("n_events"))
      .filter(col("end_us") + gapUs + 1000000L <= sealedUs)
      .select("user_id", "start_us", "end_us", "n_events")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq

    assert(streamed.nonEmpty, "native session stream emitted nothing in the sealed region")
    assert(streamed == batch)
  }
}
