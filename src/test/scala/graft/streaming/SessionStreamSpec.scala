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
}
