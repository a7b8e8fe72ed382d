package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.TimestampType
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Contract: whatever physical type the driver writes `events.ts` in
  * (it has already changed once between rounds: TIMESTAMP(NANOS) →
  * TIMESTAMP(MICROS, NTZ)), both the batch reader and the streaming
  * source must surface exactly `ts: TimestampType` with microsecond
  * instants that match DuckDB's reading of the same file. If the driver
  * regenerates testdata in yet another shape, THIS spec fails with
  * Tables.normalizeTs's message — not nine oracle rows downstream.
  */
class EventsContractSpec extends AnyFunSuite with SparkSpec {

  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    .filter(d => new java.io.File(s"$d/events.parquet").exists())

  /** Every test goes through this accessor so a machine without
    * /root/testdata fails each test with the intended message, not a
    * bare NoSuchElementException from `sfDirs.head`. */
  private def firstDir: String = {
    assert(sfDirs.nonEmpty, "no testdata dirs found")
    sfDirs.head
  }

  test("batch events.ts normalizes to TimestampType in every sf dir") {
    assert(sfDirs.nonEmpty, "no testdata dirs found")
    for (dir <- sfDirs) {
      val df = Tables.t(spark, dir, "events")
      assert(df.schema("ts").dataType == TimestampType,
        s"$dir: batch ts is ${df.schema("ts").dataType}, expected TimestampType")
      // unix_micros must resolve — this is the exact call q22/q23/q29 make
      assert(df.select(unix_micros(col("ts"))).limit(1).count() == 1)
    }
  }

  test("streaming source yields the identical ts instants as the batch reader") {
    val dir = firstDir
    // Stage the single parquet into a directory, as the stream queries do.
    val staged = java.nio.file.Files.createTempDirectory("events_contract")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"), staged.resolve("events.parquet"))
    val stream = Tables.eventStream(spark, staged.toString)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType == TimestampType,
      s"stream ts is ${stream.schema("ts").dataType}, expected TimestampType")
    val q = stream
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .writeStream.format("memory").queryName("events_contract")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("events_contract")
    val batch = Tables.t(spark, dir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty,
      "stream and batch readers disagree on ts instants")
  }

  test("event timestamps span the multi-day fixture range (micros, not ms or ns)") {
    // Guards the ÷1000 class of bug: if micros were divided (or nanos
    // passed through), the span collapses to minutes or explodes by 1000×.
    val df = Tables.t(spark, firstDir, "events")
    val Array(row) = df.agg(
      (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("span_us")).collect()
    val spanDays = row.getLong(0).toDouble / (24L * 3600 * 1000 * 1000)
    assert(spanDays > 1.0 && spanDays < 1000.0,
      f"events span $spanDays%.2f days — ts is mis-scaled (expected a multi-day fixture)")
  }

  test("normalizeTs passes a ns-epoch Long column through the legacy branch losslessly") {
    import spark.implicits._
    val ns = 1700000000123456789L // not divisible by 1000: truncation, not rounding
    val df = Tables.normalizeTs(Seq(ns).toDF("ts"), "ts")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select(unix_micros(col("ts"))).as[Long].head() == ns / 1000)
  }

  test("normalizeTs rejects an unsupported physical type loudly") {
    import spark.implicits._
    val err = intercept[IllegalStateException] {
      Tables.normalizeTs(Seq("2024-01-01").toDF("ts"), "ts")
    }
    assert(err.getMessage.contains("unsupported type"))
  }
}
