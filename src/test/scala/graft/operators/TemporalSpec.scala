package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Closed-form checks for the temporal warehouse operators: SCD2
  * change collapse / range chaining, and the cumulative-max interval
  * merge including the case the naive lag-gap test gets wrong. */
class TemporalSpec extends AnyFunSuite with SparkSpec {

  private def scd2(rows: Seq[(Long, String, Long, Long)]) = {
    import spark.implicits._
    Temporal.scd2History(
      rows.toDF("k", "v", "ts", "id"), "k", "v", "ts", "id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
      .toSet
  }

  test("scd2: consecutive equal values collapse; ranges chain; last row is current") {
    // A@1, A@2 (collapsed), B@5, A@9
    val r = scd2(Seq((7L, "A", 1L, 10L), (7L, "A", 2L, 11L),
      (7L, "B", 5L, 12L), (7L, "A", 9L, 13L)))
    assert(r == Set((7L, "A", 1L, 5L, false), (7L, "B", 5L, 9L, false),
      (7L, "A", 9L, -1L, true)))
  }

  test("scd2: same-timestamp changes resolve by id — deterministic total order") {
    // two changes at ts=5: id order makes it A→B→C with zero-width B range
    val r = scd2(Seq((1L, "A", 1L, 1L), (1L, "B", 5L, 2L), (1L, "C", 5L, 3L)))
    assert(r == Set((1L, "A", 1L, 5L, false), (1L, "B", 5L, 5L, false),
      (1L, "C", 5L, -1L, true)))
  }

  test("scd2: keys are independent; single-row key is current from its own ts") {
    val r = scd2(Seq((1L, "A", 1L, 1L), (2L, "Z", 4L, 2L)))
    assert(r == Set((1L, "A", 1L, -1L, true), (2L, "Z", 4L, -1L, true)))
  }

  private def merge(rows: Seq[(Long, Long, Long, Long)]) = {
    import spark.implicits._
    val df = rows.toDF("k", "id", "s", "e")
    Temporal.mergeIntervals(df, "k", col("s"), col("e"), "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
  }

  test("interval merge: a long early interval swallows later short ones (lag test would split)") {
    // [0,100) swallows [10,20) and [30,40); consecutive-pair gap 30→20
    // would wrongly split at [30,40) under a lag-based rule
    val r = merge(Seq((1L, 1L, 0L, 100L), (1L, 2L, 10L, 20L), (1L, 3L, 30L, 40L),
      (1L, 4L, 150L, 160L)))
    assert(r == Set((1L, 1L, 0L, 100L, 3L), (1L, 2L, 150L, 160L, 1L)))
  }

  test("interval merge: touching half-open intervals coalesce; true gaps split") {
    val r = merge(Seq((1L, 1L, 0L, 10L), (1L, 2L, 10L, 20L), (1L, 3L, 21L, 30L)))
    assert(r == Set((1L, 1L, 0L, 20L, 2L), (1L, 2L, 21L, 30L, 1L)))
  }

  test("interval merge: end of an island is the max end, not the last row's end") {
    // second interval starts later but ends earlier
    val r = merge(Seq((1L, 1L, 0L, 50L), (1L, 2L, 5L, 10L)))
    assert(r == Set((1L, 1L, 0L, 50L, 2L)))
  }

  test("interval merge: keys independent, same-start ties ordered by id deterministically") {
    val r = merge(Seq((1L, 2L, 0L, 5L), (1L, 1L, 0L, 3L), (2L, 3L, 0L, 1L)))
    assert(r == Set((1L, 1L, 0L, 5L, 2L), (2L, 1L, 0L, 1L, 1L)))
  }

  test("point-in-time lookup rule: a probe sees the value current AT its instant, never later") {
    import spark.implicits._
    // history k=1: A valid [1,5), B valid [5,∞)
    val hist = Temporal.scd2History(
      Seq((1L, "A", 1L, 1L), (1L, "B", 5L, 2L)).toDF("k", "v", "ts", "id"),
      "k", "v", "ts", "id")
    val probes = Seq((10L, 1L, 0L),   // before first change -> no match
      (11L, 1L, 1L),                  // exactly ON valid_from -> A (closed lower)
      (12L, 1L, 4L),                  // inside [1,5) -> A
      (13L, 1L, 5L),                  // exactly ON the boundary -> B (open upper)
      (14L, 1L, 99L)                  // open current range -> B
    ).toDF("probe_id", "k", "as_of")
    val got = probes.join(hist,
        probes("k") === hist("k") &&
          col("valid_from") <= col("as_of") &&
          (col("valid_to").isNull || col("as_of") < col("valid_to")),
        "left")
      .select(col("probe_id"), col("v"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(10L -> None, 11L -> Some("A"), 12L -> Some("A"),
      13L -> Some("B"), 14L -> Some("B")))
  }
}
