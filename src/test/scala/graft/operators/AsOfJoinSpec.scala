package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class AsOfJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // trades (left) and quotes (right) — the canonical as-of shape
  lazy val trades = Seq(
    (1L, "A", 100L), (2L, "A", 205L), (3L, "A", 300L),
    (4L, "B", 150L), (5L, "C", 10L)
  ).toDF("trade_id", "sym", "t")
  lazy val quotes = Seq(
    ("A", 90L, 1.0), ("A", 205L, 2.0), ("A", 210L, 3.0),
    ("B", 150L, 4.0), ("B", 160L, 5.0)
  ).toDF("sym", "t", "px")

  private def run(strict: Boolean) =
    AsOfJoin.asof(trades, quotes, Seq("sym"), "t", Seq("px"), strict = strict)
      .select(col("trade_id"), col("asof.px").as("px"))
      .as[(Long, Option[Double])].collect().toMap

  test("backward inclusive: greatest quote ts <= trade ts per key") {
    val got = run(strict = false)
    assert(got(1L).contains(1.0))   // 90 <= 100
    assert(got(2L).contains(2.0))   // equal ts matches
    assert(got(3L).contains(3.0))   // 210 <= 300 beats 205
    assert(got(4L).contains(4.0))   // B at equal ts
    assert(got(5L).isEmpty)         // C has no quotes -> null, row kept
  }

  test("strict excludes the equal-ts right row") {
    val got = run(strict = true)
    assert(got(2L).contains(1.0))   // 205 excluded, falls back to 90
    assert(got(4L).isEmpty)         // B's only preceding quote was equal-ts
  }

  test("all left columns and rows survive (left-join semantics)") {
    val out = AsOfJoin.asof(trades, quotes, Seq("sym"), "t", Seq("px"))
    assert(out.count() == 5)
    assert(out.columns.toSeq == Seq("sym", "t", "trade_id", "asof"))
  }

  test("plan is one shuffle + window, no join node") {
    val out = AsOfJoin.asof(trades, quotes, Seq("sym"), "t", Seq("px"))
    val plan = out.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("join"), s"unexpected join in:\n$plan")
  }
}
