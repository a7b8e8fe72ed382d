package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Plan-shape audit over every declared query: the physical plans that
  * pass correctness today must also keep the SHAPE that survives scale.
  * Catches regressions like a dim join silently degrading to a
  * cartesian product or an unintended broadcast-nested-loop join after
  * a refactor (both are quadratic cliffs at 100 TB).
  */
class PlanAuditSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Queries whose plan intentionally carries a BroadcastNestedLoopJoin:
    * a 1-row (or few-row) broadcast side — scalar subquery, fixed query
    * vector/doc — where BNLJ over a single broadcast row IS the right
    * plan at any scale. */
  private val intendedTinyBroadcast = Set(
    "q4_scalar_subquery",   // 1-row min-date aggregate
    "q17_cross_join",       // 5-row region × filtered part, explicit frontier semantics
    "q20_cosine_topk",      // 1-row query vector
    "dedup_jaccard",        // 1-row query document
    "dedup_jaccard_char",   // 1-row query document (char shingles)
    "ann_q8_topk")          // 5-row quantized query set

  graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name: no cartesian product, no stray nested-loop join") {
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"cartesian product in $name:\n${plan.take(3000)}")
      if (!intendedTinyBroadcast(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"unintended BNLJ in $name:\n${plan.take(3000)}")
    }
  }
}
