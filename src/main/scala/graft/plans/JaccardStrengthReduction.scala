package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, Literal, SortArray}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.BooleanType

import graft.functions.{JaccardSim, JaccardSortedSim}

/** Strength reduction for Jaccard over canonicalized shingle sets.
  *
  * [[graft.functions.JaccardSim]] builds a hash set per PAIR evaluation
  * — fine for one-off columns, quadratic waste inside a candidate
  * self-join where each row's array participates in many pairs. When
  * both inputs are provably sorted-distinct (the exact
  * `sort_array(array_distinct(_))` shape Sketches.sortedDistinct
  * emits, and the canonical form a dedup pipeline stores anyway), the
  * linear merge-walk [[graft.functions.JaccardSortedSim]] computes the
  * same value with zero per-pair allocation. This rule rewrites the
  * naive spelling into the merge-walk automatically, so a SQL user who
  * writes `jaccard_sim(sort_array(array_distinct(a)), ...)` gets the
  * fast kernel without knowing it exists — the one legitimate use of a
  * custom `Rule[LogicalPlan]` in this engine: Catalyst can't know two
  * user-defined kernels are value-equal on a restricted input shape.
  * (Both kernels are spec- and fuzz-pinned equal on sorted-distinct
  * inputs — KernelFuzzSpec.)
  */
object JaccardStrengthReduction extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case JaccardSim(l @ SortArray(ArrayDistinct(_), Literal(true, BooleanType)),
                      r @ SortArray(ArrayDistinct(_), Literal(true, BooleanType))) =>
        JaccardSortedSim(l, r)
    }
}
