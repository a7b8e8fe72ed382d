package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered conversion funnel: a user reaches stage k when an event of
  * stage k's type exists STRICTLY AFTER their earliest stage-(k−1)
  * arrival — the classic funnel semantics, expressed relationally as
  * cascaded min-ts aggregates + equi-joins rather than a per-user
  * event-list fold.
  *
  * Shape at scale: each stage is filter (pushed to the scan; at 100 TB
  * an event-type-partitioned store prunes whole directories) →
  * groupBy(user) with map-side combine → hash join on user_id against
  * the previous level's one-row-per-user table. No window over
  * unbounded user history, no collect_list of a user's events — state
  * per user is one timestamp per stage. */
object Funnel {

  /** Per-user stage arrivals: one row per user who reached stage 1,
    * with nullable `arr_i` timestamps for each later stage reached.
    * Each level is localCheckpoint'ed (eager action, corpus_curate
    * precedent): the level feeds both the next level's join and the
    * final report, and column pruning makes those two consumers
    * structurally different — without the checkpoint each level would
    * be recomputed once per consumer (ReusedExchange can't kick in on
    * pruned-apart twins). */
  def userStages(events: DataFrame, userCol: String, typeCol: String,
                 tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "at least one stage required")
    val head = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("arr_1"))
      .localCheckpoint()
    stages.tail.zipWithIndex.foldLeft(head) { case (acc, (stage, i)) =>
      val prev = s"arr_${i + 1}"
      val cur = s"arr_${i + 2}"
      val nxt = events.filter(col(typeCol) === stage)
        .join(acc.select(col(userCol), col(prev)), userCol)
        .filter(col(tsCol) > col(prev))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as(cur))
      acc.join(nxt, Seq(userCol), "left").localCheckpoint()
    }
  }

  /** Stage-level report: one row per funnel prefix — users reaching it
    * and the EXACT integer micros spent converting from the previous
    * stage (sum, not avg: an average would accumulate in doubles,
    * whose order-sensitivity breaks cross-engine bit-equality). One
    * single-row aggregate over [[userStages]] unpivoted with `stack`,
    * so the whole report is one plan and each stage's arrivals are
    * computed exactly once. */
  def report(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, stages: Seq[String]): DataFrame = {
    val per = userStages(events, userCol, typeCol, tsCol, stages)
    val aggs = stages.indices.flatMap { i =>
      val n = count(col(s"arr_${i + 1}")).as(s"n_${i + 1}")
      if (i == 0) Seq(n)
      else Seq(n, sum(unix_micros(col(s"arr_${i + 1}")) - unix_micros(col(s"arr_$i")))
        .as(s"lag_${i + 1}"))
    }
    val cells = stages.zipWithIndex.map { case (stage, i) =>
      val lag = if (i == 0) "CAST(NULL AS BIGINT)" else s"lag_${i + 1}"
      s"'${i + 1}_$stage', n_${i + 1}, $lag"
    }.mkString(", ")
    per.agg(aggs.head, aggs.tail: _*)
      .select(expr(s"stack(${stages.size}, $cells) AS (stage, n_users, sum_lag_us)"))
  }
}
