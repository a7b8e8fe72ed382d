package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (batch form): events of one user belong to
  * the same session while consecutive event times are ≤ `gapUs` apart.
  *
  * The classic two-window formulation: a lag() flags session starts
  * (strictly-greater gap, or first event), a running sum numbers them.
  * Both windows share one (user, ts, id) shuffle+sort — Catalyst plans
  * a single Window node pair over one exchange, so the operator costs
  * the same shuffle any per-user ordering needs; no join, no state.
  * The streaming twin (flatMapGroupsWithState) lives in
  * [[graft.streaming.SessionStream]].
  */
object Sessionize {

  /** Adds `session_no` (1-based per user) to the input. `tsCol` must be
    * a TimestampType column; ordering ties break on `idCol`. */
  def assign(events: DataFrame, userCol: String, tsCol: String, idCol: String,
             gapUs: Long): DataFrame = {
    val order = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(unix_micros(col(tsCol)), 1).over(order)
    val isNew = when(prev.isNull || unix_micros(col(tsCol)) - prev > gapUs, 1L)
      .otherwise(0L)
    events
      .withColumn("session_no", sum(isNew).over(running))
  }

  /** Per-session rollup: event count and duration in microseconds. */
  def sessions(events: DataFrame, userCol: String, tsCol: String, idCol: String,
               gapUs: Long): DataFrame =
    assign(events, userCol, tsCol, idCol, gapUs)
      .groupBy(col(userCol), col("session_no"))
      .agg(count(lit(1)).as("n_events"),
        (unix_micros(max(col(tsCol))) - unix_micros(min(col(tsCol)))).as("duration_us"))
}
