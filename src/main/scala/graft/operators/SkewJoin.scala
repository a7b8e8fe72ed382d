package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for pathologically skewed keys.
  *
  * AQE's runtime skew-join split handles moderate skew; explicit
  * salting is the tool when one key dominates so hard that a single
  * key's partition would spill or serialize a stage (the dedup
  * operators' hot-bucket guards are the same idea applied to LSH
  * buckets). The skewed side gets a salt in [0, salts) derived from a
  * hash of the whole row; the small side is replicated `salts`× with
  * every salt value, so the join key becomes (keys..., salt) and the
  * hot key's rows spread over `salts` shuffle partitions. Join output
  * is identical to the unsalted join; cost is `salts`× the small side
  * (keep it broadcast-sized per salt).
  *
  * When does AQE's split suffice, and when does salting win?
  * (PlanAuditSpec runs the same skewed join both ways and asserts
  * answer equality, with the split's firing machine-checked.)
  *
  *  - AQE SUFFICES for a plain shuffle JOIN with a hot key: the
  *    skewed reduce partition is re-read as several mapper-range
  *    sub-partitions, each joined against the full matching side —
  *    no plan change, no salt column, works on any already-written
  *    query. It needs the join to actually be a runtime shuffle join
  *    (a broadcast join has no skewed shuffle to split — and also no
  *    skew problem) and adaptive execution to be on.
  *  - SALTING WINS when the work AFTER the join is still keyed on the
  *    hot key: AQE splits the join stage only, so a downstream
  *    `groupBy(hotKey)` re-concentrates the key into one partition
  *    again, while the salt keeps partial aggregation spread until
  *    the final `salts`-way combine. Likewise for stateful streaming
  *    joins (AQE does not replan micro-batches), for skew so extreme
  *    a single (map, reduce) block breaks transport limits, and for
  *    engines/pipelines where the plan must be deterministic rather
  *    than decided by runtime statistics.
  */
object SkewJoin {

  private val supported = Set("inner", "left", "left_outer", "leftouter",
    "left_semi", "leftsemi", "left_anti", "leftanti")

  def saltedJoin(skewed: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(supported.contains(joinType.toLowerCase),
      s"salted join replicates the right side; '$joinType' would duplicate " +
        "unmatched right rows (use inner/left/left_semi/left_anti)")
    val saltedL = skewed.withColumn("__salt",
      pmod(xxhash64(struct(skewed.columns.map(col): _*)), lit(salts)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedL.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
