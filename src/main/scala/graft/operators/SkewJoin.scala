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
