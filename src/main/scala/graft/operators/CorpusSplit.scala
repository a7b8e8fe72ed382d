package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/val/test splitting — the reproducibility
  * primitive of a training-data pipeline. Assignment is a pure function
  * of the row's key (content hash bucket vs cumulative weight
  * thresholds), so it is stable across runs, cluster sizes, partition
  * layouts, and incremental re-ingestion: a document keeps its split
  * forever, and near-identical corpora produce near-identical splits.
  * (randomSplit, by contrast, depends on partition layout and seed
  * plumbing.) No shuffle — a projection over the scan.
  */
object CorpusSplit {

  /** Cumulative-weight thresholds as 8-hex-char bounds:
    * floor(cum_weight·2^32), weights normalized. Exposed so the DuckDB
    * oracle ([[graft.queries.ExtensionOracles]]) derives its CASE bounds
    * from this exact computation — changing weights or normalization
    * here automatically re-derives the oracle, so the two cannot drift.
    */
  def hexThresholds(splits: Seq[(String, Double)]): Seq[String] = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "positive split weights required")
    val total = splits.map(_._2).sum
    val cuts = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }.tail
    cuts.map { c =>
      f"${math.min(0xffffffffL, math.floor(c * 4294967296.0).toLong)}%08x"
    }
  }

  /** A `split` column from `key`: e.g. assign(col("text"),
    * Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)). Weights are
    * normalized. The bucket is the first 8 hex chars of md5(key)
    * compared lexicographically against cumulative-weight thresholds
    * ([[hexThresholds]]): md5 is uniform over hex strings, and — unlike
    * a seeded xxhash — every engine with an md5 function reproduces the
    * assignment bit-for-bit, so the split can be recomputed (and
    * audited) outside Spark. 32 bits of bucket resolution ≈ 2.3e-10
    * weight granularity.
    *
    * Null keys: md5(null) is null, every `h < cut` test is null, and the
    * fold's otherwise-chain assigns the LAST split label (e.g. 'test') —
    * identical to a SQL CASE falling through to ELSE, so oracle parity
    * holds. If null keys must not reach the eval/test split, coalesce
    * the key (or filter) before calling; a training pipeline should
    * treat a null split key as a data-quality error either way.
    */
  def assign(key: Column, splits: Seq[(String, Double)]): Column = {
    val h = substring(md5(key.cast("string")), 1, 8)
    splits.zip(hexThresholds(splits)).reverse.foldLeft(lit(splits.last._1)) {
      case (acc, ((name, _), cut)) => when(h < lit(cut), lit(name)).otherwise(acc)
    }
  }

  /** df + `split` column. */
  def split(df: DataFrame, keyCol: String, splits: Seq[(String, Double)]): DataFrame =
    df.withColumn("split", assign(col(keyCol), splits))

  /** 8-hex-char keep-threshold for a single fraction: rows whose md5
    * bucket is lexicographically below it are kept (≈frac of them).
    * frac ≥ 1 returns "g" — greater than every hex string, so the
    * comparison keeps ALL rows exactly (no 1/2^32 clip), and the same
    * trick is expressible verbatim in the DuckDB oracle. */
  def hexCut(frac: Double): String =
    if (frac >= 1.0) "g"
    else f"${math.max(0L, math.floor(frac * 4294967296.0).toLong)}%08x"

  /** Deterministic stratified downsampling — the corpus-rebalancing
    * primitive of a training-data pipeline (e.g. cap the dominant
    * language while keeping the tail whole). A row is kept iff its
    * md5(key) bucket falls below its stratum's [[hexCut]]: a pure
    * projection+filter over the scan (no shuffle, no RNG state), stable
    * across runs/partitionings, and — like [[assign]] — reproducible in
    * any engine with md5, so the sample can be recomputed and audited
    * outside Spark. Correlated with [[assign]]'s buckets by design:
    * sampling then splitting keeps strata proportions inside each
    * split. */
  /** Rebalance a corpus toward a target mixture — the interleaving
    * primitive of a training-data pipeline ("20% per language", "cap web
    * crawl at 60%"). Each stratum's keep fraction is
    * `min(1, total·share / n_s)`: strata above their target share are
    * deterministically downsampled to it, strata at or below keep every
    * row (a sampler can only remove — their realized shares simply end
    * up above target, which is the standard behavior). Strata absent
    * from `shares` are dropped: a mixture spec is exhaustive.
    *
    * The stratum counts are a bounded driver artifact (one row per
    * stratum — the same class of artifact as an IVF codebook); the keep
    * itself is [[sampleStratified]]'s md5-threshold projection, so the
    * whole operator costs one tiny aggregate plus a scan — no shuffle
    * of the corpus, stable across runs and partitionings, and
    * recomputable in any engine with md5 (the fraction arithmetic uses
    * only IEEE *,/ and min, which are correctly rounded, so an external
    * engine derives bit-identical thresholds).
    */
  def interleaveToMixture(df: DataFrame, keyCol: String, strataCol: String,
                          shares: Seq[(String, Double)]): DataFrame = {
    require(shares.nonEmpty && shares.forall(_._2 >= 0), "non-negative shares required")
    val counts = df.groupBy(col(strataCol).cast("string")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    val fractions = shares.map { case (stratum, share) =>
      stratum -> counts.get(stratum)
        .map(n => math.min(1.0, total * share / n)).getOrElse(0.0)
    }.toMap
    sampleStratified(df, keyCol, strataCol, fractions, defaultFrac = 0.0)
  }

  /** Integer stratum weight for temperature sampling: ⌊2^16·n^(1/2^d)⌋.
    * The exponent is restricted to 1/2^d so the weight is computed by d
    * applications of sqrt — IEEE 754 sqrt is correctly rounded (pow is
    * NOT), and ·2^16 is an exact scaling, so every engine derives the
    * same integer from the same count and the weight SUM is exact
    * integer arithmetic with no float-accumulation-order hazard. Shared
    * with the DuckDB oracle the same way [[hexThresholds]] is. */
  def temperatureWeight(n: Long, sqrtDepth: Int): Long = {
    var x = n.toDouble
    var d = sqrtDepth
    while (d > 0) { x = math.sqrt(x); d -= 1 }
    math.floor(x * 65536.0).toLong
  }

  /** Temperature-weighted mixture sampling — the multilingual
    * rebalancing pass of an LLM pipeline (sample strata ∝ n^α, α=1/T,
    * so dominant strata are flattened toward the tail; XLM-R/mT5-style).
    * Unlike [[interleaveToMixture]] the target shares are DERIVED from
    * the stratum counts: share_g = w_g/Σw with w_g = [[temperatureWeight]]
    * (α = 1/2^sqrtDepth; depth 1 = the common T=2), then each stratum
    * keeps min(1, total·share_g/n_g) of its rows via the md5-threshold
    * projection. The counts→weights table is a bounded driver artifact
    * (one row per stratum, IVF-codebook class); the keep is a shuffle-
    * free scan filter; α's 1/2^d form plus integer weight sums make the
    * realized thresholds bit-reproducible in any engine with md5 and
    * sqrt, so the mixture can be recomputed and audited outside Spark.
    * Null strata are dropped (a mixture is over known strata — same
    * contract as [[interleaveToMixture]]'s exhaustive spec). */
  def mixtureByTemperature(df: DataFrame, keyCol: String, strataCol: String,
                           sqrtDepth: Int = 1): DataFrame = {
    require(sqrtDepth >= 1 && sqrtDepth <= 4, "sqrtDepth in [1,4] (alpha = 1/2^d)")
    val counts = df.groupBy(col(strataCol).cast("string")).agg(count(lit(1)).as("n"))
      .collect().flatMap(r => Option(r.getString(0)).map(_ -> r.getLong(1))).toMap
    val total = counts.values.sum
    val weights = counts.map { case (st, n) => st -> temperatureWeight(n, sqrtDepth) }
    val wSum = weights.values.sum
    // ((total·w)/Σw)/n, left-associated — the oracle mirrors this exact
    // op order so each correctly-rounded double step matches bit-for-bit
    val fractions = counts.map { case (st, n) =>
      st -> math.min(1.0, total.toDouble * weights(st).toDouble / wSum.toDouble / n.toDouble)
    }
    sampleStratified(df, keyCol, strataCol, fractions, defaultFrac = 0.0)
  }

  /** Deterministic fixed-size sample per stratum — the eval-set carving
    * primitive ("exactly k docs per language, reproducibly"), where
    * [[sampleStratified]] is rate-based and its realized counts vary.
    * Selection = the k LARGEST (md5(key), id) pairs per stratum: md5
    * imposes a fixed pseudo-random permutation, so the pick is uniform
    * over the stratum, stable across runs/partitionings/engines, and
    * id breaks (never-observed) hash ties deterministically.
    *
    * Shape at scale: the bounded-heap [[graft.functions.TopKAgg]] —
    * map-side state is k pairs per local stratum and the shuffle
    * carries ≤ k·strata rows, where the window-rank idiom would
    * shuffle and sort every row of every stratum. */
  def reservoirPerStratum(df: DataFrame, keyCol: String, strataCol: String,
                          idCol: String, k: Int): DataFrame =
    df.select(col(strataCol), col(idCol),
        md5(col(keyCol).cast("string")).as("h"))
      .groupBy(col(strataCol))
      .agg(graft.functions.TopKAgg.topK(struct(col("h"), col(idCol)), k).as("top"))
      .select(col(strataCol), posexplode(col("top")).as(Seq("i", "s")))
      .select(col(strataCol), (col("i") + 1).cast("long").as("rank"),
        col(s"s.$idCol").as(idCol), col("s.h").as("h"))

  def sampleStratified(df: DataFrame, keyCol: String, strataCol: String,
                       fractions: Map[String, Double],
                       defaultFrac: Double = 1.0): DataFrame = {
    require(fractions.values.forall(_ >= 0), "non-negative fractions required")
    val h = substring(md5(col(keyCol).cast("string")), 1, 8)
    val cut = fractions.foldLeft(lit(hexCut(defaultFrac))) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === lit(stratum), lit(hexCut(f))).otherwise(acc)
    }
    df.filter(h < cut)
  }
}
