package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables.t

/** SURVEY.md §2.9 declared query inventory, Q1–Q20(+), as Spark-first
  * DataFrame programs.
  *
  * Oracle-stability rules (mirrored by [[Oracles]], the DuckDB SQL side):
  *   - every query ends in a total ORDER BY (ties broken by a unique key);
  *   - DOUBLE aggregates are ROUND(x, 2) (similarities ROUND(x, 4));
  *   - dates/timestamps leave the engine as "yyyy-MM-dd[ HH:mm:ss]" strings
  *     so parquet physical type differences can never cause a hash diff;
  *   - column names are identical on both sides (driver sorts by name).
  *
  * Scale notes (100 TB thinking, tested at sf0.1): aggregations are
  * partial/final hash aggs (map-side combine) by construction; dimension
  * joins broadcast explicitly; the one self-join (Q14) carries an equi key
  * (user_id) so it shuffles once, never nested-loops; no query collects to
  * the driver.
  */
object Inventory {

  /** Q1 — derived natural key + projection (reference `create_uniq_id`,
    * scraper.py:105-119). Narrow, no shuffle except the final sort+limit
    * (TakeOrderedAndProject — O(k) per partition, no full sort at scale).
    */
  def q1DerivedKey(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      concat_ws("-",
        date_format(col("o_orderdate"), "yyyy-MM-dd"),
        col("o_orderkey"), col("o_custkey"), col("o_orderpriority")).as("uniq_id"),
      col("o_orderkey"), col("o_custkey"))
      .orderBy("uniq_id").limit(100)

  /** Q2 — anti join: incremental discovery (etl_process.py:297-301).
    * left_anti, not NOT IN: identical here (keys NOT NULL) and immune to
    * the NOT-IN null trap; Catalyst plans a shuffled hash/SMJ anti join.
    */
  def q2AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem")
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_anti")
      .select("o_orderkey", "o_custkey", "o_orderstatus")
      .orderBy("o_orderkey")
  }

  /** Q3 — broadcast dim enrichment (site-map join, etl_process.py:320-323).
    * nation (25) and region (5) are broadcast explicitly: zero shuffle on
    * the fact side regardless of fact-table scale.
    */
  def q3DimJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(col("c_custkey"), col("n_name"), col("r_name"))
      .orderBy("c_custkey")
  }

  /** Q4 — scalar-subquery temporal filter (conform_dbs,
    * etl_process.py:230-235). The single-row aggregate is cross-joined
    * (broadcast nested loop over ONE row) — the fact scan stays pruned.
    */
  def q4ScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val minD = o.filter(col("o_orderstatus") === "F")
      .agg(min(col("o_orderdate")).as("min_d"))
    o.join(broadcast(minD))
      .where(col("o_orderdate") >= col("min_d"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Q5 — TPC-H Q1-shape grouped aggregation. Partial agg on 2×~(RF×LS)
    * groups map-side, one tiny shuffle; filter pushed to parquet scan.
    */
  def q5GroupbyAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(avg(col("l_extendedprice")), 2).as("avg_price"),
        round(avg(col("l_discount")), 2).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Q6 — distinct / dedup (set-dedup, scraper.py:159-160). Two exact
    * count-distincts (one expand+two-phase agg) in one scan.
    */
  def q6Distinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_supps"))

  /** Q6b — DISTINCT projection, ordered. */
  def q6bDistinctValues(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select("c_mktsegment").distinct().orderBy("c_mktsegment")

  /** Q7 — ROLLUP over customer⋈nation; (all) totals via coalesce so no
    * NULL-ordering divergence between engines can appear.
    */
  def q7Rollup(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .rollup(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("c_acctbal")), 2).as("sum_bal"))
      .select(
        coalesce(col("n_name"), lit("(all)")).as("n_name"),
        coalesce(col("c_mktsegment"), lit("(all)")).as("c_mktsegment"),
        col("cnt"), col("sum_bal"))
      .orderBy("n_name", "c_mktsegment")
  }

  /** Q8 — approx_count_distinct (HLL++), ORACLE-GATED: the sketch
    * estimate itself is engine-specific (DuckDB's HLL differs), so the
    * query emits the EXACT distinct count (oracle-matched) plus an
    * integer error gate — `err_gate = (|approx − exact|·10⁶ DIV exact)
    * DIV 50000`, i.e. 0 iff the sketch lands within 5% of truth. The
    * oracle pins err_gate = 0, so sketch drift hard-fails the driver's
    * hash check instead of only a ScalaTest bound. Both counts ride one
    * scan (single expand + two-phase agg).
    */
  def q8ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx"),
        countDistinct(col("l_orderkey")).as("exact_orders"),
        count(lit(1)).as("n_rows"))
      .select(col("exact_orders"), col("n_rows"),
        expr("(abs(approx - exact_orders) * 1000000L DIV exact_orders) DIV 50000")
          .as("err_gate"))

  /** Q9 — window ranking: top-3 orders per customer. */
  def q9WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"), col("rn"))
      .orderBy("o_custkey", "rn")
  }

  /** Q10 — window frame: running total per customer (rows frame, total
    * intra-partition order ⇒ deterministic accumulation on both engines).
    */
  def q10WindowFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .withColumn("running", round(sum(col("o_totalprice")).over(w), 2))
      .select("o_custkey", "o_orderkey", "running")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Q11 — top-k (LIMIT etl_process.py:301, made deterministic).
    * Plans as TakeOrderedAndProject: per-partition heap of 50, no global
    * sort — the shape that survives 100 TB.
    */
  def q11TopK(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(50)

  /** Q12 — set ops: EXCEPT + INTERSECT branches unioned. */
  def q12SetOps(s: SparkSession, dir: String): DataFrame = {
    val bldg = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("custkey"))
    bldg.except(urgent).withColumn("op", lit("except"))
      .unionByName(bldg.intersect(urgent).withColumn("op", lit("intersect")))
      .select("op", "custkey")
      .orderBy("op", "custkey")
  }

  /** Q13 — semi join (UNIQUE-constraint insert, scraper.py:211-218). */
  def q13SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Q14 — range self-join on events: pairs of events by the same user
    * within 1 hour. Equi key is (user_id, hour_bucket), not bare
    * user_id: a hot user's events spread over k distinct hours now land
    * on k shuffle keys instead of one, so the shuffle fan-in of a hot
    * key is bounded by events-per-hour, not events-per-user — bare
    * user_id is O(n²) pairs on ONE key for a single hot user at 100 TB.
    * The left side explodes to buckets {b, b+1}; the right side's
    * bucket is unique and ts2 ∈ [ts1, ts1+1h] implies bucket(ts2) ∈
    * {bucket(ts1), bucket(ts1)+1}, so every qualifying pair matches
    * exactly once (no pair dedup needed).
    */
  def q14RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    def hb(c: Column): Column = floor(unix_timestamp(c) / 3600).cast("long")
    val e1 = e.select(col("user_id"), col("ts").as("ts1"), col("event_id").as("id1"))
      .withColumn("hb", explode(array(hb(col("ts1")), hb(col("ts1")) + 1)))
    val e2 = e.select(col("user_id").as("user_id2"), col("ts").as("ts2"),
      col("event_id").as("id2"), hb(col("ts")).as("hb2"))
    e1.join(e2,
      col("user_id") === col("user_id2") &&
        col("hb") === col("hb2") &&
        col("ts2") >= col("ts1") &&
        col("ts2") <= col("ts1") + expr("INTERVAL 1 HOUR") &&
        col("id1") < col("id2"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("user_id")
  }

  /** Q15 — the reference's phone-extraction chain (etl_process.py:79-126)
    * as pure built-in expressions (whole-stage codegen, zero UDFs):
    * lower → strip punctuation except '$' → drop spaces → spelled-digit
    * substring replace (fixed zero..nine order; the reference's dict
    * order was nondeterministic) → digit runs → len∈[7,11] → distinct →
    * sort (reference's set order was nondeterministic; we fix it) →
    * ';'-join.
    */
  def q15PhoneRegex(s: SparkSession, dir: String): DataFrame = {
    val phones = phoneExtractChain(col("text"))
    t(s, dir, "documents")
      .select(col("doc_id"), phones.as("phones"))
      .orderBy("doc_id")
  }

  /** The §2.6 `phone_extract` semantics as a Column→Column function.
    * string.punctuation minus '$' (rationale comment etl_process.py:84). */
  def phoneExtractChain(text: Column): Column = {
    val punct = "!\"#%&'()*+,-./:;<=>?@[\\]^_`{|}~"
    val digitWords = Seq(
      "zero" -> "0", "one" -> "1", "two" -> "2", "three" -> "3",
      "four" -> "4", "five" -> "5", "six" -> "6", "seven" -> "7",
      "eight" -> "8", "nine" -> "9")
    var c = lower(text)
    c = translate(c, punct, "")
    c = translate(c, " ", "")
    for ((w, d) <- digitWords) c = regexp_replace(c, w, d)
    val runs = regexp_extract_all(c, lit("[0-9]+"), lit(0))
    val kept = filter(runs, x => length(x).between(7, 11))
    array_join(array_sort(array_distinct(kept)), ";")
  }

  /** Q16 — date + JSON scalar functions per event_type. */
  def q16DateJson(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        round(sum(col("value")), 2).as("sum_value"),
        round(avg(get_json_object(col("props"), "$.k").cast("double")), 2).as("avg_k"),
        date_format(min(date_trunc("DAY", col("ts"))), "yyyy-MM-dd").as("first_day"),
        date_format(max(date_trunc("DAY", col("ts"))), "yyyy-MM-dd").as("last_day"))
      .orderBy("event_type")

  /** Q17 — cross join (crawl frontier, scraper.py:163-166). Small side
    * broadcast; count per region.
    */
  def q17CrossJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "region")
      .crossJoin(broadcast(t(s, dir, "part").filter(col("p_size") < 10)))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("r_name")

  /** Q18 — tumbling daily window (batch form of the polling loop,
    * etl_process.py:294-347).
    */
  def q18TumblingDay(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"),
        date_format(date_trunc("DAY", col("ts")), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy("event_type", "day")

  /** Q19 — GROUPING SETS ((event_type),(event_type,day),()) counts. */
  def q19GroupingSets(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .withColumn("day", date_format(date_trunc("DAY", col("ts")), "yyyy-MM-dd"))
    e.groupingSets(
        Seq(Seq(col("event_type")), Seq(col("event_type"), col("day")), Seq()),
        col("event_type"), col("day"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        coalesce(col("event_type"), lit("(all)")).as("event_type"),
        coalesce(col("day"), lit("(all)")).as("day"),
        col("cnt"))
      .orderBy("event_type", "day")
  }

  /** Q20 — cosine-similarity top-k against a fixed query vector (the
    * north-star similarity-search baseline). Vectors are cast to double
    * before any arithmetic (float32 accumulation would diverge from the
    * oracle); the query vector is a 1-row broadcast; ranking is a top-k,
    * not a global sort.
    */
  def q20CosineTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
      .withColumn("vec", col("embedding").cast("array<double>"))
    val qv = emb.filter(col("vec_id") === 0).select(col("vec").as("qvec"))
    emb.crossJoin(broadcast(qv))
      .select(col("vec_id"), col("label"),
        round(cosineSim(col("vec"), col("qvec")), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(20)
  }

  /** dot(a,b) / (||a||·||b||) over ArrayType(Double) columns. Native
    * Catalyst expression with codegen ([[graft.functions.CosineSim]]):
    * the HOF formulation (zip_with + aggregate) it replaces is
    * CodegenFallback — interpreted, one intermediate array per row. */
  def cosineSim(a: Column, b: Column): Column =
    graft.functions.Vecs.cosineSim(a, b)

  /** Q21 — array basics on embeddings (len/label counts). */
  def q21ArrayOps(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("cnt"),
        min(size(col("embedding"))).as("min_len"),
        max(size(col("embedding"))).as("max_len"))
      .orderBy("label")

  /** Q22 — backward as-of join ([[graft.operators.AsOfJoin]]): each
    * purchase matched to the user's most recent view at-or-before it;
    * DuckDB's ASOF LEFT JOIN is the oracle. Union + running window, not
    * a range join (see the operator doc for the scale argument).
    */
  def q22AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"),
        col("event_id").as("view_id"), col("ts").as("view_ts"))
    graft.operators.AsOfJoin
      .asof(purchases, views, Seq("user_id"), "ts", Seq("view_id", "view_ts"))
      .select(col("event_id"), col("user_id"),
        col("asof.view_id").as("matched_view_id"),
        (unix_micros(col("ts")) - unix_micros(col("asof.view_ts"))).as("lag_us"))
      .orderBy("event_id")
  }

  /** Q24 — exact interpolated percentiles (corpus length stats): Spark's
    * `percentile` and DuckDB's `quantile_cont` share linear
    * interpolation, so the values hash-match exactly (percentile_approx
    * would not — it's a sketch, like Q8).
    */
  def q24Percentiles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(length(col("text")).as("len"))
      .agg(
        round(expr("percentile(len, 0.5)"), 2).as("p50"),
        round(expr("percentile(len, 0.9)"), 2).as("p90"),
        round(expr("percentile(len, 0.99)"), 2).as("p99"),
        count(lit(1)).as("n"))

  /** Q24b — approx_percentile (Greenwald–Khanna-class quantile
    * sketch), ORACLE-GATED (the q8 pattern): the sketch value is
    * engine-specific, so the query emits the EXACT interpolated
    * percentiles (oracle-matched) plus one integer gate per quantile
    * pinned to 0. The gate checks the guarantee a quantile sketch
    * actually makes — RANK accuracy, not value distance (value error
    * is unbounded on skewed data): with accuracy = 100 (ε = 1%), the
    * returned element's min/max-rank interval [#{len < v}+1, #{len ≤
    * v}] must intersect [q·n − εn − 1, q·n + εn + 1]. One extra pass
    * over the scan computes the three rank pairs against the 1-row
    * broadcast sketch output (the q4 scalar-subquery shape). */
  def q24bApproxPercentiles(s: SparkSession, dir: String): DataFrame = {
    val lens = t(s, dir, "documents").select(length(col("text")).as("len"))
    val agg = lens.agg(
      expr("approx_percentile(len, array(0.5D, 0.9D, 0.99D), 100)").as("ap"),
      expr("percentile(len, array(0.5D, 0.9D, 0.99D))").as("ep"),
      count(lit(1)).as("n"))
    def gate(i: Int, q: Double) = {
      val v = element_at(col("ap"), i)
      val lo = sum(when(col("len") < v, 1L).otherwise(0L)) + 1
      val hi = sum(when(col("len") <= v, 1L).otherwise(0L))
      val eps = col("n") / lit(100.0) + 1.0
      when(lit(q) * col("n") + eps >= lo && lit(q) * col("n") - eps <= hi,
        lit(0L)).otherwise(lit(1L))
    }
    lens.crossJoin(broadcast(agg))
      .groupBy(col("ep"), col("n"), col("ap"))   // all three 1-row constants
      .agg(gate(1, 0.5).as("g50"), gate(2, 0.9).as("g90"),
        gate(3, 0.99).as("g99"))
      .select(
        round(element_at(col("ep"), 1), 2).as("p50"),
        round(element_at(col("ep"), 2), 2).as("p90"),
        round(element_at(col("ep"), 3), 2).as("p99"),
        col("n"), col("g50"), col("g90"), col("g99"))
  }

  /** Q25 — per-group top-k via the custom [[graft.functions.TopKAgg]]
    * TypedImperativeAggregate (SURVEY §2.8's deferred UDAF): 3 latest
    * orders per customer. Unlike the Q9 window idiom this never sorts
    * full partitions — bounded k-element heaps merge map-side, the
    * shuffle carries ≤ k rows per group. Oracle = the equivalent
    * row_number formulation in DuckDB.
    */
  def q25TopkAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(graft.functions.TopKAgg.topK(
        struct(col("o_orderdate"), col("o_orderkey")), 3).as("top"))
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("i", "s")))
      .select(col("o_custkey"), col("s.o_orderkey").as("o_orderkey"),
        date_format(col("s.o_orderdate"), "yyyy-MM-dd").as("o_date"),
        (col("i") + 1).cast("long").as("rn"))
      .orderBy("o_custkey", "rn")

  /** Q26 — CUBE over customer⋈nation (all four grouping combinations;
    * completes the rollup/grouping-sets/cube family of Q7/Q19).
    * Same coalesce treatment as Q7 so NULL ordering can't diverge.
    */
  def q26Cube(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .cube(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"), round(avg(col("c_acctbal")), 2).as("avg_bal"))
      .select(
        coalesce(col("n_name"), lit("(all)")).as("n_name"),
        coalesce(col("c_mktsegment"), lit("(all)")).as("c_mktsegment"),
        col("cnt"), col("avg_bal"))
      .orderBy("n_name", "c_mktsegment")
  }

  /** Q28 — window navigation + distribution functions, completing the
    * window family (Q9 ranks, Q10 frames): per-customer order gaps via
    * lag, quartile via ntile, percent_rank. percent_rank is
    * (rank−1)/(n−1) — one integer division, IEEE-identical across
    * engines, so it oracle-checks exactly (rounded for the 6-dp float
    * normalization). One window spec, one shuffle.
    */
  def q28WindowNav(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w))
          .cast("long").as("gap_days"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Q27 — PIVOT: per-day event counts spread into one column per event
    * type. The value list is EXPLICIT, which matters at scale twice
    * over: no distinct-discovery pre-job before the real aggregation,
    * and a deterministic output schema (a discovered list would change
    * shape with the data). One aggregation pass; absent (day, type)
    * cells are 0. Oracle = conditional aggregation, the relational core
    * of PIVOT.
    */
  val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  def q27Pivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .select(date_format(date_trunc("DAY", col("ts")), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .groupBy("day")
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("day")

  /** Q27b — UNPIVOT (melt): the inverse of [[q27Pivot]], stacking the
    * per-type columns back to (day, event_type, cnt) rows. Zero cells
    * are dropped so the round trip lands exactly on the plain
    * (day, type) counts — asserting pivot∘unpivot = identity at the
    * driver's oracle gate, not just in a unit test. */
  def q27bUnpivot(s: SparkSession, dir: String): DataFrame =
    q27Pivot(s, dir)
      .unpivot(Array(col("day")), eventTypes.map(col).toArray, "event_type", "cnt")
      .filter(col("cnt") > 0)
      .orderBy("day", "event_type")

  /** Q29 — ordered conversion funnel over events (view → click →
    * purchase): a user reaches stage k when an event of stage k's type
    * exists STRICTLY AFTER their earliest stage-(k−1) arrival — the
    * classic funnel semantics, expressed relationally as cascaded
    * min-ts aggregates + equi-joins rather than a per-user event-list
    * fold. Each stage is filter (pushed to the scan) → groupBy(user)
    * with map-side combine → hash join on user_id against the previous
    * stage's one-row-per-user table; no window over unbounded user
    * history, no collect_list of a user's events. Lag totals are kept
    * as EXACT integer micros (sum, not avg — average would accumulate
    * in doubles, whose order-sensitivity breaks cross-engine
    * bit-equality). */
  def q29Funnel(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.report(t(s, dir, "events"),
      "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
      .orderBy("stage")

  /** Q30 — FULL OUTER join, completing the join family (inner Q3,
    * anti Q2, semi Q13, cross Q17, range Q14, as-of Q22): high-balance
    * customers against their big-order stats, keeping unmatched rows
    * from BOTH sides (rich customers with no big orders; big orders by
    * non-rich customers). A shuffled hash/sort-merge join on the key —
    * full outer can't broadcast (both sides must surface unmatched
    * rows), which is exactly why it earns its own declared plan. */
  def q30FullOuter(s: SparkSession, dir: String): DataFrame = {
    val rich = t(s, dir, "customer").filter(col("c_acctbal") > 9000)
      .select(col("c_custkey"), round(col("c_acctbal"), 2).as("acctbal"))
    val big = t(s, dir, "orders").filter(col("o_totalprice") > 250000)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_big"), round(sum(col("o_totalprice")), 2).as("sum_big"))
    rich.join(big, rich("c_custkey") === big("o_custkey"), "full_outer")
      .select(coalesce(rich("c_custkey"), big("o_custkey")).as("custkey"),
        col("acctbal"), col("n_big"), col("sum_big"))
      .orderBy("custkey")
  }

  /** Q31 — correlated scalar subqueries, submitted as SQL so Catalyst's
    * DECORRELATION is the thing under test: the per-customer count and
    * max-price subqueries must rewrite to aggregates + joins (the plan
    * audit asserts no nested-loop re-execution survives) instead of
    * re-running per outer row, which is the difference between a plan
    * that works at 100 TB and one that never finishes. */
  def q31Correlated(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("graft_q31_customer")
    t(s, dir, "orders").createOrReplaceTempView("graft_q31_orders")
    s.sql("""
      SELECT c_custkey,
             (SELECT count(*) FROM graft_q31_orders o
              WHERE o.o_custkey = c.c_custkey) AS n_orders,
             (SELECT round(coalesce(max(o_totalprice), 0), 2) FROM graft_q31_orders o
              WHERE o.o_custkey = c.c_custkey) AS max_price
      FROM graft_q31_customer c
      ORDER BY c_custkey""")
  }

  /** Q32 — recursive CTE (Spark 4's WITH RECURSIVE): the ancestor walk
    * `key → key div 2 → … → 1` over customer keys, rolled up to chain
    * length per start key. Each recursion level is one distributed
    * self-union step — depth is log2(max key), so the iteration count
    * is bounded by KEY WIDTH (≤ 63), never by row count; the level
    * frontier stays the full key set but each step is a narrow
    * projection, no join. DuckDB runs the identical recursion for the
    * oracle.
    *
    * SCALE CAVEAT — the frontier here is NON-SHRINKING by design:
    * `WHERE cur > 1` sheds a row only when its chain terminates, so the
    * recursion does ~log2(maxKey) near-full-table passes. That is the
    * right shape for this arithmetic walk (each pass is a shuffle-free
    * narrow projection) but the WRONG shape for a production walk over
    * a graph table, where each level must be a frontier ⋈ edges JOIN so
    * per-level cost tracks the LIVE frontier, not the start set —
    * [[q33GraphWalk]] exercises exactly that shrinking-frontier shape. */
  def q32Recursive(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("graft_q32_customer")
    s.sql("""
      WITH RECURSIVE anc(start_key, cur, depth) AS (
        SELECT c_custkey, c_custkey, CAST(0 AS BIGINT) FROM graft_q32_customer
        UNION ALL
        SELECT start_key, cur div 2, depth + 1 FROM anc WHERE cur > 1)
      SELECT start_key AS c_custkey, max(depth) AS chain_len, count(*) AS n_nodes
      FROM anc GROUP BY start_key ORDER BY c_custkey""")
  }

  /** Q33 — recursive graph walk with a SHRINKING frontier: the
    * production counterpart of [[q32Recursive]]'s caveat. A
    * parent-pointer edge TABLE (child = c_custkey, parent = child
    * div 2, materialized from customer — standing in for any edge
    * relation) is walked upward from a sparse seed set (keys ≡ 0
    * mod 97) by joining the recursive frontier against the edges each
    * level: per-level cost tracks the LIVE frontier (seeds × 1, then
    * fewer as chains reach the root and fall off the join), never the
    * full table — the shape a 100 TB lineage/thread/category walk
    * needs. Termination is structural (the root has no edge row), not
    * a predicate. DuckDB runs the identical recursion for the oracle. */
  def q33GraphWalk(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("graft_q33_customer")
    s.sql("""
      WITH RECURSIVE
      edges AS (
        SELECT c_custkey AS child, c_custkey div 2 AS parent
        FROM graft_q33_customer WHERE c_custkey > 1),
      walk(start_key, cur, depth) AS (
        SELECT c_custkey, c_custkey, CAST(0 AS BIGINT)
        FROM graft_q33_customer WHERE c_custkey % 97 = 0
        UNION ALL
        SELECT w.start_key, e.parent, w.depth + 1
        FROM walk w JOIN edges e ON w.cur = e.child)
      SELECT start_key AS c_custkey, max(depth) AS chain_len, count(*) AS n_nodes
      FROM walk GROUP BY start_key ORDER BY c_custkey""")
  }

  /** Q34 — RANGE-frame window: per event, the same user's trailing-hour
    * event count and value sum — the frame class q10's ROWS frame
    * doesn't cover (value-based bounds: all equal-ts rows enter the
    * frame together, so ties need no ordering tiebreak at all). The
    * summed measure is integer CENTS (`round(value·100)`): engines
    * disagree on double addition ORDER inside sliding frames (running
    * accumulation vs segment trees), and integers make any order
    * exact. One exchange on user_id, both windows share it. */
  def q34RangeFrame(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(
      col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
      round(col("value") * 100).cast("long").as("cents"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-3600L * 1000000, 0)
    e.select(col("event_id"), col("user_id"),
        sum(col("cents")).over(w).as("hour_sum_cents"),
        count(lit(1)).over(w).as("hour_n"))
      .orderBy("event_id")
  }

  /** Q35 — DISTINCT aggregation inside a sliding window: per event, how
    * many distinct event types the user produced in the trailing hour
    * (the behavioral-diversity signal sessions/funnels threshold on).
    * Spark windows don't accept `count(DISTINCT …)` — the composition
    * is `size(collect_set(…))`, exact and deterministic because sets
    * have no order. The per-row set buffer is bounded by the TYPE
    * cardinality (a handful), not the frame length; for high-cardinality
    * measures (distinct users per domain-hour at 100 TB) the same frame
    * swaps collect_set for the mergeable HLL sketch ([[graft.functions
    * .HllAgg]]) — this query pins the exact form the sketch
    * approximates. Value-based frame ⇒ tie-insensitive. */
  def q35WindowDistinct(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("ts_us"), col("event_type"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-3600L * 1000000, 0)
    e.select(col("event_id"), col("user_id"),
        size(collect_set(col("event_type")).over(w)).as("distinct_types"))
      .orderBy("event_id")
  }

  /** Q36 — the remaining ranking-function family in one query: decile
    * buckets (`ntile`), `percent_rank`, and `cume_dist` of order value
    * within each customer segment — the stratified-bucketing primitives
    * a curation pipeline uses to carve quality strata per domain. The
    * within-partition order is `(price, orderkey)` — the double tie is
    * broken by the unique key, so positions (hence all three
    * functions) are engine-identical; percent_rank and cume_dist are
    * small exact rationals in double, bit-equal across engines.
    * Deciles roll up to per-(segment, decile) counts + integer-cent
    * sums; one exchange on the segment key. */
  def q36Ntile(s: SparkSession, dir: String): DataFrame = {
    val seg = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val o = t(s, dir, "orders")
      .join(seg, col("o_custkey") === col("c_custkey"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    o.select(col("c_mktsegment"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        ntile(10).over(w).as("decile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .groupBy(col("c_mktsegment"), col("decile"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
        round(min(col("pr")), 6).as("min_pr"),
        round(max(col("cd")), 6).as("max_cd"))
      .orderBy("c_mktsegment", "decile")
  }

  /** Q37 — forward-fill (gap repair): carry each user's last observed
    * measurement across nulled-out readings via `last(…, ignoreNulls)`
    * over a running frame — the time-series repair every sensor/metrics
    * warehouse applies before aggregation (and the window shape
    * [[graft.operators.AsOfJoin]] builds its union trick on). Readings
    * are nulled deterministically (every 3rd event id); integer cents;
    * users with no prior observation fill with the −1 sentinel. One
    * exchange on user_id. */
  def q37GapFill(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events").select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("ts_us"),
      when(col("event_id") % 3 === 0, lit(null))
        .otherwise(round(col("value") * 100).cast("long")).as("cents"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.select(col("event_id"), col("user_id"),
        coalesce(last(col("cents"), ignoreNulls = true).over(w), lit(-1L))
          .as("filled_cents"))
      .orderBy("event_id")
  }

  /** Q23 — gap-based sessionization (30-min gap) over events: the
    * lag-flag + running-sum window formulation; one shuffle+sort per
    * user ordering, no join. Streaming twin:
    * [[graft.streaming.SessionStream]] (flatMapGroupsWithState).
    */
  def q23Sessionize(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sessionize
      .sessions(t(s, dir, "events"), "user_id", "ts", "event_id",
        gapUs = 30L * 60 * 1000 * 1000)
      .orderBy("user_id", "session_no")
}
