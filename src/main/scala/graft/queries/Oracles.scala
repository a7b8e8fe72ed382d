package graft.queries

/** DuckDB oracle SQL for [[Inventory]] — same semantics, same column
  * names, same total ORDER BY, same rounding. Only queries whose result
  * is exactly reproducible outside Spark get an oracle; sketch-based or
  * hash-seeded operators (q8, minhash, simhash, …) are rows-only checked
  * by the driver and bound by ScalaTest assertions instead.
  */
object Oracles {

  val q1DerivedKey: String =
    """SELECT concat_ws('-', strftime(o_orderdate, '%Y-%m-%d'), o_orderkey, o_custkey, o_orderpriority) AS uniq_id,
      |       o_orderkey, o_custkey
      |FROM orders ORDER BY uniq_id LIMIT 100""".stripMargin

  val q2AntiJoin: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus
      |FROM orders o
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  val q3DimJoin: String =
    """SELECT c_custkey, n_name, r_name
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |ORDER BY c_custkey""".stripMargin

  val q4ScalarSubquery: String =
    """SELECT count(*) AS cnt FROM orders
      |WHERE o_orderdate >= (SELECT min(o_orderdate) FROM orders WHERE o_orderstatus = 'F')""".stripMargin

  val q5GroupbyAgg: String =
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 2) AS sum_qty,
      |       round(sum(l_extendedprice), 2) AS sum_base_price,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |       round(avg(l_quantity), 2) AS avg_qty,
      |       round(avg(l_extendedprice), 2) AS avg_price,
      |       round(avg(l_discount), 2) AS avg_disc,
      |       count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  val q6Distinct: String =
    """SELECT count(DISTINCT l_partkey) AS n_parts, count(DISTINCT l_suppkey) AS n_supps
      |FROM lineitem""".stripMargin

  val q6bDistinctValues: String =
    "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"

  val q7Rollup: String =
    """SELECT * FROM (
      |  SELECT coalesce(n_name, '(all)') AS n_name,
      |         coalesce(c_mktsegment, '(all)') AS c_mktsegment,
      |         count(*) AS cnt,
      |         round(sum(c_acctbal), 2) AS sum_bal
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY ROLLUP(n_name, c_mktsegment)
      |) ORDER BY n_name, c_mktsegment""".stripMargin

  /** [[Inventory.q8ApproxDistinct]]: the sketch estimate is
    * engine-specific, so the oracle pins the EXACT count and err_gate=0
    * — a sketch past 5% error flips err_gate and fails the hash. */
  val q8ApproxDistinct: String =
    """SELECT count(DISTINCT l_orderkey) AS exact_orders,
      |       count(*) AS n_rows,
      |       CAST(0 AS BIGINT) AS err_gate
      |FROM lineitem""".stripMargin

  val q9WindowRank: String =
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
      |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      |  FROM orders
      |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  val q10WindowFrame: String =
    """SELECT o_custkey, o_orderkey,
      |       round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  val q11TopK: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice
      |FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      |LIMIT 50""".stripMargin

  val q12SetOps: String =
    """SELECT * FROM (
      |  SELECT 'except' AS op, custkey FROM (
      |    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |    EXCEPT
      |    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |  UNION ALL
      |  SELECT 'intersect' AS op, custkey FROM (
      |    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |    INTERSECT
      |    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |) ORDER BY op, custkey""".stripMargin

  val q13SemiJoin: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders)
      |ORDER BY c_custkey""".stripMargin

  val q14RangeJoin: String =
    """SELECT e1.user_id AS user_id, count(*) AS n_pairs
      |FROM events e1 JOIN events e2
      |  ON e1.user_id = e2.user_id
      | AND e2.ts >= e1.ts AND e2.ts <= e1.ts + INTERVAL 1 HOUR
      | AND e1.event_id < e2.event_id
      |GROUP BY e1.user_id ORDER BY user_id""".stripMargin

  /** Mirrors Inventory.phoneExtractChain exactly: same punctuation set
    * (string.punctuation minus '$'), same fixed zero..nine replace order,
    * same [7,11] length filter, distinct, ascending sort, ';' join. */
  val q15PhoneRegex: String =
    """SELECT doc_id,
      |  coalesce(array_to_string(list_sort(list_distinct(list_filter(
      |    regexp_extract_all(
      |      replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(
      |        replace(translate(lower(text), '!"#%&''()*+,-./:;<=>?@[\]^_`{|}~', ''), ' ', ''),
      |        'zero','0'),'one','1'),'two','2'),'three','3'),'four','4'),
      |        'five','5'),'six','6'),'seven','7'),'eight','8'),'nine','9'),
      |      '[0-9]+'),
      |    x -> len(x) BETWEEN 7 AND 11))), ';'), '') AS phones
      |FROM documents ORDER BY doc_id""".stripMargin

  val q16DateJson: String =
    """SELECT event_type, count(*) AS cnt,
      |       round(sum(value), 2) AS sum_value,
      |       round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 2) AS avg_k,
      |       strftime(min(date_trunc('day', ts)), '%Y-%m-%d') AS first_day,
      |       strftime(max(date_trunc('day', ts)), '%Y-%m-%d') AS last_day
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val q17CrossJoin: String =
    """SELECT r_name, count(*) AS cnt
      |FROM region CROSS JOIN (SELECT * FROM part WHERE p_size < 10)
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  val q18TumblingDay: String =
    """SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |       count(*) AS cnt, round(sum(value), 2) AS sum_value
      |FROM events GROUP BY event_type, day ORDER BY event_type, day""".stripMargin

  val q19GroupingSets: String =
    """SELECT * FROM (
      |  SELECT coalesce(event_type, '(all)') AS event_type,
      |         coalesce(day, '(all)') AS day,
      |         count(*) AS cnt
      |  FROM (SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day FROM events)
      |  GROUP BY GROUPING SETS ((event_type), (event_type, day), ())
      |) ORDER BY event_type, day""".stripMargin

  val q20CosineTopk: String =
    """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings WHERE vec_id = 0)
      |SELECT vec_id, label,
      |       round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qvec), 4) AS sim
      |FROM embeddings, q
      |ORDER BY sim DESC, vec_id LIMIT 20""".stripMargin

  val q21ArrayOps: String =
    """SELECT label, count(*) AS cnt, min(len(embedding)) AS min_len, max(len(embedding)) AS max_len
      |FROM embeddings GROUP BY label ORDER BY label""".stripMargin

  val q22AsofJoin: String =
    """WITH purchases AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      |views AS (SELECT event_id AS view_id, user_id, ts FROM events WHERE event_type = 'view')
      |SELECT p.event_id, p.user_id, v.view_id AS matched_view_id,
      |       epoch_us(p.ts) - epoch_us(v.ts) AS lag_us
      |FROM purchases p ASOF LEFT JOIN views v
      |  ON p.user_id = v.user_id AND p.ts >= v.ts
      |ORDER BY event_id""".stripMargin

  val q24Percentiles: String =
    """SELECT round(quantile_cont(len(text), 0.5), 2) AS p50,
      |       round(quantile_cont(len(text), 0.9), 2) AS p90,
      |       round(quantile_cont(len(text), 0.99), 2) AS p99,
      |       count(*) AS n
      |FROM documents""".stripMargin

  /** [[Inventory.q24bApproxPercentiles]]: exact interpolated
    * percentiles plus the three rank-accuracy gates pinned to 0 —
    * a sketch whose element drifts outside its ±1% rank window flips
    * a gate and fails the hash. */
  val q24bApproxPercentiles: String =
    """SELECT round(quantile_cont(len(text), 0.5), 2) AS p50,
      |       round(quantile_cont(len(text), 0.9), 2) AS p90,
      |       round(quantile_cont(len(text), 0.99), 2) AS p99,
      |       count(*) AS n,
      |       CAST(0 AS BIGINT) AS g50,
      |       CAST(0 AS BIGINT) AS g90,
      |       CAST(0 AS BIGINT) AS g99
      |FROM documents""".stripMargin

  val q25TopkAgg: String =
    """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date, rn
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_orderdate,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders)
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  val q26Cube: String =
    """SELECT coalesce(n_name, '(all)') AS n_name,
      |       coalesce(c_mktsegment, '(all)') AS c_mktsegment,
      |       count(*) AS cnt, round(avg(c_acctbal), 2) AS avg_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY CUBE (n_name, c_mktsegment)
      |ORDER BY n_name, c_mktsegment""".stripMargin

  val q28WindowNav: String =
    """SELECT o_custkey, o_orderkey,
      |       date_diff('day', lag(o_orderdate, 1) OVER w, o_orderdate)::BIGINT AS gap_days,
      |       CAST(ntile(4) OVER w AS INT) AS quartile,
      |       round(percent_rank() OVER w, 6) AS pct_rank
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** PIVOT's relational core, spelled as conditional aggregation (the
    * column list mirrors [[Inventory.eventTypes]]). */
  val q27Pivot: String = {
    val cols = graft.queries.Inventory.eventTypes.map { t =>
      s"count(*) FILTER (WHERE event_type = '$t') AS \"$t\""
    }.mkString(",\n       |       ")
    s"""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       |       $cols
       |FROM events GROUP BY day ORDER BY day""".stripMargin
  }

  /** The unpivoted round trip collapses back to the plain counts. */
  val q27bUnpivot: String =
    """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
      |       event_type, count(*) AS cnt
      |FROM events GROUP BY day, event_type ORDER BY day, event_type""".stripMargin

  val q23Sessionize: String =
    """WITH x AS (
      |  SELECT user_id, ts, event_id,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |              THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |y AS (
      |  SELECT user_id, ts,
      |         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                          ROWS UNBOUNDED PRECEDING) AS session_no
      |  FROM x)
      |SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
      |       count(*) AS n_events,
      |       epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
      |FROM y GROUP BY user_id, session_no
      |ORDER BY user_id, session_no""".stripMargin

  val q30FullOuter: String =
    """WITH rich AS (SELECT c_custkey, round(c_acctbal, 2) AS acctbal
      |              FROM customer WHERE c_acctbal > 9000),
      |big AS (SELECT o_custkey, count(*) AS n_big,
      |               round(sum(o_totalprice), 2) AS sum_big
      |        FROM orders WHERE o_totalprice > 250000 GROUP BY 1)
      |SELECT coalesce(rich.c_custkey, big.o_custkey) AS custkey,
      |       acctbal, n_big, sum_big
      |FROM rich FULL OUTER JOIN big ON rich.c_custkey = big.o_custkey
      |ORDER BY custkey""".stripMargin

  /** Q31's correlated subqueries verbatim — DuckDB decorrelates the
    * same shape, so the two optimizers must land on identical values. */
  val q31Correlated: String =
    """SELECT c_custkey,
      |       (SELECT count(*) FROM orders o
      |        WHERE o.o_custkey = c.c_custkey) AS n_orders,
      |       (SELECT round(coalesce(max(o_totalprice), 0), 2) FROM orders o
      |        WHERE o.o_custkey = c.c_custkey) AS max_price
      |FROM customer c
      |ORDER BY c_custkey""".stripMargin

  /** Q32's recursion verbatim (DuckDB `//` = Spark `div`). */
  val q32Recursive: String =
    """WITH RECURSIVE anc(start_key, cur, depth) AS (
      |  SELECT c_custkey, c_custkey, CAST(0 AS BIGINT) FROM customer
      |  UNION ALL
      |  SELECT start_key, cur // 2, depth + 1 FROM anc WHERE cur > 1)
      |SELECT start_key AS c_custkey, max(depth) AS chain_len, count(*) AS n_nodes
      |FROM anc GROUP BY start_key ORDER BY c_custkey""".stripMargin

  /** [[Inventory.q33GraphWalk]]'s identical recursion — frontier ⋈
    * edge-table walk from the sparse seed set. */
  val q33GraphWalk: String =
    """WITH RECURSIVE
      |edges AS (
      |  SELECT c_custkey AS child, c_custkey // 2 AS parent
      |  FROM customer WHERE c_custkey > 1),
      |walk(start_key, cur, depth) AS (
      |  SELECT c_custkey, c_custkey, CAST(0 AS BIGINT)
      |  FROM customer WHERE c_custkey % 97 = 0
      |  UNION ALL
      |  SELECT w.start_key, e.parent, w.depth + 1
      |  FROM walk w JOIN edges e ON w.cur = e.child)
      |SELECT start_key AS c_custkey, max(depth) AS chain_len, count(*) AS n_nodes
      |FROM walk GROUP BY start_key ORDER BY c_custkey""".stripMargin

  val q29Funnel: String =
    """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
      |           WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(e.ts) AS c_ts, min(v.v_ts) AS v_ts
      |      FROM events e JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY 1),
      |p AS (SELECT e.user_id, min(e.ts) AS p_ts, min(c.c_ts) AS c_ts
      |      FROM events e JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY 1)
      |SELECT '1_view' AS stage, count(*) AS n_users, CAST(NULL AS BIGINT) AS sum_lag_us FROM v
      |UNION ALL
      |SELECT '2_click', count(*),
      |       CAST(sum(epoch_us(c_ts) - epoch_us(v_ts)) AS BIGINT) FROM c
      |UNION ALL
      |SELECT '3_purchase', count(*),
      |       CAST(sum(epoch_us(p_ts) - epoch_us(c_ts)) AS BIGINT) FROM p
      |ORDER BY stage""".stripMargin

  /** [[Inventory.q34RangeFrame]]: the identical value-based frame;
    * cents are integers so the sliding sum is addition-order-exact,
    * and DuckDB's HUGEINT sum is cast back to BIGINT. */
  val q34RangeFrame: String =
    """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
      |                  CAST(round(value * 100) AS BIGINT) AS cents
      |           FROM events)
      |SELECT event_id, user_id,
      |       CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts_us
      |         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT)
      |         AS hour_sum_cents,
      |       count(*) OVER (PARTITION BY user_id ORDER BY ts_us
      |         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS hour_n
      |FROM e ORDER BY event_id""".stripMargin

  /** [[Inventory.q35WindowDistinct]]: DuckDB windows DO accept
    * `count(DISTINCT …)` — the direct form of Spark's
    * size∘collect_set composition. */
  val q35WindowDistinct: String =
    """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type
      |           FROM events)
      |SELECT event_id, user_id,
      |       CAST(count(DISTINCT event_type) OVER (
      |         PARTITION BY user_id ORDER BY ts_us
      |         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT)
      |         AS distinct_types
      |FROM e ORDER BY event_id""".stripMargin

  /** [[Inventory.q36Ntile]]: identical `(price, orderkey)` total order,
    * identical decile rollup; HUGEINT sums cast back. */
  val q36Ntile: String =
    """WITH o AS (
      |  SELECT c.c_mktsegment,
      |         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents,
      |         ntile(10) OVER w AS decile,
      |         percent_rank() OVER w AS pr,
      |         cume_dist() OVER w AS cd
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  WINDOW w AS (PARTITION BY c.c_mktsegment
      |               ORDER BY o.o_totalprice, o.o_orderkey))
      |SELECT c_mktsegment, CAST(decile AS BIGINT) AS decile,
      |       count(*) AS n, CAST(sum(cents) AS BIGINT) AS sum_cents,
      |       round(min(pr), 6) AS min_pr, round(max(cd), 6) AS max_cd
      |FROM o GROUP BY 1, 2 ORDER BY c_mktsegment, decile""".stripMargin

  /** [[Inventory.q37GapFill]]: DuckDB's `IGNORE NULLS` window syntax,
    * identical running frame and (ts, id) order. */
  val q37GapFill: String =
    """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
      |                  CASE WHEN event_id % 3 = 0 THEN NULL
      |                       ELSE CAST(round(value * 100) AS BIGINT) END AS cents
      |           FROM events)
      |SELECT event_id, user_id,
      |       coalesce(last_value(cents IGNORE NULLS) OVER (
      |         PARTITION BY user_id ORDER BY ts_us, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1)
      |         AS filled_cents
      |FROM e ORDER BY event_id""".stripMargin
}
