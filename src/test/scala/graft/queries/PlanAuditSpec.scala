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
    "q24b_approx_percentiles", // 1-row sketch aggregate broadcast (rank gates)
    "events_hll_daily",     // 1-row merged-sketch estimate broadcast (union gate)
    "q17_cross_join",       // 5-row region × filtered part, explicit frontier semantics
    "q20_cosine_topk",      // 1-row query vector
    "dedup_jaccard",        // 1-row query document
    "dedup_jaccard_char",   // 1-row query document (char shingles)
    "dedup_containment",    // 1-row query document (asymmetric containment)
    "ann_q8_topk",          // 5-row quantized query set
    "ann_q8_range",         // 5-row quantized query set (radius variant)
    "ann_lsh_topk",         // exact-twin gate: 5-row probe broadcast
    "ann_ivf_topk",         // exact-twin gate: 5-row probe broadcast
    "ann_ivf_delta",        // exact-twin gate: 5-row probe broadcast (tail arm)
    "ann_ivf_kmeans",       // exact-twin gate: 5-row probe broadcast
    "ann_filtered",         // exact-twin gate: 5-row probe broadcast
                            // (filtered-subset candidates)
    "ann_ivfpq_topk",       // exact-twin gate: 5-row probe broadcast
    "emb_knn_graph",        // bounded probe batch (every 10th vector) broadcast
    "emb_hard_negatives",   // bounded probe batch (every 70th vector) broadcast
    "emb_mmr",              // 5-row query set broadcast into the pool build
    "emb_trunc_recall",     // same probe batch, two ranking passes
    "text_tfidf",           // 1-row corpus-size aggregate (scalar-subquery shape)
    "text_pmi",             // 1-row N_uni x N_bi totals broadcast
    "text_bm25",            // 1-row corpus-stats aggregate (N, S) broadcast
    "retrieve_hybrid",      // inherits text_bm25's 1-row stats broadcast
    "index_bm25_probe",     // 1-row PERSISTED stats read broadcast
    "index_bm25_phrase")    // 1-row phrase-df count + persisted stats broadcasts

  /** Queries allowed a BOUNDED number of SCALAR-BROADCAST BNLJs rather
    * than a blanket pass: graph_nf_hll unions one per-horizon delta
    * branch per dist (maxDist = 12), each cross-joining a keyless
    * 1-row mass aggregate (the BSP iterations' own crossJoins sit
    * behind localCheckpoints). The assert pins BOTH the count and the
    * build-side shape — a BNLJ whose build is NOT a scalar aggregate
    * is a leaked iteration join, not an intended one. */
  private val boundedScalarBnlj = Map(
    "graph_nf_hll"    -> 12,
    "dedup_simhash"   -> 2,  // 1-row recall-gate counts (n_found, n_planted)
    "dedup_embedding" -> 3,  // 1-row gate counts (n_found, n_stray, n_planted)
    "events_changepoint" -> 1, // 1-row max-|cusum| aggregate (peak flag);
                               // the totals broadcast sits behind the
                               // daily-frame localCheckpoint
    "stream_changepoint" -> 1, // the same shared CUSUM tail over the
                               // drained daily state
    "dq_drift"           -> 1, // 1-row TVD aggregate (the totals
                               // broadcast sits behind a checkpoint)
    "stream_drift"       -> 1) // the same shared drift tail over the
                               // drained census

  // an allowlist entry for a query that no longer exists would silently
  // grant a future query of that name an unreviewed BNLJ allowance
  test("every allowlist key names a declared query") {
    val declared = graft.SparkEntry.queries.keySet
    val dead = (intendedTinyBroadcast ++ boundedScalarBnlj.keySet) -- declared
    assert(dead.isEmpty, s"dead allowlist entries: ${dead.mkString(", ")}")
  }

  graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name: no cartesian product, no stray nested-loop join") {
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"cartesian product in $name:\n${plan.take(3000)}")
      val lines = plan.split('\n')
      val bnljAt = lines.indices.filter(i =>
        lines(i).contains("BroadcastNestedLoopJoin"))
      boundedScalarBnlj.get(name) match {
        case Some(cap) =>
          assert(bnljAt.length <= cap,
            s"$name: ${bnljAt.length} BNLJs, at most $cap intended " +
              s"(one 1-row scalar broadcast per horizon):\n${plan.take(3000)}")
          bnljAt.foreach { i =>
            val below = lines.slice(i + 1, i + 6).mkString("\n")
            assert(below.contains("HashAggregate(keys=[]"),
              s"$name: BNLJ at plan line $i whose build side is not a " +
                s"keyless scalar aggregate:\n$below")
          }
        case None => if (!intendedTinyBroadcast(name))
          assert(bnljAt.isEmpty,
            s"unintended BNLJ in $name:\n${plan.take(3000)}")
      }
    }
  }

  /** Column pruning must reach the parquet scan: a scan that reads
    * columns a query never touches wastes IO proportional to corpus
    * size at 100 TB. Representative queries per table; the assert is on
    * the scan's ReadSchema line, the ground truth of what gets read. */
  private val prunedScans = Seq(
    // (query, column that must NOT be read, column that must be)
    ("q18_tumbling_day", "props", "event_type"),     // events: never reads props
    ("q5_groupby_agg", "l_partkey", "l_quantity"),   // lineitem: no partkey
                                                     // (l_shipdate IS read — pushed filter)
    ("text_tokens", "source", "text"),               // documents: id+text only
    // (text_tfidf's tokenize scan sits behind a localCheckpoint and is
    //  invisible in the final plan; its projection is text_tokens' shape)
    ("corpus_interleave", "source", "lang"),         // documents: text+lang only
    ("dedup_exact", "lang", "text"),
    ("dedup_url", "o_orderstatus", "o_custkey"), // orders: keys only
    ("text_ngrams", "doc_id", "text"),           // documents: text only
    // (dedup_substring's windowed scan sits behind its localCheckpoint,
    //  invisible in the final plan — same situation as text_tfidf; its
    //  pre-checkpoint projection is text_ngrams' shape)
    ("q23_sessionize", "props", "user_id"),
    ("q14_range_join", "value", "user_id"),
    ("interval_join", "props", "user_id"),           // events: id+user+ts+type
    // (dq_drift's census scans sit behind driftReport's checkpoint,
    //  invisible in the final plan — the text_tfidf situation)
    ("domain_quota", "o_orderstatus", "o_custkey"),  // orders: keys only
    ("layout_zorder", "o_totalprice", "o_orderdate"),// orders: cluster dims only
    ("corpus_offsets", "source", "text"),            // documents: id+text only
    ("corpus_mix", "source", "lang"),                // documents: text+lang only
    ("corpus_reservoir", "source", "lang"),          // documents: id+text+lang
    ("emb_centroid", "vec_id", "label"),             // embeddings: vec+label only
    ("bpe_tokens", "source", "text"),                // documents: id+text only
    ("text_compress", "lang", "text"),               // documents: id+text only
    ("text_gopher", "source", "text"),               // documents: id+text only
    ("url_filter", "o_orderstatus", "o_custkey"),    // orders: keys only
    // (url_robots' frontier scan sits behind its localCheckpoint,
    //  invisible in the final plan — the text_tfidf situation; its
    //  pre-checkpoint projection is url_filter's shape)
    ("corpus_shard", "source", "text"),              // documents: id+text only
    ("corpus_token_budget", "source", "lang"),       // documents: id+lang+text
    ("text_winnow", "lang", "text"),                 // documents: id+text only
    ("q30_full_outer", "c_mktsegment", "c_acctbal"), // customer: key+balance only
    ("skew_join", "l_partkey", "l_quantity"),        // lineitem: key+qty only
    ("mm_curate", "text", "doc_id"),                 // documents: id only —
                                                     // the media sweep must
                                                     // never scan the payload
    ("mm_image_phash", "text", "doc_id"),            // documents: id only
    ("mm_audio_fp", "text", "doc_id"),               // documents: id only
    ("index_phrase_probe", "tf", "positions"),       // postings: positions, never tf
    ("dq_expectations", "o_orderstatus", "o_custkey"))  // orders: 4 metric cols only
    // (q33_graph_walk's scans sit inside the recursive-CTE loop nodes,
    //  which don't surface a ReadSchema line in the printed plan)
    // (text_familiarity's and corpus_incremental's shingle scans sit
    //  behind localCheckpoints, invisible in the final plan — the
    //  text_tfidf situation; q29_funnel likewise checkpoints per level)

  prunedScans.foreach { case (name, absent, present) =>
    test(s"$name: parquet scan prunes '$absent', reads '$present'") {
      val plan = graft.SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema:")).toSeq
      assert(readSchemas.nonEmpty, s"no parquet scan found in $name")
      assert(!readSchemas.exists(_.contains(absent)),
        s"$name reads unused column '$absent':\n${readSchemas.mkString("\n")}")
      assert(readSchemas.exists(_.contains(present)),
        s"$name scan missing required column '$present':\n${readSchemas.mkString("\n")}")
    }
  }

  test("graph family input: documents scan reads ONLY doc_id (text never leaves parquet)") {
    // The declared plans checkpoint their iteration inputs, so the
    // parquet scan is invisible in the final executedPlan — audit the
    // exact input frame the graph queries materialize instead. `text`
    // is documents' heavy column; reading it here would multiply the
    // scan IO of every graph query by the corpus payload size.
    import org.apache.spark.sql.functions._
    val dom = graft.core.Tables.t(spark, dir, "documents")
      .select((col("doc_id") % 100).as("node"))
    val readSchemas = dom.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("ReadSchema:")).toSeq
    assert(readSchemas.nonEmpty)
    assert(!readSchemas.exists(_.contains("text")),
      s"graph input reads documents.text:\n${readSchemas.mkString("\n")}")
    assert(readSchemas.exists(_.contains("doc_id")))
  }

  test("bucketed_join: zero Exchange — the shuffle was paid at write time") {
    // force the shuffled-join regime (sf0.001 would otherwise broadcast,
    // which has no exchange trivially): the bucketed layout must carry
    // the co-partitioning, so the sort-merge join plans with NO Exchange
    // anywhere — join AND final aggregation ride the bucket partitioning
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = graft.SparkEntry.queries("bucketed_join")(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join re-shuffles — bucket partitioning lost:\n${plan.take(3000)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("skew_join: AQE's runtime split handles the same join UNSALTED, answer-identical to the salted plan") {
    // The declared skew_join query pre-salts; this runs the identical
    // skewed join bare under AQE's skew-join optimization (thresholds
    // tuned down so the sf0.001 hot partition trips them) and asserts
    // (a) the optimizer really split — the final adaptive plan marks
    // the skew — and (b) the answer is bit-identical to the salted
    // plan, which the correctness gate already pins to the oracle.
    // Where each wins, test-verified here + scaladoc'd on SkewJoin:
    // AQE's split needs a runtime shuffle-join (forced by disabling
    // broadcast below) and spreads only the JOIN — a downstream
    // aggregation on the hot key re-concentrates unless salted, and
    // stateful streaming joins never get AQE at all.
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")   // force the shuffle-join regime
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1024")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // .repartition(8): AQE splits a skewed reduce partition at
      // MAP-OUTPUT-BLOCK granularity, and sf0.001's lineitem is one
      // parquet split = ONE map task, whose single block is
      // unsplittable — the split can never fire no matter the
      // thresholds. At 100 TB a scan has thousands of mappers so the
      // granularity is moot; at test scale it must be forced. (That
      // granularity limit is itself a reason salting can win: salting
      // spreads a hot key even when one mapper produced it.)
      val li = graft.core.Tables.t(spark, dir, "lineitem").select(
        when(pmod(col("l_orderkey"), lit(10)) < 7, lit(0L))
          .otherwise(pmod(col("l_orderkey"), lit(25)).cast("long"))
          .as("n_nationkey"),
        col("l_quantity").cast("long").as("q")).repartition(8)
      val dim = graft.core.Tables.t(spark, dir, "nation")
        .select(col("n_nationkey").cast("long").as("n_nationkey"), col("n_name"))
      val unsalted = li.join(dim, Seq("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_items"), sum(col("q")).as("sum_qty"))
        .orderBy("n_name")
      val aqeRows = unsalted.collect().toSeq
      // the FINAL adaptive plan (post-execution) must carry the skew
      // split — otherwise this test silently compares two unsplit plans
      val finalPlan = unsalted.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true") || finalPlan.contains("AQEShuffleRead skewed"),
        s"AQE skew split did not fire — thresholds no longer trip:\n${finalPlan.take(3000)}")
      val salted = graft.SparkEntry.queries("skew_join")(spark, dir).collect().toSeq
      assert(aqeRows == salted)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("runtime bloom filter: a selective dim predicate injects might_contain on the fact side, answer-identical") {
    // The 100 TB shuffle-pruning shape: when a dim table carries a
    // selective filter and the fact side is too big to broadcast-join,
    // Spark's InjectRuntimeFilter builds a bloom filter from the dim
    // keys and applies `might_contain` on the fact side BEFORE the
    // shuffle — most fact rows are dropped pre-exchange. Invisible at
    // test SFs (the 10 GB application-side threshold), so this audit
    // lowers the thresholds, forces the shuffle-join regime, and pins
    // (a) the filter really injects and (b) the answer is identical to
    // the un-filtered plan — the same force-then-assert treatment as
    // the AQE skew test above.
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    def query() = {
      val orders = graft.core.Tables.t(spark, dir, "orders")
        .filter(col("o_orderstatus") === "F" && col("o_orderkey") % 19 === 0)
        .select(col("o_orderkey"), col("o_custkey"))
      val li = graft.core.Tables.t(spark, dir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
      li.join(orders, Seq("o_orderkey"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
        .orderBy("o_custkey")
    }
    val plain = query().collect().toSeq
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1024")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = query()
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"runtime bloom filter did not inject:\n${optimized.take(3000)}")
      assert(q.collect().toSeq == plain)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("layout_zorder_stored: x-range filter prunes z-bucket directories at the scan") {
    val df = graft.SparkEntry.queries("layout_zorder_stored")(spark, dir)
    // sparkPlan, not executedPlan: AQE's wrapper has no children, so
    // collectLeaves on executedPlan never reaches the file scan
    val scan = df.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no file scan in layout_zorder_stored plan"))
    assert(scan.toString.contains("PartitionFilters: [zbucket"),
      s"zbucket candidates not applied as a partition filter:\n${scan.toString.take(2000)}")
    // only the 16 candidate directories (x>>6 = 1) are listed, and
    // the partitions that survive really cover x ∈ [64, 127] only
    val parts = scan.relation.location.listFiles(scan.partitionFilters, Nil)
    assert(parts.size <= 16, s"${parts.size} z-bucket dirs listed; pruning must keep <= 16 of 256")
    // layout invariance double-check: pruned read == plain computation
    import org.apache.spark.sql.functions._
    val plain = graft.core.Tables.t(spark, dir, "orders")
      .select((col("o_custkey") % 1024).cast("long").as("x"),
        (datediff(to_date(col("o_orderdate")), lit("1970-01-01")) % 1024).cast("long").as("y"))
      .filter(col("x").between(64, 127))
      .groupBy("x").agg(count(lit(1)).as("n"), sum(col("y")).as("sum_y"))
      .orderBy("x").collect().toSeq
    assert(df.collect().toSeq == plain)
  }

  test("layout_zonemap_stored: receipt predicate prunes ship-range dirs via the stats sidecar") {
    // The predicate column (receipt_days) is NOT the layout key — the
    // candidate set exists only because the build collected per-range
    // min/max stats. The sidecar-derived bin list must still reach the
    // scan as a static partition filter, and the receipt-trails-ship
    // correlation bounds the listing to the window's ~3 ranges.
    val df = graft.SparkEntry.queries("layout_zonemap_stored")(spark, dir)
    val scan = df.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no file scan in layout_zonemap_stored plan"))
    assert(scan.toString.contains("PartitionFilters: [bin"),
      s"sidecar bins not applied as a partition filter:\n${scan.toString.take(2000)}")
    val parts = scan.relation.location.listFiles(scan.partitionFilters, Nil)
    assert(parts.size <= 4,
      s"${parts.size} ship-range dirs listed; the 60-day receipt window must keep <= 4 of ~63")
    // sidecar invariance double-check: pruned read == plain computation
    import org.apache.spark.sql.functions._
    val plain = graft.core.Tables.t(spark, dir, "lineitem")
      .select((datediff(to_date(col("l_shipdate")), lit("1992-01-01")).cast("long")
        + col("l_orderkey") % 30).as("receipt_days"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"),
        col("l_returnflag"))
      .filter(col("receipt_days").between(1900, 1959))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
      .orderBy("l_returnflag").collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rows = df.collect().toSeq
    assert(rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))) == plain)
    // the pruning contract the sidecar exists for: few ranges read, many present
    assert(rows.head.getLong(3) <= 4L && rows.head.getLong(4) >= 50L,
      s"bins_read=${rows.head.getLong(3)} bins_total=${rows.head.getLong(4)}")
  }

  test("index_trgm_probe: the needle's trigram buckets prune posting dirs at the scan") {
    val df = graft.SparkEntry.queries("index_trgm_probe")(spark, dir)
    // the posting probe runs pre-checkpoint; audit the probe frame the
    // declared query builds (the invStore situation) via the store API
    import org.apache.spark.sql.functions._
    val grams = "merge part".sliding(3).toSeq.distinct
    val buckets = grams.map { g =>
      val c = new java.util.zip.CRC32()
      c.update(g.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      (c.getValue % 64).toLong
    }.distinct
    val probe = spark.read.parquet(
        graft.queries.Extensions.trgmStorePath(spark, dir))
      .filter(col("gbucket").isin(buckets: _*) && col("gram").isin(grams: _*))
    // answer sanity: verified ⊆ candidates and the exact scan agrees
    val plain = graft.core.Tables.t(spark, dir, "documents")
      .filter(instr(lower(col("text")), "merge part") > 0)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == plain)
    assert(rows.forall(_.getLong(1) >= plain.size))   // conjunction over-approximates
    // pruning: the needle's 8 grams hash into <= 8 of 64 directories
    val scan = probe.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no file scan under the trigram probe"))
    val parts = scan.relation.location.listFiles(scan.partitionFilters, Nil)
    assert(parts.size <= grams.size,
      s"${parts.size} gram dirs listed; probe must keep <= ${grams.size} of 64")
  }

  test("cdc_apply_stored: file-group filter prunes k_bucket directories at the scan") {
    val df = graft.SparkEntry.queries("cdc_apply_stored")(spark, dir)
    val scan = df.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no file scan in cdc_apply_stored plan"))
    assert(scan.toString.contains("PartitionFilters: [") &&
      scan.toString.contains("k_bucket"),
      s"k_bucket not applied as a partition filter:\n${scan.toString.take(2000)}")
    // only the 4 compacted file groups' directory trees are listed —
    // every seq_era within them (the key's whole history), no others
    val parts = scan.relation.location.listFiles(scan.partitionFilters, Nil)
    val buckets = parts.map(_.values.getInt(0)).distinct
    assert(buckets.forall(_ < 4) && buckets.nonEmpty,
      s"pruning must keep only k_bucket 0..3, listed: $buckets")
    // storage invariance: compacting the stored log == compacting the
    // derived log restricted to the same buckets
    import org.apache.spark.sql.functions._
    val plain = graft.queries.Extensions.cdcApply(spark, dir)
      .filter(col("k") % 16 < 4).collect().toSeq
    assert(df.collect().toSeq == plain)
  }

  test("cdc_time_travel: as-of filter prunes seq_era directories at the scan") {
    val df = graft.SparkEntry.queries("cdc_time_travel")(spark, dir)
    val scan = df.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no file scan in cdc_time_travel plan"))
    assert(scan.toString.contains("PartitionFilters: [") &&
      scan.toString.contains("seq_era"),
      s"seq_era not applied as a partition filter:\n${scan.toString.take(2000)}")
    // the time dimension prunes: every era directory written after the
    // as-of point vanishes from the listing (key buckets all survive —
    // a snapshot spans the whole key domain)
    import org.apache.spark.sql.functions._
    val log = graft.streaming.CdcStream.changeLog(
      graft.core.Tables.t(spark, dir, "orders"))
    val env = log.agg(min(col("seq")).cast("long"), max(col("seq")).cast("long")).head()
    val asOf = (env.getLong(0) + env.getLong(1)) / 2
    val maxEra = asOf / 10000L
    val parts = scan.relation.location.listFiles(scan.partitionFilters, Nil)
    // partition schema order is (k_bucket, seq_era); inferred int
    val eras = parts.map(_.values.getInt(1).toLong).distinct
    assert(eras.nonEmpty && eras.forall(_ <= maxEra),
      s"pruning must keep only seq_era <= $maxEra, listed: $eras")
    // replay invariance: the as-of snapshot == the derived log filtered
    // to seq <= S and compacted (time travel changes WHERE we cut the
    // log, never the merge semantics)
    val plain = log.filter(col("seq") <= asOf)
      .groupBy(col("k"))
      .agg(max(struct(col("seq"), col("op"), col("cents"))).as("m"))
      .filter(col("m.op") =!= "D")
      .select(col("k"), col("m.seq").as("seq"), col("m.cents").as("cents"),
        lit(asOf).as("as_of_seq"))
      .orderBy("k").collect().toSeq
    assert(df.collect().toSeq == plain)
  }

  test("cdc_compact_rewrite: bucket filter prunes BOTH the base and the live-log scans") {
    val df = graft.SparkEntry.queries("cdc_compact_rewrite")(spark, dir)
    val scans = df.queryExecution.sparkPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(scans.size == 2, s"expected base + live-log scans, got ${scans.size}")
    scans.foreach { scan =>
      assert(scan.toString.contains("PartitionFilters: [") &&
        scan.toString.contains("k_bucket"),
        s"k_bucket not a partition filter:\n${scan.toString.take(2000)}")
      val parts = scan.relation.location.listFiles(scan.partitionFilters, Nil)
      val buckets = parts.map(_.values.getInt(0)).distinct
      assert(buckets.forall(_ < 4) && buckets.nonEmpty,
        s"pruning must keep only k_bucket 0..3, listed: $buckets")
    }
    // storage invariance: compact-then-merge == whole-log compaction
    import org.apache.spark.sql.functions._
    val plain = graft.queries.Extensions.cdcApply(spark, dir)
      .filter(col("k") % 16 < 4).collect().toSeq
    assert(df.collect().toSeq == plain)
  }

  test("layout_hilbert_stored: x-range filter prunes exactly the strip's 16x16 blocks") {
    val df = graft.SparkEntry.queries("layout_hilbert_stored")(spark, dir)
    val scan = df.queryExecution.sparkPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
      .getOrElse(fail("no file scan in layout_hilbert_stored plan"))
    assert(scan.toString.contains("PartitionFilters: [hbucket"),
      s"hbucket candidates not applied as a partition filter:\n${scan.toString.take(2000)}")
    // each bucket is one level-4 quadrant block; the 64-column strip
    // touches exactly 64 of 256 — pruning == predicate selectivity
    val parts = scan.relation.location.listFiles(scan.partitionFilters, Nil)
    assert(parts.size <= 64, s"${parts.size} hilbert dirs listed; pruning must keep <= 64 of 256")
    import org.apache.spark.sql.functions._
    val plain = graft.core.Tables.t(spark, dir, "orders")
      .select((col("o_custkey") % 256).cast("long").as("x"),
        (datediff(to_date(col("o_orderdate")), lit("1970-01-01")) % 256).cast("long").as("y"))
      .filter(col("x").between(64, 127))
      .groupBy("x").agg(count(lit(1)).as("n"), sum(col("y")).as("sum_y"))
      .orderBy("x").collect().toSeq
    assert(df.collect().toSeq == plain)
  }

  test("q14_range_join: shuffle key is (user_id, hour_bucket), never bare user_id") {
    // at sf0.001 the tiny side broadcasts (fine); what must hold at any
    // plan choice is the equi-key arity — (user_id, hour_bucket), so a
    // shuffled variant at scale hashes on the composite key
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    val sp = graft.SparkEntry.queries("q14_range_join")(spark, dir)
      .queryExecution.sparkPlan
    val keyCounts = sp.collect {
      case j: SortMergeJoinExec    => j.leftKeys.length
      case j: ShuffledHashJoinExec => j.leftKeys.length
      case j: BroadcastHashJoinExec => j.leftKeys.length
    }
    assert(keyCounts.nonEmpty, s"no shuffled equi-join found in q14 plan:\n$sp")
    assert(keyCounts.forall(_ >= 2),
      s"q14 self-join shuffles on a single key — hot-user skew guard lost:\n$sp")
  }

  test("BSP lineage discipline: optimized plan size of iteration k is CONSTANT in k") {
    // The per-iteration localCheckpoint in the Graph module is what
    // prevents the classic iterative-Spark failure: without the cut,
    // iteration k's logical plan contains every prior join and grows
    // exponentially (analysis time AND re-execution). Pin it: the
    // returned frame's optimized plan must be the same size whether the
    // loop ran 2 times or 8 — if anyone removes a checkpoint, the node
    // count becomes a function of k and this fails loudly.
    import spark.implicits._
    val edges = Seq(0L -> 1L, 1L -> 2L, 2L -> 0L, 2L -> 3L).toDF("src", "dst")
    val nodes = (0L to 3L).toDF("node")
    def planSize(df: org.apache.spark.sql.DataFrame): Int = {
      var n = 0
      df.queryExecution.optimizedPlan.foreach(_ => n += 1)
      n
    }
    val prSizes = Seq(2, 5, 8).map(k =>
      planSize(graft.operators.Graph.pageRankE9(edges, nodes, k)))
    assert(prSizes.distinct.size == 1,
      s"pageRankE9 plan grows with iterations: $prSizes — a lineage cut was lost")
    val ccSizes = Seq(2, 5, 8).map(k =>
      planSize(graft.operators.Graph.connectedComponentsMinLabel(edges, nodes, k)))
    assert(ccSizes.distinct.size == 1,
      s"connectedComponentsMinLabel plan grows with iterations: $ccSizes — a lineage cut was lost")
  }

  test("q14_range_join: hot-user fixture — operator exact, bucket bounds the key") {
    // one hot user, 2000 events spread uniformly over 100 hours: with
    // the bare user_id key every event lands on ONE shuffle key
    // (fan-in n); with (user_id, hour_bucket) the max key holds ~n/100.
    // The guard must not change semantics: the operator's pair count is
    // checked against the closed-form answer (events every 180 s → each
    // pairs with the next 20 within the inclusive 1-hour window).
    import org.apache.spark.sql.functions.{floor, max, unix_timestamp}
    import spark.implicits._
    val n = 2000
    val base = 1700000000L
    val hot = (0 until n).map { i =>
      (42L, new java.sql.Timestamp((base + i.toLong * 180) * 1000L), i.toLong)
    }.toDF("user_id", "ts", "event_id")
    val maxBucket = hot
      .groupBy($"user_id", floor(unix_timestamp($"ts") / 3600).as("hb")).count()
      .agg(max($"count")).as[Long].head()
    assert(maxBucket <= 2L * n / 100,
      s"hour bucket did not spread the hot key: max=$maxBucket")
    val tmp = java.nio.file.Files.createTempDirectory("q14skew").toString
    hot.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = graft.queries.Inventory.q14RangeJoin(spark, tmp).collect()
    val expected = (0 until n).map(i => math.min(20, n - 1 - i)).sum.toLong
    assert(out.length == 1 && out.head.getLong(0) == 42L)
    assert(out.head.getLong(1) == expected)
  }
}
