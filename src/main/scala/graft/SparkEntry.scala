package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Extensions => E, ExtensionOracles => EO, Inventory => I, Oracles => O, StreamingOracles => SO, StreamingQueries => SQ}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` holds one entry per implemented operator from SURVEY.md §2;
  * `oracleSql` holds the DuckDB-equivalent SQL for every entry whose
  * result is exactly reproducible outside Spark (same column names, same
  * total ORDER BY, same rounding). Entries without an oracle are
  * rows-only checked by the driver and asserted in ScalaTest.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    I.q5GroupbyAgg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_derived_key"    -> (I.q1DerivedKey(_, _)),
    "q2_anti_join"      -> (I.q2AntiJoin(_, _)),
    "q3_dim_join"       -> (I.q3DimJoin(_, _)),
    "q4_scalar_subquery" -> (I.q4ScalarSubquery(_, _)),
    "q5_groupby_agg"    -> (I.q5GroupbyAgg(_, _)),
    "q6_distinct"       -> (I.q6Distinct(_, _)),
    "q6b_distinct_values" -> (I.q6bDistinctValues(_, _)),
    "q7_rollup"         -> (I.q7Rollup(_, _)),
    "q8_approx_distinct" -> (I.q8ApproxDistinct(_, _)),
    "q9_window_rank"    -> (I.q9WindowRank(_, _)),
    "q10_window_frame"  -> (I.q10WindowFrame(_, _)),
    "q11_topk"          -> (I.q11TopK(_, _)),
    "q12_setops"        -> (I.q12SetOps(_, _)),
    "q13_semi_join"     -> (I.q13SemiJoin(_, _)),
    "q14_range_join"    -> (I.q14RangeJoin(_, _)),
    "q15_phone_regex"   -> (I.q15PhoneRegex(_, _)),
    "q16_date_json"     -> (I.q16DateJson(_, _)),
    "q17_cross_join"    -> (I.q17CrossJoin(_, _)),
    "q18_tumbling_day"  -> (I.q18TumblingDay(_, _)),
    "q19_grouping_sets" -> (I.q19GroupingSets(_, _)),
    "q20_cosine_topk"   -> (I.q20CosineTopk(_, _)),
    "q21_array_ops"     -> (I.q21ArrayOps(_, _)),
    "q22_asof_join"     -> (I.q22AsofJoin(_, _)),
    "q23_sessionize"    -> (I.q23Sessionize(_, _)),
    "q24_percentiles"   -> (I.q24Percentiles(_, _)),
    "q25_topk_agg"      -> (I.q25TopkAgg(_, _)),
    "q26_cube"          -> (I.q26Cube(_, _)),
    "q27_pivot"         -> (I.q27Pivot(_, _)),
    "q27b_unpivot"      -> (I.q27bUnpivot(_, _)),
    "q28_window_nav"    -> (I.q28WindowNav(_, _)),
    // LLM-data-pipeline operators (BASELINE.json north star)
    "dedup_exact"       -> (E.dedupExact(_, _)),
    "dedup_url"         -> (E.dedupUrl(_, _)),
    "dedup_substring"   -> (E.dedupSubstring(_, _)),
    "text_ngrams"       -> (E.textNgrams(_, _)),
    "dedup_jaccard"     -> (E.dedupJaccard(_, _)),
    "dedup_jaccard_char" -> (E.dedupJaccardChar(_, _)),
    "dedup_minhash"     -> (E.dedupMinhash(_, _)),
    "dedup_minhash_verify" -> (E.dedupMinhashVerify(_, _)),
    "dedup_simhash"     -> (E.dedupSimhash(_, _)),
    "dedup_embedding"   -> (E.dedupEmbedding(_, _)),
    "ann_lsh_topk"      -> (E.annLsh(_, _)),
    "ann_ivf_topk"      -> (E.annIvf(_, _)),
    "ann_ivf_stored"    -> (E.annIvfStored(_, _)),
    "ann_ivf_kmeans"    -> (E.annIvfKmeans(_, _)),
    "ann_ivfpq_topk"    -> (E.annIvfPq(_, _)),
    "emb_quantize"      -> (E.embQuantize(_, _)),
    "ann_q8_topk"       -> (E.annQ8(_, _)),
    "corpus_split"      -> (E.corpusSplit(_, _)),
    "corpus_sample"     -> (E.corpusSample(_, _)),
    "corpus_pack"       -> (E.corpusPack(_, _)),
    "corpus_interleave" -> (E.corpusInterleave(_, _)),
    "corpus_mix"        -> (E.corpusMix(_, _)),
    "corpus_decontam"   -> (E.corpusDecontam(_, _)),
    "corpus_decontam_bloom" -> (E.corpusDecontamBloom(_, _)),
    "corpus_chunk"      -> (E.corpusChunk(_, _)),
    "line_dedup"        -> (E.lineDedup(_, _)),
    "corpus_curate"     -> (E.corpusCurate(_, _)),
    "corpus_curate2"    -> (E.corpusCurate2(_, _)),
    "text_tokens"       -> (E.textTokens(_, _)),
    "text_quality"      -> (E.textQuality(_, _)),
    "text_langid"       -> (E.textLangid(_, _)),
    "text_tfidf"        -> (E.textTfidf(_, _)),
    "text_redact"       -> (E.textRedact(_, _)),
    "text_repetition"   -> (E.textRepetition(_, _)),
    "text_fingerprint"  -> (E.textFingerprint(_, _)),
    "mm_bytes"          -> (E.mmBytes(_, _)),
    "mm_decode"         -> (E.mmDecode(_, _)),
    "mm_frames"         -> (E.mmFrames(_, _)),
    "mm_audio"          -> (E.mmAudio(_, _)),
    // §2.7 streaming operators, drained to deterministic batch shapes
    "stream_session"    -> (SQ.streamSession(_, _)),
    "stream_dedup"      -> (SQ.streamDedup(_, _)),
    "stream_join"       -> (SQ.streamJoin(_, _)),
    "stream_window"     -> (SQ.streamWindow(_, _)),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_derived_key"    -> O.q1DerivedKey,
    "q2_anti_join"      -> O.q2AntiJoin,
    "q3_dim_join"       -> O.q3DimJoin,
    "q4_scalar_subquery" -> O.q4ScalarSubquery,
    "q5_groupby_agg"    -> O.q5GroupbyAgg,
    "q6_distinct"       -> O.q6Distinct,
    "q6b_distinct_values" -> O.q6bDistinctValues,
    "q7_rollup"         -> O.q7Rollup,
    // q8: HLL++ sketch, no exact oracle (rows-only; bound-checked in tests)
    "q9_window_rank"    -> O.q9WindowRank,
    "q10_window_frame"  -> O.q10WindowFrame,
    "q11_topk"          -> O.q11TopK,
    "q12_setops"        -> O.q12SetOps,
    "q13_semi_join"     -> O.q13SemiJoin,
    "q14_range_join"    -> O.q14RangeJoin,
    "q15_phone_regex"   -> O.q15PhoneRegex,
    "q16_date_json"     -> O.q16DateJson,
    "q17_cross_join"    -> O.q17CrossJoin,
    "q18_tumbling_day"  -> O.q18TumblingDay,
    "q19_grouping_sets" -> O.q19GroupingSets,
    "q20_cosine_topk"   -> O.q20CosineTopk,
    "q21_array_ops"     -> O.q21ArrayOps,
    "q22_asof_join"     -> O.q22AsofJoin,
    "q23_sessionize"    -> O.q23Sessionize,
    "q24_percentiles"   -> O.q24Percentiles,
    "q25_topk_agg"      -> O.q25TopkAgg,
    "q26_cube"          -> O.q26Cube,
    "q27_pivot"         -> O.q27Pivot,
    "q27b_unpivot"      -> O.q27bUnpivot,
    "q28_window_nav"    -> O.q28WindowNav,
    // deterministic extension ops; sketch/LSH ops are rows-only
    "dedup_exact"       -> EO.dedupExact,
    "dedup_url"         -> EO.dedupUrl,
    "dedup_substring"   -> EO.dedupSubstring,
    "text_ngrams"       -> EO.textNgrams,
    "dedup_jaccard"     -> EO.dedupJaccard,
    "dedup_jaccard_char" -> EO.dedupJaccardChar,
    "dedup_minhash_verify" -> EO.dedupMinhashVerify,
    "ann_q8_topk"       -> EO.annQ8,
    "corpus_split"      -> EO.corpusSplit,
    "corpus_sample"     -> EO.corpusSample,
    "corpus_pack"       -> EO.corpusPack,
    "corpus_interleave" -> EO.corpusInterleave,
    "corpus_mix"        -> EO.corpusMix,
    "corpus_decontam"   -> EO.corpusDecontam,
    // the Bloom prefilter is exact-preserving, so the bloom path must
    // match the SAME oracle SQL bit for bit — sharing the string keeps
    // the two paths from drifting apart
    "corpus_decontam_bloom" -> EO.corpusDecontam,
    "corpus_chunk"      -> EO.corpusChunk,
    "line_dedup"        -> EO.lineDedup,
    "corpus_curate"     -> EO.corpusCurate,
    "corpus_curate2"    -> EO.corpusCurate2,
    "emb_quantize"      -> EO.embQuantize,
    "text_tokens"       -> EO.textTokens,
    "text_langid"       -> EO.textLangid,
    "text_tfidf"        -> EO.textTfidf,
    "text_redact"       -> EO.textRedact,
    "text_repetition"   -> EO.textRepetition,
    "text_quality"      -> EO.textQuality,
    "mm_bytes"          -> EO.mmBytes,
    "mm_decode"         -> EO.mmDecode,
    "mm_frames"         -> EO.mmFrames,
    "mm_audio"          -> EO.mmAudio,
    "stream_session"    -> SO.streamSession,
    "stream_dedup"      -> SO.streamDedup,
    "stream_join"       -> SO.streamJoin,
    "stream_window"     -> SO.streamWindow,
  )
}
