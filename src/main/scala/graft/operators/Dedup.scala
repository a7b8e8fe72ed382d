package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Sketches

/** Deduplication operators for large-scale corpus curation: exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design (100 TB): everything is expressed as shuffles on compact
  * keys (hashes/band buckets), never all-pairs. Candidate generation is
  * LSH-bucket self-joins with a hot-bucket guard (a degenerate bucket —
  * e.g. boilerplate — would otherwise explode quadratically); exact
  * verification runs only on candidates. Signatures are built from
  * built-in expressions (codegen) with deterministic seeds, so results
  * are reproducible run-to-run.
  */
object Dedup {

  // ---------- exact ----------

  /** Exact dedup: one row kept per distinct value of `on` (hash groupBy,
    * single shuffle; map-side partial agg does the heavy lifting). */
  def exact(df: DataFrame, on: String, idCol: String): DataFrame =
    df.groupBy(col(on))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  // ---------- URL canonicalization ----------

  /** Canonicalize an absolute http(s) URL so that cosmetically-different
    * spellings of the same resource compare equal — the key-preparation
    * step of URL-keyed dedup (the first pass every crawl pipeline runs,
    * before any content even downloads). Rules, applied in order:
    *
    *   1. drop the fragment (`#...` — client-side only, never a
    *      different resource);
    *   2. lowercase the scheme and host (RFC 3986 §6.2.2.1: both are
    *      case-insensitive; the path is NOT touched — it is
    *      case-sensitive on most origins);
    *   3. strip a leading `www.` and a default port (`:80` for http,
    *      `:443` for https) from the host;
    *   4. strip trailing slashes from the path (`/a/b/` ≡ `/a/b`,
    *      `/` ≡ empty);
    *   5. drop tracking query parameters (`utm_*`, `ref`, `fbclid`,
    *      `gclid`) while preserving the order of the rest; an
    *      emptied-out query drops its `?` too.
    *
    * Backed by the single-pass codegen'd kernel
    * ([[graft.functions.NormalizeUrl]]); the declaratively-composed
    * twin [[urlNormalizeReference]] (regexp ops on the RE2 ∩ Java-regex
    * common subset — the chain the DuckDB oracle runs) pins the
    * kernel's semantics in UrlDedupSpec. No UDF, no higher-order
    * function, stays inside whole-stage codegen either way. A string
    * that doesn't parse as `scheme://host...` is passed through
    * unchanged rather than nulled: an un-canonicalizable key still
    * dedups against exact copies of itself. Query parameters are NOT
    * reordered (a=1&b=2 vs b=2&a=1 stay distinct): ordering is
    * semantic for some origins, and the crawl frontier that feeds this
    * operator emits params in a fixed order anyway.
    */
  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val HostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/]*)"
  private val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(/.*)$"
  private val TrackRe = "&(utm_[A-Za-z0-9_]*|ref|fbclid|gclid)=[^&]*"

  // the reference chain's sub-computations over `base`/`q` sub-Columns
  // (assembled by [[urlNormalizeReference]])
  private def schemeOf(base: Column) = lower(regexp_extract(base, SchemeRe, 1))
  private def hostRawOf(base: Column) =
    regexp_replace(lower(regexp_extract(base, HostRe, 1)), "^www\\.", "")
  private def pathOf(base: Column) =
    regexp_replace(regexp_extract(base, PathRe, 1), "/+$", "")
  // '&'-prefix every param so one anchored pattern kills any tracking
  // param wherever it sits; then strip the sentinel '&' back off
  private def cleanQueryOf(q: Column) =
    regexp_replace(regexp_replace(concat(lit("&"), q), TrackRe, ""), "^&", "")

  /** Reassemble the canonical URL from its normalized pieces — pure
    * cheap ops (CASE/concat/length over the inputs), safe to inline
    * over either expression trees or materialized attributes. */
  private def assemble(url: Column, scheme: Column, host0: Column,
                       path: Column, q: Column, q2: Column): Column = {
    val defPort = when(scheme === "http", lit(":80"))
      .when(scheme === "https", lit(":443")).otherwise(lit(""))
    val host = when(length(defPort) > 0 && host0.endsWith(defPort),
      host0.substr(lit(1), length(host0) - length(defPort))).otherwise(host0)
    val qn = when(q.isNull || q2 === "", lit("")).otherwise(concat(lit("?"), q2))
    when(scheme === "" || host0 === "", url)
      .otherwise(concat(scheme, lit("://"), host, path, qn))
  }

  def urlNormalize(url: Column): Column =
    graft.functions.Urls.normalizeUrl(url)

  /** The same canonicalization composed from built-in regexp
    * expressions — the declarative REFERENCE implementation: it is the
    * chain the DuckDB oracle runs verbatim, and UrlDedupSpec pins the
    * kernel to it (edge-case table + full equality over the synthesized
    * corpus). Not the hot path: inlined as one Column its CASE branches
    * re-derive the regexp sub-chains ~30× per row, and even layered it
    * is ~7 compiled-regex evaluations per row vs the kernel's single
    * scan. */
  def urlNormalizeReference(url: Column): Column = {
    val nofrag = regexp_replace(url, "#.*$", "")
    val parts = split(nofrag, "\\?", 2)
    val base = get(parts, lit(0))
    val q = get(parts, lit(1)) // null when the URL has no '?'
    assemble(url, schemeOf(base), hostRawOf(base), pathOf(base), q, cleanQueryOf(q))
  }

  /** URL-keyed exact dedup: [[urlNormalize]] then [[exact]] on the
    * canonical form. The group-by key is the canonical URL itself (a
    * bounded short string — unlike document text there is no need to
    * pre-hash it; Spark's hash-aggregate hashes it once either way). */
  def urlDedup(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    df.select(col(idCol), urlNormalize(col(urlCol)).as("norm_url"))
      .groupBy(col("norm_url"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Per-host document quota — the Common-Crawl-style curation pass
    * that caps how many pages any one site contributes to the corpus
    * (a handful of template-heavy domains otherwise dominate a crawl).
    * Hosts are canonicalized through [[urlNormalize]] (case, `www.`,
    * default ports) so one site can't dodge its cap by spelling its
    * host five ways; the kept set is the `maxPerHost` SMALLEST ids
    * (earliest in crawl order — deterministic and re-runnable).
    *
    * Shape at scale: the naive idiom (`row_number() over (partition by
    * host order by id)`) shuffles and SORTS every URL of every host.
    * This uses the bounded-heap [[graft.functions.TopKAgg]] instead:
    * partial aggregation caps map-side state at `maxPerHost` ids per
    * local host, the shuffle carries ≤ maxPerHost·hosts rows, and no
    * full sort ever happens — a skewed mega-host costs its map tasks a
    * heap each, not a single sorted partition. TopK keeps the LARGEST
    * values, so ids ride negated and are flipped back on output
    * (descending −id = ascending id, so `kept_ids` comes out sorted). */
  def domainQuota(df: DataFrame, urlCol: String, idCol: String,
                  maxPerHost: Int): DataFrame = {
    val host = regexp_extract(urlNormalize(col(urlCol)),
      "^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)
    df.select(col(idCol).cast("long").as("_id"), host.as("host"))
      .groupBy("host")
      .agg(count(lit(1)).as("n_urls"),
        graft.functions.TopKAgg.topK(-col("_id"), maxPerHost).as("_neg"))
      .select(col("host"), col("n_urls"),
        transform(col("_neg"), x => -x).as("kept_ids"))
  }

  /** Incremental ingest dedup — the daily-crawl pass: screen an
    * incoming batch against the EXISTING corpus without ever comparing
    * corpus docs to each other. Two deterministic screens per incoming
    * doc: exact (16-byte md5 equi-join against the corpus's
    * pre-aggregated hash table — the shuffle carries hashes, never
    * text) and near (the [[Dedup]] verify kernel: length-blocked
    * char-5-gram sorted-distinct shingles, merge-walk Jaccard, with
    * the corpus-side hot-bucket guard bounding any block's fan-out at
    * `maxBucket`). Returns one row per incoming doc: `n_exact` corpus
    * twins, `n_near` corpus docs at Jaccard ≥ `minJaccard`, and the
    * best score (null when none) — the accept/reject signal an ingest
    * gate consumes. Cost scales with the BATCH (corpus side is hash
    * table + blocked shingles), which is what makes re-screening every
    * day affordable; the seeded-minhash path covers cross-length
    * near-dups where this blocking is deliberately narrow. */
  def incrementalDedup(corpus: DataFrame, batch: DataFrame, idCol: String,
                       textCol: String, maxBucket: Int, minJaccard: Double): DataFrame = {
    val ch = corpus.select(md5(col(textCol)).as("h"))
      .groupBy("h").agg(count(lit(1)).as("n_corpus"))
    val exact = batch.select(col(idCol), md5(col(textCol)).as("h"))
      .join(ch, Seq("h"), "left")
      .select(col(idCol), coalesce(col("n_corpus"), lit(0L)).as("n_exact"))
    // prune hot buckets BEFORE shingling (the minhash-verify shape):
    // shingle arrays are computed for bucket survivors only, never for
    // the boilerplate buckets the guard discards
    val cbRaw = corpus.select(length(col(textCol)).cast("long").as("lb"), col(textCol))
    val keep = cbRaw.groupBy("lb").agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBucket).select("lb")
    val cbp = cbRaw.join(broadcast(keep), Seq("lb"))
      .select(col("lb"),
        graft.functions.Sketches.sortedDistinct(charShingles(col(textCol), 5)).as("sg_c"))
      .localCheckpoint()
    val bb = batch.select(col(idCol), length(col(textCol)).cast("long").as("lb"),
      graft.functions.Sketches.sortedDistinct(charShingles(col(textCol), 5)).as("sg_b"))
    val near = bb.join(cbp.hint("shuffle_hash"), Seq("lb"))
      .select(col(idCol), round(jaccardSorted(col("sg_b"), col("sg_c")), 4).as("j"))
      .filter(col("j") >= minJaccard)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_near"), max(col("j")).as("best_jaccard"))
    exact.join(near, Seq(idCol), "left")
      .select(col(idCol), col("n_exact"),
        coalesce(col("n_near"), lit(0L)).as("n_near"), col("best_jaccard"))
  }

  // ---------- exact-substring duplication ----------

  /** Per-document exact-substring duplication report — the signal
    * behind substring-level dedup (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better", arXiv:2107.06499:
    * long verbatim token runs repeated across documents hurt LMs even
    * when whole-document dedup passes). For every stride-1 `window`-
    * token window of every document: is that exact window present in
    * any OTHER document? Reports per doc the window count, the number
    * of window POSITIONS whose content is cross-document duplicated,
    * and their fraction. (Within-document repetition is deliberately
    * out of scope — [[TextAnalysis]]'s text_repetition covers it.)
    *
    * Shape at scale: a suffix array (the paper's tool) is not a
    * distributed-friendly structure; the equivalent signal here is the
    * decontam shape — windows from the codegen'd
    * [[graft.functions.WordShingles]] kernel, projected to md5 hashes
    * immediately (the shuffles carry 16-byte keys + ids, never window
    * text), document-frequency aggregate on the hash, and an equi-join
    * back. The windowed projection feeds both the df branch and the
    * probe side, so it is localCheckpoint'ed to run the scan + shingle
    * + hash pass once. */
  def substringDupStats(df: DataFrame, idCol: String, textCol: String,
                        window: Int): DataFrame = {
    val wh = df.select(col(idCol),
        explode(Sketches.wordShingles(col(textCol), window)).as("g"))
      .select(col(idCol), md5(col("g")).as("h"))
      .localCheckpoint()
    val dup = wh.distinct()
      .groupBy("h").agg(count(lit(1)).as("doc_df"))
      .filter(col("doc_df") > 1)
      .select(col("h").as("hd"))
    wh.join(dup, wh("h") === dup("hd"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_windows"), count(col("hd")).as("n_dup"),
        round(count(col("hd")).cast("double") / count(lit(1)).cast("double"), 4)
          .as("dup_frac"))
  }

  // ---------- shingling ----------

  /** Word n-gram shingles of lowercased whitespace-tokenized text; a doc
    * shorter than n shingles whole. Native codegen'd single pass
    * ([[graft.functions.WordShingles]]) — the HOF formulation
    * (transform(sequence)/slice/concat_ws, all interpreted) was the
    * dominant cost of the whole MinHash pipeline. */
  def wordShingles(text: Column, n: Int): Column =
    Sketches.wordShingles(text, n)

  /** Character n-gram shingles (native one-pass kernel, like
    * [[wordShingles]]). */
  def charShingles(text: Column, n: Int): Column =
    Sketches.charShingles(text, n)

  /** Jaccard similarity of two shingle arrays (distinct semantics).
    * Native one-pass kernel ([[graft.functions.JaccardSim]]) — the
    * Column formulation re-evaluated a twice-referenced array_intersect
    * plus two array_distincts per pair. */
  def jaccard(a: Column, b: Column): Column =
    Sketches.jaccardSim(a, b)

  /** Jaccard over pre-normalized (sorted-distinct) arrays — same value,
    * one merge pass per pair instead of two hash-set builds. Normalize
    * once per document with [[Sketches.sortedDistinct]]. */
  def jaccardSorted(a: Column, b: Column): Column =
    Sketches.jaccardSortedSim(a, b)

  // ---------- MinHash + LSH ----------

  /** 2^31-1: keeps a*h+b under 2^62 — ANSI mode makes Long overflow an
    * ERROR, not a wraparound, so the classic 64-bit mix is off-limits. */
  private val MersennePrime = (1L << 31) - 1

  /** Shingle array → array of 31-bit hashes (xxhash64 reduced mod
    * 2^31-1; ANSI mode makes 64-bit wraparound an error, and
    * (p-1)*p + p < 2^62 keeps the permutation arithmetic overflow-free).
    *
    * IMPORTANT perf contract: materialize this ONCE per row (its own
    * projection) and build [[minhashSignature]] over the resulting
    * *attribute*. Inlining it under each of the N signature elements
    * looked harmless but cost N× recomputation of shingling+hashing —
    * CollapseProject keeps separate projections apart precisely because
    * the expression is expensive and referenced N times.
    */
  def shingleHashes(shingles: Column): Column =
    transform(array_distinct(shingles), s => pmod(xxhash64(s), lit(MersennePrime)))

  /** MinHash signature (array<long> of length numHashes) over a
    * [[shingleHashes]] column: one (a*h+b) mod p min per permutation —
    * O(numHashes · |shingles|) per row in a single codegen'd pass
    * ([[graft.functions.MinHashSig]]; the HOF formulation this replaces
    * ran numHashes interpreted array_min(transform(...)) per row).
    */
  def minhashSignature(hashes: Column, numHashes: Int = 128, seed: Long = 42L): Column =
    graft.functions.Vecs.minhashSig(hashes, numHashes, seed)

  /** (doc, band_key) pairs: the signature cut into `bands` bands of
    * `rowsPerBand`, each band hashed to one bucket key. Same-bucket docs
    * are near-dup candidates.
    */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { bnd =>
      xxhash64(lit(bnd), concat_ws(",", slice(sig, bnd * rowsPerBand + 1, rowsPerBand)))
    }: _*)

  /** Candidate pairs via LSH banding. `maxBucket` guards hot buckets:
    * a bucket with more than maxBucket docs contributes no pairs from
    * that band (the docs still pair through their other bands), keeping
    * the self-join linear-ish under boilerplate skew. The default is
    * deliberately small — a band bucket holding >100 docs is boilerplate
    * collision, not near-dup signal, and each such bucket costs
    * O(bucket²) join rows concentrated on ONE shuffle key (measured:
    * near-cap buckets serialized the whole stage onto one core).
    */
  def candidatePairs(docBands: DataFrame, idCol: String, maxBucket: Int = 100): DataFrame = {
    // bucket-size guard as a window count: one shuffle on band_key that
    // the self-join below then reuses (both children arrive hash-
    // partitioned on band_key — no re-exchange), vs. the groupBy +
    // left_semi formulation which shuffled the exploded set twice more.
    val w = Window.partitionBy("band_key")
    val pruned = docBands
      .select(col(idCol), explode(col("band_keys")).as("band_key"))
      .withColumn("bsz", count(lit(1)).over(w))
      .filter(col("bsz") <= maxBucket && col("bsz") > 1)
      .drop("bsz")
    val a = pruned.select(col("band_key"), col(idCol).as("id_a"))
    val b = pruned.select(col("band_key"), col(idCol).as("id_b"))
    a.join(b, Seq("band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Full MinHash near-dup pipeline over (idCol, textCol): returns
    * verified pairs (id_a, id_b, jaccard ≥ threshold). Shingle → sign →
    * band → candidate join → exact Jaccard verify on candidates only.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, numHashes: Int = 128, bands: Int = 32,
                   threshold: Double = 0.5): DataFrame = {
    val rowsPerBand = numHashes / bands
    // Materialize shingles and band keys (localCheckpoint): the inner
    // self-join on band_key makes Catalyst infer `band_key IS NOT NULL`
    // and push it below the projection WITH the defining expression
    // inlined — i.e. the whole shingle→hash→sign→band tree re-evaluated
    // per row inside an interpreted Filter (HOFs are CodegenFallback).
    // Cutting lineage here turns every downstream join/filter into pure
    // attribute ops. These are also the natural persistence points of a
    // minhash pipeline at scale (signatures are reused artifacts).
    // sorted-distinct normalization up front: MinHash is order- and
    // duplicate-insensitive (min over the same distinct hash set), and
    // the exact-verify stage can then use the merge-walk Jaccard kernel
    // instead of rebuilding hash sets per candidate pair.
    val shingled = df.select(col(idCol),
        Sketches.sortedDistinct(wordShingles(col(textCol), shingleN)).as("shingles"))
      .localCheckpoint()
    // staged projections: hashes once per row, then signature over the
    // attribute, then band keys over the attribute (see shingleHashes doc)
    val hashed = shingled.select(col(idCol), shingleHashes(col("shingles")).as("shash"))
    val signed = hashed.select(col(idCol),
      minhashSignature(col("shash"), numHashes).as("sig"))
    val banded = signed.select(col(idCol),
      lshBandKeys(col("sig"), bands, rowsPerBand).as("band_keys"))
      .localCheckpoint()
    val cands = candidatePairs(banded, idCol)
    val sa = shingled.select(col(idCol).as("id_a"), col("shingles").as("sh_a"))
    val sb = shingled.select(col(idCol).as("id_b"), col("shingles").as("sh_b"))
    // cands is the small skinny side — it broadcasts, and the
    // shingle-carrying sides stream past it without ever being
    // broadcast-serialized (contrast dedupMinhashVerify, whose
    // self-join has arrays on BOTH sides and must shuffle-hash)
    cands.join(sa, "id_a").join(sb, "id_b")
      .select(col("id_a"), col("id_b"), jaccardSorted(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Cluster assignment from verified pairs.
    *
    * The verified near-dup edge set is orders of magnitude smaller than
    * the corpus (it survived LSH banding AND exact verification), so the
    * default path counts it and — when it fits comfortably on the driver
    * (`driverEdgeLimit`, default 10M edges ≈ 160 MB) — runs exact
    * union-find there and broadcast-joins the label map back: one pass,
    * no iteration. Above the limit it falls back to distributed min-id
    * label propagation (each round one shuffle on id; near-dup clusters
    * are shallow, so few rounds converge). This is the standard
    * contracted-graph connected-components treatment: iterate only when
    * the contracted graph itself is big.
    */
  def clusters(ids: DataFrame, idCol: String, pairs: DataFrame, maxIter: Int = 5,
               driverEdgeLimit: Long = 10_000_000L): DataFrame = {
    val edgeDf = pairs.select(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst"))
    val base = ids.select(col(idCol).as("id"), col(idCol).as("cluster_id"))
    // One bounded collect decides the path AND delivers the edges: the
    // old count()-then-collect() pair executed the verified-pair plan
    // (LSH banding + exact verify, the expensive discovery pass) twice
    // whenever the caller hadn't checkpointed it. limit(L+1) keeps the
    // driver bound intact — L+1 rows ≈ the same 160 MB ceiling — and
    // over-limit edge sets short-circuit into the distributed path.
    val probeLimit = math.min(driverEdgeLimit, Int.MaxValue.toLong - 1L).toInt
    val probed = edgeDf.limit(probeLimit + 1).collect()
    if (probed.length <= probeLimit) {
      val edges = probed.map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { val (lo, hi) = if (ra < rb) (ra, rb) else (rb, ra); parent(hi) = lo }
      }
      val labelMap = parent.keys.map(k => (k, find(k))).filter(kv => kv._1 != kv._2).toSeq
      if (labelMap.isEmpty) return base
      val spark = ids.sparkSession
      import spark.implicits._
      val mapping = broadcast(labelMap.toDF("m_id", "m_cluster"))
      base.join(mapping, base("id") === mapping("m_id"), "left")
        .select(col("id"), coalesce(col("m_cluster"), col("cluster_id")).as("cluster_id"))
    } else {
      // distributed fallback: the shared min-label-propagation operator
      // (Graph.connectedComponentsMinLabel symmetrizes and checkpoints)
      Graph.connectedComponentsMinLabel(
          edgeDf, base.select(col("id").as("node")), maxIter)
        .select(col("node").as("id"), col("component").as("cluster_id"))
    }
  }

  // ---------- SimHash ----------

  /** 64-bit SimHash per doc + its 4×16-bit band keys (near-dups at
    * Hamming distance ≤ 3 must collide on at least one band). Uses the
    * custom Catalyst expression (codegen, no UDF).
    */
  def simhashDocs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // shared whitespace class, not Java "\\s+": \s matches \x0B on the
    // JVM but not in RE2/DuckDB, and the one stray tokenizer would
    // silently diverge if a simhash oracle ever lands
    val tokens = split(lower(trim(col(textCol))), TextAnalysis.WsClass)
    df.select(col(idCol), Sketches.simhash64(tokens).as("simhash"))
      .withColumn("bands", array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xffffL)).as("key"))
      }: _*))
  }

  /** SimHash near-dup pairs: band-collision candidates, verified by
    * Hamming distance ≤ maxHamming (bit_count is a built-in).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val docs = simhashDocs(df, idCol, textCol)
      .localCheckpoint()   // joins below must see attributes, not the hash expr
    val w = Window.partitionBy("band_key")
    val pruned = docs.select(col(idCol), col("simhash"), explode(col("bands")).as("bk"))
      .select(col(idCol), col("simhash"), concat_ws(":", col("bk.band"), col("bk.key")).as("band_key"))
      .withColumn("bsz", count(lit(1)).over(w))   // see candidatePairs: one shuffle, reused by the join
      .filter(col("bsz") <= maxBucket && col("bsz") > 1)
      .drop("bsz")
    val a = pruned.select(col("band_key"), col(idCol).as("id_a"), col("simhash").as("sh_a"))
    val b = pruned.select(col("band_key"), col(idCol).as("id_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  // ---------- embedding near-dup ----------

  /** Semantic near-dup pairs, SemDeDup-style (Abbas et al. 2023,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication"): k-means-cluster the embedding space (the caller
    * trains the codebook — [[Similarity.sampleCentroids]] +
    * [[Similarity.kmeansRefine]], the same trained-artifact flow as
    * the IVF index), then compare pairs ONLY within a cluster —
    * semantic duplicates sit next to each other in embedding space, so
    * the cluster partition bounds the quadratic pair blowup to
    * Σ cᵢ², with nlist chosen ∝ N to keep E[c] constant (SemDeDup ran
    * 110k clusters over LAION; the paper's exact regime). The
    * intra-cluster comparison is an equi-join on `list_id` —
    * shuffle-hash, never broadcast (both sides are the corpus) — with
    * exact cosine verification at `threshold`.
    *
    * What this catches that MinHash/SimHash structurally can't:
    * paraphrases, translations, and re-renders whose SURFACE n-grams
    * share nothing but whose embeddings nearly coincide. The price is
    * a cluster-boundary false-negative class (twins split across two
    * clusters); SemDeDup accepts it, and the declared fixture's specs
    * measure it at exactly zero on the planted twins.
    */
  def semanticPairs(df: DataFrame, idCol: String, vecCol: String,
                    centroids: Array[(Long, Array[Double])],
                    threshold: Double): DataFrame = {
    val assigned = Similarity.ivfAssign(df, idCol, vecCol, centroids)
      .select(col(idCol).as("id"), col("v"), col("list_id"))
      .localCheckpoint()   // assign once: both join sides reuse it
    val a = assigned.select(col("list_id"), col("id").as("id_a"), col("v").as("v_a"))
    val b = assigned.select(col("list_id"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b.hint("shuffle_hash"), Seq("list_id"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.queries.Inventory.cosineSim(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** [[semanticPairs]] + the shared contracted-graph clustering chain
    * ([[clusters]]): one row per semantic group — (keep_id, n_dups),
    * keep = min id, the canonical SemDeDup keep-one-per-group output. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
                    centroids: Array[(Long, Array[Double])],
                    threshold: Double): DataFrame =
    clusters(df.select(col(idCol)), idCol,
        semanticPairs(df, idCol, vecCol, centroids, threshold))
      .groupBy("cluster_id")
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .select(col("keep_id"), col("n_dups"))

  /** Near-duplicate embeddings: sign-LSH bucket candidates verified by
    * exact cosine ≥ threshold. See [[Similarity.signBucket]].
    */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
                     threshold: Double = 0.95, nbits: Int = 16): DataFrame = {
    val vecs = df.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .withColumn("bucket", Similarity.signBucket(col("v"), nbits))
      .localCheckpoint()   // see minhashPairs: keep the bucket expr out of inferred filters
    val a = vecs.select(col("bucket"), col(idCol).as("id_a"), col("v").as("v_a"))
    val b = vecs.select(col("bucket"), col(idCol).as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.queries.Inventory.cosineSim(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
