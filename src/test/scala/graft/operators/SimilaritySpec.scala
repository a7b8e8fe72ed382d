package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.core.Tables.t

class SimilaritySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"
  lazy val emb = t(spark, sf, "embeddings")
  lazy val queries = emb.filter(col("vec_id") < 3)

  test("brute force: each query's rank-1 neighbor is itself at sim 1.0") {
    val top1 = Similarity.bruteForceTopK(emb, queries, "vec_id", "vec_id", "embedding", 1)
      .select("qid", "id", "sim").as[(Long, Long, Double)].collect()
    for ((qid, id, sim) <- top1) {
      assert(qid == id)
      assert(math.abs(sim - 1.0) < 1e-9)
    }
  }

  test("lsh top-k always contains the query itself and respects k") {
    val got = Similarity.lshTopK(emb, queries, "vec_id", "vec_id", "embedding",
      k = 10, nbits = 8)
    val byQ = got.select("qid", "id").as[(Long, Long)].collect().groupBy(_._1)
    for ((qid, rows) <- byQ) {
      assert(rows.length <= 10)
      assert(rows.exists(_._2 == qid), s"query $qid not in own candidates")
    }
  }

  test("lsh candidates re-rank exactly: sims match brute force for shared ids") {
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "vec_id", "embedding", 500)
      .select("qid", "id", "sim").as[(Long, Long, Double)].collect()
      .map { case (q, i, s) => (q, i) -> s }.toMap
    val lsh = Similarity.lshTopK(emb, queries, "vec_id", "vec_id", "embedding",
      k = 10, nbits = 8)
      .select("qid", "id", "sim").as[(Long, Long, Double)].collect()
    for ((q, i, s) <- lsh)
      assert(math.abs(s - bf((q, i))) < 1e-9)
  }

  test("ivfAssign picks the nearest centroid") {
    val c0 = Array.fill(4)(0.0)
    val c1 = Array.fill(4)(10.0)
    val df = Seq(
      (1L, Array(0.1f, 0.2f, 0.0f, 0.1f)),
      (2L, Array(9.8f, 10.1f, 9.9f, 10.0f))).toDF("vec_id", "embedding")
    val got = Similarity.ivfAssign(df, "vec_id", "embedding",
      Array((100L, c0), (200L, c1)))
      .select("vec_id", "list_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 100L, 2L -> 200L))
  }

  test("int8-quantized brute force: self at rank 1, high recall vs float") {
    val q8 = Similarity.bruteForceTopKQ8(emb, queries, "vec_id", "vec_id", "embedding", 10)
      .select("qid", "id", "rank", "sim").as[(Long, Long, Int, Double)].collect()
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "vec_id", "embedding", 10)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    for (q <- q8.map(_._1).distinct) {
      val r1 = q8.find(r => r._1 == q && r._3 == 1).get
      assert(r1._2 == q && r1._4 > 0.9999, s"self-match for $q: $r1")
    }
    val overlap = q8.count(r => exact.contains((r._1, r._2)))
    assert(overlap.toDouble / exact.size >= 0.8,
      s"quantized recall ${overlap.toDouble / exact.size}")
  }

  test("radius search: self-pairs at sim 1, every hit >= tau, no shuffle in the plan") {
    val tau = 0.25
    val got = Similarity.rangeSearchQ8(emb, queries, "vec_id", "vec_id", "embedding", tau)
    val rows = got.select("qid", "id", "sim").as[(Long, Long, Double)].collect()
    assert(rows.forall(_._3 >= tau))
    val selfs = rows.filter(r => r._1 == r._2)
    assert(selfs.length == queries.count())
    assert(selfs.forall(r => math.abs(r._3 - 1.0) < 1e-9))
    // threshold is a scan filter: no aggregate, no exchange beyond the
    // tiny query broadcast
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
  }

  test("nearestLabelQ8 classifies planted clusters; ties break on the smaller label") {
    import graft.functions.{VecUtil, Vecs}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // two planted labels: codes near (100,0) vs (0,100)
    def arr(bytes: Byte*) = new GenericArrayData(bytes.toArray)
    val labels = Array(1L, 2L)
    val ns = Array(2L, 2L)
    // label 1 sums: (200, 0); label 2 sums: (0, 200)
    val sums = Array(200L, 0L, 0L, 200L)
    assert(VecUtil.nearestLabelQ8(arr(90, 5), labels, ns, sums) == 1L)
    assert(VecUtil.nearestLabelQ8(arr(5, 90), labels, ns, sums) == 2L)
    // exact tie: equidistant point → smaller label wins
    assert(VecUtil.nearestLabelQ8(arr(50, 50), labels, ns, sums) == 1L)
    // through the Column API over a frame, on real data: every pred is
    // an observed label
    val q = emb.select(col("label").cast("long").as("label"),
      Vecs.quantizeI8(col("embedding").cast("array<double>")).as("qi"))
    val obs = q.select("label").distinct().as[Long].collect().toSet
    val some = q.limit(20).select(
      Vecs.nearestLabelQ8(col("qi"), obs.toArray.sorted, obs.toArray.map(_ => 1L),
        obs.toArray.flatMap(_ => Array.fill(64)(0L))).as("p"))
      .as[Long].collect()
    assert(some.forall(obs.contains))
  }

  test("kmeansRefine converges to planted cluster centers") {
    // two tight blobs around (0,...,0)+1 and (0,...,0)+9; seed centroids off-center
    val blobA = (0 until 20).map(i => (i.toLong, Array.fill(4)(1.0f + (i % 3) * 0.01f)))
    val blobB = (0 until 20).map(i => (100L + i, Array.fill(4)(9.0f + (i % 3) * 0.01f)))
    val df = (blobA ++ blobB).toDF("vec_id", "embedding")
    val seed = Array((0L, Array.fill(4)(3.0)), (1L, Array.fill(4)(7.0)))
    val refined = Similarity.kmeansRefine(df, "vec_id", "embedding", seed, iters = 3)
    val c0 = refined.find(_._1 == 0L).get._2
    val c1 = refined.find(_._1 == 1L).get._2
    assert(math.abs(c0(0) - 1.01) < 0.02, c0.toSeq)   // mean of blob A
    assert(math.abs(c1(0) - 9.01) < 0.02, c1.toSeq)   // mean of blob B
    // refined codebook assigns every point to its own blob's list
    val assigned = Similarity.ivfAssign(df, "vec_id", "embedding", refined)
      .select("vec_id", "list_id").as[(Long, Long)].collect()
    assert(assigned.forall { case (id, list) => (id < 100L) == (list == 0L) })
  }

  test("ivf top-k: exact sims, self at rank 1, decent recall vs brute force") {
    val cents = Similarity.sampleCentroids(emb, "vec_id", "embedding", nlist = 8)
    assert(cents.length == 8 && cents.head._2.length == 64)
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "vec_id", "embedding",
      k = 10, cents, nprobe = 3)
      .select("qid", "id", "sim", "rank").as[(Long, Long, Double, Int)].collect()
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "vec_id", "embedding", 10)
      .select("qid", "id", "sim").as[(Long, Long, Double)].collect()
      .map { case (q, i, s) => (q, i) -> s }.toMap
    // the query's own list is always probed (distance 0 to its centroid
    // is its assignment) -> self must appear at rank 1, sim 1.0
    for (q <- ivf.map(_._1).distinct) {
      val r1 = ivf.find(r => r._1 == q && r._4 == 1).get
      assert(r1._2 == q && math.abs(r1._3 - 1.0) < 1e-9)
    }
    // candidate sims are exact (same kernel as brute force)
    ivf.foreach { case (q, i, s, _) =>
      bf.get((q, i)).foreach(exact => assert(math.abs(s - exact) < 1e-9))
    }
    // recall@10 with 3/8 lists probed: conservatively above 40%
    val hit = ivf.count { case (q, i, _, _) => bf.contains((q, i)) }
    assert(hit.toDouble / bf.size >= 0.4, s"recall ${hit.toDouble / bf.size}")
  }

  test("ivf knn join: batch query table, exact re-ranked sims, recall floor, equi-only plan") {
    val cents = Similarity.sampleCentroids(emb, "vec_id", "embedding", nlist = 16)
    val batch = emb.filter(col("vec_id") % 4 === 0)   // 125 queries — a query TABLE
    val knn = Similarity.ivfKnnJoin(emb, batch, "vec_id", "vec_id", "embedding",
      k = 5, cents, nprobe = 4)
    val got = knn.select("qid", "id", "sim", "rank").as[(Long, Long, Double, Int)].collect()
    // self is always in its own probed list -> rank 1 at sim 1.0
    for (q <- got.map(_._1).distinct) {
      val r1 = got.find(r => r._1 == q && r._4 == 1).get
      assert(r1._2 == q && math.abs(r1._3 - 1.0) < 1e-9, s"self-match for $q: $r1")
    }
    // re-rank exactness: every returned sim equals the float brute-force sim
    val bf = Similarity.bruteForceTopK(emb, batch, "vec_id", "vec_id", "embedding", 5)
      .select("qid", "id", "sim").as[(Long, Long, Double)].collect()
    val bfAll = Similarity.bruteForceTopK(emb, batch, "vec_id", "vec_id", "embedding", 500)
      .select("qid", "id", "sim").as[(Long, Long, Double)].collect()
      .map { case (q, i, s) => (q, i) -> s }.toMap
    got.foreach { case (q, i, s, _) =>
      assert(math.abs(s - bfAll((q, i))) < 1e-9, s"re-rank sim drift at ($q,$i)")
    }
    // recall@5 with 4/16 lists probed over the whole batch
    val bfSet = bf.map(r => (r._1, r._2)).toSet
    val hit = got.count(r => bfSet.contains((r._1, r._2)))
    assert(hit.toDouble / bfSet.size >= 0.5,
      s"batch recall ${hit.toDouble / bfSet.size}")
    // deterministic: a second run returns the identical row set
    val again = Similarity.ivfKnnJoin(emb, batch, "vec_id", "vec_id", "embedding",
      k = 5, cents, nprobe = 4)
      .select("qid", "id", "sim", "rank").as[(Long, Long, Double, Int)].collect()
    assert(got.sorted.toSeq == again.sorted.toSeq)
    // the probe is an equi-join: no cartesian, no nested-loop join
    val plan = knn.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in batch knn plan:\n${plan.take(3000)}")
  }

  test("ivf-pq: deterministic codebooks, self at rank 1, exact refined sims, recall floor") {
    val cents = Similarity.sampleCentroids(emb, "vec_id", "embedding", nlist = 8)
    val books = Similarity.trainPq(emb, "vec_id", "embedding", m = 8, ksub = 16)
    assert(books.length == 8 && books(0).length == 16 && books(0)(0).length == 8)
    // training is a pure function of the corpus (stride sample, stride
    // init, fixed iterations) — byte-stable run to run
    val books2 = Similarity.trainPq(emb, "vec_id", "embedding", m = 8, ksub = 16)
    assert(books.flatten.flatten.toSeq == books2.flatten.flatten.toSeq)
    val pq = Similarity.ivfPqTopK(emb, queries, "vec_id", "vec_id", "embedding",
      k = 10, cents, nprobe = 3, books)
      .select("qid", "id", "sim", "rank").as[(Long, Long, Double, Int)].collect()
    val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "vec_id", "embedding", 10)
      .select("qid", "id", "sim").as[(Long, Long, Double)].collect()
      .map { case (q, i, s) => (q, i) -> s }.toMap
    // self's ADC score is the query·its-own-reconstruction dot — top of
    // its list — so it survives candidate generation, and exact refine
    // must then put it at rank 1 with sim 1
    for (q <- pq.map(_._1).distinct) {
      val r1 = pq.find(r => r._1 == q && r._4 == 1).get
      assert(r1._2 == q && math.abs(r1._3 - 1.0) < 1e-9)
    }
    // final sims come from the exact kernel, not ADC
    pq.foreach { case (q, i, s, _) =>
      bf.get((q, i)).foreach(exact => assert(math.abs(s - exact) < 1e-9))
    }
    val hit = pq.count { case (q, i, _, _) => bf.contains((q, i)) }
    assert(hit.toDouble / bf.size >= 0.4, s"recall ${hit.toDouble / bf.size}")
  }

  test("k-means-refined codebook: recall at equal nprobe >= stride codebook") {
    def recall(cents: Array[(Long, Array[Double])]): Double = {
      val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "vec_id", "embedding",
        k = 10, cents, nprobe = 3)
        .select("qid", "id").as[(Long, Long)].collect().toSet
      val bf = Similarity.bruteForceTopK(emb, queries, "vec_id", "vec_id", "embedding", 10)
        .select("qid", "id").as[(Long, Long)].collect().toSet
      bf.count(ivf.contains).toDouble / bf.size
    }
    val seed = Similarity.sampleCentroids(emb, "vec_id", "embedding", nlist = 8)
    val refined = Similarity.kmeansRefine(emb, "vec_id", "embedding", seed, iters = 2)
    val (rSeed, rRefined) = (recall(seed), recall(refined))
    assert(rRefined >= rSeed,
      s"refined codebook recall $rRefined < stride codebook recall $rSeed")
  }

  test("stored IVF corpus: partition-pruned probes, identical results") {
    val cents = Similarity.sampleCentroids(emb, "vec_id", "embedding", nlist = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString + "/corpus"
    Similarity.writeIvfCorpus(emb, "vec_id", "embedding", cents, dir)
    // one directory per list on disk — the physical partitioning probes prune
    val listDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("list_id=")).map(_.getName).sorted
    assert(listDirs.length == 8, s"got ${listDirs.toSeq}")

    val stored = Similarity.ivfTopKStored(spark, dir, queries,
      "vec_id", "embedding", k = 10, cents, nprobe = 3)
    // the probe set must reach the scan as a partition filter: only
    // probed list_id directories are listed/read
    val scan = stored.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [list_id") &&
      (scan.contains(" IN (") || scan.contains("list_id#") && scan.contains("isin")),
      s"probe set not pushed as a partition filter:\n${scan.take(3000)}")

    val mem = Similarity.ivfTopK(emb, queries, "vec_id", "vec_id", "embedding",
      k = 10, cents, nprobe = 3)
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().sorted.toSeq
    val sto = stored
      .select("qid", "id", "rank").as[(Long, Long, Int)].collect().sorted.toSeq
    assert(sto == mem, "stored-corpus search diverged from in-memory IVF")
  }

  test("emb_centroid: integer-exact sums match a driver reference; map-side combine in plan") {
    val dir = "/root/testdata/sf0.01"
    val q = graft.queries.Extensions.embCentroid(spark, dir)
    val got = q.select($"label".cast("long"), $"pos", $"n", $"q_sum")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // reference: quantize on the driver with the same trunc kernel
    val raw = graft.core.Tables.t(spark, dir, "embeddings")
      .select($"label".cast("long"), $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    val ref = raw.flatMap { case (label, x) =>
      val maxAbs = x.map(math.abs).max
      x.zipWithIndex.map { case (e, i) =>
        (label, i + 1L) -> (if (maxAbs > 0) (e * 127.0 / maxAbs).toByte.toLong else 0L)
      }
    }.groupBy(_._1).map { case ((label, pos), vs) =>
      (label, pos, vs.size.toLong, vs.map(_._2).sum)
    }.toSeq.sortBy(t => (t._1, t._2))
    assert(got == ref)
    // the shuffle must carry partial sums, not exploded rows: two
    // aggregate stages around the (label, pos) exchange
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(label"), plan.take(2000))
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(2000))
  }

  test("emb_mmr: rank-1 is pure relevance, scores non-increasing, selection diversifies") {
    val dir = "/root/testdata/sf0.01"
    val out = graft.queries.Extensions.embMmr(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(byQ.values.forall(_.length == 5))
    for ((_, rows) <- byQ) {
      val sorted = rows.sortBy(_._2)
      // step 1 is the pure-relevance argmax: its mmr is exactly 7·rel
      assert(sorted.head._5 == 7 * sorted.head._4)
      assert(sorted.head._4 == rows.map(_._4).max)
      // (no monotonicity assert: with NEGATIVE pairwise dots the
      // −3·maxSim term can lift a later pick above an earlier score —
      // anti-correlated candidates are rewarded, which is the point)
      // no repeats
      assert(rows.map(_._3).distinct.length == 5)
    }
    // diversification must BITE somewhere: at least one query's MMR
    // five differs from its plain relevance five (otherwise λ=0.7 is
    // dead weight on this corpus and the gate proves nothing)
    val emb = graft.core.Tables.t(spark, dir, "embeddings")
      .select($"vec_id",
        graft.functions.Vecs.quantizeI8($"embedding".cast("array<double>")).as("qi"))
    val q5 = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"qi".as("qqi"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy($"rel".desc, $"id")
    val relTop5 = emb.filter($"vec_id" >= 5).crossJoin(broadcast(q5))
      .select($"qid", $"vec_id".as("id"),
        graft.functions.Vecs.dotI8($"qi", $"qqi").as("rel"))
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(w))
      .filter($"rk" <= 5)
      .as[(Long, Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val mmrSets = byQ.view.mapValues(_.map(_._3).toSet).toMap
    assert((0L to 4L).exists(q => mmrSets(q) != relTop5(q)),
      "MMR selected exactly the relevance top-5 for every query — diversification is vacuous")
  }

  test("filtered search: every IVF candidate honors the metadata predicate") {
    // the ann_filtered arm run directly: candidates ONLY from the
    // label ≡ 1 (mod 3) subset, probes from the full collection —
    // pre-filtering, not post-filtering a full-corpus top-k
    val sub = emb.filter($"label" % 3 === 1)
    val subIds = sub.select("vec_id").as[Long].collect().toSet
    val cents = Similarity.sampleCentroids(sub, "vec_id", "embedding", nlist = 16)
    val got = Similarity.ivfTopK(sub, emb.filter($"vec_id" < 5), "vec_id",
        "vec_id", "embedding", k = 10, cents, nprobe = 4)
      .select("qid", "id").as[(Long, Long)].collect()
    assert(got.nonEmpty)
    assert(got.forall { case (_, id) => subIds(id) },
      "a candidate escaped the predicate subset")
    // all 5 probes answered, even those whose own label is excluded
    assert(got.map(_._1).toSet == (0L to 4L).toSet)
  }
}
