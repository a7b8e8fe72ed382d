package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The native vector kernels must be bit-identical to the HOF
  * formulations they replaced (same accumulation order, same modular
  * arithmetic) — these specs pin that equivalence, plus null/empty
  * semantics and the codegen contract (the kernel call appears inside
  * WholeStageCodegen output, not behind a CodegenFallback).
  */
class VecExpressionsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // --- HOF twins (the replaced formulations, kept here as the oracle) ---

  private def hofDot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)

  private def hofCosine(a: Column, b: Column): Column =
    hofDot(a, b) / sqrt(hofDot(a, a)) / sqrt(hofDot(b, b))

  private def hofSignBucket(vec: Column, nbits: Int, dim: Int, seed: Long): Column = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val bits = (0 until nbits).map { b =>
      val plane = array((0 until dim).map(d =>
        lit(mix(seed + b.toLong * 131071L + d).toDouble / Long.MaxValue.toDouble)): _*)
      val dp = aggregate(zip_with(vec, plane, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
      when(dp > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  private def hofMinhash(hashes: Column, numHashes: Int, seed: Long): Column = {
    val p = (1L << 31) - 1
    val perms = (0 until numHashes).map { i =>
      val a = VecUtil.mix(seed + 2L * i) | 1L
      val b = VecUtil.mix(seed + 2L * i + 1)
      ((((a % (p - 1)) + (p - 1)) % (p - 1)) + 1, ((b % p) + p) % p)
    }
    array(perms.map { case (a, b) =>
      array_min(transform(hashes, h => pmod(h * lit(a) + lit(b), lit(p))))
    }: _*)
  }

  // deterministic pseudo-random vectors (no Random: reproducible spec)
  private val vecs = (0 until 20).map { r =>
    (r.toLong, (0 until 64).map(d =>
      (VecUtil.mix(r * 1000L + d).toDouble / Long.MaxValue.toDouble)).toArray)
  }
  private lazy val vdf = vecs.toDF("id", "v")

  test("CosineSim is bit-identical to the zip_with/aggregate formulation") {
    val both = vdf.crossJoin(vdf.select(col("id").as("id2"), col("v").as("w")))
      .select(Vecs.cosineSim(col("v"), col("w")).as("native"),
        hofCosine(col("v"), col("w")).as("hof"))
      .collect()
    assert(both.length == 400)
    both.foreach(r => assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0))
  }

  test("SignBucket matches the literal-hyperplane HOF formulation") {
    val rows = vdf.select(Vecs.signBucket(col("v"), 16, 7L).as("native"),
      hofSignBucket(col("v"), 16, 64, 7L).as("hof")).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // buckets are spread, not degenerate
    assert(rows.map(_.getLong(0)).distinct.length > 5)
  }

  test("MinHashSig matches the array_min/transform formulation") {
    val hdf = Seq(
      (1L, Seq(17L, 99L, 12345L, 1L << 30)),
      (2L, Seq(0L, (1L << 31) - 2)),
      (3L, Seq(42L))).toDF("id", "h")
    val rows = hdf.select(Vecs.minhashSig(col("h"), 32, 42L).as("native"),
      hofMinhash(col("h"), 32, 42L).as("hof")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  private def hofNearest(cents: Array[(Long, Array[Double])], vec: Column,
                         nprobe: Int): Column = {
    val ca = array(cents.map { case (cid, v) =>
      struct(lit(cid).as("cid"), array(v.map(lit): _*).as("cv"))
    }: _*)
    val ranked = array_sort(transform(ca, ct =>
      struct(Vecs.squaredDist(vec, ct.getField("cv")).as("dist"),
        ct.getField("cid").as("cid"))))
    transform(slice(ranked, 1, nprobe), s => s.getField("cid"))
  }

  test("NearestLists matches the array_sort/transform struct formulation") {
    val cents = vecs.take(8).map { case (id, v) => (id, v) }.toArray
    for (nprobe <- Seq(1, 3, 8)) {
      val rows = vdf.select(
        Vecs.nearestLists(col("v"), cents, nprobe).as("native"),
        hofNearest(cents, col("v"), nprobe).as("hof")).collect()
      rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1),
        s"nprobe=$nprobe"))
    }
  }

  test("NearestLists ties break by cid asc (duplicate centroids)") {
    // two identical centroids with different ids: the lower cid must win,
    // matching the (dist, cid) struct ordering of the HOF formulation
    val dup = Array((5L, Array(1.0, 0.0)), (2L, Array(1.0, 0.0)), (9L, Array(0.0, 1.0)))
    val out = Seq((1L, Array(0.9, 0.1))).toDF("id", "v")
      .select(Vecs.nearestLists(col("v"), dup, 3).as("n")).collect()
    assert(out.head.getSeq[Long](0) == Seq(2L, 5L, 9L))
  }

  test("NearestLists runs inside whole-stage codegen") {
    val cents = vecs.take(4).toArray
    val gen =
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        vdf.repartition(2).select(Vecs.nearestLists(col("v"), cents, 2).as("n"))
          .queryExecution.explainString(ExplainMode.fromString("codegen"))
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(gen.contains("VecUtil.nearestLists"), "nearestLists not in generated code")
  }

  test("null and empty inputs") {
    val df = Seq((1L, Some(Seq(1L, 2L)), Some(Array(1.0, 0.0))),
      (2L, Some(Seq.empty[Long]), Some(Array(0.0, 1.0))),
      (3L, None, None))
      .toDF("id", "h", "v")
    val out = df.select(col("id"),
      Vecs.minhashSig(col("h"), 4, 42L).as("sig"),
      Vecs.cosineSim(col("v"), col("v")).as("self_sim")).orderBy("id").collect()
    assert(out(0).getDouble(2) == 1.0)                       // cos(v, v) = 1
    assert(out(1).getSeq[Any](1) == Seq(null, null, null, null)) // empty → null mins
    assert(out(2).isNullAt(1) && out(2).isNullAt(2))         // null in → null out
  }

  test("QuantStats: trunc-based int8 scheme, high recon cosine, zero-vector NaN") {
    val df = Seq(
      (1L, Array(1.0, -0.5, 0.25, 0.0)),
      (2L, Array(0.0, 0.0, 0.0, 0.0)))
      .toDF("id", "v")
      .select(col("id"), Vecs.quantStats(col("v")).as("st"))
      .select(col("id"), col("st.q_sum"), col("st.recon_cos"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // scale = 1.0: q = [127, -63 (trunc -63.5), 31 (trunc 31.75), 0]
    assert(df(1L)._1 == 127L - 63L + 31L)
    assert(df(1L)._2 > 0.999)         // 4-element recon stays very close
    assert(df(2L)._1 == 0L && df(2L)._2.isNaN)
  }

  test("kernels run inside whole-stage codegen, not CodegenFallback") {
    // repartition forces a real exchange (a bare local Seq plans as
    // LocalTableScan with no codegen stage); AQE off so the codegen
    // explain sees final-plan subtrees rather than an unexecuted
    // AdaptiveSparkPlan placeholder
    val gen =
      try {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        vdf.repartition(2).select(Vecs.cosineSim(col("v"), col("v")).as("c"),
            Vecs.signBucket(col("v")).as("b"))
          .queryExecution.explainString(ExplainMode.fromString("codegen"))
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(gen.contains("VecUtil.cosine"), "cosine not in generated code")
    assert(gen.contains("VecUtil.signBucket"), "signBucket not in generated code")
    assert(!gen.contains("Found 0 WholeStageCodegen"))
  }
}
