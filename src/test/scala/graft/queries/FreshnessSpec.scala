package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The merge-on-read ANN freshness probe and the volume twin of the
  * modularity scoring — declared-query contracts at sf0.001 (the
  * driver oracle hash-checks both at sf0.01).
  */
class FreshnessSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ann_ivf_delta: gate passes, emits the exact twin, and the tail genuinely matters") {
    val rows = Extensions.annIvfDelta(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getLong(4)))
    assert(rows.length == 50, "5 probes × exact top-10")
    assert(rows.forall(_._5 == 0L), "recall gate must pass at the 50% floor")
    // the emitted rows ARE the exact twin (ranks dense per qid, sims
    // non-increasing) — the ANN arms certify through the gate bit only
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to 10), s"qid $qid ranks not dense")
      val sims = rs.sortBy(_._2).map(_._4)
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b },
        s"qid $qid sims not non-increasing")
    }
    // freshness is only proven if the unindexed tail holds exact-top-10
    // mass — otherwise a base-only probe would pass vacuously
    assert(rows.exists(_._3 % 8 == 7),
      "no exact-top-10 id in the unindexed tail — the freshness gate is vacuous")
  }

  test("graph_modularity_volume: full node domain, strong planted-block structure") {
    val rows = Extensions.graphModularityVolume(spark, dir).collect()
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.map(_.getLong(1)).sum == n, "n_nodes must partition the full domain")
    val q = rows.map(_.getLong(4)).distinct
    assert(q.length == 1 && q.head > 600000L,
      s"planted 50-blocks should score > 0.6, got ${q.headOption} ppm")
    // data-dominated: communities scale with N (one per block, ±merges)
    assert(rows.length >= (n / 50 / 2).toInt,
      s"suspiciously few communities (${rows.length}) for ${n / 50} blocks")
  }
}
