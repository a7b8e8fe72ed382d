package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The incremental-SCD2 contract: merging the post-cut delta batch
  * into the pre-cut history must reproduce the full rebuild EXACTLY —
  * merge(H_old, Δ) ≡ rebuild(all). The driver oracle certifies this
  * cross-engine at sf0.01 (scd2_merge shares scd2History's oracle
  * verbatim); this spec pins the same algebra at a second SF and
  * checks the boundary conditions that make incremental equal full.
  */
class Scd2MergeSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("merge(H_old, delta) equals the full rebuild, row for row") {
    val merged = Extensions.scd2Merge(spark, dir).collect().toSeq
    val rebuilt = Extensions.scd2History(spark, dir).collect().toSeq
    assert(merged.length == rebuilt.length)
    assert(merged == rebuilt)
  }

  test("exactly one open interval per key; closed intervals chain without overlap") {
    def epoch(d: java.time.LocalDateTime): Long =
      d.toEpochSecond(java.time.ZoneOffset.UTC)
    val rows = Extensions.scd2Merge(spark, dir).collect()
      .map(r => (r.getLong(0), epoch(r.getAs[java.time.LocalDateTime](2)),
        Option(r.getAs[java.time.LocalDateTime](3)).map(epoch),
        r.getBoolean(4)))
    rows.groupBy(_._1).foreach { case (k, iv) =>
      assert(iv.count(_._4) == 1, s"key $k must have exactly one current row")
      val open = iv.filter(_._4).head
      assert(open._3.isEmpty, s"key $k: the current row must have null valid_to")
      // sorted by (valid_from, valid_to nulls-last) — same-date changes
      // produce zero-length intervals that still chain
      val sorted = iv.sortBy(t => (t._2, t._3.getOrElse(Long.MaxValue)))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3.contains(b._2),
            s"key $k: interval ending ${a._3} must chain to ${b._2}")
        case _ => ()
      }
      assert(sorted.last._4, s"key $k: the last interval must be the open one")
    }
  }
}
