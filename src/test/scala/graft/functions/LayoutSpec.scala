package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.queries.Extensions

class LayoutSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Per-bit reference the magic-mask spread must equal. */
  private def refInterleave(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("magic-mask interleave equals the per-bit reference (fuzz + corners)") {
    val rnd = new Random(42)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L), (1023L, 511L)) ++
      Seq.fill(2000)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    for ((x, y) <- cases)
      assert(LayoutUtil.interleave16(x, y) == refInterleave(x, y), s"($x,$y)")
    // inputs above 16 bits truncate — callers bucket their dims first
    assert(LayoutUtil.interleave16(65536L + 3L, 0L) == LayoutUtil.interleave16(3L, 0L))
  }

  test("codegen'd column path matches the JVM kernel") {
    val rnd = new Random(7)
    val rows = Seq.fill(500)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = rows.toDF("x", "y")
      .select(Layout.interleave16($"x", $"y")).as[Long].collect().toSeq
    assert(got == rows.map { case (x, y) => LayoutUtil.interleave16(x, y) })
  }

  test("z-bucket report: every bucket's span ≤ 63 on BOTH dimensions") {
    val rep = Extensions.layoutZorder(spark, "/root/testdata/sf0.01")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rep.nonEmpty)
    // top 8 of 20 bits fixed → low 6 bits free per dimension: the
    // measurable form of "z-clustering keeps files tight on all dims"
    for ((zb, _, minX, maxX, minY, maxY) <- rep) {
      assert(maxX - minX <= 63, s"bucket $zb x-span")
      assert(maxY - minY <= 63, s"bucket $zb y-span")
    }
    // n sums to the full table: the report covers every row exactly once
    assert(rep.map(_._2).sum ==
      graft.core.Tables.t(spark, "/root/testdata/sf0.01", "orders").count())
  }

  test("hilbert8 is a bijection on the 256×256 grid with unit-step adjacency") {
    // bijectivity + |Δx|+|Δy| = 1 between consecutive d + corner start
    // is a complete certificate that this IS a Hilbert curve
    val inv = new Array[(Int, Int)](65536)
    for (x <- 0 until 256; y <- 0 until 256) {
      val d = LayoutUtil.hilbert8(x, y).toInt
      assert(d >= 0 && d < 65536, s"key out of range at ($x,$y): $d")
      assert(inv(d) == null, s"collision at d=$d: ${inv(d)} vs ($x,$y)")
      inv(d) = (x, y)
    }
    assert(inv(0) == (0, 0), s"curve must start at the origin, got ${inv(0)}")
    for (d <- 0 until 65535) {
      val (x1, y1) = inv(d); val (x2, y2) = inv(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-adjacent step d=$d: ($x1,$y1) -> ($x2,$y2)")
    }
  }

  test("hilbert8: inputs masked to 8 bits; codegen'd column path matches the JVM kernel") {
    assert(LayoutUtil.hilbert8(256L + 3L, 512L + 7L) == LayoutUtil.hilbert8(3L, 7L))
    val rnd = new Random(11)
    val rows = Seq.fill(500)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val got = rows.toDF("x", "y")
      .select(Layout.hilbert8($"x", $"y")).as[Long].collect().toSeq
    assert(got == rows.map { case (x, y) => LayoutUtil.hilbert8(x, y) })
  }

  test("hilbert beats morton on UNALIGNED key ranges (the file-boundary case)") {
    // On power-of-4-ALIGNED buckets Morton is optimal (each is an exact
    // 16×16 square) — the curves differ where it matters in practice:
    // parquet file/row-group boundaries land at ARBITRARY key offsets.
    // Measure the bounding-box span of every 256-cell range starting at
    // each multiple of 64: Hilbert stays connected (span ≤ 31), Morton
    // ranges that straddle a quadrant seam jump across the grid.
    def invert(key: (Long, Long) => Long): Array[(Int, Int)] = {
      val inv = new Array[(Int, Int)](65536)
      for (x <- 0 until 256; y <- 0 until 256) inv(key(x, y).toInt) = (x, y)
      inv
    }
    def spans(inv: Array[(Int, Int)]): Seq[Int] =
      (0 until (65536 - 256) by 64).map { o =>
        val pts = (o until o + 256).map(inv)
        math.max(pts.map(_._1).max - pts.map(_._1).min,
          pts.map(_._2).max - pts.map(_._2).min)
      }
    val h = spans(invert(LayoutUtil.hilbert8))
    val z = spans(invert(LayoutUtil.interleave16))
    assert(h.max <= 31, s"hilbert worst unaligned span ${h.max} (expected ≤ 31)")
    assert(h.max < z.max && h.sum < z.sum,
      s"hilbert (max ${h.max}, mean ${h.sum / h.size}) should beat " +
        s"morton (max ${z.max}, mean ${z.sum / z.size})")
  }
}
