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
}
