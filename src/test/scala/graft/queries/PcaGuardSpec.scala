package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Exercises the [[Extensions.pcaPowerIterate]] overflow guard: a Gram
  * cell past the documented i64 matvec bound must fail loudly instead
  * of wrapping silently under non-ANSI Long arithmetic. */
class PcaGuardSpec extends AnyFunSuite {

  private val d = 64
  private val bound = Long.MaxValue / (d.toLong * 1000000L)

  test("a Gram cell past the i64 matvec bound fails loudly") {
    val mat = Array.fill(d, d)(0L)
    mat(3)(7) = bound + 1
    val e = intercept[IllegalArgumentException](Extensions.pcaPowerIterate(mat))
    assert(e.getMessage.contains("overflows"))
  }

  test("a cell exactly at the bound iterates without wrapping") {
    val mat = Array.tabulate(d, d)((i, j) => if (i == j) bound else 0L)
    val v = Extensions.pcaPowerIterate(mat)
    // Diagonal matrix: every component stays equal and positive.
    assert(v.forall(_ > 0L) && v.distinct.length == 1)
  }

  test("dominant direction wins on a rank-1-plus-noise matrix") {
    // C = 100 * u uᵀ with u = e0 + e1, plus small diagonal noise:
    // the iterate must concentrate equally on dims 0 and 1.
    val mat = Array.tabulate(d, d) { (i, j) =>
      val r1 = if (i < 2 && j < 2) 100L else 0L
      r1 + (if (i == j) 1L else 0L)
    }
    val v = Extensions.pcaPowerIterate(mat)
    assert(v(0) == v(1) && v(0) > v(2) * 100)
  }
}
