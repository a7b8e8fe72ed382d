package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, SparkSpec}

class InventorySpec extends AnyFunSuite with SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query returns rows at sf0.001") {
    for ((name, fn) <- SparkEntry.queries)
      assert(fn(spark, sf).count() > 0, s"query $name returned no rows")
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("q8 approx distinct is within the 2% rsd bound (5x slack)") {
    import org.apache.spark.sql.functions._
    val row = Inventory.q8ApproxDistinct(spark, sf).collect()(0)
    val approx = row.getLong(row.fieldIndex("approx_orders"))
    val exact = graft.core.Tables.t(spark, sf, "lineitem")
      .agg(countDistinct(col("l_orderkey"))).collect()(0).getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.10,
      s"approx=$approx exact=$exact")
  }
}
