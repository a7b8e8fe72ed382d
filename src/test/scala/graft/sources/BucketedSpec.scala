package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.core.Tables.t

class BucketedSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("bucketed-by-key join plans with no exchange and correct results") {
    Bucketed.write(t(spark, dir, "orders"), "b_orders", Seq("o_orderkey"), 4)
    Bucketed.write(t(spark, dir, "lineitem"), "b_lineitem", Seq("l_orderkey"), 4)
    val o = Bucketed.read(spark, "b_orders")
    val l = Bucketed.read(spark, "b_lineitem")
    val joined = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not exchange:\n$plan")

    // results identical to the unbucketed join
    val plain = t(spark, dir, "orders").as("o")
      .join(t(spark, dir, "lineitem").as("li"),
        col("o.o_orderkey") === col("li.l_orderkey"))
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(joined.as[(Long, Long)].collect().sorted.toSeq == plain)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}
