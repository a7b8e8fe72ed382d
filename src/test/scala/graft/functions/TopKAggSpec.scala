package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.functions.TopKAgg.topK

class TopKAggSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("top-k of longs per group, descending, bounded at k") {
    val df = Seq((1, 5L), (1, 9L), (1, 1L), (1, 7L), (2, 3L)).toDF("g", "x")
    val got = df.groupBy("g").agg(topK(col("x"), 2).as("t"))
      .as[(Int, Seq[Long])].collect().toMap
    assert(got(1) == Seq(9L, 7L))
    assert(got(2) == Seq(3L))
  }

  test("struct ordering: lexicographic (a, b) top-k") {
    val df = Seq((1, 10, 1L), (1, 10, 5L), (1, 20, 0L), (1, 5, 9L)).toDF("g", "a", "b")
    val got = df.groupBy("g")
      .agg(topK(struct(col("a"), col("b")), 2).as("t"))
      .select(explode(col("t")).as("s"))
      .select("s.a", "s.b").as[(Int, Long)].collect().toSeq
    assert(got == Seq((20, 0L), (10, 5L)))
  }

  test("survives partial/final split and serialization across many partitions") {
    val df = spark.range(0, 10000).select(
      (col("id") % 7).as("g"), col("id").as("x")).repartition(16)
    val got = df.groupBy("g").agg(topK(col("x"), 3).as("t"))
      .as[(Long, Seq[Long])].collect().toMap
    (0L until 7L).foreach { g =>
      val expect = (9999L to 0L by -1).filter(_ % 7 == g).take(3)
      assert(got(g) == expect, s"group $g")
    }
  }

  test("nulls are skipped; empty group yields empty array") {
    val df = Seq((1, Some(4L)), (1, None), (2, None)).toDF("g", "x")
    val got = df.groupBy("g").agg(topK(col("x"), 2).as("t"))
      .as[(Int, Seq[Long])].collect().toMap
    assert(got(1) == Seq(4L))
    assert(got(2) == Seq.empty)
  }

  test("agrees with the window formulation on real data") {
    val orders = graft.core.Tables.t(spark, "/root/testdata/sf0.001", "orders")
    val viaAgg = graft.queries.Inventory.q25TopkAgg(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, String, Long)].collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val viaWindow = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
        col("rn").cast("long"))
      .orderBy("o_custkey", "rn")
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(viaAgg == viaWindow)
  }
}
