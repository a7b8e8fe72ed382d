package graft.sources

import org.apache.spark.sql.SaveMode
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** JDBC warehouse round-trip against embedded Derby (on Spark's own
  * classpath — no new dependency): write, whole-table read, range-
  * partitioned read, and the reference's dedup-append semantics.
  */
class JdbcWarehouseSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // in-memory Derby: each test database dies with the JVM, no files
  private def freshUrl = s"jdbc:derby:memory:graft${System.nanoTime()};create=true"

  private def warehouseRows(ids: Range) =
    ids.map(i => (s"2017-05-0$i-1000000$i-birmingham-womenseekmen",
      i.toLong, s"555123456$i", java.sql.Timestamp.valueOf(s"2017-05-0$i 11:53:00")))
      .toDF("uniq_id", "ad_id", "phone", "post_date")

  test("write then read round-trips rows and types") {
    val url = freshUrl
    JdbcWarehouse.write(warehouseRows(1 to 5), url, "warehouse")
    val back = JdbcWarehouse.read(spark, url, "warehouse")
    assert(back.count() == 5)
    val r = back.orderBy("ad_id").collect()
    assert(r.map(_.getAs[String]("uniq_id")).toSeq ==
      (1 to 5).map(i => s"2017-05-0$i-1000000$i-birmingham-womenseekmen"))
    assert(r.map(_.getAs[java.sql.Timestamp]("post_date").toString).toSeq ==
      (1 to 5).map(i => s"2017-05-0$i 11:53:00.0"))
  }

  test("range-partitioned read returns the same rows across strides") {
    val url = freshUrl
    JdbcWarehouse.write(warehouseRows(1 to 9), url, "warehouse")
    val part = JdbcWarehouse.readPartitioned(spark, url, "warehouse",
      "ad_id", lower = 1, upper = 10, numPartitions = 3)
    assert(part.rdd.getNumPartitions == 3)
    assert(part.select("uniq_id").collect().map(_.getString(0)).sorted.toSeq ==
      JdbcWarehouse.read(spark, url, "warehouse")
        .select("uniq_id").collect().map(_.getString(0)).sorted.toSeq)
  }

  test("appendDedup inserts only unseen keys, like the UNIQUE-constraint catch") {
    val url = freshUrl
    JdbcWarehouse.write(warehouseRows(1 to 5), url, "warehouse")
    // overlapping batch: 4..7 — only 6 and 7 are fresh
    val n = JdbcWarehouse.appendDedup(warehouseRows(4 to 7), url, "warehouse", "uniq_id")
    assert(n == 2)
    val back = JdbcWarehouse.read(spark, url, "warehouse")
    assert(back.count() == 7)
    assert(back.select("uniq_id").distinct().count() == 7)
    // idempotent replay: nothing fresh, nothing appended
    assert(JdbcWarehouse.appendDedup(warehouseRows(1 to 7), url, "warehouse", "uniq_id") == 0)
    assert(JdbcWarehouse.read(spark, url, "warehouse").count() == 7)
  }

  test("append mode accumulates without table recreation") {
    val url = freshUrl
    JdbcWarehouse.write(warehouseRows(1 to 2), url, "warehouse")
    JdbcWarehouse.write(warehouseRows(3 to 4), url, "warehouse", SaveMode.Append)
    assert(JdbcWarehouse.read(spark, url, "warehouse").count() == 4)
  }
}
