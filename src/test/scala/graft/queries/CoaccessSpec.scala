package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Pins the [[Extensions.graphCoaccess]] hot-bucket guard: a bucket
  * with arbitrarily many distinct users contributes at most
  * C(CoaccessCap, 2) pairs to the self-join, because the per-bucket
  * `row_number ≤ B` cap runs BEFORE the join. Without the cap a single
  * hot (hour, event_type) bucket goes quadratic at scale — this spec
  * is the regression gate that keeps the guard wired.
  */
class CoaccessSpec extends AnyFunSuite with SparkSpec {

  private def writeHotBucket(users: Int): String = {
    val dir = Files.createTempDirectory("coaccess").toString
    import spark.implicits._
    // Every user appears in the same two (hour, "view") buckets, so all
    // surviving pairs share 2 buckets and pass the w >= 2 tail prune.
    val rows = (1 to users).flatMap { u =>
      Seq((u.toLong, "2024-01-01 10:15:00", u.toLong, "view", 1.0, "{}"),
          (u.toLong + users, "2024-01-01 11:45:00", u.toLong, "view", 1.0, "{}"))
    }
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("hot bucket fan-out is bounded by C(B,2) regardless of bucket size") {
    val b = Extensions.CoaccessCap
    val hot = writeHotBucket(users = b * 8) // 512 distinct users per bucket
    val out = Extensions.graphCoaccess(spark, hot).collect()
    assert(out.length == b * (b - 1) / 2,
      s"expected capped C($b,2) pairs, got ${out.length}")
    // The cap is deterministic: lowest user_ids survive, every pair
    // shares both buckets (w = 2).
    assert(out.forall(r => r.getLong(0) <= b && r.getLong(1) <= b))
    assert(out.forall(_.getLong(2) == 2L))
  }

  test("buckets under the cap are untouched: pairs and weights exact") {
    val small = writeHotBucket(users = 5)
    val out = Extensions.graphCoaccess(spark, small).collect()
    assert(out.length == 5 * 4 / 2)
    assert(out.forall(_.getLong(2) == 2L))
  }
}
