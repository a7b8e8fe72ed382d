package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Streaming CDC apply: drained state ≡ batch compaction, and a fully
  * replayed log in a LATER micro-batch changes nothing (at-least-once
  * delivery absorbed by the max algebra). */
class CdcStreamSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def drainCopies(copies: Int, name: String): Map[Long, (Long, String, Long)] = {
    val staged = Files.createTempDirectory("graft_cdc")
    (1 to copies).foreach { i =>
      Files.copy(Paths.get(s"$dir/orders.parquet"), staged.resolve(s"orders_$i.parquet"))
    }
    val q = CdcStream.run(spark, staged.toString, name,
      maxFilesPerTrigger = if (copies > 1) Some(1) else None)
    q.awaitTermination()
    if (copies > 1)
      assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
        "replay did not arrive in a separate micro-batch")
    val m = spark.table(name)
      .select(col("k"), col("m.seq"), col("m.op"), col("m.cents"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getLong(3)))).toMap
    spark.catalog.dropTempView(name)
    m
  }

  test("drained streaming state equals the batch last-writer-wins compaction") {
    val streamed = drainCopies(1, "cdc_one")
    val batch = CdcStream.changeLog(graft.core.Tables.t(spark, dir, "orders"))
      .groupBy(col("k"))
      .agg(max(struct(col("seq"), col("op"), col("cents"))).as("m"))
      .select(col("k"), col("m.seq"), col("m.op"), col("m.cents"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getLong(3)))).toMap
    assert(streamed == batch)
    assert(batch.nonEmpty)
    // tombstone winners exist in-state (dropped only at read time)
    assert(streamed.values.exists(_._2 == "D"))
  }

  test("a full replay arriving in a later micro-batch is absorbed idempotently") {
    assert(drainCopies(2, "cdc_two") == drainCopies(1, "cdc_one_b"))
  }
}
