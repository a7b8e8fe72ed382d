package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class StreamJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("stream-stream attribution join matches the batch range join") {
    val dir = "/root/testdata/sf0.001"
    val streamDir = java.nio.file.Files.createTempDirectory("graft_sjoin")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val q = StreamJoin.attributionJoin(spark, streamDir.toString, "attr_out")
    q.awaitTermination()

    val streamed = spark.table("attr_out")
      .select("purchase_id", "view_id", "lag_us")
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val batch = StreamJoin.attributionBatch(spark, dir)
      .select("purchase_id", "view_id", "lag_us")
      .as[(Long, Long, Long)].collect().sorted.toSeq

    assert(streamed.nonEmpty, "stream join emitted nothing")
    assert(streamed == batch)
  }
}
