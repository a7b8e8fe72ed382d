package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class MultimodalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.asMedia(
    Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "payload"),
    "id", "payload")

  test("asMedia produces binary payloads") {
    val r = media.collect().map(m => m.media_id -> new String(m.bytes, "UTF-8")).toMap
    assert(r == Map(1L -> "alpha", 2L -> "beta", 3L -> "gamma"))
  }

  test("stub decode is deterministic and schema-complete") {
    val a = Multimodal.decode(media).collect().sortBy(_.media_id)
    val b = Multimodal.decode(media).collect().sortBy(_.media_id)
    assert(a.toSeq == b.toSeq)
    for (d <- a) {
      assert(Seq("image", "audio", "video").contains(d.kind))
      assert(d.width >= 320 && d.height >= 240)
      if (d.kind == "image") assert(d.n_frames == 1)
    }
  }

  test("frame sampling emits ceil(n_frames / everyN) rows per multi-frame doc") {
    val decoded = Multimodal.decode(media)
    val sampled = Multimodal.sampleFrames(decoded, everyN = 30)
      .groupBy("media_id").agg(count(lit(1)).as("n")).as[(Long, Long)].collect().toMap
    for (d <- decoded.collect() if d.n_frames > 1) {
      val expect = (d.n_frames + 29) / 30
      assert(sampled(d.media_id) == expect,
        s"media ${d.media_id}: ${sampled(d.media_id)} != $expect (n_frames=${d.n_frames})")
    }
  }

  test("resize plan preserves aspect ratio and caps the long side") {
    val plan = Multimodal.resizePlan(Multimodal.decode(media), maxSide = 256)
      .collect()
    for (r <- plan) {
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (ow, oh) = (r.getAs[Int]("out_width"), r.getAs[Int]("out_height"))
      assert(math.max(ow, oh) <= 256 || (w <= 256 && h <= 256))
      val ratioIn = w.toDouble / h
      val ratioOut = ow.toDouble / oh
      assert(math.abs(ratioIn - ratioOut) / ratioIn < 0.02)
    }
  }
}
