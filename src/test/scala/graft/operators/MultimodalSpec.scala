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
    val sampled = Multimodal.sampleFrames(decoded.toDF(), everyN = 30)
      .groupBy("media_id").agg(count(lit(1)).as("n")).as[(Long, Long)].collect().toMap
    for (d <- decoded.collect() if d.n_frames > 1) {
      val expect = (d.n_frames + 29) / 30
      assert(sampled(d.media_id) == expect,
        s"media ${d.media_id}: ${sampled(d.media_id)} != $expect (n_frames=${d.n_frames})")
    }
  }

  test("HeaderDecoder parses a real-world PNG (not just our own fixtures)") {
    // the canonical 1x1 transparent PNG, byte-for-byte as browsers emit it
    val onePx = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNk" +
        "YPhfDwAChwGA60e6kgAAAABJRU5ErkJggg==")
    val m = Multimodal.HeaderDecoder.decode(onePx)
    assert(m.kind == "png" && m.width == 1 && m.height == 1 && m.nFrames == 1)
  }

  test("HeaderDecoder round-trips the byte-valid fixtures of all four containers") {
    import Multimodal.{HeaderDecoder, MediaFixtures}
    val p = HeaderDecoder.decode(MediaFixtures.png(1920, 1080))
    assert((p.kind, p.width, p.height) == (("png", 1920, 1080)))
    val j = HeaderDecoder.decode(MediaFixtures.jpeg(640, 480))
    assert((j.kind, j.width, j.height) == (("jpeg", 640, 480)))
    val g = HeaderDecoder.decode(MediaFixtures.gif(320, 200))
    assert((g.kind, g.width, g.height) == (("gif", 320, 200)))
    val w = HeaderDecoder.decode(MediaFixtures.wav(44100))
    assert((w.kind, w.sampleRateHz) == (("wav", 44100)))
  }

  test("JPEG marker scan skips unknown segments and survives garbage") {
    import Multimodal.{HeaderDecoder, MediaFixtures}
    // splice a COM segment (FFFE, length 6, 4 payload bytes) between
    // APP0 and SOF0: the scan must skip it by its length field
    val base = MediaFixtures.jpeg(100, 50)
    val sofAt = base.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    val withCom = base.take(sofAt) ++
      Array[Byte](0xff.toByte, 0xfe.toByte, 0, 6, 'n', 'o', 't', 'e') ++
      base.drop(sofAt)
    val m = HeaderDecoder.decode(withCom)
    assert((m.kind, m.width, m.height) == (("jpeg", 100, 50)))
    // corrupt/foreign bytes: unknown, never an exception
    assert(Multimodal.HeaderDecoder.decode("not media at all".getBytes).kind == "unknown")
    assert(Multimodal.HeaderDecoder.decode(Array[Byte](0xff.toByte, 0xd8.toByte)).kind == "unknown")
    assert(Multimodal.HeaderDecoder.decode(Array.empty[Byte]).kind == "unknown")
    // corrupt RIFF chunk sizes: negative (would step 0/backwards) and
    // huge positive (would overflow the index negative) — both bail
    def wavWithSize(sz: Long): Array[Byte] =
      "RIFF".getBytes ++ Array[Byte](36, 0, 0, 0) ++ "WAVE".getBytes ++
        "junk".getBytes ++ Array[Byte](
          (sz & 0xff).toByte, ((sz >> 8) & 0xff).toByte,
          ((sz >> 16) & 0xff).toByte, ((sz >> 24) & 0xff).toByte) ++
        new Array[Byte](4)
    assert(Multimodal.HeaderDecoder.decode(wavWithSize(0xFFFFFFF8L)).kind == "unknown")
    assert(Multimodal.HeaderDecoder.decode(wavWithSize(0x7FFFFFF0L)).kind == "unknown")
    assert(Multimodal.HeaderDecoder.decode("GIF89a".getBytes).kind == "unknown")
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
