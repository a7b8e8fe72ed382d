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

  test("ImageIoDecoder really decodes pixels: dimensions match the header walk, checksum matches the source raster") {
    import Multimodal.{HeaderDecoder, ImageIoDecoder}
    // paint a deterministic gradient, encode through the JDK's own
    // writers, then decode through the seam — dimensions must agree
    // with the independent header walk and the pixel checksum with a
    // CRC computed straight off the source raster
    def painted(w: Int, h: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_ARGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, 0xff000000 | ((x * 7) % 256 << 16) | ((y * 13) % 256 << 8) | ((x + y) % 256))
      img
    }
    def enc(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    def rasterCrc(img: java.awt.image.BufferedImage): Long = {
      val crc = new java.util.zip.CRC32
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val p = img.getRGB(x, y)
        crc.update(Array[Byte]((p >>> 24).toByte, (p >>> 16).toByte,
          (p >>> 8).toByte, p.toByte), 0, 4)
      }
      crc.getValue
    }
    val src = painted(37, 21)
    val pngBytes = enc(src, "png")
    val m = ImageIoDecoder.decode(pngBytes)
    val hdr = HeaderDecoder.decode(pngBytes)
    assert((m.kind, m.width, m.height) == (("png", 37, 21)))
    assert((hdr.width, hdr.height) == ((m.width, m.height)),
      "pixel decode and header walk must agree on dimensions")
    // PNG is lossless: the decoded raster is the painted raster
    assert(ImageIoDecoder.pixelChecksum(pngBytes) == rasterCrc(src))
    // GIF re-quantizes the palette, JPEG is lossy — still must decode
    // to the right geometry with a stable checksum per encoding
    val gifBytes = enc(painted(16, 9), "gif")
    val g = ImageIoDecoder.decode(gifBytes)
    assert((g.kind, g.width, g.height) == (("gif", 16, 9)))
    assert(ImageIoDecoder.pixelChecksum(gifBytes) == ImageIoDecoder.pixelChecksum(gifBytes))
    // non-image and corrupt inputs fall back to the header walk
    assert(ImageIoDecoder.decode(Multimodal.MediaFixtures.wav(8000)).kind == "wav")
    assert(ImageIoDecoder.decode("junk".getBytes).kind == "unknown")
    assert(ImageIoDecoder.pixelChecksum("junk".getBytes) == -1L)
    // and the seam accepts it like any decoder: distributed decode over
    // real blobs yields the true dimensions
    implicit val enc2 = org.apache.spark.sql.Encoders.product[Multimodal.MediaRow]
    val blobs = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, pngBytes), Multimodal.MediaRow(2L, gifBytes)))
    val out = Multimodal.decode(blobs, ImageIoDecoder).collect().sortBy(_.media_id)
    assert(out.map(d => (d.media_id, d.kind, d.width, d.height)).toSeq ==
      Seq((1L, "png", 37, 21), (2L, "gif", 16, 9)))
  }

  test("MP4 box walk recovers geometry and time base; corrupt boxes bail to unknown") {
    import Multimodal.{HeaderDecoder, MediaFixtures}
    val m = HeaderDecoder.decode(MediaFixtures.mp4(1920, 1080, 30, 9000))
    assert((m.kind, m.width, m.height, m.nFrames, m.sampleRateHz) ==
      (("mp4", 1920, 1080, 9000, 30)))
    // an extra top-level box BEFORE moov must be skipped by its size
    val base = MediaFixtures.mp4(640, 360, 24, 240)
    val free = Array[Byte](0, 0, 0, 12) ++ "free".getBytes ++ "pad!".getBytes
    val ftypLen = 16
    val shifted = base.take(ftypLen) ++ free ++ base.drop(ftypLen)
    val s = HeaderDecoder.decode(shifted)
    assert((s.kind, s.width, s.height) == (("mp4", 640, 360)))
    // corrupt: truncated moov, zero/oversized box sizes, missing tkhd
    assert(HeaderDecoder.decode(base.take(40)).kind == "unknown")
    val zeroSize = base.clone(); zeroSize(16) = 0; zeroSize(17) = 0; zeroSize(18) = 0; zeroSize(19) = 0
    assert(HeaderDecoder.decode(zeroSize).kind == "unknown")
    val hugeSize = base.clone(); hugeSize(16) = 0x7f
    assert(HeaderDecoder.decode(hugeSize).kind == "unknown")
    assert(HeaderDecoder.decode("ftypnope".getBytes).kind == "unknown")
  }

  test("PcmDecoder really decodes samples: JDK-encoded WAV round-trips, fixtures match, corrupt blobs fall back") {
    import Multimodal.{MediaFixtures, PcmDecoder}
    import javax.sound.sampled.{AudioFormat, AudioFileFormat, AudioInputStream, AudioSystem}
    // 1) our own fixture: bytes → exact sample values back
    val want = Array.tabulate(300)(i => ((i * 131 % 65536) - 32768).toShort)
    val fix = MediaFixtures.wavPcm(16000, want)
    assert(PcmDecoder.samples(fix).get.toSeq == want.toSeq)
    val meta = PcmDecoder.decode(fix)
    assert((meta.kind, meta.sampleRateHz, meta.nFrames) == (("wav", 16000, 300)))
    // 2) not an inverse of itself: encode the same samples through the
    // JDK's own WAV writer and decode through the seam
    val pcm = new Array[Byte](want.length * 2)
    want.indices.foreach { i =>
      pcm(2 * i) = want(i).toByte; pcm(2 * i + 1) = (want(i) >> 8).toByte
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 16000f, 16, 1, 2, 16000f, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, want.length),
      AudioFileFormat.Type.WAVE, bos)
    val jdkWav = bos.toByteArray
    assert(PcmDecoder.samples(jdkWav).get.toSeq == want.toSeq)
    // and the independent header walk agrees on the rate
    assert(Multimodal.HeaderDecoder.decode(jdkWav).sampleRateHz == 16000)
    // 3) corrupt / non-audio: None samples, header-walk metadata, no throw
    assert(PcmDecoder.samples("junk".getBytes).isEmpty)
    assert(PcmDecoder.samples(Array.empty[Byte]).isEmpty)
    assert(PcmDecoder.decode(MediaFixtures.png(8, 8)).kind == "png")
    // 4) the distributed path: decodePcm reduces to exact checksums
    implicit val enc = org.apache.spark.sql.Encoders.product[Multimodal.MediaRow]
    val blobs = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, fix), Multimodal.MediaRow(2L, "junk".getBytes)))
    val rows = Multimodal.decodePcm(blobs).collect().sortBy(_.media_id)
    val sum = want.map(_.toLong).sum
    val wsum = want.zipWithIndex.map { case (s, i) => (i + 1L) * s }.sum
    assert(rows.map(r => (r.media_id, r.sample_rate_hz, r.n_samples, r.sum_samples, r.wsum_samples)).toSeq ==
      Seq((1L, 16000, 300L, sum, wsum), (2L, 0, 0L, 0L, 0L)))
  }

  test("AVI header walk recovers geometry, frame count, and fps; corrupt bails to unknown") {
    import Multimodal.{HeaderDecoder, MediaFixtures}
    val frames = Seq.tabulate(3)(k => MediaFixtures.jpegGrayHalves(24, 32, 10 * k, 200 - k))
    val avi = MediaFixtures.aviMjpeg(24, 32, 25, frames)
    val m = HeaderDecoder.decode(avi)
    assert((m.kind, m.width, m.height, m.nFrames, m.sampleRateHz) ==
      (("avi", 24, 32, 3, 25)))
    // corrupt: truncation and an oversized chunk size must bail, not throw
    assert(HeaderDecoder.decode(avi.take(20)).kind == "unknown")
    val huge = avi.clone()
    huge(16) = 0xff.toByte; huge(17) = 0xff.toByte
    huge(18) = 0xff.toByte; huge(19) = 0x7f.toByte     // hdrl size > file
    assert(HeaderDecoder.decode(huge).kind == "unknown")
    // a RIFF that is neither WAVE nor AVI is unknown
    assert(HeaderDecoder.decode("RIFF   WEBP".getBytes).kind == "unknown")
  }

  test("AVI walk skips a malformed PLAIN chunk named like a LIST type") {
    import Multimodal.HeaderDecoder
    def fourcc(s: String) = s.getBytes("US-ASCII")
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    // avih with known geometry, then a PLAIN chunk whose fourcc spells
    // 'strl' (never a LIST) — the old walk would hand it to listEnd,
    // which read the preceding bytes as a LIST size and could report a
    // garbage-but-in-bounds fps; the fixed walk skips it and reports
    // fps 0 because no genuine LIST strl exists
    val avih = fourcc("avih") ++ le32(56) ++ le32(40000) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(7) ++ le32(0) ++
      le32(1) ++ le32(0) ++ le32(24) ++ le32(32) ++ new Array[Byte](16)
    val fake = fourcc("strl") ++ le32(8) ++ le32(1) ++ le32(25)
    val hdrl = fourcc("LIST") ++ le32(4 + avih.length + fake.length) ++
      fourcc("hdrl") ++ avih ++ fake
    val body = fourcc("AVI ") ++ hdrl
    val avi = fourcc("RIFF") ++ le32(body.length) ++ body
    val m = HeaderDecoder.decode(avi)
    assert((m.kind, m.width, m.height, m.nFrames, m.sampleRateHz) ==
      (("avi", 24, 32, 7, 0)))
  }

  test("MjpegAvi extracts the exact frame payloads, odd lengths word-aligned") {
    import Multimodal.{MediaFixtures, MjpegAvi}
    val frames = Seq.tabulate(4)(k => MediaFixtures.jpegGrayHalves(16, 16, k, 255 - k))
    // JPEG streams can be odd-length: the container pads, the walk must not drift
    val got = MjpegAvi.frames(MediaFixtures.aviMjpeg(16, 16, 24, frames))
    assert(got.length == 4)
    got.zip(frames).foreach { case (g, f) => assert(g.toSeq == f.toSeq) }
    assert(MjpegAvi.frames("junk".getBytes).isEmpty)
    assert(MjpegAvi.frames(MediaFixtures.wav(8000)).isEmpty)
    assert(MjpegAvi.frames(Array.empty[Byte]).isEmpty)
  }

  test("MjpegAvi really decodes frame pixels: checksum matches an independently painted raster") {
    import Multimodal.{MediaFixtures, MjpegAvi}
    val (w, h, v1, v2) = (40, 48, 77, 201)
    val frame = MediaFixtures.jpegGrayHalves(w, h, v1, v2)
    // independent fingerprint: CRC32 over the raster bytes we INTENDED,
    // painted here with no ImageIO anywhere on this side
    val crc = new java.util.zip.CRC32
    val row1 = Array.fill(w)(v1.toByte); val row2 = Array.fill(w)(v2.toByte)
    (0 until h / 2).foreach(_ => crc.update(row1))
    (0 until h / 2).foreach(_ => crc.update(row2))
    assert(MjpegAvi.frameChecksum(frame) == crc.getValue)
    // pixel sums match the closed form the oracle uses
    val Some((gw, gh, sum, wsum)) = MjpegAvi.framePixels(frame)
    assert((gw, gh) == ((w, h)))
    assert(sum == w.toLong * (h / 2) * (v1 + v2))
    val s1 = (h / 2).toLong * (h / 2 + 1) / 2
    val s2 = h.toLong * (h + 1) / 2 - s1
    assert(wsum == w * (v1 * s1 + v2 * s2))
    assert(MjpegAvi.framePixels("nope".getBytes).isEmpty)
    assert(MjpegAvi.frameChecksum("nope".getBytes) == -1L)
  }

  test("decodeVideoFrames: distributed per-frame reduction, corrupt blobs dropped") {
    import Multimodal.{MediaFixtures, MjpegAvi}
    implicit val enc = org.apache.spark.sql.Encoders.product[Multimodal.MediaRow]
    val frames = Seq.tabulate(3)(k => MediaFixtures.jpegGrayHalves(16, 32, 30 + k, 60 + k))
    val blobs = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, MediaFixtures.aviMjpeg(16, 32, 24, frames)),
      Multimodal.MediaRow(2L, "garbage".getBytes)))
    val rows = Multimodal.decodeVideoFrames(blobs).collect().sortBy(r => (r.media_id, r.frame_idx))
    assert(rows.map(_.media_id).toSeq == Seq(1L, 1L, 1L))
    rows.zipWithIndex.foreach { case (r, k) =>
      val Some((w, h, sum, wsum)) = MjpegAvi.framePixels(frames(k))
      assert((r.frame_idx, r.width, r.height, r.sum_px, r.wsum_px) ==
        ((k, w, h, sum, wsum)))
    }
  }

  test("decodeVideoFrames everyN samples by STREAM position, composing with dropped frames") {
    import Multimodal.MediaFixtures
    implicit val enc = org.apache.spark.sql.Encoders.product[Multimodal.MediaRow]
    val frames = Seq.tabulate(5)(k => MediaFixtures.jpegGrayHalves(16, 16, 40 + k, 80 + k))
    // corrupt the frame at kept position 2: it must be dropped while
    // positions 0 and 4 survive — indices stay stream positions, so the
    // sampling grid does not shift over the gap
    val broken = frames.updated(2, "not a jpeg".getBytes.asInstanceOf[Array[Byte]])
    val blobs = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, MediaFixtures.aviMjpeg(16, 16, 24, frames)),
      Multimodal.MediaRow(2L, MediaFixtures.aviMjpeg(16, 16, 24, broken))))
    val got = Multimodal.decodeVideoFrames(blobs, everyN = 2).collect()
      .map(r => (r.media_id, r.frame_idx)).sorted.toSeq
    assert(got == Seq((1L, 0), (1L, 2), (1L, 4), (2L, 0), (2L, 4)))
  }

  test("lossless re-encodes: PNG/BMP/GIF of one raster differ in bytes, agree in pixels") {
    // the mm_image_dedup premise, and proof the lossless codecs are
    // sample-exact at arbitrary (unaligned) geometry
    import Multimodal.{MediaFixtures, MjpegAvi}
    val blobs = Seq("png", "bmp", "gif")
      .map(f => MediaFixtures.imageGrayHalves(37, 23, 77, 201, f))
    for (Seq(a, b) <- blobs.combinations(2))
      assert(!java.util.Arrays.equals(a, b))
    val sigs = blobs.map(MjpegAvi.framePixels(_).get).distinct
    assert(sigs.size == 1)
    val (w, h, sum, wsum) = sigs.head
    assert((w, h) == ((37, 23)))
    // closed form with odd height: h//2 rows of v1, the rest v2
    assert(sum == 37L * (11 * 77 + 12 * 201))
    val s1 = 11L * 12 / 2                       // Σ(y+1), y in [0,11)
    val s2 = 23L * 24 / 2 - s1
    assert(wsum == 37L * (77 * s1 + 201 * s2))
  }

  test("aHash: brightness shift and container switch preserve the hash exactly") {
    // the mm_image_phash premise: bits compare cell mean vs global
    // mean, both shifted by the same delta, so the hash is invariant
    import Multimodal.{MediaFixtures, MjpegAvi}
    val base = MjpegAvi.aHash(MediaFixtures.imageGrayBands(37, 24, 11, 0, "png")).get
    for (delta <- Seq(6, 12, 55); fmt <- Seq("png", "bmp", "gif")) {
      val v = MjpegAvi.aHash(MediaFixtures.imageGrayBands(37, 24, 11, delta, fmt)).get
      assert(v == ((37, 24, base._3, base._4)))
    }
    // but pixel SIGNATURES differ — exact-content dedup cannot group these
    val s0 = MjpegAvi.framePixels(MediaFixtures.imageGrayBands(37, 24, 11, 0, "png")).get
    val s6 = MjpegAvi.framePixels(MediaFixtures.imageGrayBands(37, 24, 11, 6, "bmp")).get
    assert(s0._3 != s6._3 && s6._3 - s0._3 == 37L * 24 * 6)
    // closed form: band b value (11*7+13b+5)%200, bit_b = 8*v_b > Σv
    val vs = (0 until 8).map(b => (11 * 7 + b * 13 + 5) % 200)
    val tot = vs.sum
    var hi = 0L; var lo = 0L
    for (b <- 0 until 8 if vs(b) * 8 > tot) {
      val cells = 255L * (1L << (8 * (b % 4)))
      if (b < 4) lo |= cells else hi |= cells
    }
    assert((base._3, base._4) == ((hi, lo)))
    // and the hash is informative: seed 16's band values wrap mod 200
    // at band 7 (v7 = 8), flipping the bit pattern vs seed 11's
    val other = MjpegAvi.aHash(MediaFixtures.imageGrayBands(37, 24, 16, 0, "png")).get
    assert((other._3, other._4) != ((hi, lo)))
  }

  test("aHash: unaligned geometry still decodes (generic grid binning)") {
    import Multimodal.{MediaFixtures, MjpegAvi}
    // halves fixture at odd size — just assert determinism across codecs
    val a = MjpegAvi.aHash(MediaFixtures.imageGrayHalves(37, 23, 77, 201, "png")).get
    val b = MjpegAvi.aHash(MediaFixtures.imageGrayHalves(37, 23, 77, 201, "gif")).get
    assert(a == b && a._1 == 37 && a._2 == 23)
  }

  test("audio energy fingerprint: volume gain preserves the envelope bits exactly") {
    // the mm_audio_fp premise: window energy vs its share of total
    // energy — both sides scale by g², so the comparison is invariant
    import Multimodal.{MediaFixtures, PcmDecoder}
    val m = 11; val L = 4 + m % 5; val n = 64 * L
    def wav(g: Int) = MediaFixtures.wavPcm(8000,
      Array.tabulate(n)(i => (((m * 7 + i * 13) % 97 - 48) * g).toShort))
    def fp(bytes: Array[Byte]): (Long, Long) = {
      val ss = PcmDecoder.samples(bytes).get
      val winSum = new Array[Long](64); var tot = 0L
      for (i <- 0 until ss.length) {
        val e = ss(i).toLong * ss(i); winSum(i * 64 / ss.length) += e; tot += e
      }
      var hi = 0L; var lo = 0L
      for (w <- 0 until 64 if winSum(w) * 64 > tot)
        if (w < 32) lo |= 1L << w else hi |= 1L << (w - 32)
      (hi, lo)
    }
    val base = fp(wav(1))
    assert(fp(wav(2)) == base && fp(wav(3)) == base)
    // but the content signature moves with the gain
    val s1 = PcmDecoder.samples(wav(1)).get.map(_.toLong).sum
    val s2 = PcmDecoder.samples(wav(2)).get.map(_.toLong).sum
    assert(s2 == 2 * s1 && s1 != 0)
    // and a different content fingerprints differently
    val other = MediaFixtures.wavPcm(8000,
      Array.tabulate(n)(i => ((12 * 7 + i * 13) % 97 - 48).toShort))
    assert(fp(other) != base)
  }

  test("video aHash: brightness-shifted re-encode collides, frame order still counts") {
    // the mm_video_phash premise: per-frame aHash survives a uniform
    // brightness delta THROUGH the lossy JPEG round trip (block-uniform
    // rasters encode exactly), while per-frame pixel sums move
    import Multimodal.{MediaFixtures, MjpegAvi}
    val (w, h) = (24, 32)
    def avi(delta: Int, vals: Seq[(Int, Int)]) = MediaFixtures.aviMjpeg(w, h, 24,
      vals.map { case (v1, v2) => MediaFixtures.jpegGrayHalves(w, h, v1 + delta, v2 + delta) })
    val vals = Seq((80, 140), (150, 60), (90, 90))
    val a = avi(0, vals); val b = avi(12, vals)
    assert(!java.util.Arrays.equals(a, b))
    def hashes(bytes: Array[Byte]) = MjpegAvi.frames(bytes).toSeq.map(f => MjpegAvi.aHash(f).get)
    assert(hashes(a) == hashes(b))
    // half-aligned grid: the winning half's word is exactly 2^32-1
    assert(hashes(a).map(t => (t._3, t._4)) ==
      Seq((4294967295L, 0L), (0L, 4294967295L), (0L, 0L)))
    // pixel sums differ by exactly w*h*delta per frame — exact dedup splits
    val pa = MjpegAvi.frames(a).map(MjpegAvi.framePixels(_).get._3).toSeq
    val pb = MjpegAvi.frames(b).map(MjpegAvi.framePixels(_).get._3).toSeq
    assert(pa.zip(pb).forall { case (x, y) => y - x == w.toLong * h * 12 })
    // order sensitivity: swapping frames changes the order-weighted signature
    val c = avi(0, Seq(vals(1), vals(0), vals(2)))
    def sig(bytes: Array[Byte]) = hashes(bytes).zipWithIndex
      .map { case ((_, _, hi, lo), k) => ((k + 1) * hi, (k + 1) * lo) }
      .foldLeft((0L, 0L)) { case ((sh, sl), (hh, ll)) => (sh + hh, sl + ll) }
    assert(sig(c) != sig(a))
  }

  test("mm_curate: one pass triages three modalities and drops planted re-exports") {
    val rows = graft.queries.Extensions.mmCurate(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq("audio", "image", "video"))
    // every doc lands in exactly one modality branch and decodes
    assert(rows.map(_._2).sum == 500)
    // each branch really deduplicates: kept < total, drops account exactly
    for ((_, total, kept, dropped) <- rows) {
      assert(kept < total && dropped == total - kept && kept > 0)
    }
    // kept is bounded by the branch's content modulus (60/3=20 image
    // contents, 50 audio, 40 video — perceptual collisions may merge more)
    val byKind = rows.map(r => r._1 -> r._3).toMap
    assert(byKind("image") <= 20 && byKind("audio") <= 50 && byKind("video") <= 40)
  }

  test("cell fixture: aHash reconstructs the planted 64-bit pattern, flips are local") {
    import Multimodal.{MediaFixtures, MjpegAvi}
    val p = MediaFixtures.splitmix64(7L)
    for (fmt <- Seq("png", "bmp", "gif")) {
      val (w, h, hi, lo) = MjpegAvi.aHash(MediaFixtures.imageGrayCells(p, fmt)).get
      assert((w, h) == ((32, 32)))
      assert(hi == (p >>> 32) && lo == (p & 0xFFFFFFFFL))
    }
    // flipping one pattern bit flips exactly that hash bit
    val q = p ^ (1L << 37)
    val (_, _, qhi, qlo) = MjpegAvi.aHash(MediaFixtures.imageGrayCells(q, "png")).get
    assert((qhi << 32 | qlo) == q)
  }

  test("mm_image_neardup corpus: Hamming <=2 within a content, >=16 across contents") {
    // the margin that makes the banded discovery provably recover the
    // planted clusters (so the oracle can be hash-free)
    import Multimodal.MediaFixtures.splitmix64
    val hashes = (0 until 55).map { m =>
      val base = splitmix64(m.toLong)
      val b1 = (m * 17 + 3) % 64
      val b2raw = (m * 29 + 11) % 64
      val b2 = if (b2raw == b1) (b2raw + 1) % 64 else b2raw
      Seq(base, base ^ (1L << b1), base ^ (1L << b2))
    }
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (vs <- hashes; a <- vs; b <- vs) assert(dist(a, b) <= 2)
    // the REAL separation (the scaladoc's >=16), not just the >=3 the
    // verify threshold needs — anyone widening maxDist has a guard
    for (i <- hashes.indices; j <- hashes.indices if i < j;
         a <- hashes(i); b <- hashes(j)) assert(dist(a, b) >= 16)
    // popcount stays in the fixture's guaranteed-margin zone
    for (vs <- hashes; a <- vs)
      assert(java.lang.Long.bitCount(a) >= 2 && java.lang.Long.bitCount(a) <= 62)
  }

  test("window-amplitude WAV: audioFp reconstructs the planted pattern; margins hold") {
    import Multimodal.{MediaFixtures, audioFp}
    def wav(p: Long) = MediaFixtures.wavPcm(8000, Array.tabulate(512) { i =>
      (if (((p >>> (i / 8)) & 1L) == 1L) 100 else 30).toShort
    })
    val p = MediaFixtures.splitmix64(1017L)
    val (rate, n, hi, lo) = audioFp(wav(p)).get
    assert(rate == 8000 && n == 512)
    assert((hi << 32 | lo) == p)
    // a one-window re-master flips exactly that fingerprint bit
    val q = p ^ (1L << 29)
    val (_, _, qhi, qlo) = audioFp(wav(q)).get
    assert((qhi << 32 | qlo) == q)
    // the mm_audio_neardup corpus margins: <=2 within, >=18 across contents
    val hashes = (0 until 45).map { m =>
      val base = MediaFixtures.splitmix64(m + 1000L)
      val b1 = (m * 13 + 5) % 64
      val b2raw = (m * 23 + 9) % 64
      val b2 = if (b2raw == b1) (b2raw + 1) % 64 else b2raw
      Seq(base, base ^ (1L << b1), base ^ (1L << b2))
    }
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    for (vs <- hashes; a <- vs; b <- vs) assert(dist(a, b) <= 2)
    // real cross-content separation (the scaladoc's >=18), not just >=3
    for (i <- hashes.indices; j <- hashes.indices if i < j;
         a <- hashes(i); b <- hashes(j)) assert(dist(a, b) >= 18)
    for (vs <- hashes; a <- vs)
      assert(java.lang.Long.bitCount(a) >= 1 && java.lang.Long.bitCount(a) <= 63)
  }

  test("tagged WAV duplicates: LIST/INFO chunk changes bytes, not decoded samples") {
    // the mm_audio_dedup premise: a metadata tag makes the container
    // byte-different while the JDK reader skips it at decode
    import Multimodal.{MediaFixtures, PcmDecoder, HeaderDecoder}
    val want = Array.tabulate(200)(i => ((i * 331 - 20000) % 32768).toShort)
    val plain = MediaFixtures.wavPcm(16000, want)
    val tagged = MediaFixtures.wavPcmTagged(16000, want, "comment=shard-7")
    assert(!java.util.Arrays.equals(plain, tagged))
    assert(PcmDecoder.samples(tagged).get.toSeq == want.toSeq)
    assert(PcmDecoder.samples(plain).get.toSeq == want.toSeq)
    // the independent header walk still finds fmt past nothing / the
    // reader past the tag: both report the same rate and frame count
    assert(HeaderDecoder.decode(tagged).sampleRateHz == 16000)
    val m = PcmDecoder.decode(tagged)
    assert((m.kind, m.nFrames) == (("wav", 200)))
  }

  test("re-containered duplicates: byte hashes differ, decoded pixel signatures match") {
    // the mm_video_dedup premise: the same frames at a different fps
    // produce different CONTAINER bytes (md5 dedup misses the pair)
    // while the decoded frame pixels are identical
    import Multimodal.{MediaFixtures, MjpegAvi}
    val frames = Seq.tabulate(3)(k => MediaFixtures.jpegGrayHalves(24, 32, 15 + k, 230 - k))
    val a = MediaFixtures.aviMjpeg(24, 32, 24, frames)
    val b = MediaFixtures.aviMjpeg(24, 32, 30, frames)
    assert(!java.util.Arrays.equals(a, b))
    assert(MjpegAvi.frames(a).map(MjpegAvi.frameChecksum).toSeq ==
      MjpegAvi.frames(b).map(MjpegAvi.frameChecksum).toSeq)
  }

  test("MP4 geometry comes from the first trak with nonzero dimensions (audio-first files)") {
    import Multimodal.{HeaderDecoder, MediaFixtures}
    // surgery on the single-trak fixture: moov = [8 hdr][mvhd 108][trak 100];
    // prepend a copy of the trak with its 16.16 geometry zeroed (an audio
    // track), then fix up the moov size — geometry must come from trak 2
    val base = MediaFixtures.mp4(1280, 720, 30, 600)
    val ftypLen = 16
    val trakStart = ftypLen + 8 + 108
    val trak = base.slice(trakStart, trakStart + 100)
    val audioTrak = trak.clone()
    (92 until 100).foreach(i => audioTrak(i) = 0)       // zero width+height
    val moovSize = 8 + 108 + 100 + 100
    def be32(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    val twoTrak = base.take(ftypLen) ++ be32(moovSize) ++ "moov".getBytes ++
      base.slice(ftypLen + 8, trakStart) ++ audioTrak ++ trak
    val m = HeaderDecoder.decode(twoTrak)
    assert((m.kind, m.width, m.height, m.nFrames, m.sampleRateHz) ==
      (("mp4", 1280, 720, 600, 30)))
    // all-zero-geometry files still parse (0×0 fallback, not unknown)
    val onlyAudio = base.take(ftypLen) ++ be32(8 + 108 + 100) ++ "moov".getBytes ++
      base.slice(ftypLen + 8, trakStart) ++ audioTrak
    val a = HeaderDecoder.decode(onlyAudio)
    assert((a.kind, a.width, a.height) == (("mp4", 0, 0)))
  }

  test("mm_video_scene: cut count and first-cut position hit the fixture's closed form") {
    val out = graft.queries.Extensions.mmVideoScene(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val id = r.getLong(0)
      val n = 5 + id % 6
      val sceneLen = 2 + id % 3
      assert(r.getLong(1) == n, s"n_frames id=$id")
      assert(r.getLong(2) == (n + sceneLen - 1) / sceneLen, s"n_scenes id=$id")
      assert(r.getLong(3) == sceneLen, s"first_cut id=$id")
    }
    // a real spread of scene counts, not one degenerate value
    assert(out.map(_.getLong(2)).distinct.length > 2)
  }

  test("mm_audio_scene: voiced/silent segmentation hits the fixture's closed form") {
    val out = graft.queries.Extensions.mmAudioScene(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val id = r.getLong(0)
      val wn = 6 + id % 5
      val sl = 1 + id % 3
      val voiced = (0L until wn).count(w => (w / sl) % 2 == 0)
      val segs = (0L until wn).count(w => w % sl == 0 && (w / sl) % 2 == 0)
      assert(r.getLong(1) == wn, s"n_windows id=$id")
      assert(r.getLong(2) == voiced, s"n_voiced id=$id")
      assert(r.getLong(3) == segs, s"n_segments id=$id")
    }
    assert(out.map(_.getLong(3)).distinct.length > 2)
  }

  test("decodeAudioWindows: exact per-window energies, trailing partial window dropped") {
    import org.apache.spark.sql.Encoders
    // 2.5 windows of 4 samples: [1,-1,2,-2 | 0,0,0,0 | 3,3] -> energies 6, 0; tail dropped
    val samples = Array[Short](1, -1, 2, -2, 0, 0, 0, 0, 3, 3)
    val media = spark.createDataset(Seq(
      Multimodal.MediaRow(9L, Multimodal.MediaFixtures.wavPcm(8000, samples))))(
      Encoders.product[Multimodal.MediaRow])
    val rows = Multimodal.decodeAudioWindows(media, 4).collect()
      .map(r => r.win_idx -> r.energy).toMap
    assert(rows == Map(0 -> 6L, 1 -> 0L))
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
