package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample plumbing.
  *
  * Four decoders share the [[MediaDecoder]] seam: [[StubDecoder]]
  * (deterministic fake metadata from a byte hash — CI without any
  * codec), [[HeaderDecoder]] (real container-header parse incl. the
  * ISO BMFF and RIFF/AVI walks, the right cost for a metadata pass
  * over 100 TB), [[ImageIoDecoder]] (real PIXEL decode via the JDK's
  * javax.imageio for PNG/JPEG/GIF/BMP), and [[PcmDecoder]] (real AUDIO
  * SAMPLE decode via the JDK's javax.sound.sampled for WAV/PCM).
  * [[MjpegAvi]] adds real VIDEO FRAME pixel decode for MJPEG-in-AVI
  * (RIFF chunk walk + per-frame JPEG decode — every modality now has a
  * real-bytes-to-real-samples path in pure JDK). Everything
  * Spark-side — schemas, the mapPartitions batch shape, partitioning,
  * the frame-sample generator — is identical across decoders, so
  * heavier codecs (inter-frame video: H.264 &c., where no JDK codec
  * exists) remain a one-class change behind the same seam.
  *
  * Scale notes: media blobs dominate row size, so media tables should be
  * written with small `maxRecordsPerFile`/row-group targets and metadata
  * kept in sibling columns (predicate pushdown on metadata never touches
  * the blob pages thanks to parquet column pruning). Decode runs
  * per-partition (one decoder instance per task, not per row); frame
  * sampling is a generator (posexplode), not a collect.
  */
object Multimodal {

  /** Typed metadata for a decoded media blob. */
  final case class MediaMeta(kind: String, width: Int, height: Int,
                             nFrames: Int, sampleRateHz: Int)

  final case class MediaRow(media_id: Long, bytes: Array[Byte])
  final case class DecodedRow(media_id: Long, kind: String, width: Int,
                              height: Int, n_frames: Int, sample_rate_hz: Int)
  /** Decoded-sample stats: linear (`sum`) and position-weighted
    * (`wsum`, Σ(i+1)·sᵢ) checksums over the PCM16 stream — the weighted
    * form is order-sensitive, so a decode that permutes or drops
    * samples cannot checksum-match. */
  final case class PcmRow(media_id: Long, sample_rate_hz: Int,
                          n_samples: Long, sum_samples: Long,
                          wsum_samples: Long)

  /** Decoder interface — the seam where a real image/audio/video library
    * would plug in (per-partition instantiation, batch iteration). */
  trait MediaDecoder extends Serializable {
    def decode(bytes: Array[Byte]): MediaMeta
  }

  /** STUB: deterministic fake decode — metadata derived from FNV-1a of
    * the bytes. NOT a real codec; exists so the distributed plumbing is
    * exercised end-to-end with stable assertions.
    */
  object StubDecoder extends MediaDecoder {
    def decode(bytes: Array[Byte]): MediaMeta = {
      val h = graft.functions.SketchUtil.fnv1a(bytes)
      def pick(shift: Int, mod: Int, base: Int) =
        base + (((h >>> shift) % mod + mod) % mod).toInt
      val kind = Seq("image", "audio", "video")((((h % 3) + 3) % 3).toInt)
      MediaMeta(kind,
        width = pick(8, 1601, 320), height = pick(24, 1081, 240),
        nFrames = if (kind == "image") 1 else pick(40, 3000, 1),
        sampleRateHz = if (kind == "audio") pick(16, 32001, 16000) else 0)
    }
  }

  /** REAL header codec: kind/width/height/sample-rate parsed from the
    * container's magic bytes — PNG IHDR, JPEG SOF marker scan, GIF
    * logical screen descriptor, WAV fmt chunk. Pure byte arithmetic
    * with no native libraries, which is exactly what a metadata pass
    * over 100 TB of media blobs should be: the expensive pixel/sample
    * decode stays behind the same [[MediaDecoder]] seam
    * ([[ImageIoDecoder]] and [[PcmDecoder]] are the real
    * implementations). Unrecognized containers → ("unknown", 0s)
    * rather than an exception: one corrupt blob must not kill a task.
    */
  object HeaderDecoder extends MediaDecoder {
    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
    private def be32(b: Array[Byte], i: Int): Int =
      (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
    private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
    private def le32(b: Array[Byte], i: Int): Int =
      u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
    private def ascii(b: Array[Byte], i: Int, s: String): Boolean =
      b.length >= i + s.length && s.indices.forall(j => u8(b, i + j) == s.charAt(j))

    def decode(bytes: Array[Byte]): MediaMeta = {
      if (bytes.length >= 24 && u8(bytes, 0) == 0x89 && ascii(bytes, 1, "PNG") &&
          u8(bytes, 4) == 0x0d && u8(bytes, 5) == 0x0a && u8(bytes, 6) == 0x1a &&
          u8(bytes, 7) == 0x0a && ascii(bytes, 12, "IHDR"))
        MediaMeta("png", be32(bytes, 16), be32(bytes, 20), 1, 0)
      else if (bytes.length >= 4 && u8(bytes, 0) == 0xff && u8(bytes, 1) == 0xd8)
        jpegMeta(bytes)
      else if (bytes.length >= 10 &&
               (ascii(bytes, 0, "GIF87a") || ascii(bytes, 0, "GIF89a")))
        MediaMeta("gif", le16(bytes, 6), le16(bytes, 8), 1, 0)
      else if (ascii(bytes, 0, "RIFF") && ascii(bytes, 8, "WAVE"))
        wavMeta(bytes)
      else if (ascii(bytes, 0, "RIFF") && ascii(bytes, 8, "AVI "))
        aviMeta(bytes)
      else if (bytes.length >= 12 && ascii(bytes, 4, "ftyp"))
        mp4Meta(bytes)
      else MediaMeta("unknown", 0, 0, 0, 0)
    }

    /** Walk JPEG segments from after SOI to the first SOF marker
      * (0xC0–0xCF minus DHT 0xC4 / JPG 0xC8 / DAC 0xCC): dimensions sit
      * at fixed offsets inside SOF. Standalone markers have no length
      * field; every other segment carries a big-endian length that
      * includes itself. */
    private def jpegMeta(b: Array[Byte]): MediaMeta = {
      var i = 2
      while (i + 3 < b.length && u8(b, i) == 0xff) {
        val marker = u8(b, i + 1)
        if (marker == 0xff) i += 1                       // fill byte
        else if ((marker >= 0xc0 && marker <= 0xcf) &&
                 marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          if (i + 8 < b.length)
            return MediaMeta("jpeg", be16(b, i + 7), be16(b, i + 5), 1, 0)
          else return MediaMeta("unknown", 0, 0, 0, 0)
        }
        else if (marker == 0xd8 || marker == 0x01 ||
                 (marker >= 0xd0 && marker <= 0xd9)) i += 2  // standalone
        else i += 2 + be16(b, i + 2)                     // length-prefixed
      }
      MediaMeta("unknown", 0, 0, 0, 0)
    }

    /** ISO BMFF (MP4/MOV) box walk — the VIDEO container's metadata
      * pass: top-level boxes to `moov`, then its children for `mvhd`
      * (movie time base + duration) and `trak`→`tkhd` (track geometry,
      * 16.16 fixed-point). Reported as MediaMeta("mp4", width, height,
      * nFrames = mvhd duration in TIMESCALE TICKS, sampleRateHz = the
      * timescale) — the (duration, time-base) pair, the same shape the
      * audio walk reports; ticks equal frames exactly when the
      * timescale is the frame rate. Frame PIXEL decode lives in
      * [[MjpegAvi]] for the one container the JDK can decode
      * (MJPEG-in-AVI); MP4's compressed codecs (H.264 &c.) stay behind
      * the [[MediaDecoder]] seam. Box sizes are bounds-checked like the
      * RIFF walk: a corrupt size bails to "unknown" instead of spinning
      * or indexing out of bounds. Geometry comes from the first `trak`
      * whose `tkhd` carries NONZERO dimensions — a real file often
      * leads with the audio track (width/height 0), which must not mask
      * the video track's geometry. */
    private def mp4Meta(b: Array[Byte]): MediaMeta = {
      // returns the payload offset of the first `name` box in [from, to)
      def find(name: String, from: Int, to: Int): Int = {
        var i = from
        while (i + 8 <= to) {
          val size = be32(b, i)
          if (size < 8 || size > to - i) return -1
          if (ascii(b, i + 4, name)) return i + 8
          i += size
        }
        -1
      }
      val n = b.length
      val moov = find("moov", 0, n)
      if (moov < 0) return MediaMeta("unknown", 0, 0, 0, 0)
      val moovEnd = moov - 8 + be32(b, moov - 8)
      val mvhd = find("mvhd", moov, moovEnd)
      // scan EVERY trak for the first tkhd with nonzero geometry (an
      // audio-first file reports 0×0 on trak 1); remember the first
      // well-formed tkhd as the 0×0 fallback when no trak has any
      var trak = find("trak", moov, moovEnd)
      var tkhd = -1                     // winning (nonzero-geometry) tkhd
      var tkhd0 = -1                    // first well-formed tkhd seen
      while (trak >= 0 && tkhd < 0) {
        val trakEnd = trak - 8 + be32(b, trak - 8)
        val t = find("tkhd", trak, trakEnd)
        if (t >= 0 && u8(b, t) == 0 && t + 84 <= n) {
          if (tkhd0 < 0) tkhd0 = t
          if ((be32(b, t + 76) | be32(b, t + 80)) != 0) tkhd = t
        }
        trak = find("trak", trakEnd, moovEnd)
      }
      if (tkhd < 0) tkhd = tkhd0
      // version-0 layouts only (32-bit times) — the fixture family and
      // the overwhelming majority of real files; v1 bails to unknown
      if (mvhd < 0 || tkhd < 0 || u8(b, mvhd) != 0 || mvhd + 20 > n)
        return MediaMeta("unknown", 0, 0, 0, 0)
      val timescale = be32(b, mvhd + 12)
      val duration = be32(b, mvhd + 16)
      val w = be32(b, tkhd + 76) >>> 16   // 16.16 fixed point
      val h = be32(b, tkhd + 80) >>> 16
      MediaMeta("mp4", w, h, duration, timescale)
    }

    /** RIFF/AVI metadata walk: `LIST hdrl` → `avih` (geometry + total
      * frame count) and its `LIST strl` → `strh` (time base as a
      * rate/scale rational). Reported as MediaMeta("avi", width,
      * height, nFrames = avih dwTotalFrames, sampleRateHz = the
      * frames-per-second rate/scale quotient, 0 when scale does not
      * divide rate) — same (count, time-base) shape as the MP4 walk.
      * Same bounds discipline as [[wavMeta]]: corrupt sizes bail to
      * "unknown". Frame PIXEL extraction is [[MjpegAvi]]'s job — this
      * walk reads only the fixed-size headers, the right cost for a
      * metadata pass. */
    private def aviMeta(b: Array[Byte]): MediaMeta = {
      // payload offset of the first chunk with `fourcc` in [from, to).
      // `wantList` pins the container kind: hdrl/strl exist only as
      // LIST types (matched on the 4 bytes after the size, payload
      // past the type tag), avih/strh only as plain chunks — so a
      // malformed PLAIN chunk whose fourcc spells a LIST type name is
      // skipped, never handed to listEnd, which therefore only ever
      // reads a genuine LIST size field
      def find(fourcc: String, from: Int, to: Int, wantList: Boolean): Int = {
        var i = from
        while (i + 8 <= to) {
          val size = le32(b, i + 4)
          if (size < 0 || size > to - i - 8) return -1
          val isList = ascii(b, i, "LIST")
          if (wantList && isList && size >= 4 && ascii(b, i + 8, fourcc))
            return i + 12
          if (!wantList && !isList && ascii(b, i, fourcc)) return i + 8
          i += 8 + size + (size & 1)                     // word-aligned
        }
        -1
      }
      def listEnd(payload: Int): Int = payload - 12 + 8 + le32(b, payload - 8)
      val n = b.length
      val hdrl = find("hdrl", 12, n, wantList = true)
      if (hdrl < 0) return MediaMeta("unknown", 0, 0, 0, 0)
      val hdrlEnd = listEnd(hdrl)
      val avih = find("avih", hdrl, hdrlEnd, wantList = false)
      if (avih < 0 || avih + 40 > n) return MediaMeta("unknown", 0, 0, 0, 0)
      val nFrames = le32(b, avih + 16)                   // dwTotalFrames
      val w = le32(b, avih + 32)
      val h = le32(b, avih + 36)
      val fps = {
        val strl = find("strl", hdrl, hdrlEnd, wantList = true)
        val strh = if (strl < 0) -1
          else find("strh", strl, listEnd(strl), wantList = false)
        if (strh < 0 || strh + 28 > n) 0
        else {
          val scale = le32(b, strh + 20)
          val rate = le32(b, strh + 24)
          if (scale > 0 && rate % scale == 0) rate / scale else 0
        }
      }
      MediaMeta("avi", w, h, nFrames, fps)
    }

    /** Walk RIFF chunks to "fmt " for the sample rate. A negative
      * (corrupt) chunk size would step zero or backwards — bail to
      * "unknown" instead of spinning or indexing out of bounds. */
    private def wavMeta(b: Array[Byte]): MediaMeta = {
      var i = 12
      while (i + 8 <= b.length) {
        val size = le32(b, i + 4)
        // corrupt sizes: negative, or larger than the remaining bytes —
        // either would step zero/backwards or overflow i negative
        if (size < 0 || size > b.length - i - 8) return MediaMeta("unknown", 0, 0, 0, 0)
        if (ascii(b, i, "fmt ") && i + 16 <= b.length)
          return MediaMeta("wav", 0, 0, 0, le32(b, i + 12))
        i += 8 + size + (size & 1)                       // chunks are word-aligned
      }
      MediaMeta("unknown", 0, 0, 0, 0)
    }
  }

  /** REAL pixel decode through the JDK's `javax.imageio` (PNG/JPEG/GIF/
    * BMP — the platform readers, no native libraries, headless-safe).
    * Dimensions come from the DECODED raster, not the header walk; the
    * container kind still comes from [[HeaderDecoder]] so kind strings
    * stay consistent across decoders. Non-image containers (wav) and
    * undecodable blobs fall back to the header walk — same
    * corrupt-blob-never-kills-a-task contract. Per the [[MediaDecoder]]
    * seam this is instantiated once per task and streams the batch;
    * ImageIO reader instances are created per call (they are not
    * thread-safe to share across tasks). */
  object ImageIoDecoder extends MediaDecoder {
    // ImageIO's default stream cache spools to TEMP FILES — per-decode
    // disk I/O and file churn on executors; the input is already an
    // in-memory byte array, so force the memory-backed stream
    javax.imageio.ImageIO.setUseCache(false)

    // Per-thread per-format cached readers, format picked by magic
    // bytes — the per-BLOB twin of MjpegAvi's per-frame cache: skips
    // ImageIO.read's registry scan + reader/stream allocation on every
    // decode of a 100 TB image sweep. Anything unsniffable (or that the
    // cached reader rejects) falls back to the generic sniffing path,
    // so decode semantics are unchanged.
    private val readerCache =
      new ThreadLocal[java.util.HashMap[String, javax.imageio.ImageReader]] {
        override def initialValue() = new java.util.HashMap[String, javax.imageio.ImageReader]()
      }

    private def sniffFormat(b: Array[Byte]): String =
      if (b.length < 8) null
      else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) "jpeg"
      else if ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
      else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') "gif"
      else if (b(0) == 'B' && b(1) == 'M') "bmp"
      else null

    private def readImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
      val fmt = sniffFormat(bytes)
      val fast = if (fmt == null) None else {
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val cache = readerCache.get()
          var rd = cache.get(fmt)
          if (rd == null) {
            // Select via the SAME content-sniffing registry walk
            // ImageIO.read performs (getImageReaders over the stream,
            // first match) — not getImageReadersByFormatName, whose
            // first entry can be a DIFFERENT plugin (e.g. TwelveMonkeys
            // ahead of the JDK JPEG reader) that decodes CMYK/ICC
            // variants differently and would silently change checksums
            // versus the fallback path.
            val it = javax.imageio.ImageIO.getImageReaders(iis)
            if (it.hasNext) { rd = it.next(); cache.put(fmt, rd) }
          }
          if (rd == null) None
          else {
            rd.setInput(iis, true, true)
            Option(rd.read(0))
          }
        } catch { case _: Exception => None }
        finally { try iis.close() catch { case _: Exception => () } }
      }
      fast.orElse(
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
        catch { case _: Exception => None })
    }

    def decode(bytes: Array[Byte]): MediaMeta = {
      val header = HeaderDecoder.decode(bytes)
      readImage(bytes) match {
        case Some(img) =>
          val kind = if (header.kind == "unknown") "image" else header.kind
          MediaMeta(kind, img.getWidth, img.getHeight, 1, 0)
        case None => header
      }
    }

    /** CRC32 over the row-major ARGB raster — a deterministic
      * pixel-level fingerprint (spec assertions, exact content dedup
      * across re-encodes of the same pixels). −1 when undecodable. */
    def pixelChecksum(bytes: Array[Byte]): Long =
      readImage(bytes).map { img =>
        val crc = new java.util.zip.CRC32
        val w = img.getWidth
        val row = new Array[Int](w)
        val rowBytes = new Array[Byte](w * 4)
        var y = 0
        while (y < img.getHeight) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val p = row(x)
            rowBytes(x * 4) = (p >>> 24).toByte
            rowBytes(x * 4 + 1) = (p >>> 16).toByte
            rowBytes(x * 4 + 2) = (p >>> 8).toByte
            rowBytes(x * 4 + 3) = p.toByte
            x += 1
          }
          crc.update(rowBytes, 0, w * 4)
          y += 1
        }
        crc.getValue
      }.getOrElse(-1L)
  }

  /** REAL audio sample decode through the JDK's `javax.sound.sampled`
    * (the platform WAV reader — no native libraries): the audio twin of
    * [[ImageIoDecoder]]. `decode` recovers the sample rate and frame
    * count from the DECODED stream, not the header walk; [[samples]]
    * yields the actual PCM16 sample values (normalizing whatever the
    * container carries to signed 16-bit little-endian via the JDK's
    * format converter). Non-audio containers and undecodable blobs fall
    * back to [[HeaderDecoder]] — same corrupt-blob-never-kills-a-task
    * contract. Instantiated once per task through the [[MediaDecoder]]
    * seam; stream objects are created per call (not thread-safe to
    * share). */
  object PcmDecoder extends MediaDecoder {
    import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}

    private def open(bytes: Array[Byte]): AudioInputStream =
      AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))

    def decode(bytes: Array[Byte]): MediaMeta = {
      val header = HeaderDecoder.decode(bytes)
      try {
        val ais = open(bytes)
        try {
          val fmt = ais.getFormat
          val kind = if (header.kind == "unknown") "audio" else header.kind
          MediaMeta(kind, 0, 0, ais.getFrameLength.toInt,
            math.round(fmt.getSampleRate))
        } finally ais.close()
      } catch { case _: Exception => header }
    }

    /** Decoded PCM16 samples (channel-interleaved frame order), or None
      * when the blob is not decodable audio. */
    def samples(bytes: Array[Byte]): Option[Array[Short]] =
      try {
        val raw = open(bytes)
        try {
          val rf = raw.getFormat
          val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
            rf.getSampleRate, 16, rf.getChannels, rf.getChannels * 2,
            rf.getSampleRate, false)
          val ais = AudioSystem.getAudioInputStream(target, raw)
          val buf = ais.readAllBytes()
          val out = new Array[Short](buf.length / 2)
          var i = 0
          while (i < out.length) {
            out(i) = (((buf(2 * i + 1) & 0xff) << 8) | (buf(2 * i) & 0xff)).toShort
            i += 1
          }
          Some(out)
        } finally raw.close()
      } catch { case _: Exception => None }
  }

  /** REAL video frame pixel decode for the one video container the JDK
    * can fully decode: MJPEG-in-AVI — each `00dc` movi chunk is a
    * complete baseline JPEG, so the frame walk is the RIFF chunk
    * discipline (the WAV/AVI walks above) and the pixel work is
    * `javax.imageio`'s JPEG reader ([[ImageIoDecoder]]'s codec). This
    * closes the video seam with zero native libraries; compressed
    * inter-frame codecs (H.264 in MP4) remain behind [[MediaDecoder]].
    *
    * Pixel values are read from the DECODED RASTER's band 0
    * (`getRaster.getSample`), never `getRGB` — `getRGB` on a grayscale
    * image applies the linear-gray → sRGB color transform and would
    * report gamma-bent values, not the codec's samples. */
  object MjpegAvi extends Serializable {
    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def le32(b: Array[Byte], i: Int): Int =
      u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
    private def ascii(b: Array[Byte], i: Int, s: String): Boolean =
      b.length >= i + s.length && s.indices.forall(j => u8(b, i + j) == s.charAt(j))

    /** The `##dc` (compressed video) chunk payloads inside `LIST movi`,
      * in stream order — each one full JPEG. Empty on anything that is
      * not a well-formed AVI: same corrupt-blob-never-kills-a-task
      * contract, same bounds discipline as the header walks. */
    def frames(bytes: Array[Byte]): Array[Array[Byte]] = {
      if (!(ascii(bytes, 0, "RIFF") && ascii(bytes, 8, "AVI ")))
        return Array.empty
      val n = bytes.length
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var i = 12
      var movi = -1
      var moviEnd = -1
      while (i + 8 <= n && movi < 0) {
        val size = le32(bytes, i + 4)
        if (size < 0 || size > n - i - 8) return Array.empty
        if (ascii(bytes, i, "LIST") && size >= 4 && ascii(bytes, i + 8, "movi")) {
          movi = i + 12; moviEnd = i + 8 + size
        }
        i += 8 + size + (size & 1)
      }
      if (movi < 0) return Array.empty
      var j = movi
      while (j + 8 <= moviEnd) {
        val size = le32(bytes, j + 4)
        if (size < 0 || size > moviEnd - j - 8) return out.toArray
        if (u8(bytes, j + 2) == 'd' && u8(bytes, j + 3) == 'c')
          out += java.util.Arrays.copyOfRange(bytes, j + 8, j + 8 + size)
        j += 8 + size + (size & 1)
      }
      out.toArray
    }

    /** Per-thread cached JPEG reader. `ImageIO.read` scans the reader
      * registry and allocates a fresh reader + stream cache PER CALL —
      * at one call per FRAME that registry/alloc churn is the dominant
      * constant of a frame sweep (and its garbage is exactly the GC
      * pressure that made mm_video_frames swing 3–8 s between bench
      * passes). One reader per task thread, reused across
      * setInput/read cycles (readers are reusable on a single thread,
      * not thread-safe across threads — hence ThreadLocal, mirroring
      * the per-task [[MediaDecoder]] seam). */
    private val jpegReader = new ThreadLocal[javax.imageio.ImageReader] {
      override def initialValue(): javax.imageio.ImageReader = {
        val it = javax.imageio.ImageIO.getImageReadersByFormatName("jpeg")
        if (it.hasNext) it.next() else null
      }
    }

    /** Decode via the cached JPEG reader; anything it rejects falls
      * back to the generic `ImageIO.read` path (format sniffing), so
      * semantics for malformed/non-JPEG chunk payloads are unchanged —
      * the fallback only ever runs for frames the fast path couldn't
      * decode anyway. */
    private def readFrame(frame: Array[Byte]): Option[java.awt.image.BufferedImage] = {
      val rd = jpegReader.get()
      val fast =
        if (rd == null) None
        else {
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(frame))
          try {
            rd.setInput(iis, true, true) // seekForwardOnly, ignoreMetadata
            Option(rd.read(0))
          } catch { case _: Exception => None }
          finally {
            try iis.close() catch { case _: Exception => () }
          }
        }
      fast.orElse(
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frame)))
        catch { case _: Exception => None })
    }

    /** Decode one frame's pixels: (width, height, Σ band-0 samples,
      * Σ (row+1)·sample — the position-weighted form, so a decode that
      * crops, pads, or flips rows cannot checksum-match). None when the
      * frame bytes are not decodable. */
    def framePixels(frame: Array[Byte]): Option[(Int, Int, Long, Long)] =
      try readFrame(frame).map { img =>
        val r = img.getRaster
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0L; var wsum = 0L
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          r.getSamples(0, y, w, 1, 0, row)
          var x = 0; var rs = 0L
          while (x < w) { rs += row(x); x += 1 }
          sum += rs; wsum += (y + 1L) * rs
          y += 1
        }
        (w, h, sum, wsum)
      } catch { case _: Exception => None }

    /** 8×8 AVERAGE-HASH of a decoded image — the classic perceptual
      * fingerprint: downsample the band-0 raster to an 8×8 grid of
      * cell means and emit one bit per cell, set iff the cell mean
      * exceeds the global mean. All comparisons are exact integer
      * cross-multiplies (`cellSum·W·H > totalSum·cellPx`, no float
      * mean), so the hash is deterministic and closed-form-oracle-able.
      * The defining invariance: a uniform brightness shift adds the
      * same constant to every cell mean AND the global mean, leaving
      * every strict comparison — hence the hash — EXACTLY unchanged,
      * which is how brightness-shifted re-exports collide here while
      * their raw pixel signatures ([[framePixels]]) differ. Bit `gy·8
      * + gx` rides in two 32-bit halves (`hi` = bits 32–63) so the
      * downstream group key and the DuckDB oracle never wrestle with
      * a sign bit. None when undecodable; cross-multiply stays inside
      * Long for any image under ~2.6 gigapixels. */
    def aHash(frame: Array[Byte]): Option[(Int, Int, Long, Long)] =
      try readFrame(frame).map { img =>
        val r = img.getRaster
        val w = img.getWidth
        val h = img.getHeight
        val row = new Array[Int](w)
        // one pass: per-cell sums for the 8×8 grid + the global sum;
        // the column→cell map is hoisted out of the pixel loop (one
        // division per column, not per pixel — the loop is the whole
        // cost of a 100 TB image sweep)
        val colCell = new Array[Int](w)
        var cx = 0
        while (cx < w) { colCell(cx) = cx * 8 / w; cx += 1 }
        val cellSum = new Array[Long](64)
        val cellPx = new Array[Long](64)
        var total = 0L
        var y = 0
        while (y < h) {
          val gyBase = (y * 8 / h) * 8
          r.getSamples(0, y, w, 1, 0, row)
          var x = 0
          while (x < w) {
            val c = gyBase + colCell(x)
            cellSum(c) += row(x); cellPx(c) += 1; total += row(x)
            x += 1
          }
          y += 1
        }
        val px = w.toLong * h
        var hi = 0L; var lo = 0L
        var i = 0
        while (i < 64) {
          if (cellPx(i) > 0 && cellSum(i) * px > total * cellPx(i)) {
            if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
          }
          i += 1
        }
        (w, h, hi, lo)
      } catch { case _: Exception => None }

    /** CRC32 over the row-major raw band-0 samples of a decoded frame —
      * the pixel-level fingerprint spec assertions compare against an
      * independently painted raster. −1 when undecodable. */
    def frameChecksum(frame: Array[Byte]): Long =
      try readFrame(frame).map { img =>
        val r = img.getRaster
        val w = img.getWidth
        val crc = new java.util.zip.CRC32
        val row = new Array[Int](w)
        val rowBytes = new Array[Byte](w)
        var y = 0
        while (y < img.getHeight) {
          r.getSamples(0, y, w, 1, 0, row)
          var x = 0
          while (x < w) { rowBytes(x) = row(x).toByte; x += 1 }
          crc.update(rowBytes, 0, w)
          y += 1
        }
        crc.getValue
      }.getOrElse(-1L) catch { case _: Exception => -1L }
  }

  /** One decoded video frame's pixel reduction — four longs per frame
    * through the shuffle, never pixels (the [[PcmRow]] discipline). */
  final case class FrameRow(media_id: Long, frame_idx: Int, width: Int,
                            height: Int, sum_px: Long, wsum_px: Long)

  /** Distributed VIDEO FRAME pixel decode: per blob, walk the AVI movi
    * chunks ([[MjpegAvi.frames]]) and JPEG-decode each kept frame's
    * pixels, reduced in-task to (geometry, Σsample, Σ(row+1)·sample) —
    * the raw rasters never enter the shuffle, so a 100 TB video sweep
    * moves four longs per FRAME, not the pixels. `everyN` keeps frames
    * at stream positions 0, N, 2N, … and SKIPS the others BEFORE the
    * JPEG decode — the chunk walk is byte arithmetic, the entropy
    * decode is the dominant cost, so a sampled sweep's cost is ∝ 1/N
    * (the [[sampleFrames]] cadence applied where it pays). Undecodable
    * frames are dropped (corrupt-frame-never-kills-a-task); frame_idx
    * keeps the stream position either way. */
  def decodeVideoFrames(media: Dataset[MediaRow], everyN: Int = 1): Dataset[FrameRow] = {
    require(everyN > 0, "everyN must be positive")
    implicit val enc = Encoders.product[FrameRow]
    media.mapPartitions { it =>
      it.flatMap { r =>
        MjpegAvi.frames(r.bytes).iterator.zipWithIndex.flatMap { case (f, k) =>
          if (k % everyN != 0) None
          else MjpegAvi.framePixels(f).map { case (w, h, sum, wsum) =>
            FrameRow(r.media_id, k, w, h, sum, wsum)
          }
        }
      }
    }
  }

  /** Distributed STILL-IMAGE pixel signature: one [[FrameRow]] per
    * decodable blob (frame_idx 0) through the same per-frame kernel as
    * the video path — ImageIO decode, raw band-0 raster samples, Σs
    * and Σ(row+1)·s reduced in-task. Works on any ImageIO container
    * (PNG/JPEG/GIF/BMP); undecodable blobs are dropped. */
  def decodeImagePixels(media: Dataset[MediaRow]): Dataset[FrameRow] = {
    implicit val enc = Encoders.product[FrameRow]
    media.mapPartitions { it =>
      it.flatMap { r =>
        MjpegAvi.framePixels(r.bytes).map { case (w, h, sum, wsum) =>
          FrameRow(r.media_id, 0, w, h, sum, wsum)
        }
      }
    }
  }

  /** One image's perceptual fingerprint — geometry plus the 8×8
    * average-hash in two 32-bit halves; five longs per blob through
    * the shuffle, never pixels (the [[FrameRow]] discipline). */
  final case class AHashRow(media_id: Long, width: Int, height: Int,
                            ahash_hi: Long, ahash_lo: Long)

  /** Distributed perceptual image fingerprinting: ImageIO-decode each
    * blob and reduce its raster in-task to the [[MjpegAvi.aHash]]
    * 8×8 average-hash. Near-duplicate grouping then needs only a
    * map-side-combining groupBy on the hash (exact-collision form) or
    * the banded-Hamming join the SimHash path already uses — never a
    * pairwise pixel comparison. Undecodable blobs are dropped. */
  def decodeImageAHash(media: Dataset[MediaRow]): Dataset[AHashRow] = {
    implicit val enc = Encoders.product[AHashRow]
    media.mapPartitions { it =>
      it.flatMap { r =>
        MjpegAvi.aHash(r.bytes).map { case (w, h, hi, lo) =>
          AHashRow(r.media_id, w, h, hi, lo)
        }
      }
    }
  }

  /** One video frame's perceptual fingerprint — stream position,
    * geometry and the [[MjpegAvi.aHash]] halves; six longs per FRAME
    * through the shuffle, never pixels. */
  final case class VideoAHashRow(media_id: Long, frame_idx: Int, width: Int,
                                 height: Int, ahash_hi: Long, ahash_lo: Long)

  /** Distributed perceptual VIDEO fingerprinting: walk the AVI movi
    * chunks and aHash each frame's decoded raster — the video rung of
    * the perceptual family ([[MjpegAvi.aHash]] for stills,
    * [[decodeAudioFp]] for audio). Downstream, an order-weighted sum
    * of the per-frame hashes gives a sequence signature that is
    * brightness-shift-invariant (each frame hash is) yet still
    * order-sensitive, so re-encoded, re-brightened, re-containered
    * copies collide while frame-shuffled videos do not. Undecodable
    * frames are dropped; frame_idx keeps the stream position. */
  def decodeVideoAHash(media: Dataset[MediaRow]): Dataset[VideoAHashRow] = {
    implicit val enc = Encoders.product[VideoAHashRow]
    media.mapPartitions { it =>
      it.flatMap { r =>
        MjpegAvi.frames(r.bytes).iterator.zipWithIndex.flatMap { case (f, k) =>
          MjpegAvi.aHash(f).map { case (w, h, hi, lo) =>
            VideoAHashRow(r.media_id, k, w, h, hi, lo)
          }
        }
      }
    }
  }

  /** Deterministic, BYTE-VALID media fixtures: real container headers
    * (PNG signature + IHDR with a correct CRC32, JPEG SOI + APP0 + SOF0,
    * GIF screen descriptor, RIFF/WAVE fmt chunk) so [[HeaderDecoder]] is
    * exercised against the actual container rules, not an inverse of
    * itself. */
  object MediaFixtures {
    private def be16(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
    private def be32(v: Int) =
      Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    private def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    private def le32(v: Int) =
      Array[Byte](v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)

    def png(w: Int, h: Int): Array[Byte] = {
      val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
      val ihdr = "IHDR".getBytes ++ be32(w) ++ be32(h) ++
        Array[Byte](8, 6, 0, 0, 0)                       // 8-bit RGBA
      val crc = new java.util.zip.CRC32
      crc.update(ihdr)
      sig ++ be32(13) ++ ihdr ++ be32(crc.getValue.toInt) ++
        be32(0) ++ "IEND".getBytes ++ be32(0xae426082)
    }

    def jpeg(w: Int, h: Int): Array[Byte] = {
      val app0 = Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(16) ++
        "JFIF".getBytes ++ Array[Byte](0, 1, 1, 0) ++ be16(1) ++ be16(1) ++
        Array[Byte](0, 0)
      val sof0 = Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(11) ++
        Array[Byte](8) ++ be16(h) ++ be16(w) ++ Array[Byte](1, 0x11, 0)
      Array[Byte](0xff.toByte, 0xd8.toByte) ++ app0 ++ sof0 ++
        Array[Byte](0xff.toByte, 0xd9.toByte)
    }

    def gif(w: Int, h: Int): Array[Byte] =
      "GIF89a".getBytes ++ le16(w) ++ le16(h) ++ Array[Byte](0, 0, 0) ++
        Array[Byte](0x3b)

    def wav(sampleRateHz: Int): Array[Byte] =
      "RIFF".getBytes ++ le32(36) ++ "WAVE".getBytes ++
        "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++
        le32(sampleRateHz) ++ le32(sampleRateHz * 2) ++ le16(2) ++ le16(16) ++
        "data".getBytes ++ le32(0)

    /** Minimal byte-valid ISO BMFF (MP4): ftyp + moov{mvhd, trak{tkhd}}
      * with version-0 layouts, unity matrices, and 16.16 fixed-point
      * geometry — every field at its spec offset, so the box walk is
      * exercised against the real container rules. */
    def mp4(w: Int, h: Int, timescaleHz: Int, durationTicks: Int): Array[Byte] = {
      val matrix = be32(0x00010000) ++ be32(0) ++ be32(0) ++
        be32(0) ++ be32(0x00010000) ++ be32(0) ++
        be32(0) ++ be32(0) ++ be32(0x40000000)
      val ftyp = be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(0x200)
      val mvhd = be32(108) ++ "mvhd".getBytes ++
        be32(0) ++                                  // version 0 + flags
        be32(0) ++ be32(0) ++                       // ctime, mtime
        be32(timescaleHz) ++ be32(durationTicks) ++
        be32(0x00010000) ++ Array[Byte](1, 0) ++    // rate 1.0, volume 1.0
        new Array[Byte](10) ++ matrix ++
        new Array[Byte](24) ++ be32(2)              // predefined, next track
      val tkhd = be32(92) ++ "tkhd".getBytes ++
        be32(7) ++                                  // version 0 + enabled flags
        be32(0) ++ be32(0) ++                       // ctime, mtime
        be32(1) ++ be32(0) ++                       // track id, reserved
        be32(durationTicks) ++
        new Array[Byte](8) ++                       // reserved
        new Array[Byte](8) ++                       // layer, alt, volume, reserved
        matrix ++ be32(w << 16) ++ be32(h << 16)    // 16.16 geometry
      val trak = be32(8 + tkhd.length) ++ "trak".getBytes ++ tkhd
      val moov = be32(8 + mvhd.length + trak.length) ++ "moov".getBytes ++ mvhd ++ trak
      ftyp ++ moov
    }

    /** [[wavPcm]] with a `LIST`/`INFO` metadata chunk (an `ICMT`
      * comment) between `fmt ` and `data` — the tagged-file variant
      * every ripper/editor writes. The JDK reader skips the tag, so
      * the DECODED samples are identical to the untagged file while
      * the container bytes differ: [[graft.queries.Extensions
      * mmAudioDedup]]'s prey. */
    def wavPcmTagged(sampleRateHz: Int, samples: Array[Short], tag: String): Array[Byte] = {
      val data = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        data(2 * i) = samples(i).toByte
        data(2 * i + 1) = (samples(i) >> 8).toByte
        i += 1
      }
      val t = tag.getBytes("US-ASCII")
      val tPad = t ++ (if (t.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
      val list = "LIST".getBytes ++ le32(4 + 8 + tPad.length) ++ "INFO".getBytes ++
        "ICMT".getBytes ++ le32(t.length) ++ tPad
      "RIFF".getBytes ++ le32(36 + list.length + data.length) ++ "WAVE".getBytes ++
        "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++
        le32(sampleRateHz) ++ le32(sampleRateHz * 2) ++ le16(2) ++ le16(16) ++
        list ++
        "data".getBytes ++ le32(data.length) ++ data
    }

    /** A real LOSSLESS image — the same two-gray-halves raster as
      * [[jpegGrayHalves]] encoded by the JDK's PNG, BMP, or GIF codec.
      * Lossless containers need no block alignment: any geometry
      * round-trips sample-exact, so the same raster in three different
      * containers is three byte-different blobs with one pixel
      * signature ([[graft.queries.Extensions.mmImageDedup]]'s prey). */
    def imageGrayHalves(w: Int, h: Int, v1: Int, v2: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        val v = if (y < h / 2) v1 else v2
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, v); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }

    /** A lossless image of EIGHT equal-height horizontal bands, band
      * `b` painted `((seed·7 + b·13 + 5) % 200) + delta` — `delta` is
      * a uniform brightness shift (≤ 55 keeps every sample under 256,
      * shift applied AFTER the modulus so no band wraps). With `h` a
      * multiple of 8 the bands align exactly with [[MjpegAvi.aHash]]'s
      * grid rows, so the hash has a closed form; with the shift
      * outside the modulus the hash is delta-invariant by the aHash
      * invariance argument while Σsample moves by `w·h·delta` — the
      * [[graft.queries.Extensions.mmImagePhash]] corpus plants exactly
      * such brightness-shifted, container-switched re-exports. */
    def imageGrayBands(w: Int, h: Int, seed: Int, delta: Int, fmt: String): Array[Byte] = {
      require(h % 8 == 0, "h must be a multiple of 8 for band/grid alignment")
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        val v = ((seed * 7 + (y * 8 / h) * 13 + 5) % 200) + delta
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, v); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }

    /** SplitMix64 finalizer (Steele et al., public domain) — the
      * deterministic 64-bit pattern generator behind
      * [[imageGrayCells]] corpora: well-scattered bits, so distinct
      * seeds give patterns ~32 Hamming apart. */
    def splitmix64(seed: Long): Long = {
      var z = seed + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }

    /** A 32×32 lossless image of 64 uniform 4×4 cells, cell `c`
      * painted 140 when bit `c` of `pattern` is set, else 60 — built
      * so [[MjpegAvi.aHash]] RECONSTRUCTS the pattern exactly: with
      * equal cells the bit test reduces to v_c·64 > Σv, and Σv =
      * 3840 + 80·popcount leaves a ≥ 160 margin per cell whenever
      * 2 ≤ popcount ≤ 62, so a 140-cell is always above the global
      * mean and a 60-cell below it. Flipping one bit of the pattern
      * flips exactly that aHash bit — full 64-bit control, which is
      * how [[graft.queries.Extensions.mmImageNeardup]] plants
      * near-duplicates at an exact Hamming distance. */
    def imageGrayCells(pattern: Long, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        32, 32, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < 32) {
        var x = 0
        while (x < 32) {
          val c = (y / 4) * 8 + (x / 4)
          raster.setSample(x, y, 0, if (((pattern >>> c) & 1L) == 1L) 140 else 60)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }

    /** A REAL baseline JPEG (the JDK encoder at quality 1.0 — all-ones
      * quantization tables) of a grayscale raster split into a top half
      * of `v1` and a bottom half of `v2`. With `w` a multiple of 8 and
      * `h` a multiple of 16 every 8×8 block is UNIFORM, so the DCT has
      * only a DC coefficient and the quality-1.0 round trip reproduces
      * each sample EXACTLY (verified empirically over the full fixture
      * grid) — which is what lets [[graft.queries.Extensions]] put a
      * closed-form integer oracle on DECODED PIXELS of a lossy codec. */
    def jpegGrayHalves(w: Int, h: Int, v1: Int, v2: Int): Array[Byte] = {
      require(w % 8 == 0 && h % 16 == 0, "block-uniform geometry only")
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        val v = if (y < h / 2) v1 else v2
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, v); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val p = wr.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(1.0f)
      wr.setOutput(new javax.imageio.stream.MemoryCacheImageOutputStream(bos))
      try wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
      finally wr.dispose()
      bos.toByteArray
    }

    /** Byte-valid MJPEG-in-AVI: RIFF/`AVI ` with a `LIST hdrl` carrying
      * a real `avih` (geometry + frame count) and `LIST strl` with
      * `strh` (fccType `vids`, handler `MJPG`, rate/scale time base)
      * and a BITMAPINFOHEADER `strf` (biCompression `MJPG`), then
      * `LIST movi` holding one word-aligned `00dc` chunk per frame —
      * every field at its spec offset, so [[MjpegAvi]] and the
      * [[HeaderDecoder]] AVI walk are exercised against the real
      * container rules, not an inverse of themselves. */
    def aviMjpeg(w: Int, h: Int, fps: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
      def fourcc(s: String) = s.getBytes("US-ASCII")
      val avih = fourcc("avih") ++ le32(56) ++
        le32(if (fps > 0) 1000000 / fps else 0) ++   // dwMicroSecPerFrame
        le32(0) ++ le32(0) ++ le32(0) ++             // maxBytesPerSec, padding, flags
        le32(frames.length) ++ le32(0) ++            // dwTotalFrames, initialFrames
        le32(1) ++ le32(0) ++                        // dwStreams, suggestedBufferSize
        le32(w) ++ le32(h) ++ new Array[Byte](16)    // geometry, dwReserved[4]
      val strh = fourcc("strh") ++ le32(56) ++
        fourcc("vids") ++ fourcc("MJPG") ++
        le32(0) ++ le16(0) ++ le16(0) ++ le32(0) ++  // flags, priority, language, initialFrames
        le32(1) ++ le32(fps) ++                      // dwScale, dwRate: fps/1
        le32(0) ++ le32(frames.length) ++            // dwStart, dwLength (frames)
        le32(0) ++ le32(0xffffffff) ++ le32(0) ++    // suggestedBufferSize, quality, sampleSize
        le16(0) ++ le16(0) ++ le16(w) ++ le16(h)     // rcFrame
      val strf = fourcc("strf") ++ le32(40) ++
        le32(40) ++ le32(w) ++ le32(h) ++            // biSize, biWidth, biHeight
        le16(1) ++ le16(24) ++ fourcc("MJPG") ++     // biPlanes, biBitCount, biCompression
        le32(w * h * 3) ++ le32(0) ++ le32(0) ++     // biSizeImage, biXPelsPerMeter, biYPelsPerMeter
        le32(0) ++ le32(0)                           // biClrUsed, biClrImportant
      val strl = fourcc("LIST") ++ le32(4 + strh.length + strf.length) ++
        fourcc("strl") ++ strh ++ strf
      val hdrl = fourcc("LIST") ++ le32(4 + avih.length + strl.length) ++
        fourcc("hdrl") ++ avih ++ strl
      val chunks = frames.toArray.flatMap { f =>
        fourcc("00dc") ++ le32(f.length) ++ f ++
          (if (f.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
      }
      val movi = fourcc("LIST") ++ le32(4 + chunks.length) ++
        fourcc("movi") ++ chunks
      val body = fourcc("AVI ") ++ hdrl ++ movi
      fourcc("RIFF") ++ le32(body.length) ++ body
    }

    /** PCM16 mono WAV carrying actual sample data — the fixture
      * [[PcmDecoder]] decodes back to the exact `samples` array. */
    def wavPcm(sampleRateHz: Int, samples: Array[Short]): Array[Byte] = {
      val data = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        data(2 * i) = samples(i).toByte
        data(2 * i + 1) = (samples(i) >> 8).toByte
        i += 1
      }
      "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
        "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++
        le32(sampleRateHz) ++ le32(sampleRateHz * 2) ++ le16(2) ++ le16(16) ++
        "data".getBytes ++ le32(data.length) ++ data
    }
  }

  /** Wrap a string column as the opaque binary media column (test-data
    * adapter: documents.text stands in for real blobs). */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    df.select(col(idCol).cast("long").as("media_id"),
      encode(col(payloadCol), "UTF-8").as("bytes")).as[MediaRow]
  }

  /** Distributed decode: mapPartitions so a real decoder would be
    * constructed once per task and stream the batch — the exact shape a
    * heavyweight codec needs. */
  def decode(media: Dataset[MediaRow], decoder: MediaDecoder = StubDecoder): Dataset[DecodedRow] = {
    implicit val enc = Encoders.product[DecodedRow]
    media.mapPartitions { it =>
      it.map { r =>
        val m = decoder.decode(r.bytes)
        DecodedRow(r.media_id, m.kind, m.width, m.height, m.nFrames, m.sampleRateHz)
      }
    }
  }

  /** Distributed PCM sample decode: real `javax.sound.sampled` decode
    * per blob ([[PcmDecoder]]), reduced in-task to (rate, count, sum,
    * weighted-sum) — the raw sample arrays never enter the shuffle, so
    * a 100 TB audio sweep moves four longs per blob, not the audio.
    * Undecodable blobs report n_samples = 0 with the header-walk rate. */
  def decodePcm(media: Dataset[MediaRow]): Dataset[PcmRow] = {
    implicit val enc = Encoders.product[PcmRow]
    media.mapPartitions { it =>
      it.map { r =>
        val meta = PcmDecoder.decode(r.bytes)
        val ss = PcmDecoder.samples(r.bytes).getOrElse(Array.empty[Short])
        var sum = 0L; var wsum = 0L; var i = 0
        while (i < ss.length) {
          sum += ss(i); wsum += (i + 1L) * ss(i); i += 1
        }
        PcmRow(r.media_id, meta.sampleRateHz, ss.length, sum, wsum)
      }
    }
  }

  /** One audio blob's perceptual fingerprint — rate, sample count and
    * the 64-window energy-envelope bits in two 32-bit halves; five
    * longs per blob through the shuffle, never audio. */
  final case class AudioFpRow(media_id: Long, sample_rate_hz: Int,
                              n_samples: Int, fp_hi: Long, fp_lo: Long)

  /** One fixed-length audio analysis window's exact energy — the
    * row-level form the temporal segmenters consume (vs
    * [[AudioFpRow]]'s whole-blob envelope bits). */
  final case class AudioWindowRow(media_id: Long, win_idx: Int, energy: Long)

  /** Decode PCM16 and reduce IN-TASK to per-window absolute-amplitude
    * energies (Σ|sᵢ| over consecutive `winLen`-sample windows; a
    * trailing partial window is dropped — analysis frames are fixed
    * length by convention). The row the shuffle carries is three
    * longs; the segmentation window/aggregate downstream never sees a
    * sample. Exact integers (|s| ≤ 2¹⁵, so even 2⁴⁸ samples per window
    * fit i64), so a silence run is EXACTLY energy 0 and a synthesized
    * fixture's voiced/silent structure survives the real WAV
    * decode-and-reduce round trip bit-for-bit. Undecodable blobs are
    * dropped (the corrupt-blob contract). */
  def decodeAudioWindows(media: Dataset[MediaRow], winLen: Int): Dataset[AudioWindowRow] = {
    require(winLen >= 1)
    implicit val enc = Encoders.product[AudioWindowRow]
    media.mapPartitions { it =>
      it.flatMap { r =>
        PcmDecoder.samples(r.bytes) match {
          case Some(ss) =>
            (0 until ss.length / winLen).iterator.map { w =>
              var e = 0L
              var i = w * winLen
              val end = i + winLen
              while (i < end) { e += math.abs(ss(i).toLong); i += 1 }
              AudioWindowRow(r.media_id, w, e)
            }
          case None => Iterator.empty
        }
      }
    }
  }

  /** Distributed perceptual AUDIO fingerprinting — the audio twin of
    * [[MjpegAvi.aHash]]: decode PCM16 samples ([[PcmDecoder]]) and
    * reduce in-task to a 64-window ENERGY ENVELOPE, one bit per
    * window, set iff the window's Σs² exceeds its share of the total
    * (`eWin·n > eTot·winLen`, exact integer cross-multiply — no float
    * mean). The defining invariance: scaling every sample by a gain g
    * scales both sides by g², leaving every strict comparison — hence
    * the fingerprint — EXACTLY unchanged, so volume-adjusted
    * re-releases collide here while their Σsample signatures
    * ([[decodePcm]]) differ by the gain. Near-dup grouping is then a
    * map-side-combining groupBy on (rate, count, fp) — never a
    * pairwise sample comparison; a Hamming-tolerant variant would
    * reuse the SimHash banding. Cross-multiply stays inside Long for
    * clips under ~2^19 samples at full 16-bit swing (far above the
    * fixture sizes; longer audio would fingerprint per-chunk).
    * Undecodable blobs are dropped. */
  def decodeAudioFp(media: Dataset[MediaRow]): Dataset[AudioFpRow] = {
    implicit val enc = Encoders.product[AudioFpRow]
    media.mapPartitions { it =>
      it.flatMap { r =>
        audioFp(r.bytes).map { case (rate, n, hi, lo) =>
          AudioFpRow(r.media_id, rate, n, hi, lo)
        }
      }
    }
  }

  /** Per-blob kernel behind [[decodeAudioFp]]: (rate, n_samples,
    * fp_hi, fp_lo), None when undecodable or empty. */
  def audioFp(bytes: Array[Byte]): Option[(Int, Int, Long, Long)] = {
    val meta = PcmDecoder.decode(bytes)
    PcmDecoder.samples(bytes).filter(_.nonEmpty).map { ss =>
      val n = ss.length
      val winSum = new Array[Long](64)
      val winLen = new Array[Long](64)
      var tot = 0L
      var i = 0
      while (i < n) {
        val w = (i.toLong * 64 / n).toInt
        val e = ss(i).toLong * ss(i)
        winSum(w) += e; winLen(w) += 1; tot += e
        i += 1
      }
      var hi = 0L; var lo = 0L
      var w = 0
      while (w < 64) {
        if (winLen(w) > 0 && winSum(w) * n > tot * winLen(w)) {
          if (w < 32) lo |= 1L << w else hi |= 1L << (w - 32)
        }
        w += 1
      }
      (meta.sampleRateHz, n, hi, lo)
    }
  }

  /** Per-blob VIDEO perceptual signature: walk the AVI frames, aHash
    * each, reduce in-task to (n_frames, width, height, Σ(k+1)·hi_k,
    * Σ(k+1)·lo_k) — the [[decodeVideoAHash]] sequence signature
    * computed without any intermediate shuffle, for single-pass
    * multi-modal sweeps ([[graft.queries.Extensions.mmCurate]]).
    * None when no frame decodes. */
  def videoAHashSig(bytes: Array[Byte]): Option[(Int, Int, Int, Long, Long)] = {
    val fs = MjpegAvi.frames(bytes)
    var n = 0; var w = 0; var h = 0; var sigHi = 0L; var sigLo = 0L
    var k = 0
    while (k < fs.length) {
      MjpegAvi.aHash(fs(k)) match {
        case Some((fw, fh, hi, lo)) =>
          n += 1; if (fw > w) w = fw; if (fh > h) h = fh
          sigHi += (k + 1L) * hi; sigLo += (k + 1L) * lo
        case None =>
      }
      k += 1
    }
    if (n == 0) None else Some((n, w, h, sigHi, sigLo))
  }

  /** Frame sampling as a generator: one row per sampled frame index —
    * posexplode over a sequence, never a driver loop. Accepts any frame
    * with (media_id, n_frames) columns. */
  def sampleFrames(decoded: DataFrame, everyN: Int): DataFrame =
    decoded
      .filter(col("n_frames") > 1)
      .select(col("media_id"),
        posexplode(sequence(lit(0), col("n_frames") - 1, lit(everyN)))
          .as(Seq("sample_idx", "frame_idx")))

  /** Resize plan (stub): target geometry preserving aspect ratio —
    * metadata-only arithmetic; the pixel transform would live in the
    * decoder seam. */
  def resizePlan(decoded: Dataset[DecodedRow], maxSide: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide).cast("double") / greatest(col("width"), col("height")))
    decoded.toDF().select(col("media_id"), col("width"), col("height"),
      round(col("width") * scale).cast("int").as("out_width"),
      round(col("height") * scale).cast("int").as("out_height"))
  }
}
