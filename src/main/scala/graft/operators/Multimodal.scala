package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample plumbing.
  *
  * The decode step is STUBBED (no media libraries in this environment):
  * [[StubDecoder]] produces deterministic fake metadata from a hash of
  * the bytes. Everything Spark-side — schemas, the mapPartitions batch
  * shape, partitioning, the frame-sample generator — is real and tested,
  * so swapping in a real codec is a one-class change behind
  * [[MediaDecoder]].
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

  /** Frame sampling as a generator: one row per sampled frame index —
    * posexplode over a sequence, never a driver loop. */
  def sampleFrames(decoded: Dataset[DecodedRow], everyN: Int): DataFrame =
    decoded.toDF()
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
