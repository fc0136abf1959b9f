package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decode/feature-extract/frame-sample as *batched*
  * partition-local transforms.
  *
  * The actual media decode is STUBBED (this container ships no image/audio
  * codecs): `decodeStub` computes deterministic features of the raw bytes
  * instead of decoding pixels. Everything around it — schema, binary column
  * handling, batch shape, partitioning, frame sampling arithmetic — is real
  * and tested. The batching mirrors the reference's dominant-cost lesson:
  * one Tesseract *process per character group* killed its throughput
  * (/root/reference/diary_ocr.py:229-247); here decoder init is amortized
  * once per batch, never per row.
  */
object Multimodal {

  final case class MediaMeta(codec: String, width: Int, height: Int, durationMs: Long)
  final case class MediaRow(doc_id: Long, kind: String, media: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(
      doc_id: Long,
      kind: String,
      n_bytes: Long,
      byte_entropy: Double,
      head_histogram: Seq[Long], // first 8 byte-value buckets
      frames_sampled: Int)

  val BatchSize = 64

  /** Deterministic synthetic media derived from a documents table — the test
    * stand-in for real blobs (doc text bytes, repeated + scrambled). */
  def synthesizeMedia(docs: DataFrame, spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val base = text.getBytes("UTF-8")
        val n = math.max(256, base.length * 4)
        val bytes = Array.tabulate(n) { i =>
          (base(i % base.length) ^ (i * 31 + id).toByte).toByte
        }
        val meta = kind match {
          case "image" => MediaMeta("fake-png", 64 + (id % 64).toInt, 64, 0L)
          case "audio" => MediaMeta("fake-pcm", 0, 0, 1000L + id % 9000)
          case _ => MediaMeta("fake-h264", 128, 72, 2000L + id % 8000)
        }
        MediaRow(id, kind, bytes, meta)
    }
  }

  /** Batched decode/feature-extract. The decode itself is a clearly-marked
    * STUB; the Spark-side plumbing (binary in, struct out, per-batch decoder
    * lifecycle, frame sampling) is the real contract. */
  def decodeStub(media: Dataset[MediaRow], frameStride: Int = 10): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // >>> STUB: a real implementation opens ONE decoder here per batch
        // (libjpeg/ffmpeg ctx), decodes each blob, and emits pixel/audio
        // features. We emit deterministic byte-level stand-ins instead.
        batch.iterator.map { row =>
          val bytes = row.media
          val hist = new Array[Long](256)
          var i = 0
          while (i < bytes.length) { hist(bytes(i) & 0xff) += 1; i += 1 }
          var entropy = 0.0
          val n = bytes.length.toDouble
          var j = 0
          while (j < 256) {
            if (hist(j) > 0) {
              val p = hist(j) / n
              entropy -= p * math.log(p) / math.log(2)
            }
            j += 1
          }
          // frame sampling arithmetic is real: every frameStride-th frame
          val nFrames = if (row.kind == "video") (bytes.length / 1024) else 1
          val sampled = if (nFrames <= 1) 1 else 1 + (nFrames - 1) / frameStride
          MediaFeatures(row.doc_id, row.kind, bytes.length.toLong, entropy,
            hist.take(8).toSeq, sampled)
        }
      }
    }
  }
}
