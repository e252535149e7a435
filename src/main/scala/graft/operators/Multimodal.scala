package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-wise per partition.
  *
  * The Spark-side mechanics here are real and tested — schema, partition
  * iteration, batch shape, feature-column output. The DECODE itself is a
  * STUB: this container ships no image/audio codecs, so [[decodeFeatures]]
  * computes a deterministic fake (byte histogram + length) where a real
  * deployment would call the codec. Swap `stubDecode` for the real kernel;
  * nothing else changes.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, mime: String, media: Array[Byte])
  final case class MediaFeatures(media_id: Long, mime: String, n_bytes: Int,
                                 features: Array[Float])

  /** STUB decode kernel: 16-bin byte histogram, L1-normalized, plus length.
    * Deterministic stand-in for image decode / audio feature extraction. */
  def stubDecode(bytes: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    bytes.foreach(b => hist((b & 0xFF) >> 4) += 1f)
    val n = math.max(bytes.length, 1)
    hist.map(_ / n)
  }

  /** Per-partition batch decode: one iterator pass per partition (the
    * mapInPandas batch shape), no shuffle, preserves partitioning. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real codecs amortize per-partition init (decoder handles, model
      // weights) here — exactly why this is mapPartitions, not map
      rows.map { r =>
        MediaFeatures(r.media_id, r.mime, r.media.length, stubDecode(r.media))
      }
    }
  }

  /** Frame sampling shape: byte-range windows standing in for video frame
    * extraction — emits (media_id, frame_no, frame_bytes). */
  def sampleFrames(media: Dataset[MediaRow], frameSize: Int,
                   everyN: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.media.grouped(frameSize).zipWithIndex.collect {
        case (frame, i) if i % everyN == 0 => (r.media_id, i, frame)
      }
    }.toDF("media_id", "frame_no", "frame_bytes")
  }

  /** Resize shape: deterministic stride-downsample of the payload (every
    * `factor`-th byte) standing in for image resize / audio resample —
    * same row count, smaller payload, mime tagged with the factor. A real
    * deployment swaps the stride loop for the codec's resampler; the
    * partition-preserving mapPartitions shape is the part that matters. */
  def resize(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    require(factor >= 1, "factor must be >= 1")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val out = new Array[Byte]((r.media.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = r.media(i * factor); i += 1 }
        MediaRow(r.media_id, s"${r.mime};resize=1/$factor", out)
      }
    }
  }

  /** Fixture builder: wrap a text column as binary "media" (UTF-8) so the
    * plumbing is exercisable on the documents table. */
  def fromText(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        lit("text/plain").as("mime"),
        encode(col(textCol), "UTF-8").as("media"))
      .as[MediaRow]
  }
}
