package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media are opaque `binary` columns with typed metadata structs — the
  * parquet-native representation that survives 100 TB: bytes stay columnar
  * and compressed, metadata prunes without touching payloads, and heavy
  * per-item work runs batch-at-a-time inside partitions (the Scala
  * analogue of `mapInPandas`: an iterator-of-batches shape that amortizes
  * per-batch setup like model loading).
  *
  * The actual decoders (JPEG/PNG/audio frames) are NOT available in this
  * environment, so [[StubCodec]] stands in with a clearly-marked
  * deterministic fake; the Spark-side plumbing (schema, batching,
  * partitioning, UDF signature) is real and tested.
  */
object Multimodal {

  case class Media(id: Long, media: Array[Byte], width: Int, height: Int, format: String)
  case class MediaFeatures(id: Long, features: Array[Float])
  case class MediaFrames(id: Long, frames: Seq[Array[Byte]])

  /** How many media rows each decode batch processes (per-batch setup —
    * e.g. loading a decoder or model — is amortized across the batch). */
  val BatchSize = 64

  /** STUB: deterministic fake decoder — real image/audio libs are absent
    * in this container. Derives `dims` pseudo-features from the raw bytes
    * so the pipeline shape (bytes in, fixed-width float vector out) is
    * exercised end-to-end. Swap with a real decode+embed in production. */
  object StubCodec {
    def decodeFeatures(media: Array[Byte], dims: Int): Array[Float] = {
      val out = new Array[Float](dims)
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < media.length) {
        h = (h ^ (media(i) & 0xffL)) * 0x100000001b3L
        out(i % dims) += ((h % 1000003L).toFloat / 1000003f)
        i += 1
      }
      out
    }

    /** STUB frame sampler: every `stride`-th 16-byte window stands in for
      * a decoded video frame. */
    def sampleFrames(media: Array[Byte], stride: Int): Seq[Array[Byte]] =
      media.grouped(16).zipWithIndex.collect {
        case (frame, i) if i % stride == 0 => frame
      }.toSeq
  }

  /** Batch feature extraction over the media column: iterator-of-batches
    * inside each partition, preserving Spark's partitioning (no shuffle). */
  def extractFeatures(ds: Dataset[Media], dims: Int): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        // per-batch setup would go here (decoder/model init)
        batch.iterator.map(m => MediaFeatures(m.id, StubCodec.decodeFeatures(m.media, dims)))
      }
    }
  }

  /** Batch frame sampling (video -> frame list). */
  def sampleFrames(ds: Dataset[Media], stride: Int): Dataset[MediaFrames] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map(m => MediaFrames(m.id, StubCodec.sampleFrames(m.media, stride)))
      }
    }
  }

  /** Metadata-only pruning demo: select media rows by metadata without
    * reading payload bytes (column pruning keeps `media` out of the scan
    * until after the filter). */
  def filterByMeta(df: DataFrame, minWidth: Int, format: String): DataFrame =
    df.where(col("width") >= minWidth && col("format") === format)
}
