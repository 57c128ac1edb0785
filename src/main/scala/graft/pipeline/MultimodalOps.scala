package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing: media travel as opaque
  * `binary` columns with typed metadata; decode / feature-extract /
  * frame-sample run per partition over the binary payloads.
  *
  * The container has no codec libraries, so the DECODE STEP IS A
  * DETERMINISTIC STUB (byte-statistics features standing in for a real
  * JPEG/audio decoder) — everything around it is real and tested: the
  * schema convention, the typed Dataset boundary, partition-parallel
  * execution via mapPartitions, and the batch shape a vectorized decoder
  * would consume. Swapping in a real decoder changes only the body of
  * `decodeFrame`.
  */
object MultimodalOps {

  /** Schema convention for a media column: (id, media: binary, kind). */
  case class MediaRow(id: Long, media: Array[Byte], kind: String)

  /** Extracted features: fixed-dim vector + frame/byte accounting. */
  case class MediaFeatures(
      id: Long,
      kind: String,
      n_bytes: Int,
      n_frames: Int,
      features: Array[Float])

  /** STUB decoder: a real implementation would decode the frame bytes
    * (JPEG/PCM/…) and emit model features; this deterministic stand-in
    * emits scaled byte-histogram moments so tests can pin exact values.
    */
  private def decodeFrame(frame: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (frame.nonEmpty) {
      var i = 0
      while (i < frame.length) {
        out(i % dim) += (frame(i) & 0xff) / 255.0f
        i += 1
      }
      var d = 0
      while (d < dim) { out(d) /= math.max(1, frame.length / dim); d += 1 }
    }
    out
  }

  /** Evenly-spaced frame sampling over the byte payload — the video
    * "sample N frames" access pattern, expressed on raw bytes.
    */
  private[pipeline] def sampleFrames(media: Array[Byte], frames: Int): Seq[Array[Byte]] = {
    if (media.isEmpty) Seq.empty
    else {
      val span = math.max(1, media.length / frames)
      (0 until frames).map { f =>
        val start = math.min(f * span, media.length - 1)
        java.util.Arrays.copyOfRange(media, start, math.min(start + span, media.length))
      }
    }
  }

  /** Partition-parallel decode + feature extraction. No shuffle: each
    * partition's binaries are decoded where they sit; at 100 TB this is
    * the same shape as a GPU-batched decoder behind an arrow batch.
    */
  def extractFeatures(
      ds: Dataset[MediaRow],
      dim: Int = 16,
      frames: Int = 4
  ): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { row =>
        val fs = sampleFrames(row.media, frames)
        val feats = new Array[Float](dim)
        fs.foreach { fr =>
          val f = decodeFrame(fr, dim)
          var d = 0
          while (d < dim) { feats(d) += f(d) / math.max(1, fs.length); d += 1 }
        }
        MediaFeatures(row.id, row.kind, row.media.length, fs.length, feats)
      }
    }
  }

  /** DataFrame-level entry: (idCol, binaryCol, kind) → features frame. */
  def mediaFeatures(
      df: DataFrame,
      id: String,
      media: String,
      kind: String,
      dim: Int = 16,
      frames: Int = 4
  ): DataFrame = {
    import df.sparkSession.implicits._
    val ds = df.select(
      col(id).cast("long").as("id"),
      col(media).cast("binary").as("media"),
      lit(kind).as("kind")
    ).as[MediaRow]
    extractFeatures(ds, dim, frames).toDF()
  }
}
