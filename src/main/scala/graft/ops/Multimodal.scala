package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Schema.DocRow

/** Multimodal column handling: media (image/audio/video/table) as opaque
  * `binary` payloads with typed metadata, plus decode / feature-extract /
  * resize / frame-sample plumbing.
  *
  * The actual codec step is a STUB (this container has no image/audio
  * libraries): `decodeStub` produces a deterministic fake header from the
  * payload bytes. Everything AROUND the stub is real and tested — schema,
  * doc_id-hash partitioning, batched mapPartitions signature (one decoder
  * instance per partition, mirroring how a Python pipeline would hold one
  * codec per `mapInPandas` batch iterator) — so swapping `decodeStub` for a
  * real codec changes no plumbing.
  */
object Multimodal {

  final case class MediaRow(doc_id: String, media_ref: String, kind: String,
      payload: Array[Byte])

  final case class MediaFeatures(
      doc_id: String,
      media_ref: String,
      kind: String,
      byte_len: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Seq[Float])

  /** Extract the media table from an interleaved spans corpus: one row per
    * non-text span, with a deterministic synthetic payload (sha-seeded
    * bytes standing in for real encoded media). Narrow — no shuffle.
    */
  def mediaTable(spark: SparkSession, docs: Dataset[DocRow]): Dataset[MediaRow] = {
    import spark.implicits._
    docs.flatMap { d =>
      d.spans.filter(_.kind != "text").map { s =>
        MediaRow(d.doc_id, s.media_ref, s.kind, fakePayload(s.media_ref))
      }
    }
  }

  /** Deterministic fake payload: 64-256 bytes derived from the ref hash. */
  def fakePayload(mediaRef: String): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
      .digest(mediaRef.getBytes("UTF-8"))
    val len = 64 + (java.lang.Byte.toUnsignedInt(md(0)) % 193)
    Array.tabulate[Byte](len)(i => md(i % md.length))
  }

  /** STUB decoder — deterministic fake decode deriving typed metadata and
    * an 8-dim feature vector from payload bytes. A real implementation
    * would parse the codec header and run a feature extractor here;
    * the function signature (bytes -> metadata + features) is the real
    * contract.
    */
  def decodeStub(kind: String, payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    def b(i: Int) = java.lang.Byte.toUnsignedInt(payload(i % payload.length))
    val width = 64 + b(1) % 192
    val height = 64 + b(2) % 192
    val frames = kind match {
      case "audio" => 1 + b(3) % 300 // "samples/100"
      case "video" => 1 + b(3) % 120
      case _ => 1
    }
    val feat = Array.tabulate(8)(i => (b(4 + i) / 255.0f) * 2.0f - 1.0f)
    (width, height, frames, feat)
  }

  /** Feature extraction over the media table: mapPartitions with one
    * decoder per partition (the pooled-resource pattern — at scale each
    * executor holds one codec instance, not one per row).
    */
  def extractFeatures(spark: SparkSession,
      media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // pooled per-partition "decoder" (stub has no state; a real codec
      // would be initialized exactly here, once)
      it.map { m =>
        val (w, h, f, feat) = decodeStub(m.kind, m.payload)
        MediaFeatures(m.doc_id, m.media_ref, m.kind, m.payload.length,
          w, h, f, feat.toSeq)
      }
    }
  }

  /** "Resize" = recompute features at a target resolution (stub keeps the
    * aspect contract: width/height scaled, features unchanged length).
    */
  def resize(features: Dataset[MediaFeatures], maxDim: Int)
      (implicit spark: SparkSession): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim).cast("double") / greatest(col("width"), col("height")))
    features.toDF()
      .withColumn("out_width", ceil(col("width") * scale).cast("int"))
      .withColumn("out_height", ceil(col("height") * scale).cast("int"))
  }

  /** Frame sampling for video/audio rows: every k-th frame index, capped. */
  def sampleFrames(features: Dataset[MediaFeatures], every: Int,
      maxFrames: Int): DataFrame =
    features.toDF()
      .withColumn("sampled_frames",
        slice(sequence(lit(0), col("n_frames") - 1, lit(every)), 1, maxFrames))
      .withColumn("n_sampled", size(col("sampled_frames")))
}
