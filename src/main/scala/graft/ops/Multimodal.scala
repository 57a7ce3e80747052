package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Schema.DocRow

/** Multimodal column handling: media (image/audio/video/table) as opaque
  * `binary` payloads with typed metadata, plus decode / feature-extract /
  * resize / frame-sample plumbing.
  *
  * Decode status by kind:
  *   - image: REAL — payloads are binary PPM (P6) files and `parsePpm` is
  *     a genuine pure-JVM decoder (ASCII header with comment handling,
  *     maxval, pixel-length validation, features from actual pixel bytes).
  *     No external libraries needed, so nothing is stubbed here.
  *   - audio/table: STUB (`decodeStub` — this container has no codec
  *     libraries for real compressed formats); deterministic fake metadata
  *     derived from payload bytes. Everything AROUND the decoders is real
  *     and tested — schema, partitioning, pooled per-partition decoder
  *     (mirroring one codec per `mapInPandas` batch iterator) — so
  *     swapping `decodeStub` for a real codec changes no plumbing, as
  *     `parsePpm` demonstrates.
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
        MediaRow(d.doc_id, s.media_ref, s.kind, fakePayload(s.kind, s.media_ref))
      }
    }
  }

  /** Deterministic synthetic payload derived from the ref hash. Images are
    * REAL binary PPM (P6) files — header + sha-cycled pixel bytes — so the
    * decode path exercises an actual format; other kinds get 64-256 opaque
    * bytes (their decode is the documented stub).
    */
  def fakePayload(kind: String, mediaRef: String): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
      .digest(mediaRef.getBytes("UTF-8"))
    def b(i: Int) = java.lang.Byte.toUnsignedInt(md(i))
    if (kind == "image") {
      val w = 8 + b(1) % 56
      val h = 8 + b(2) % 56
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      header ++ Array.tabulate[Byte](w * h * 3)(i => md(i % md.length))
    } else {
      val len = 64 + (b(0) % 193)
      Array.tabulate[Byte](len)(i => md(i % md.length))
    }
  }

  /** REAL PPM (P6) decoder — pure JVM, no libraries. Parses the ASCII
    * header (magic, whitespace + '#' comments, width, height, maxval),
    * validates the pixel-array length against the declared dimensions, and
    * derives the 8-dim feature vector from the ACTUAL pixel bytes (8-bin
    * mean intensity, normalized to [-1, 1]).
    */
  def parsePpm(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    var pos = 2
    def skipWs(): Unit = {
      var done = false
      while (!done && pos < payload.length) {
        val c = (payload(pos) & 0xff).toChar
        if (c == '#') {
          while (pos < payload.length && payload(pos) != '\n') pos += 1
        } else if (Character.isWhitespace(c)) pos += 1
        else done = true
      }
    }
    def readInt(): Int = {
      skipWs()
      require(pos < payload.length && Character.isDigit((payload(pos) & 0xff).toChar),
        s"PPM: digit expected at offset $pos")
      var v = 0
      while (pos < payload.length && Character.isDigit((payload(pos) & 0xff).toChar)) {
        v = v * 10 + (payload(pos) - '0')
        pos += 1
      }
      v
    }
    require(payload.length >= 2 && payload(0) == 'P' && payload(1) == '6',
      "PPM: not a P6 file")
    val w = readInt()
    val h = readInt()
    val maxval = readInt()
    require(w > 0 && h > 0 && maxval > 0 && maxval < 65536,
      s"PPM: bad header ${w}x$h maxval=$maxval")
    pos += 1 // exactly one whitespace byte separates maxval from pixels
    val bytesPerSample = if (maxval < 256) 1 else 2
    val expected = w * h * 3 * bytesPerSample
    require(payload.length - pos == expected,
      s"PPM: pixel array ${payload.length - pos} bytes, expected $expected")
    val feat = new Array[Float](8)
    var s = 0
    while (s < 8) {
      val from = pos + (expected.toLong * s / 8).toInt
      val until = pos + (expected.toLong * (s + 1) / 8).toInt
      var sum = 0L
      var i = from
      while (i < until) { sum += payload(i) & 0xff; i += 1 }
      feat(s) =
        if (until > from)
          ((sum.toDouble / (until - from)) / 255.0 * 2.0 - 1.0).toFloat
        else 0.0f
      s += 1
    }
    (w, h, 1, feat)
  }

  /** Decode dispatch: real parser for self-describing formats (PPM magic
    * "P6"), deterministic stub otherwise.
    */
  def decode(kind: String, payload: Array[Byte]): (Int, Int, Int, Array[Float]) =
    if (payload.length >= 2 && payload(0) == 'P' && payload(1) == '6')
      parsePpm(payload)
    else decodeStub(kind, payload)

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
      // pooled per-partition decoder (the PPM parser is stateless; a
      // stateful codec would be initialized exactly here, once)
      it.map { m =>
        val (w, h, f, feat) = decode(m.kind, m.payload)
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
