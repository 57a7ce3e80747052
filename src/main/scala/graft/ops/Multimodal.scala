package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Schema.DocRow

/** Multimodal column handling: media (image/audio/video/table) as opaque
  * `binary` payloads with typed metadata, plus decode / feature-extract /
  * resize / frame-sample plumbing.
  *
  * All four media kinds are REAL self-describing formats parsed by genuine
  * pure-JVM decoders (no codec libraries exist in this sandbox, so the
  * formats are the classic uncompressed ones — exactly what a training-data
  * pipeline's decode stage sees after transcoding):
  *   - image: binary PPM (P6) — ASCII header with comment handling, maxval,
  *     pixel-length validation, features from actual pixel bytes.
  *   - audio: RIFF/WAVE PCM16 — chunk walk (fmt /data, unknown chunks
  *     skipped with even-padding), sample-rate/channel/bit-depth fields,
  *     features from the actual 16-bit samples.
  *   - video: YUV4MPEG2 (y4m) — stream header (W/H/F/C tags), per-frame
  *     FRAME markers with optional params, 4:2:0 plane-size validation,
  *     features from the actual luma planes.
  *   - table: headerless numeric CSV — rectangularity + numeric-cell
  *     validation, features from the actual cell values.
  * `decodeStub` remains only as the documented fallback for payloads in an
  * unknown format (a real pipeline would route those to a quarantine sink).
  *
  * Metadata mapping into the fixed (width, height, n_frames) schema:
  *   image: (w, h, 1) · audio: (sample_rate/100, channels, samples/100)
  *   video: (w, h, frame_count) · table: (n_cols, n_rows, 1)
  *
  * Reference analogue: the visual-search app consumes image metadata
  * (reference `apps/4_visual_search.py`); the reference core treats media
  * as opaque references, so decode semantics here follow the public format
  * specs (netpbm, RIFF/WAVE, yuv4mpeg2), not reference code.
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
    * bytes in the kind's real format). Narrow — no shuffle.
    */
  def mediaTable(spark: SparkSession, docs: Dataset[DocRow]): Dataset[MediaRow] = {
    import spark.implicits._
    docs.flatMap { d =>
      d.spans.filter(_.kind != "text").map { s =>
        MediaRow(d.doc_id, s.media_ref, s.kind, fakePayload(s.kind, s.media_ref))
      }
    }
  }

  private def u16le(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def u32le(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def rdU16le(p: Array[Byte], off: Int): Int =
    (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)
  private def rdU32le(p: Array[Byte], off: Int): Long =
    (p(off) & 0xffL) | ((p(off + 1) & 0xffL) << 8) |
      ((p(off + 2) & 0xffL) << 16) | ((p(off + 3) & 0xffL) << 24)

  /** Deterministic synthetic payload derived from the SHA-256 of the media
    * ref — a REAL file in the kind's format (PPM / WAV / Y4M / CSV), so the
    * decode path exercises actual parsers. All dimension fields are digest
    * arithmetic that the serial oracle re-derives without running these
    * builders (Verify.dumpKgOracle).
    */
  def fakePayload(kind: String, mediaRef: String): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
      .digest(mediaRef.getBytes("UTF-8"))
    def b(i: Int) = java.lang.Byte.toUnsignedInt(md(i))
    kind match {
      case "image" =>
        val w = 8 + b(1) % 56
        val h = 8 + b(2) % 56
        val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
        header ++ Array.tabulate[Byte](w * h * 3)(i => md(i % md.length))
      case "audio" =>
        // canonical 44-byte RIFF/WAVE PCM16 header + interleaved samples
        val channels = 1 + b(1) % 2
        val sampleRate = 8000 + 100 * (b(2) % 80)
        val nSamples = 100 * (1 + b(3) % 300) // per-channel sample frames
        val dataLen = nSamples * channels * 2
        val out = new java.io.ByteArrayOutputStream(44 + dataLen)
        out.write("RIFF".getBytes("US-ASCII")); out.write(u32le(36 + dataLen))
        out.write("WAVE".getBytes("US-ASCII"))
        out.write("fmt ".getBytes("US-ASCII")); out.write(u32le(16))
        out.write(u16le(1)) // PCM
        out.write(u16le(channels)); out.write(u32le(sampleRate))
        out.write(u32le(sampleRate * channels * 2))
        out.write(u16le(channels * 2)); out.write(u16le(16))
        out.write("data".getBytes("US-ASCII")); out.write(u32le(dataLen))
        var i = 0
        while (i < nSamples * channels) {
          out.write(u16le(((b(i % 32) - 128) * 256) & 0xffff))
          i += 1
        }
        out.toByteArray
      case "video" =>
        // yuv4mpeg2: stream header + FRAME-marked 4:2:0 planar frames
        val w = 16 + 2 * (b(1) % 24)
        val h = 16 + 2 * (b(2) % 24)
        val frames = 1 + b(3) % 12
        val frameBytes = w * h * 3 / 2
        val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n"
          .getBytes("US-ASCII")
        val out = new java.io.ByteArrayOutputStream(
          header.length + frames * (6 + frameBytes))
        out.write(header)
        var f = 0
        while (f < frames) {
          out.write("FRAME\n".getBytes("US-ASCII"))
          var i = 0
          while (i < frameBytes) { out.write(md((i + 11 * f) % 32)); i += 1 }
          f += 1
        }
        out.toByteArray
      case "table" =>
        // headerless numeric CSV, fixed-width %03d cells: every row is
        // exactly cols*4 bytes (3 digits/cell + comma-or-newline)
        val cols = 3 + b(1) % 6
        val rows = 5 + b(2) % 36
        val sb = new StringBuilder(rows * cols * 4)
        var r = 0
        while (r < rows) {
          var c = 0
          while (c < cols) {
            val v = (b((r * 31 + c * 7) % 32) * 4 + r + c) % 1000
            sb.append(f"$v%03d").append(if (c == cols - 1) '\n' else ',')
            c += 1
          }
          r += 1
        }
        sb.toString.getBytes("US-ASCII")
      case _ =>
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
    // Long product: a huge header dim (e.g. 65536x65536) overflows the Int
    // product to a small value that can collide with the remaining byte
    // count and wrongly accept the file
    val expected = w.toLong * h * 3 * bytesPerSample
    require(payload.length - pos == expected,
      s"PPM: pixel array ${payload.length - pos} bytes, expected $expected")
    val feat = binnedMeans(8) { emit =>
      var i = pos
      while (i < payload.length) { emit(((payload(i) & 0xff) / 255.0) * 2.0 - 1.0); i += 1 }
    }
    (w, h, 1, feat)
  }

  /** REAL RIFF/WAVE decoder — pure JVM. Validates the RIFF container size,
    * walks sub-chunks (skipping unknown ones with the spec's even-byte
    * padding), requires PCM16 from `fmt `, and validates `data` alignment
    * against block size. Features are 8-bin means of the ACTUAL 16-bit
    * samples, normalized to [-1, 1]. Returns (sample_rate/100, channels,
    * ceil(samples/100), features).
    */
  def parseWav(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    require(payload.length >= 44, "WAV: too short for a RIFF/WAVE header")
    def tag(off: Int) = new String(payload, off, 4, "US-ASCII")
    require(tag(0) == "RIFF", "WAV: missing RIFF magic")
    require(tag(8) == "WAVE", "WAV: RIFF form is not WAVE")
    require(rdU32le(payload, 4) == payload.length - 8,
      s"WAV: RIFF size ${rdU32le(payload, 4)} != file size - 8")
    var pos = 12
    var channels = -1
    var sampleRate = -1
    var dataOff = -1
    var dataLen = -1
    while (pos + 8 <= payload.length) {
      val id = tag(pos)
      // keep the unsigned 32-bit size in a Long for the bound check: a
      // corrupt size >= 2^31 truncated with .toInt goes negative, slips
      // past the overrun require, and `pos += 8 + size + (size & 1)` then
      // stops advancing — an executor-task hang instead of an error row
      val sizeL = rdU32le(payload, pos + 4)
      require(pos + 8L + sizeL <= payload.length,
        s"WAV: chunk '$id' overruns the file")
      val size = sizeL.toInt
      id match {
        case "fmt " =>
          require(size >= 16, "WAV: fmt chunk too small")
          require(rdU16le(payload, pos + 8) == 1, "WAV: not PCM")
          channels = rdU16le(payload, pos + 10)
          sampleRate = rdU32le(payload, pos + 12).toInt
          require(rdU16le(payload, pos + 22) == 16, "WAV: not 16-bit")
        case "data" =>
          dataOff = pos + 8
          dataLen = size
        case _ => // skip unknown chunk
      }
      pos += 8 + size + (size & 1) // chunks are even-padded per spec
    }
    require(channels > 0 && sampleRate > 0, "WAV: no fmt chunk")
    require(dataOff >= 0, "WAV: no data chunk")
    require(dataLen % (2 * channels) == 0,
      s"WAV: data length $dataLen not aligned to ${2 * channels}-byte frames")
    val nSamples = dataLen / (2 * channels)
    val feat = binnedMeans(8) { emit =>
      var i = dataOff
      while (i < dataOff + dataLen) {
        emit(rdU16le(payload, i).toShort / 32768.0)
        i += 2
      }
    }
    (sampleRate / 100, channels, (nSamples + 99) / 100, feat)
  }

  /** REAL YUV4MPEG2 (y4m) decoder — pure JVM. Parses the stream header
    * (W/H required, C tag must be a 4:2:0 variant, unknown tags skipped),
    * then walks FRAME markers (optional per-frame params allowed by spec),
    * validating each frame's planar size w*h*3/2. Features are 8-bin means
    * of the ACTUAL luma planes across all frames. Returns
    * (width, height, frame_count, features).
    */
  def parseY4m(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val magic = "YUV4MPEG2"
    require(payload.length > magic.length &&
      new String(payload, 0, magic.length, "US-ASCII") == magic,
      "Y4M: missing YUV4MPEG2 magic")
    var nl = magic.length
    while (nl < payload.length && payload(nl) != '\n') nl += 1
    require(nl < payload.length, "Y4M: unterminated stream header")
    val header = new String(payload, 0, nl, "US-ASCII")
    var w = -1
    var h = -1
    var chroma = "420" // spec default when no C tag
    header.split(' ').drop(1).foreach { t =>
      if (t.nonEmpty) t.charAt(0) match {
        case 'W' => w = t.substring(1).toInt
        case 'H' => h = t.substring(1).toInt
        case 'C' => chroma = t.substring(1)
        case _ => // F/I/A/X tags irrelevant to decode
      }
    }
    require(w > 0 && h > 0, s"Y4M: missing W/H in header '$header'")
    require(chroma.startsWith("420"), s"Y4M: unsupported chroma C$chroma")
    require(w % 2 == 0 && h % 2 == 0, s"Y4M: 4:2:0 needs even dims, got ${w}x$h")
    // dims a real frame must satisfy anyway (a frame cannot exceed the
    // payload), checked in Long arithmetic BEFORE the Int products below:
    // a header like W1073741824 H2 overflows w*h to a negative Int, making
    // frameBytes negative — pos then walks BACKWARD and the frame loop
    // never terminates while buffering luma offsets (hang, then OOM)
    require(w.toLong * h * 3 / 2 <= payload.length,
      s"Y4M: ${w}x$h frame larger than the whole payload")
    val lumaBytes = w * h
    val frameBytes = lumaBytes * 3 / 2
    var pos = nl + 1
    var frames = 0
    val lumaRanges = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (pos < payload.length) {
      require(pos + 5 <= payload.length &&
        new String(payload, pos, 5, "US-ASCII") == "FRAME",
        s"Y4M: FRAME marker expected at offset $pos")
      pos += 5
      while (pos < payload.length && payload(pos) != '\n') pos += 1 // frame params
      require(pos < payload.length, "Y4M: unterminated FRAME line")
      pos += 1
      require(pos + frameBytes <= payload.length,
        s"Y4M: truncated frame ${frames} at offset $pos")
      lumaRanges += pos
      pos += frameBytes
      frames += 1
    }
    require(frames > 0, "Y4M: stream has no frames")
    val feat = binnedMeans(8) { emit =>
      lumaRanges.foreach { off =>
        var i = off
        while (i < off + lumaBytes) { emit(((payload(i) & 0xff) / 255.0) * 2.0 - 1.0); i += 1 }
      }
    }
    (w, h, frames, feat)
  }

  /** REAL headerless-CSV table decoder — pure JVM. Validates rectangularity
    * (every row the same column count) and that every cell is numeric;
    * features are 8-bin means of the ACTUAL cell values (normalized by the
    * observed max). Returns (n_cols, n_rows, 1, features).
    */
  def parseCsvTable(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val text = new String(payload, "UTF-8")
    val rows = text.split('\n').filter(_.nonEmpty)
    require(rows.nonEmpty, "CSV: empty table")
    val cols = rows(0).count(_ == ',') + 1
    val values = new Array[Double](rows.length * cols)
    var r = 0
    while (r < rows.length) {
      val cells = rows(r).split(',')
      require(cells.length == cols,
        s"CSV: row $r has ${cells.length} cells, expected $cols")
      var c = 0
      while (c < cols) {
        val cell = cells(c)
        require(cell.nonEmpty && cell.forall(Character.isDigit),
          s"CSV: non-numeric cell '$cell' at ($r,$c)")
        values(r * cols + c) = cell.toDouble
        c += 1
      }
      r += 1
    }
    val max = math.max(values.max, 1.0)
    val feat = binnedMeans(8) { emit =>
      values.foreach(v => emit((v / max) * 2.0 - 1.0))
    }
    (cols, rows.length, 1, feat)
  }

  /** Two-pass 8-bin mean over a re-playable value stream: pass 1 counts,
    * pass 2 accumulates per-bin sums — no buffering of the value stream.
    */
  private def binnedMeans(bins: Int)(replay: (Double => Unit) => Unit): Array[Float] = {
    var n = 0L
    replay(_ => n += 1)
    val sums = new Array[Double](bins)
    val counts = new Array[Long](bins)
    var i = 0L
    replay { v =>
      val b = if (n == 0) 0 else ((i * bins) / n).toInt.min(bins - 1)
      sums(b) += v
      counts(b) += 1
      i += 1
    }
    Array.tabulate(bins)(b =>
      if (counts(b) > 0) (sums(b) / counts(b)).toFloat else 0.0f)
  }

  /** Decode dispatch: magic-sniffed real parser for the self-describing
    * formats (PPM "P6", RIFF/WAVE, YUV4MPEG2), declared-kind CSV parse for
    * tables (CSV has no magic), deterministic stub only for payloads in an
    * unknown format.
    */
  def decode(kind: String, payload: Array[Byte]): (Int, Int, Int, Array[Float]) =
    if (payload.length >= 2 && payload(0) == 'P' && payload(1) == '6')
      parsePpm(payload)
    else if (payload.length >= 4 &&
      new String(payload, 0, 4, "US-ASCII") == "RIFF")
      parseWav(payload)
    else if (payload.length >= 9 &&
      new String(payload, 0, 9, "US-ASCII") == "YUV4MPEG2")
      parseY4m(payload)
    else if (kind == "table")
      parseCsvTable(payload)
    else decodeStub(kind, payload)

  /** STUB decoder — the documented fallback for unknown-format payloads
    * only (every synthesized kind now decodes for real). Derives
    * deterministic typed metadata and an 8-dim feature vector from payload
    * bytes; the signature (bytes -> metadata + features) is the contract a
    * real codec drop-in satisfies, as the four real parsers demonstrate.
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
      // pooled per-partition decoder (these parsers are stateless; a
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
