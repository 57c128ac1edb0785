package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing: media travel as opaque
  * `binary` columns with typed metadata; decode / feature-extract /
  * frame-sample run per partition over the binary payloads.
  *
  * The decode step is REAL and JDK-only: JPEG payloads fully pixel-decode
  * through javax.imageio, WAV payloads decode their PCM16 samples via the
  * RIFF chunk walk — no external codec library. Formats the JDK can't
  * decode fall back to deterministic byte-statistics features, keeping
  * the pipeline total. The schema convention, typed Dataset boundary,
  * partition-parallel mapPartitions execution, and batch shape are the
  * same ones a GPU-batched decoder would consume.
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

  // ---- real container-header decoders (pure JVM, no codec libs) ------------

  /** Parsed media header metadata (image or audio). */
  case class MediaHeader(
      format: String, // "jpeg" | "wav" | "unknown"
      width: Int, height: Int, components: Int, // jpeg (0 otherwise)
      sampleRate: Int, channels: Int, bitsPerSample: Int, // wav (0 otherwise)
      durationMs: Double)

  /** JPEG header parse: walk the marker segments to the SOF (start of
    * frame: 0xC0–0xC3, 0xC5–0xC7, 0xC9–0xCB, 0xCD–0xCF) and read the
    * frame dimensions and component count. Real JPEG bytes, no decode of
    * the entropy-coded payload.
    */
  def parseJpegHeader(b: Array[Byte]): Option[MediaHeader] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      val marker = b(i + 1) & 0xff
      if (marker == 0xd9 || marker == 0xda) return None // EOI / SOS before SOF
      val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
      val isSof = (marker >= 0xc0 && marker <= 0xcf) &&
        marker != 0xc4 && marker != 0xc8 && marker != 0xcc
      if (isSof) {
        if (i + 9 >= b.length) return None
        val h = ((b(i + 5) & 0xff) << 8) | (b(i + 6) & 0xff)
        val w = ((b(i + 7) & 0xff) << 8) | (b(i + 8) & 0xff)
        val ncomp = b(i + 9) & 0xff
        return Some(MediaHeader("jpeg", w, h, ncomp, 0, 0, 0, 0.0))
      }
      i += 2 + len
    }
    None
  }

  /** WAV/RIFF header parse: fmt chunk → channels/rate/bits, data chunk →
    * payload size; duration follows from rate × frame size.
    */
  def parseWavHeader(b: Array[Byte]): Option[MediaHeader] = {
    def le16(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def le32(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def tag(o: Int) = new String(b, o, 4, "US-ASCII")
    if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var rate, channels, bits, dataLen = 0
    while (i + 8 <= b.length) {
      val id = tag(i); val size = le32(i + 4)
      if (id == "fmt ") {
        channels = le16(i + 10); rate = le32(i + 12); bits = le16(i + 22)
      } else if (id == "data") dataLen = size
      i += 8 + size + (size & 1)
    }
    if (rate == 0 || channels == 0 || bits == 0) return None
    val frameBytes = channels * (bits / 8)
    val durMs = if (frameBytes > 0) dataLen.toDouble * 1000.0 / (rate.toDouble * frameBytes) else 0.0
    Some(MediaHeader("wav", 0, 0, 0, rate, channels, bits, durMs))
  }

  /** MP4 / ISO-BMFF header parse: walk the box tree (u32 big-endian size
    * + 4cc type) to moov → mvhd (timescale + duration, v0/v1) and
    * trak → tkhd (track width/height as 16.16 fixed-point). Real
    * container bytes, no codec decode.
    */
  def parseMp4Header(b: Array[Byte]): Option[MediaHeader] = {
    def be32(o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    def be64(o: Int): Long = (be32(o) << 32) | be32(o + 4)
    def tag(o: Int) = new String(b, o, 4, "US-ASCII")
    if (b.length < 12 || tag(4) != "ftyp") return None
    var timescale = 0L; var duration = 0L; var w = 0; var h = 0
    def walk(start: Long, end: Long): Unit = {
      var i = start
      while (i + 8 <= end) {
        val size = be32(i.toInt)
        val tp = tag(i.toInt + 4)
        val boxEnd = if (size == 0) end else i + size
        if (size != 0 && size < 8) return // corrupt — stop walking
        val p = i.toInt + 8 // payload offset
        tp match {
          case "moov" => walk(i + 8, boxEnd)
          case "trak" => walk(i + 8, boxEnd)
          case "mvhd" if p < b.length =>
            val v = b(p) & 0xff
            if (v == 1 && p + 32 <= b.length) {
              timescale = be32(p + 20); duration = be64(p + 24)
            } else if (p + 20 <= b.length) {
              timescale = be32(p + 12); duration = be32(p + 16)
            }
          case "tkhd" if p < b.length =>
            val v = b(p) & 0xff
            val wOff = if (v == 1) p + 88 else p + 76
            if (wOff + 8 <= b.length) {
              w = (be32(wOff) >> 16).toInt
              h = (be32(wOff + 4) >> 16).toInt
            }
          case _ =>
        }
        if (boxEnd <= i) return
        i = boxEnd
      }
    }
    walk(0L, b.length.toLong)
    if (timescale == 0 && w == 0) return None
    val durMs = if (timescale > 0) duration.toDouble * 1000.0 / timescale.toDouble else 0.0
    Some(MediaHeader("mp4", w, h, 0, 0, 0, 0, durMs))
  }

  def parseHeader(b: Array[Byte]): MediaHeader =
    parseJpegHeader(b).orElse(parseWavHeader(b)).orElse(parseMp4Header(b))
      .getOrElse(MediaHeader("unknown", 0, 0, 0, 0, 0, 0, 0.0))

  /** Minimal real MP4 (ftyp + moov(mvhd + trak(tkhd)) + mdat) — fixture
    * builder; timescale 1000 so duration units are milliseconds.
    */
  def makeMp4(w: Int, h: Int, durationMs: Int): Array[Byte] = {
    import java.nio.ByteBuffer
    def box(tp: String, payload: Array[Byte]): Array[Byte] = {
      val out = ByteBuffer.allocate(8 + payload.length)
      out.putInt(8 + payload.length)
      out.put(tp.getBytes("US-ASCII"))
      out.put(payload)
      out.array()
    }
    val mvhd = ByteBuffer.allocate(100)
    mvhd.putInt(0) // version 0 + flags
    mvhd.putInt(0); mvhd.putInt(0) // ctime, mtime
    mvhd.putInt(1000) // timescale: ms
    mvhd.putInt(durationMs)
    mvhd.putInt(0x00010000); mvhd.putShort(0x0100.toShort) // rate, volume
    mvhd.position(mvhd.position() + 10) // reserved
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(mvhd.putInt)
    mvhd.position(mvhd.position() + 24) // pre_defined
    mvhd.putInt(2) // next track id
    val tkhd = ByteBuffer.allocate(84)
    tkhd.putInt(7) // version 0, flags: enabled|in-movie|in-preview
    tkhd.putInt(0); tkhd.putInt(0) // ctime, mtime
    tkhd.putInt(1); tkhd.putInt(0) // track id, reserved
    tkhd.putInt(durationMs)
    tkhd.position(tkhd.position() + 16) // reserved, layer, altgroup, volume, reserved
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000).foreach(tkhd.putInt)
    tkhd.putInt(w << 16); tkhd.putInt(h << 16) // 16.16 fixed
    val ftypPayload = ByteBuffer.allocate(12)
    ftypPayload.put("isom".getBytes("US-ASCII")); ftypPayload.putInt(0)
    ftypPayload.put("isom".getBytes("US-ASCII"))
    box("ftyp", ftypPayload.array()) ++
      box("moov", box("mvhd", mvhd.array()) ++ box("trak", box("tkhd", tkhd.array()))) ++
      box("mdat", Array.tabulate[Byte](32)(i => (i * 7).toByte))
  }

  /** Minimal real JPEG container (SOI + JFIF APP0 + SOF0 + EOI) — fixture
    * builder for tests and the synthetic media column.
    */
  def makeJpeg(w: Int, h: Int, ncomp: Int = 3): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def b2(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    out.write(0xff); out.write(0xd8) // SOI
    out.write(0xff); out.write(0xe0); b2(16) // APP0 len
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1); out.write(0); b2(1); b2(1); out.write(0); out.write(0)
    out.write(0xff); out.write(0xc0); b2(8 + 3 * ncomp) // SOF0
    out.write(8); b2(h); b2(w); out.write(ncomp)
    for (c <- 1 to ncomp) { out.write(c); out.write(0x11); out.write(0) }
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Minimal real WAV container (RIFF/fmt/data) with a silent payload. */
  def makeWav(rate: Int, channels: Int, bits: Int, nSamples: Int): Array[Byte] = {
    val frame = channels * (bits / 8)
    val dataLen = nSamples * frame
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * frame).putShort(frame.toShort).putShort(bits.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    out.array()
  }

  /** Real mono PCM16 WAV with the given sample payload. */
  def makePcmWav(rate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate)
      .putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(out.putShort)
    out.array()
  }

  /** Real JPEG (JDK ImageIO encoder) filled with one gray level — the
    * deterministic fixture for the decode pipeline (a solid color
    * survives JPEG quantization exactly, so oracles can pin pixel means).
    */
  def makeSolidJpeg(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", out)
    out.toByteArray
  }

  // ---- real payload decode (JDK-only: javax.imageio + RIFF/PCM) ------------

  /** Decoded media content: pixel/sample accounting plus summary stats.
    * For images n_units = pixels, sum_val = Σ(r+g+b), mean_val over all
    * channel samples, peak = max channel value; for audio n_units =
    * samples, sum_val = Σ amplitude, peak = max |amplitude|.
    */
  case class MediaContent(
      id: Long,
      format: String,
      width: Int,
      height: Int,
      n_units: Long,
      sum_val: Long,
      mean_val: Double,
      peak: Long,
      features: Array[Float])

  /** Full JPEG pixel decode via the JDK's ImageIO — no codec library. */
  private[pipeline] def decodeJpeg(id: Long, b: Array[Byte], dim: Int): Option[MediaContent] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        var sum = 0L; var peak = 0L
        val hist = new Array[Float](dim)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val bl = rgb & 0xff
            sum += r + g + bl
            if (r > peak) peak = r; if (g > peak) peak = g; if (bl > peak) peak = bl
            hist(((r + g + bl) / 3) * dim / 256) += 1f
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        var d = 0
        while (d < dim) { hist(d) /= math.max(1L, n); d += 1 }
        Some(MediaContent(id, "jpeg", w, h, n, sum, sum.toDouble / (3.0 * n), peak, hist))
      }
    } catch { case _: Exception => None }

  /** PCM16 sample decode from the WAV data chunk (any channel count). */
  private[pipeline] def decodeWavPcm(id: Long, b: Array[Byte], dim: Int): Option[MediaContent] = {
    def le16(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def le32(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def tag(o: Int) = new String(b, o, 4, "US-ASCII")
    if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var bits = 0; var dataOff = -1; var dataLen = 0
    while (i + 8 <= b.length) {
      val cid = tag(i); val size = le32(i + 4)
      if (cid == "fmt ") bits = le16(i + 22)
      else if (cid == "data") { dataOff = i + 8; dataLen = size }
      i += 8 + size + (size & 1)
    }
    if (bits != 16 || dataOff < 0) return None
    val n = math.min(dataLen, b.length - dataOff) / 2
    var sum = 0L; var peak = 0L
    val hist = new Array[Float](dim)
    var k = 0
    while (k < n) {
      val s = le16(dataOff + 2 * k).toShort.toInt
      sum += s
      val a = math.abs(s); if (a > peak) peak = a
      hist(math.min(dim - 1, a * dim / 32768)) += 1f
      k += 1
    }
    var d = 0
    while (d < dim) { hist(d) /= math.max(1, n); d += 1 }
    Some(MediaContent(id, "wav", 0, 0, n.toLong, sum,
      if (n == 0) 0.0 else sum.toDouble / n, peak, hist))
  }

  /** Decode one payload by sniffed format; byte-statistics fallback keeps
    * the pipeline total for formats the JDK can't decode.
    */
  def decodeContent(id: Long, b: Array[Byte], dim: Int = 16): MediaContent = {
    val h = parseHeader(b)
    (h.format match {
      case "jpeg" => decodeJpeg(id, b, dim)
      case "wav" => decodeWavPcm(id, b, dim)
      case _ => None
    }).getOrElse {
      var sum = 0L; var peak = 0L
      b.foreach { x => val v = x & 0xff; sum += v; if (v > peak) peak = v }
      MediaContent(id, h.format, h.width, h.height, b.length.toLong, sum,
        if (b.isEmpty) 0.0 else sum.toDouble / b.length, peak,
        decodeFrame(b, dim))
    }
  }

  /** Partition-parallel full-payload decode over a binary column — the
    * metadata+content pass of a media pipeline (no shuffle; at 100 TB
    * each partition decodes where it sits).
    */
  def mediaContent(df: DataFrame, idCol: String, mediaCol: String, dim: Int = 16): DataFrame = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("id"), col(mediaCol).cast("binary").as("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, media) =>
        decodeContent(id, if (media == null) Array.empty[Byte] else media, dim)
      })
      .toDF()
  }

  /** Media header extraction over a binary column — partition-parallel,
    * no shuffle (the header parse touches only the leading bytes; at
    * 100 TB this is the metadata pass before any GPU decode).
    */
  def mediaHeaders(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val parse = udf((b: Array[Byte]) =>
      if (b == null) None
      else {
        val h = parseHeader(b)
        Some((h.format, h.width, h.height, h.components,
          h.sampleRate, h.channels, h.bitsPerSample, h.durationMs))
      })
    df.select(col(idCol), parse(col(mediaCol)).as("h"))
      .select(col(idCol),
        col("h._1").as("format"), col("h._2").as("width"), col("h._3").as("height"),
        col("h._4").as("components"), col("h._5").as("sample_rate"),
        col("h._6").as("channels"), col("h._7").as("bits"),
        col("h._8").as("duration_ms"))
  }

  /** Byte-statistics fallback features for formats without a JDK decoder
    * (deterministic, so tests can pin exact values). JPEG/WAV payloads
    * take the REAL decode path in decodeContent above.
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
    * JPEG/WAV payloads get the REAL whole-payload decode (one logical
    * frame); other formats sample byte-range frames with the fallback.
    */
  def extractFeatures(
      ds: Dataset[MediaRow],
      dim: Int = 16,
      frames: Int = 4
  ): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { row =>
        val media = if (row.media == null) Array.empty[Byte] else row.media
        parseHeader(media).format match {
          case "jpeg" | "wav" =>
            val c = decodeContent(row.id, media, dim)
            MediaFeatures(row.id, row.kind, media.length, 1, c.features)
          case _ =>
            val fs = sampleFrames(media, frames)
            val feats = new Array[Float](dim)
            fs.foreach { fr =>
              val f = decodeFrame(fr, dim)
              var d = 0
              while (d < dim) { feats(d) += f(d) / math.max(1, fs.length); d += 1 }
            }
            MediaFeatures(row.id, row.kind, media.length, fs.length, feats)
        }
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
