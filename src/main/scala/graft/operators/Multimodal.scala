package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque `binary` payloads + typed metadata,
  * processed in partition-sized batches.
  *
  * The decode step is REAL for three dependency-free formats — BMP
  * (24-bit uncompressed) and PPM (binary P6) images producing true
  * pixel dimensions plus a 4x4 average-luma thumbnail, and PCM WAV
  * audio producing the sample rate plus a 16-window RMS energy
  * envelope — all parsed directly from bytes on the JVM with no codec
  * libraries. Payloads in any other format fall back to a
  * deterministic opaque fingerprint (byte-sampled thumbnail), so the
  * operator is total. JPEG/PNG/MP3 would slot into [[decodeImage]] /
  * [[decodeAudio]] behind the same contract when codec libs exist.
  *
  * The Spark-side contract is production-shaped: binary column +
  * metadata struct in, fixed-schema feature rows out, batch iteration
  * via `mapPartitions` so decoder/codec/model init amortizes per
  * partition (the Scala analogue of pandas-batched UDFs).
  *
  * At 100 TB the payload column dominates row size: repartition by
  * byte-budget (`targetPartitionBytes`) before heavy decode so a skewed
  * file mix cannot OOM one executor while others idle.
  */
object Multimodal {

  /** Attach a binary payload + metadata struct (here: utf-8 bytes of the
    * text standing in for an image/audio blob).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "utf-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        col("source").as("origin"),
        octet_length(encode(col("text"), "utf-8")).as("n_bytes")).as("meta"))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("content_hash", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    // images: 4x4 average-luma thumbnail; audio: 16-window RMS envelope
    StructField("thumb", ArrayType(FloatType, containsNull = false))))

  /** Decode a recognized image payload to (format, width, height,
    * 4x4 average-luma thumbnail normalized to [0,1], row-major from the
    * top-left). Returns None for unrecognized or malformed payloads.
    *
    * Supported without any codec dependency:
    *  - BMP: 24bpp uncompressed (BI_RGB), bottom-up or top-down rows,
    *    4-byte row padding per the format spec.
    *  - PPM: binary "P6", whitespace/comment-tolerant header, maxval 255.
    */
  private[operators] def decodeImage(
      bytes: Array[Byte]): Option[(String, Int, Int, Array[Float])] =
    decodeRgb(bytes).map { case (fmt, w, h, rgbAt) =>
      val sums = new Array[Double](16)
      val counts = new Array[Long](16)
      var y = 0
      while (y < h) {
        val gy = (y.toLong * 4 / h).toInt
        var x = 0
        while (x < w) {
          val (r, g, b) = rgbAt(x, y)
          val gx = (x.toLong * 4 / w).toInt
          val c = gy * 4 + gx
          sums(c) += 0.299 * r + 0.587 * g + 0.114 * b
          counts(c) += 1
          x += 1
        }
        y += 1
      }
      val thumb = Array.tabulate(16)(i =>
        if (counts(i) == 0) 0f else (sums(i) / counts(i) / 255.0).toFloat)
      (fmt, w, h, thumb)
    }

  /** Header-parse a BMP/PPM payload to (format, width, height, random-
    * access RGB accessor). The shared decode front of the thumbnail and
    * resize paths; all bounds/hostile-header guards live here.
    */
  private[operators] def decodeRgb(
      bytes: Array[Byte]): Option[(String, Int, Int, (Int, Int) => (Int, Int, Int))] = {

    def u16le(o: Int): Int =
      (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def i32le(o: Int): Int =
      (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)

    if (bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M') {
      val dataOff = i32le(10)
      val w = i32le(18)
      val hRaw = i32le(22)
      val bpp = u16le(28)
      val compression = i32le(30)
      // hostile headers: w near Int.MaxValue overflows the stride math and
      // hRaw == Int.MinValue survives math.abs — do the geometry in Long
      // so malformed payloads fall back to opaque instead of crashing
      if (w <= 0 || hRaw == 0 || hRaw == Int.MinValue ||
        bpp != 24 || compression != 0) return None
      val h = math.abs(hRaw)
      val topDown = hRaw < 0
      val rowStrideL = ((w.toLong * 3 + 3) / 4) * 4
      if (dataOff < 54 || dataOff.toLong + rowStrideL * h > bytes.length)
        return None
      val rowStride = rowStrideL.toInt
      Some(("bmp", w, h, (x: Int, y: Int) => {
        // BMP stores rows bottom-up unless height is negative; pixels BGR
        val srcRow = if (topDown) y else h - 1 - y
        val o = dataOff + srcRow * rowStride + x * 3
        ((bytes(o + 2) & 0xff), (bytes(o + 1) & 0xff), (bytes(o) & 0xff))
      }))
    } else if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') {
      // header: "P6" ws width ws height ws maxval single-ws, then binary RGB
      var p = 2
      def skipWsAndComments(): Unit = {
        var go = true
        while (go && p < bytes.length) {
          val c = bytes(p)
          if (c == ' ' || c == '\t' || c == '\n' || c == '\r') p += 1
          else if (c == '#') { while (p < bytes.length && bytes(p) != '\n') p += 1 }
          else go = false
        }
      }
      def readInt(): Int = {
        skipWsAndComments()
        var v = 0L
        var any = false
        while (p < bytes.length && bytes(p) >= '0' && bytes(p) <= '9') {
          v = v * 10 + (bytes(p) - '0')
          if (v > 1000000000L) return -1 // hostile header, reject
          any = true
          p += 1
        }
        if (any) v.toInt else -1
      }
      val w = readInt()
      val h = readInt()
      val maxval = readInt()
      if (w <= 0 || h <= 0 || maxval != 255 || p >= bytes.length) return None
      p += 1 // exactly one whitespace byte separates header and raster
      val dataOff = p
      if (dataOff.toLong + 3L * w * h > bytes.length) return None
      Some(("ppm", w, h, (x: Int, y: Int) => {
        val o = dataOff + (y * w + x) * 3
        ((bytes(o) & 0xff), (bytes(o + 1) & 0xff), (bytes(o + 2) & 0xff))
      }))
    } else None
  }

  /** Encode a raster as a standard bottom-up 24bpp BI_RGB BMP (the
    * mirror of the [[decodeRgb]] BMP arm, 4-byte row padding).
    */
  private[operators] def encodeBmp(
      w: Int, h: Int, rgbAt: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val rowStride = ((w * 3 + 3) / 4) * 4
    val size = 54 + rowStride * h
    val b = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(rowStride * h).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    var y = h - 1 // bottom-up rows
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val (r, g, bl) = rgbAt(x, y)
        b.put(bl.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var pad = rowStride - w * 3
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      y -= 1
    }
    b.array()
  }

  /** Area-average box resample to (outW, outH): output pixel (gx, gy)
    * averages the input box `[gx*w/outW, (gx+1)*w/outW)` (floor
    * division per channel — deterministic integer arithmetic, no
    * float accumulation). Upsampling degenerates each box to one pixel
    * (nearest). Returns the materialized output raster as an accessor.
    */
  private[operators] def resizeBox(
      w: Int, h: Int, rgbAt: (Int, Int) => (Int, Int, Int),
      outW: Int, outH: Int): (Int, Int) => (Int, Int, Int) = {
    val out = new Array[Int](outW * outH * 3)
    var gy = 0
    while (gy < outH) {
      val y0 = (gy.toLong * h / outH).toInt
      val y1 = math.max(((gy + 1).toLong * h / outH).toInt, y0 + 1)
      var gx = 0
      while (gx < outW) {
        val x0 = (gx.toLong * w / outW).toInt
        val x1 = math.max(((gx + 1).toLong * w / outW).toInt, x0 + 1)
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val (r, g, b) = rgbAt(x, y)
            sr += r; sg += g; sb += b
            x += 1
          }
          y += 1
        }
        val n = (x1 - x0).toLong * (y1 - y0)
        val o = (gy * outW + gx) * 3
        out(o) = (sr / n).toInt
        out(o + 1) = (sg / n).toInt
        out(o + 2) = (sb / n).toInt
        gx += 1
      }
      gy += 1
    }
    (x: Int, y: Int) => {
      val o = (y * outW + x) * 3
      (out(o), out(o + 1), out(o + 2))
    }
  }

  private val resizeSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("format",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("in_w",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("in_h",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("out_w",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("out_h",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("n_out_bytes",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("mean_r",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("mean_g",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("mean_b",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("out_payload",
      org.apache.spark.sql.types.BinaryType, nullable = false)))

  /** Image resize stage: decode every recognized image payload
    * (BMP/PPM), area-average resample to (outW, outH), re-encode as
    * BMP, and report geometry plus the floor-mean output RGB (exact
    * integer arithmetic — oracle-able). Non-image and malformed
    * payloads are dropped: resize is an image stage, and the decode
    * guards in [[decodeRgb]] decide membership. Pure `mapPartitions`
    * over opaque bytes — embarrassingly map-side at any scale, the
    * same batch shape a codec-library resize would use.
    */
  def resizeImages(
      withPayloadDf: DataFrame, outW: Int, outH: Int): DataFrame = {
    require(outW >= 1 && outH >= 1, "output dims must be >= 1")
    val spark = withPayloadDf.sparkSession
    val rdd = withPayloadDf.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val decoded =
          try decodeRgb(bytes)
          catch { case _: Exception => None }
        decoded.map { case (fmt, w, h, rgbAt) =>
          val resized = resizeBox(w, h, rgbAt, outW, outH)
          val payload = encodeBmp(outW, outH, resized)
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < outH) {
            var x = 0
            while (x < outW) {
              val (rr, gg, bb) = resized(x, y)
              sr += rr; sg += gg; sb += bb
              x += 1
            }
            y += 1
          }
          val n = outW.toLong * outH
          Row(id, fmt, w, h, outW, outH, payload.length,
            (sr / n).toInt, (sg / n).toInt, (sb / n).toInt, payload)
        }
      }
    }
    spark.createDataFrame(rdd, resizeSchema)
  }

  /** Decode a PCM WAV payload to (sampleRate, nSamples, 16-window RMS
    * energy envelope normalized to [0,1]). RIFF/WAVE with a PCM
    * (format 1) fmt chunk and 16-bit samples — parsed straight from
    * bytes, no audio libraries. Returns None for anything else.
    */
  private[operators] def decodeAudio(
      bytes: Array[Byte]): Option[(Int, Int, Array[Float])] =
    decodePcm(bytes).map { case (sampleRate, nFrames, sampleAt) =>
      val sums = new Array[Double](16)
      val counts = new Array[Long](16)
      var f = 0
      while (f < nFrames) {
        val w = (f.toLong * 16 / nFrames).toInt
        val v = sampleAt(f) / 32768.0
        sums(w) += v * v
        counts(w) += 1
        f += 1
      }
      val env = Array.tabulate(16)(i =>
        if (counts(i) == 0) 0f else math.sqrt(sums(i) / counts(i)).toFloat)
      (sampleRate, nFrames, env)
    }

  /** Header-parse a PCM WAV payload to (sampleRate, nFrames, random-
    * access first-channel sample accessor). The shared decode front of
    * the envelope and resample paths; all bounds/hostile-header guards
    * live here.
    */
  private[operators] def decodePcm(
      bytes: Array[Byte]): Option[(Int, Int, Int => Short)] = {
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def i32(o: Int): Int =
      (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    def tag(o: Int, s: String): Boolean =
      o + 4 <= bytes.length && (0 until 4).forall(i => bytes(o + i) == s.charAt(i))
    if (bytes.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var p = 12
    var sampleRate = -1
    var channels = -1
    var bits = -1
    var dataOff = -1
    var dataLen = -1
    while (p + 8 <= bytes.length && (dataOff < 0 || sampleRate < 0)) {
      val size = i32(p + 4)
      // bounds in Long: a hostile size near Int.MaxValue would wrap the
      // Int sum negative and bypass the rejection
      if (size < 0 || p.toLong + 8L + size > bytes.length) return None
      if (tag(p, "fmt ")) {
        if (size < 16) return None
        if (u16(p + 8) != 1) return None // PCM only
        channels = u16(p + 10)
        sampleRate = i32(p + 12)
        bits = u16(p + 22)
      } else if (tag(p, "data")) {
        dataOff = p + 8
        dataLen = size
      }
      p += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (sampleRate <= 0 || channels <= 0 || bits != 16 ||
      dataOff < 0 || dataLen < 2) return None
    val frameBytes = 2 * channels
    val nFrames = dataLen / frameBytes
    if (nFrames == 0) return None
    val off = dataOff
    val fb = frameBytes
    Some((sampleRate, nFrames, (f: Int) => {
      val o = off + f * fb // first channel only
      ((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort
    }))
  }

  /** Encode mono 16-bit PCM samples as a standard 44-byte-header WAV
    * (the mirror of the [[decodePcm]] guards).
    */
  private[operators] def encodeWav(
      rate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = 2 * samples.length
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1).putShort(1)
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => b.putShort(s))
    b.array()
  }

  private val resampleSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("doc_id",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("in_rate",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("out_rate",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("in_samples",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("out_samples",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("mean_abs",
      org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("out_payload",
      org.apache.spark.sql.types.BinaryType, nullable = false)))

  /** Audio resample stage: decode every recognized PCM WAV payload,
    * decimate by block-averaging `factor` consecutive samples (integer
    * arithmetic, truncation toward zero — the JVM's semantics,
    * spec-pinned), re-encode as mono 16-bit WAV at `rate / factor`. A
    * shorter final block averages its own length (the tail is data).
    * Non-audio payloads are dropped. Pure `mapPartitions` — the audio
    * twin of [[resizeImages]].
    */
  def resampleAudio(
      withPayloadDf: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, "factor must be >= 1")
    val spark = withPayloadDf.sparkSession
    val rdd = withPayloadDf.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val decoded =
          try decodePcm(bytes)
          catch { case _: Exception => None }
        decoded.map { case (rate, n, sampleAt) =>
          val outN = (n + factor - 1) / factor
          val out = new Array[Short](outN)
          var i = 0
          while (i < outN) {
            val s0 = i * factor
            val s1 = math.min(s0 + factor, n)
            var sum = 0L
            var s = s0
            while (s < s1) { sum += sampleAt(s); s += 1 }
            out(i) = (sum / (s1 - s0)).toShort
            i += 1
          }
          var absSum = 0L
          out.foreach(s => absSum += math.abs(s.toLong))
          Row(id, rate, rate / factor, n, outN, absSum / outN,
            encodeWav(rate / factor, out))
        }
      }
    }
    spark.createDataFrame(rdd, resampleSchema)
  }

  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    // 4x4 average-luma thumbnail of the sampled frame, row-major
    StructField("thumb", ArrayType(FloatType, containsNull = false))))

  /** Decode a Y4M (YUV4MPEG2) payload and sample every `stride`-th frame
    * (up to `maxFrames`), producing (width, height, totalFrames,
    * sampled (frameIdx, 4x4 average-luma thumb)). Y4M is the plain
    * uncompressed video interchange format of the ffmpeg/mjpegtools
    * world: a text header `YUV4MPEG2 W.. H.. F..` then `FRAME\n` +
    * raw planes per frame — parseable with zero codec dependencies.
    * 4:2:0 chroma (C420*) and 4:4:4 (C444) are supported; the thumb
    * reads only the Y plane (luma IS the Y byte). Returns None for
    * non-Y4M or malformed payloads; geometry math is in Long so hostile
    * headers degrade to None, never a crash.
    */
  private[operators] def decodeY4mFrames(
      bytes: Array[Byte],
      stride: Int,
      maxFrames: Int): Option[(Int, Int, Int, Seq[(Int, Array[Float])])] = {
    val magic = "YUV4MPEG2"
    if (bytes.length < magic.length ||
      !(0 until magic.length).forall(i => bytes(i) == magic.charAt(i)))
      return None
    // header line: space-separated parameter tags, terminated by \n
    var p = magic.length
    var w = -1
    var h = -1
    var chroma = "420"
    while (p < bytes.length && bytes(p) != '\n') {
      if (bytes(p) == ' ') {
        p += 1
        if (p < bytes.length) {
          val tag = bytes(p).toChar
          val start = p + 1
          var e = start
          while (e < bytes.length && bytes(e) != ' ' && bytes(e) != '\n') e += 1
          val v = new String(bytes, start, e - start, "US-ASCII")
          tag match {
            case 'W' => w = v.toIntOption.getOrElse(-1)
            case 'H' => h = v.toIntOption.getOrElse(-1)
            case 'C' => chroma = v
            case _ => () // F (rate), I (interlace), A (aspect), X (ext) — ignored
          }
          p = e
        }
      } else p += 1
    }
    if (p >= bytes.length) return None
    p += 1 // consume the header newline
    if (w <= 0 || h <= 0 || w > (1 << 20) || h > (1 << 20)) return None
    val ySize = w.toLong * h
    val frameSize: Long =
      if (chroma.startsWith("420")) {
        if (w % 2 != 0 || h % 2 != 0) return None
        ySize + 2L * ((w / 2).toLong * (h / 2))
      } else if (chroma == "444") 3L * ySize
      else return None // 422/mono/etc: not needed, reject loudly via None
    if (frameSize > Int.MaxValue) return None

    def lumaThumbAt(yOff: Long): Array[Float] = {
      val sums = new Array[Double](16)
      val counts = new Array[Long](16)
      var y = 0
      while (y < h) {
        val gy = (y.toLong * 4 / h).toInt
        var x = 0
        while (x < w) {
          val gx = (x.toLong * 4 / w).toInt
          val c = gy * 4 + gx
          sums(c) += bytes((yOff + y.toLong * w + x).toInt) & 0xff
          counts(c) += 1
          x += 1
        }
        y += 1
      }
      Array.tabulate(16)(i =>
        if (counts(i) == 0) 0f else (sums(i) / counts(i) / 255.0).toFloat)
    }

    val frameTag = "FRAME"
    val sampled = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Float])]
    var idx = 0
    while (p < bytes.length) {
      if (p + frameTag.length > bytes.length ||
        !(0 until frameTag.length).forall(i => bytes(p + i) == frameTag.charAt(i)))
        return None // trailing garbage: treat the whole payload as malformed
      p += frameTag.length
      while (p < bytes.length && bytes(p) != '\n') p += 1 // frame params
      if (p >= bytes.length) return None
      p += 1
      if (p.toLong + frameSize > bytes.length) return None // truncated frame
      if (idx % stride == 0 && sampled.length < maxFrames)
        sampled += ((idx, lumaThumbAt(p)))
      p += frameSize.toInt
      idx += 1
    }
    Some((w, h, idx, sampled.toSeq))
  }

  /** Frame sampling over video payloads: every `stride`-th frame (capped
    * at `maxFrames` per document) becomes a row with the frame's 4x4
    * average-luma thumbnail — the "sample frames for captioning /
    * embedding" pass of a video training pipeline. Input needs
    * (doc_id, payload); undecodable payloads contribute zero rows
    * (filter-on-decode, the streaming-friendly contract — join back
    * against the corpus to find them). Same `mapPartitions` batch shape
    * as [[decodeFeatures]]: decoder init amortizes per partition, and
    * the payload column never shuffles — sampling is map-side at any
    * scale.
    */
  def frameSamples(
      withPayloadDf: DataFrame,
      stride: Int = 2,
      maxFrames: Int = 16,
      targetPartitions: Int = 0): DataFrame = {
    require(stride >= 1 && maxFrames >= 1, "stride/maxFrames must be >= 1")
    val spark = withPayloadDf.sparkSession
    val repartitioned =
      if (targetPartitions > 0) withPayloadDf.repartition(targetPartitions)
      else withPayloadDf
    val rdd = repartitioned.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val decoded =
          try decodeY4mFrames(bytes, stride, maxFrames)
          catch { case _: Exception => None }
        decoded match {
          case Some((w, h, n, frames)) =>
            frames.map { case (idx, thumb) => Row(id, idx, w, h, n, thumb.toSeq) }
          case None => Nil
        }
      }
    }
    spark.createDataFrame(rdd, frameSchema)
  }

  /** Scene-cut detection over video payloads: decode every frame's 4x4
    * luma thumbnail ([[frameSamples]] stride=1), then flag frame f as a
    * cut when the mean absolute per-cell luma change from frame f-1
    * crosses `threshold` — the shot-boundary pass a video training
    * pipeline runs before captioning/sampling per shot. The frame diff
    * is a doc-keyed window (bounded by `maxFrames` per document, the
    * p61 discipline — never a global funnel), and the per-document
    * report is one partial-aggregable groupBy. The decode itself stays
    * map-side: payloads never shuffle; only (doc_id, frame_idx, thumb)
    * rows — 16 floats each — reach the window.
    */
  def sceneCutReport(
      videos: DataFrame,
      threshold: Double = 0.5,
      maxFrames: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frames = frameSamples(videos, stride = 1, maxFrames = maxFrames)
    val w = Window.partitionBy("doc_id").orderBy("frame_idx")
    val prev = lag(col("thumb"), 1).over(w)
    val l1 = aggregate(
      zip_with(col("thumb"), prev, (a, b) => abs(a - b).cast("double")),
      lit(0.0d), (acc, v) => acc + v) / lit(16.0d)
    val cut = prev.isNotNull && l1 >= lit(threshold)
    frames
      .select(col("doc_id"), col("frame_idx"), cut.as("is_cut"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(col("is_cut").cast("long")).as("n_cuts"),
        concat_ws(",",
          transform(
            sort_array(collect_list(when(col("is_cut"), col("frame_idx")))),
            _.cast("string")))
          .as("cut_frames"))
  }

  /** Deterministic synthetic Y4M clip (8x8, C420, constant-luma frames):
    * frame f of doc d has every Y byte equal to (d*7 + f*13) mod 256.
    * Exists so frame-sampling can be ORACLE-checked end-to-end — the
    * decoded thumbnail of an analytically-known payload is itself
    * analytically known, so a SQL engine with no video decoder can
    * still verify the full parse-sample-decode path.
    */
  def syntheticY4m(docId: Long, nFrames: Int): Array[Byte] = {
    val w = 8
    val h = 8
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n".getBytes("US-ASCII")
    val frameHdr = "FRAME\n".getBytes("US-ASCII")
    val frameSize = w * h + 2 * (w / 2) * (h / 2)
    val out = new Array[Byte](header.length + nFrames * (frameHdr.length + frameSize))
    System.arraycopy(header, 0, out, 0, header.length)
    var p = header.length
    var f = 0
    while (f < nFrames) {
      System.arraycopy(frameHdr, 0, out, p, frameHdr.length)
      p += frameHdr.length
      val v = (math.floorMod(docId * 7 + f * 13, 256)).toByte
      java.util.Arrays.fill(out, p, p + w * h, v)
      p += w * h
      java.util.Arrays.fill(out, p, p + 2 * (w / 2) * (h / 2), 128.toByte)
      p += 2 * (w / 2) * (h / 2)
      f += 1
    }
    out
  }

  /** Deterministic synthetic payloads with CLOSED-FORM features, one of
    * the three real decode formats per doc (docId mod 3): a 4x4 grey
    * BMP, a 4x4 grey PPM, and a 16-sample constant PCM WAV. Geometry is
    * chosen so every thumbnail cell holds exactly ONE pixel/sample —
    * the decoded feature is then a single textually-replicable IEEE
    * expression ((0.299v + 0.587v + 0.114v)/255 for images,
    * sqrt((s/32768)^2) for audio), so a SQL engine with no decoder
    * verifies the full byte-parse -> decode -> feature path
    * bit-for-bit (the p30 Y4M pattern, extended to all three formats).
    */
  def syntheticPayload(docId: Long): Array[Byte] = (docId % 3) match {
    case 0 => syntheticBmp((docId % 256).toInt)
    case 1 => syntheticPpm(((docId * 31) % 256).toInt)
    case _ => syntheticWav((8000 + (docId % 8) * 1000).toInt,
      (((docId % 200) - 100) * 327).toShort, 16)
  }

  /** 4x4 24bpp bottom-up BMP, every pixel grey `v` (0..255). */
  private[operators] def syntheticBmp(v: Int): Array[Byte] = {
    val w = 4
    val h = 4
    val rowStride = ((w * 3 + 3) / 4) * 4
    val size = 54 + rowStride * h
    val b = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(rowStride * h).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    for (_ <- 0 until h) {
      for (_ <- 0 until w * 3) b.put(v.toByte)
      for (_ <- 0 until rowStride - w * 3) b.put(0.toByte)
    }
    b.array()
  }

  /** 4x4 binary PPM (P6, maxval 255), every pixel grey `v`. */
  private[operators] def syntheticPpm(v: Int): Array[Byte] =
    "P6\n4 4\n255\n".getBytes("US-ASCII") ++ Array.fill(3 * 16)(v.toByte)

  /** Deterministic patterned 9x8 grey BMP: pixel (x, y) — row-major
    * from the top-left — has grey level (seed*31 + x*7 + y*13) mod 256.
    * Exists so perceptual-hash image dedup can be oracle-checked
    * end-to-end: the dHash of an analytically-known raster is itself
    * closed-form, so a SQL engine with no image decoder replays the
    * full byte-parse -> grid -> hash path.
    */
  def syntheticBmpPattern(seed: Long): Array[Byte] =
    syntheticBmpPattern(seed, -1, -1, 0)

  /** [[syntheticBmpPattern]] with one cell (bumpX, bumpY) brightened by
    * `bump` (mod 256) — the analytically-known near-duplicate: at most
    * the two dHash comparisons touching that cell can flip, so the
    * perturbed raster sits within hamming 2 of its base. */
  def syntheticBmpPattern(seed: Long, bumpX: Int, bumpY: Int,
      bump: Int): Array[Byte] =
    encodeBmp(9, 8, (x, y) => {
      val base = seed * 31 + x * 7 + y * 13
      val v = math.floorMod(
        if (x == bumpX && y == bumpY) base + bump else base, 256).toInt
      (v, v, v)
    })

  private val dHashSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("dhash", StringType, nullable = false)))

  /** Perceptual difference hash (dHash) per image: decode (BMP/PPM),
    * area-average to a 9x8 grid ([[resizeBox]] — floor-division integer
    * arithmetic), integer luma per cell (299r + 587g + 114b; a positive
    * scale, so comparisons are division-free and exact), and bit
    * (y, x) = 1 iff cell (x, y) is strictly brighter than its right
    * neighbor. Emitted row-major as a 64-char bit string — portable
    * across engines with no sign/overflow concerns, and groupable like
    * any key. Undecodable payloads are dropped ([[decodeRgb]] decides
    * membership). Pure `mapPartitions` over opaque bytes: map-side at
    * any scale; the downstream dedup is one hash-keyed aggregation.
    */
  def dHash(withPayloadDf: DataFrame): DataFrame = {
    val spark = withPayloadDf.sparkSession
    val rows = withPayloadDf.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val decoded =
          try decodeRgb(bytes)
          catch { case _: Exception => None }
        decoded.map { case (fmt, w, h, rgbAt) =>
          val grid = resizeBox(w, h, rgbAt, 9, 8)
          def luma(x: Int, y: Int): Int = {
            val (r0, g0, b0) = grid(x, y)
            299 * r0 + 587 * g0 + 114 * b0
          }
          val sb = new java.lang.StringBuilder(64)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              sb.append(if (luma(x, y) > luma(x + 1, y)) '1' else '0')
              x += 1
            }
            y += 1
          }
          Row(id, fmt, w, h, sb.toString)
        }
      }
    }
    spark.createDataFrame(rows, dHashSchema)
  }

  /** Patterned mono 16-bit PCM WAV at 8 kHz: `nBlocks` constant-
    * amplitude blocks of `blockLen` samples; block w of seed s has
    * amplitude ((s*37 + w*11) mod 100) * 300. Exists so acoustic-
    * fingerprint dedup can be oracle-checked end-to-end — the
    * fingerprint of an analytically-known envelope is closed-form.
    */
  def syntheticWavPattern(seed: Long, nBlocks: Int = 17,
      blockLen: Int = 64): Array[Byte] =
    encodeWav(8000, Array.tabulate(nBlocks * blockLen)(i =>
      (math.floorMod(seed * 37 + (i / blockLen) * 11, 100) * 300).toShort))

  private val audioFpSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("afp", StringType, nullable = false)))

  /** Acoustic fingerprint: decode PCM ([[decodePcm]] — format guards
    * decide membership), split the frame stream into `nWindows` equal
    * slices `[w*n/W, (w+1)*n/W)`, sum |amplitude| per slice in Long,
    * and emit bit w = 1 iff slice w is strictly louder than slice w+1
    * — compared CROSS-MULTIPLIED (sum_w * len_{w+1} > sum_{w+1} *
    * len_w), so unequal slice lengths stay integer-exact, no float
    * means. The (nWindows-1)-char bit string is the loudness-contour
    * analog of [[dHash]]: deterministic, engine-portable, groupable.
    * Pure `mapPartitions`; downstream dedup is one hash-keyed
    * aggregation.
    */
  def audioFingerprint(withPayloadDf: DataFrame,
      nWindows: Int = 17): DataFrame = {
    require(nWindows >= 2 && nWindows <= 256, "nWindows in [2, 256]")
    val spark = withPayloadDf.sparkSession
    val rows = withPayloadDf.select("doc_id", "payload").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val decoded =
          try decodePcm(bytes)
          catch { case _: Exception => None }
        decoded.map { case (rate, nFrames, sampleAt) =>
          val sums = new Array[Long](nWindows)
          val lens = new Array[Long](nWindows)
          var f = 0
          while (f < nFrames) {
            val w = ((f.toLong * nWindows) / nFrames).toInt
            sums(w) += math.abs(sampleAt(f).toLong)
            lens(w) += 1
            f += 1
          }
          val sb = new java.lang.StringBuilder(nWindows - 1)
          var w = 0
          while (w < nWindows - 1) {
            // arbitrary-precision cross-multiply: a |sum| can reach
            // ~32767 * nFrames and a slice length nFrames, so the Long
            // product overflows around hour-long clips — BigInt keeps
            // the exactness claim true at any payload size
            val louder = lens(w) > 0 && lens(w + 1) > 0 &&
              BigInt(sums(w)) * lens(w + 1) > BigInt(sums(w + 1)) * lens(w)
            sb.append(if (louder) '1' else '0')
            w += 1
          }
          Row(id, rate, nFrames, sb.toString)
        }
      }
    }
    spark.createDataFrame(rows, audioFpSchema)
  }

  /** Mono 16-bit PCM WAV: `n` samples of constant amplitude `s`. */
  private[operators] def syntheticWav(rate: Int, s: Short, n: Int): Array[Byte] = {
    val dataLen = 2 * n
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1).putShort(1)
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    for (_ <- 0 until n) b.putShort(s)
    b.array()
  }

  /** Feature extraction over payload batches. Recognized image formats
    * (BMP/PPM) are truly decoded — real dimensions, real pixel-average
    * thumbnail; anything else gets a deterministic opaque fingerprint:
    * FNV-1a content hash and a 16-float byte-sampled pseudo-thumbnail,
    * so downstream schema/partitioning logic is exercised identically.
    */
  def decodeFeatures(withPayloadDf: DataFrame, targetPartitions: Int = 0): DataFrame = {
    val spark = withPayloadDf.sparkSession
    val repartitioned =
      if (targetPartitions > 0) withPayloadDf.repartition(targetPartitions)
      else withPayloadDf
    val rdd = repartitioned.select("doc_id", "payload").rdd.mapPartitions { it =>
      // per-partition init would go here (codec handles, model weights)
      it.map { r =>
        val id = r.getLong(0)
        // totality: a NULL payload (e.g. encoded from a NULL text) is an
        // empty opaque payload, never an NPE outside the guards below
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        var h = 0xcbf29ce484222325L
        var i = 0
        while (i < bytes.length) {
          h ^= bytes(i) & 0xffL
          h *= 0x100000001b3L
          i += 1
        }
        // totality backstop: a malformed payload that slips past the
        // header guards degrades to the opaque fingerprint, never a
        // task failure
        val decoded =
          try decodeImage(bytes)
          catch { case _: Exception => None }
        decoded match {
          case Some((fmt, w, ht, thumb)) =>
            Row(id, bytes.length, h, fmt, w, ht, null, thumb.toSeq)
          case None =>
            val audio =
              try decodeAudio(bytes)
              catch { case _: Exception => None }
            audio match {
              case Some((rate, _, env)) =>
                Row(id, bytes.length, h, "wav", null, null, rate, env.toSeq)
              case None =>
                val thumb = new Array[Float](16)
                if (bytes.length > 0) { // empty payload keeps an all-zero thumb
                  var t = 0
                  while (t < 16) {
                    // long arithmetic: t * length overflows Int at ~137 MB
                    val idx = math.min((t.toLong * bytes.length / 16).toInt,
                      bytes.length - 1)
                    thumb(t) = (bytes(idx) & 0xff) / 255.0f
                    t += 1
                  }
                }
                Row(id, bytes.length, h, "opaque", null, null, null, thumb.toSeq)
            }
        }
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }
}
