package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Real-decode gates for the multimodal operator: hand-built BMP and PPM
  * byte images (no codec libraries involved on either side) must come
  * back with true dimensions and correct 4x4 average-luma thumbnails,
  * including BMP's bottom-up row order and row padding.
  */
class MultimodalDecodeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** 24bpp BI_RGB BMP. `pix(x, y)` returns (r, g, b) with y = 0 at the
    * TOP of the image; rows are written bottom-up unless `topDown`.
    */
  private def bmp(w: Int, h: Int, topDown: Boolean = false)(
      pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val size = 54 + stride * h
    val out = new Array[Byte](size)
    def i32(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte
      out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte
      out(o + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    i32(2, size); i32(10, 54); i32(14, 40)
    i32(18, w); i32(22, if (topDown) -h else h)
    out(26) = 1 // planes
    out(28) = 24 // bpp
    i32(30, 0) // BI_RGB
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pix(x, y)
      val storedRow = if (topDown) y else h - 1 - y
      val o = 54 + storedRow * stride + x * 3
      out(o) = b.toByte; out(o + 1) = g.toByte; out(o + 2) = r.toByte
    }
    out
  }

  private def ppm(w: Int, h: Int, comment: Boolean = false)(
      pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val hdr = if (comment) s"P6\n# synthetic fixture\n$w $h\n255\n"
              else s"P6\n$w $h\n255\n"
    bos.write(hdr.getBytes(StandardCharsets.US_ASCII))
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = pix(x, y)
      bos.write(r); bos.write(g); bos.write(b)
    }
    bos.toByteArray
  }

  test("BMP: dimensions, padding, and all-white thumbnail") {
    // w=6 forces 2 bytes of row padding (18 -> 20)
    val got = Multimodal.decodeImage(bmp(6, 4)((_, _) => (255, 255, 255)))
    val (fmt, w, h, thumb) = got.get
    assert(fmt == "bmp" && w == 6 && h == 4)
    thumb.foreach(v => assert(math.abs(v - 1.0f) < 1e-3, s"luma $v"))
  }

  test("BMP: left-black right-white splits thumbnail columns") {
    val img = bmp(8, 8)((x, _) => if (x < 4) (0, 0, 0) else (255, 255, 255))
    val (_, _, _, thumb) = Multimodal.decodeImage(img).get
    for (gy <- 0 until 4; gx <- 0 until 4) {
      val v = thumb(gy * 4 + gx)
      if (gx < 2) assert(v < 0.01, s"cell ($gy,$gx)=$v should be black")
      else assert(v > 0.99, s"cell ($gy,$gx)=$v should be white")
    }
  }

  test("BMP: bottom-up and top-down storage give the same image") {
    def pix(x: Int, y: Int) = if (y < 4) (255, 255, 255) else (0, 0, 0)
    val up = Multimodal.decodeImage(bmp(8, 8)(pix)).get._4
    val down = Multimodal.decodeImage(bmp(8, 8, topDown = true)(pix)).get._4
    assert(up.toSeq == down.toSeq)
    // top half (thumbnail rows 0-1) white, bottom half black
    for (gy <- 0 until 4; gx <- 0 until 4) {
      val v = up(gy * 4 + gx)
      if (gy < 2) assert(v > 0.99, s"cell ($gy,$gx)=$v") else assert(v < 0.01, s"cell ($gy,$gx)=$v")
    }
  }

  test("PPM: P6 with comment header decodes true dims and luma") {
    val img = ppm(5, 3, comment = true)((_, y) =>
      if (y == 0) (255, 0, 0) else (0, 0, 0)) // top row pure red
    val (fmt, w, h, thumb) = Multimodal.decodeImage(img).get
    assert(fmt == "ppm" && w == 5 && h == 3)
    // red luma = 0.299
    assert(math.abs(thumb(0) - 0.299f) < 1e-3)
    assert(thumb(15) < 0.01)
  }

  /** PCM16 mono WAV from a per-frame sample function. */
  private def wav(rate: Int, nFrames: Int)(sample: Int => Short): Array[Byte] = {
    val dataLen = nFrames * 2
    val out = new Array[Byte](44 + dataLen)
    def put(o: Int, s: String): Unit =
      (0 until s.length).foreach(i => out(o + i) = s.charAt(i).toByte)
    def i32(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte; out(o + 3) = ((v >> 24) & 0xff).toByte
    }
    def i16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    put(0, "RIFF"); i32(4, 36 + dataLen); put(8, "WAVE")
    put(12, "fmt "); i32(16, 16); i16(20, 1); i16(22, 1)
    i32(24, rate); i32(28, rate * 2); i16(32, 2); i16(34, 16)
    put(36, "data"); i32(40, dataLen)
    for (f <- 0 until nFrames) i16(44 + f * 2, sample(f))
    out
  }

  test("WAV: PCM parse gives true sample rate and RMS envelope") {
    // first half silence, second half a full-scale square wave
    val n = 1600
    val bytes = wav(16000, n)(f =>
      if (f < n / 2) 0 else if (f % 2 == 0) 32767 else -32767)
    val (rate, frames, env) = Multimodal.decodeAudio(bytes).get
    assert(rate == 16000 && frames == n)
    for (w <- 0 until 8) assert(env(w) < 0.01, s"window $w should be silent")
    for (w <- 8 until 16) assert(env(w) > 0.95, s"window $w should be loud")
  }

  test("WAV flows through decodeFeatures with format and sample_rate") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val bytes = wav(8000, 100)(_ => 1000)
    val df = Seq((1L, bytes)).toDF("doc_id", "payload")
    val row = Multimodal.decodeFeatures(df).collect().head
    assert(row.getAs[String]("format") == "wav")
    assert(row.getAs[Int]("sample_rate") == 8000)
    assert(row.isNullAt(row.fieldIndex("width")))
  }

  test("malformed WAV rejects: non-PCM, truncated data, bad magic") {
    val good = wav(8000, 100)(_ => 0)
    assert(Multimodal.decodeAudio(good).isDefined)
    val nonPcm = good.clone(); nonPcm(20) = 3 // IEEE float format code
    assert(Multimodal.decodeAudio(nonPcm).isEmpty)
    assert(Multimodal.decodeAudio(good.take(50)).isEmpty) // truncated chunk
    val badMagic = good.clone(); badMagic(0) = 'X'
    assert(Multimodal.decodeAudio(badMagic).isEmpty)
  }

  test("malformed and unknown payloads fall back to opaque") {
    assert(Multimodal.decodeImage("hello world".getBytes).isEmpty)
    assert(Multimodal.decodeImage(Array[Byte]('B', 'M', 1, 2)).isEmpty)
    // truncated raster must not decode
    val truncated = ppm(4, 4)((_, _) => (9, 9, 9)).dropRight(10)
    assert(Multimodal.decodeImage(truncated).isEmpty)
  }

  test("hostile headers reject instead of crashing (overflow geometry)") {
    // BMP header whose width overflows Int stride math
    val evil = bmp(6, 4)((_, _) => (0, 0, 0))
    def i32(out: Array[Byte], o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
      out(o + 2) = ((v >> 16) & 0xff).toByte; out(o + 3) = ((v >> 24) & 0xff).toByte
    }
    i32(evil, 18, 800000000) // width
    assert(Multimodal.decodeImage(evil).isEmpty)
    i32(evil, 18, 6)
    i32(evil, 22, Int.MinValue) // height: abs() stays negative
    assert(Multimodal.decodeImage(evil).isEmpty)
    // PPM with an absurd ASCII dimension
    val evilPpm = ("P6\n99999999999 2\n255\n" + "x" * 64).getBytes("US-ASCII")
    assert(Multimodal.decodeImage(evilPpm).isEmpty)
  }

  test("empty payload degrades to an all-zero opaque thumb, no crash") {
    import spark.implicits._
    val df = Seq((1L, Array.empty[Byte])).toDF("doc_id", "payload")
    val row = Multimodal.decodeFeatures(df).collect().head
    assert(row.getAs[String]("format") == "opaque")
    assert(row.getAs[Int]("n_bytes") == 0)
    assert(row.getAs[scala.collection.Seq[Float]]("thumb").forall(_ == 0f))
  }

  test("decodeFeatures routes image payloads to the real decoder end-to-end") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val img = bmp(8, 8)((x, _) => if (x < 4) (0, 0, 0) else (255, 255, 255))
    val df = Seq(
      (1L, img, "image/bmp"),
      (2L, "just text".getBytes("UTF-8"), "text/plain"))
      .toDF("doc_id", "payload", "mime")
    val feats = Multimodal.decodeFeatures(df).orderBy(col("doc_id")).collect()
    val bmpRow = feats(0)
    assert(bmpRow.getAs[String]("format") == "bmp")
    assert(bmpRow.getAs[Int]("width") == 8 && bmpRow.getAs[Int]("height") == 8)
    val opaque = feats(1)
    assert(opaque.getAs[String]("format") == "opaque")
    assert(opaque.isNullAt(opaque.fieldIndex("width")))
    assert(opaque.getAs[Long]("content_hash") != 0L)
  }

  /** Hand-built Y4M with per-pixel control: `pix(f, x, y)` is the Y byte. */
  private def y4m(w: Int, h: Int, nFrames: Int, chroma: String = "C420",
      params: String = " F25:1 Ip A1:1")(pix: (Int, Int, Int) => Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(s"YUV4MPEG2 W$w H$h$params $chroma\n".getBytes(StandardCharsets.US_ASCII))
    val chromaSize = if (chroma == "C444") 2 * w * h else 2 * (w / 2) * (h / 2)
    for (f <- 0 until nFrames) {
      bos.write("FRAME\n".getBytes(StandardCharsets.US_ASCII))
      for (y <- 0 until h; x <- 0 until w) bos.write(pix(f, x, y) & 0xff)
      for (_ <- 0 until chromaSize) bos.write(128)
    }
    bos.toByteArray
  }

  test("Y4M: frame count, stride sampling, and real luma averaging") {
    // 4 frames; frame f is left-dark right-bright so the thumb splits
    val clip = y4m(8, 8, 4)((f, x, _) => if (x < 4) f * 10 else 200 + f)
    val got = Multimodal.decodeY4mFrames(clip, stride = 2, maxFrames = 16).get
    val (w, h, n, frames) = got
    assert((w, h, n) == (8, 8, 4))
    assert(frames.map(_._1) == Seq(0, 2))
    val t0 = frames.head._2
    // row-major 4x4: columns 0-1 dark (f=0 -> 0), columns 2-3 bright (200)
    assert(t0(0) == 0f && t0(1) == 0f)
    assert(math.abs(t0(2) - 200f / 255f) < 1e-6 && math.abs(t0(3) - 200f / 255f) < 1e-6)
    val t2 = frames(1)._2
    assert(math.abs(t2(0) - 20f / 255f) < 1e-6)
  }

  test("Y4M: maxFrames caps, C444 supported, unknown chroma rejected") {
    val clip = y4m(4, 4, 6)((f, _, _) => f)
    val sampled = Multimodal.decodeY4mFrames(clip, stride = 1, maxFrames = 3).get._4
    assert(sampled.map(_._1) == Seq(0, 1, 2))
    val c444 = y4m(4, 4, 2, chroma = "C444")((f, _, _) => 100 + f)
    val got444 = Multimodal.decodeY4mFrames(c444, 1, 16).get
    assert(got444._3 == 2 && math.abs(got444._4.head._2(0) - 100f / 255f) < 1e-6)
    val mono = y4m(4, 4, 1, chroma = "Cmono")((_, _, _) => 7)
    assert(Multimodal.decodeY4mFrames(mono, 1, 16).isEmpty)
  }

  test("Y4M: truncated frame, odd 4:2:0 dims, and non-Y4M payloads reject") {
    val clip = y4m(4, 4, 2)((_, _, _) => 50)
    val truncated = clip.dropRight(5)
    assert(Multimodal.decodeY4mFrames(truncated, 1, 16).isEmpty)
    val odd = y4m(3, 4, 1)((_, _, _) => 50) // 3 wide cannot be 4:2:0
    assert(Multimodal.decodeY4mFrames(odd, 1, 16).isEmpty)
    assert(Multimodal.decodeY4mFrames("not video".getBytes("UTF-8"), 1, 16).isEmpty)
    assert(Multimodal.decodeY4mFrames(Array.empty[Byte], 1, 16).isEmpty)
  }

  test("frameSamples: map-side rows per sampled frame; undecodable yields none") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, Multimodal.syntheticY4m(1L, 5)),
      (2L, "opaque bytes".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val rows = Multimodal.frameSamples(df, stride = 2, maxFrames = 16)
      .orderBy(col("doc_id"), col("frame_idx")).collect()
    assert(rows.forall(_.getLong(0) == 1L))
    assert(rows.map(_.getInt(1)).toSeq == Seq(0, 2, 4))
    assert(rows.forall(r => r.getInt(2) == 8 && r.getInt(3) == 8 && r.getInt(4) == 5))
    // constant-luma synthetic: frame f of doc d is ((7d + 13f) mod 256)/255
    val luma0 = rows(0).getAs[scala.collection.Seq[Float]]("thumb").head
    assert(math.abs(luma0 - 7f / 255f) < 1e-6)
  }

  test("syntheticPayload decodes to its closed-form features (p14 oracle)") {
    // doc 0 -> BMP grey 0; doc 3 -> BMP grey 3; doc 1 -> PPM grey 31;
    // doc 2 -> WAV amplitude (2%200-100)*327 = -32046 at 10000 Hz
    val bmp = Multimodal.decodeImage(Multimodal.syntheticPayload(3L)).get
    assert(bmp._1 == "bmp" && bmp._2 == 4 && bmp._3 == 4)
    val expLuma = ((0.299 * 3 + 0.587 * 3 + 0.114 * 3) / 255.0).toFloat
    assert(bmp._4.forall(_ == expLuma), bmp._4.toSeq)
    assert(Multimodal.syntheticPayload(3L).length == 102)

    val ppm = Multimodal.decodeImage(Multimodal.syntheticPayload(1L)).get
    assert(ppm._1 == "ppm" && ppm._2 == 4 && ppm._3 == 4)
    val expLumaP = ((0.299 * 31 + 0.587 * 31 + 0.114 * 31) / 255.0).toFloat
    assert(ppm._4.forall(_ == expLumaP), ppm._4.toSeq)
    assert(Multimodal.syntheticPayload(1L).length == 59)

    val wav = Multimodal.decodeAudio(Multimodal.syntheticPayload(2L)).get
    assert(wav._1 == 10000 && wav._2 == 16)
    val v = -32046.0 / 32768.0
    val expRms = math.sqrt(v * v).toFloat
    assert(wav._3.forall(_ == expRms), wav._3.toSeq)
    assert(Multimodal.syntheticPayload(2L).length == 76)
  }

  test("resizeBox area-averages gradients with exact floor arithmetic") {
    // 2x2 gradient -> 1x1: means are floor((10+50+90+130)/4)=70, 80, 90
    val px2 = Array(
      (10, 20, 30), (50, 60, 70),
      (90, 100, 110), (130, 140, 150))
    val one = Multimodal.resizeBox(2, 2, (x, y) => px2(y * 2 + x), 1, 1)
    assert(one(0, 0) == ((70, 80, 90)))
    // 4x4 with a distinct value per pixel -> 2x2 quadrant means; r value
    // at (x,y) is y*40+x*10 so quadrant means are exact: floor of
    // (0+10+40+50)/4=25, (20+30+60+70)/4=45, (80+90+120+130)/4=105, 125
    val quad = Multimodal.resizeBox(4, 4,
      (x, y) => (y * 40 + x * 10, 0, 0), 2, 2)
    assert(quad(0, 0)._1 == 25 && quad(1, 0)._1 == 45)
    assert(quad(0, 1)._1 == 105 && quad(1, 1)._1 == 125)
    // upsample 1x1 -> 2x2 is nearest: every output pixel is the source
    val up = Multimodal.resizeBox(1, 1, (_, _) => (7, 8, 9), 2, 2)
    assert((0 until 2).forall(y => (0 until 2).forall(x => up(x, y) == ((7, 8, 9)))))
  }

  test("encodeBmp round-trips through decodeRgb pixel-for-pixel") {
    val px = Array(
      (10, 20, 30), (50, 60, 70),
      (90, 100, 110), (130, 140, 150))
    val bytes = Multimodal.encodeBmp(2, 2, (x, y) => px(y * 2 + x))
    val (fmt, w, h, rgbAt) = Multimodal.decodeRgb(bytes).get
    assert(fmt == "bmp" && w == 2 && h == 2)
    for (y <- 0 until 2; x <- 0 until 2)
      assert(rgbAt(x, y) == px(y * 2 + x), s"pixel ($x,$y)")
    assert(bytes.length == 70) // 54 header + 2 rows of stride 8
  }

  test("resampleAudio block-averages ramps with pinned truncation") {
    val spark2 = spark
    import spark2.implicits._
    // ramp 0,10,...,150 at factor 4: block means 15, 55, 95, 135;
    // mean_abs = (15+55+95+135)/4 = 75
    val ramp = Multimodal.encodeWav(8000,
      Array.tabulate(16)(i => (i * 10).toShort))
    // negative ramp -1..-4: one block, sum -10 / 4 = -2 (JVM truncation
    // toward zero, NOT floor(-2.5)=-3) — and a 6-sample input at factor
    // 4 averages its 2-sample tail separately
    val neg = Multimodal.encodeWav(4000,
      Array[Short](-1, -2, -3, -4, 10, 20))
    val df = Seq((1L, ramp), (2L, neg), (3L, Array[Byte](1, 2, 3)))
      .toDF("doc_id", "payload")
    val out = Multimodal.resampleAudio(df, 4).orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    val r1 = out(0)
    assert(r1.getInt(1) == 8000 && r1.getInt(2) == 2000)
    assert(r1.getInt(3) == 16 && r1.getInt(4) == 4 && r1.getLong(5) == 75L)
    val (rate1, n1, at1) = Multimodal.decodePcm(r1.getAs[Array[Byte]](6)).get
    assert(rate1 == 2000 && n1 == 4)
    assert((0 until 4).map(at1(_).toInt) == Seq(15, 55, 95, 135))
    val r2 = out(1)
    assert(r2.getInt(4) == 2)
    val (_, n2, at2) = Multimodal.decodePcm(r2.getAs[Array[Byte]](6)).get
    assert(n2 == 2 && at2(0) == -2 && at2(1) == 15,
      s"truncation toward zero and tail averaging: ${at2(0)}, ${at2(1)}")
  }

  test("resizeImages end-to-end: images resized, non-images dropped") {
    val spark2 = spark
    import spark2.implicits._
    val payloads = Seq(0L, 1L, 2L, 3L).toDF("doc_id").as[Long]
      .mapPartitions(_.map(id => (id, Multimodal.syntheticPayload(id))))
      .toDF("doc_id", "payload")
    val out = Multimodal.resizeImages(payloads, 2, 2)
      .orderBy("doc_id").collect()
    // doc 2 is WAV: dropped; constant-gray sources keep their gray mean
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L, 3L))
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(3L).getString(1) == "bmp" && byId(3L).getInt(7) == 3)
    assert(byId(1L).getString(1) == "ppm" && byId(1L).getInt(7) == 31)
    // the resized payload itself decodes back as a 2x2 BMP
    val rt = Multimodal.decodeRgb(byId(3L).getAs[Array[Byte]](10)).get
    assert(rt._1 == "bmp" && rt._2 == 2 && rt._3 == 2)
    assert(rt._4(0, 0) == ((3, 3, 3)))
  }
}
