package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Multimodal contract: real header/pixel/sample decode for the
  * codec-free formats (bit-exact fixtures), the documented synthetic
  * fallback for codec-bound payloads, explode shape, and per-partition
  * feature extraction over real decoded data.
  */
class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val media = Seq(
    (1L, "image", "some image bytes".getBytes),
    (2L, "video", "a much longer fake video payload 0123456789".getBytes),
    (3L, "audio", Array.empty[Byte]))
    .toDF("media_id", "kind", "bytes")

  private def le2(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
  private def le4(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte,
    (v >>> 16).toByte, (v >>> 24).toByte)

  /** Minimal valid BITMAPINFOHEADER BMP around the given pixel array. */
  private def bmp(width: Int, height: Int, bpp: Int, compression: Int,
      pixelData: Array[Byte]): Array[Byte] =
    "BM".getBytes ++ le4(54 + pixelData.length) ++ le4(0) ++ le4(54) ++
      le4(40) ++ le4(width) ++ le4(height) ++ le2(1) ++ le2(bpp) ++
      le4(compression) ++ le4(pixelData.length) ++ le4(0) ++ le4(0) ++
      le4(0) ++ le4(0) ++ pixelData

  /** Minimal canonical PCM WAV around the given data-chunk bytes. */
  private def wav(channels: Int, rate: Int, bits: Int,
      data: Array[Byte]): Array[Byte] =
    "RIFF".getBytes ++ le4(36 + data.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le4(16) ++ le2(1) ++ le2(channels) ++ le4(rate) ++
      le4(rate * channels * bits / 8) ++ le2(channels * bits / 8) ++
      le2(bits) ++ "data".getBytes ++ le4(data.length) ++ data

  test("decode: synthetic fallback for codec-bound payloads is deterministic and bounded") {
    val d1 = MultimodalOps.decode(media).orderBy("media_id").collect()
    val d2 = MultimodalOps.decode(media).orderBy("media_id").collect()
    def dims(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getAs[Long]("media_id"), r.getAs[Int]("width"),
        r.getAs[Int]("height"), r.getAs[Int]("channels"))).toSeq
    assert(dims(d1) == dims(d2)) // same bytes → same decode
    d1.foreach { r =>
      assert(r.getAs[String]("format") == "unknown")
      assert(r.getAs[Array[Byte]]("pixels") == null)
      assert(r.getAs[collection.Seq[Float]]("samples") == null)
      assert(r.getAs[Int]("width") >= 1 && r.getAs[Int]("width") <= 1920)
      assert(r.getAs[Int]("height") >= 1 && r.getAs[Int]("height") <= 1080)
      assert(r.getAs[Int]("channels") >= 1 && r.getAs[Int]("channels") <= 3)
    }
  }

  test("decode: real BMP/WAV geometry rides the header, not the fallback") {
    // 1×1 24-bpp BMP: one BGR pixel + 1-byte row pad to stride 4
    val tiny = bmp(1, 1, 24, 0, Array[Byte](30, 20, 10, 0))
    val tinyWav = wav(2, 44100, 16, le2(0) ++ le2(16384))
    val out = MultimodalOps.decode(Seq((1L, tiny), (2L, tinyWav))
      .toDF("media_id", "bytes")).orderBy("media_id").collect()
    assert(out(0).getAs[Int]("width") == 1 && out(0).getAs[Int]("height") == 1)
    assert(out(0).getAs[Int]("channels") == 3)
    assert(out(0).getAs[Array[Byte]]("pixels").toSeq == Seq[Byte](10, 20, 30))
    assert(out(1).getAs[Int]("channels") == 2) // WAV channel count is real
    assert(out(1).getAs[collection.Seq[Float]]("samples") == Seq(0.0f, 0.5f))
  }

  test("bmp_pixels: 24-bpp bottom-up — row flip, stride padding stripped, BGR→RGB") {
    // 3×2 logical image, stored bottom-up with 3 pad bytes per 9-byte row
    val stored =
      Array[Byte](30, 20, 10, 60, 50, 40, 90, 80, 70, 0, 0, 0) ++ // bottom row
        Array[Byte](0, 0, -1, 0, -1, 0, -1, 0, 0, 0, 0, 0) // top row (BGR)
    val out = MultimodalOps.decode(Seq((1L, bmp(3, 2, 24, 0, stored)))
      .toDF("media_id", "bytes")).collect().head
    val expected = Array[Byte](-1, 0, 0, 0, -1, 0, 0, 0, -1, // top row RGB
      10, 20, 30, 40, 50, 60, 70, 80, 90) // bottom row RGB
    assert(out.getAs[Array[Byte]]("pixels").toSeq == expected.toSeq)
  }

  test("bmp_pixels: 32-bpp top-down — rows in order, BGRA→RGBA") {
    val stored = Array[Byte](3, 2, 1, 4, 7, 6, 5, 8, // top row BGRA
      11, 10, 9, 12, 15, 14, 13, 16)
    val out = MultimodalOps.decode(Seq((1L, bmp(2, -2, 32, 0, stored)))
      .toDF("media_id", "bytes")).collect().head
    assert(out.getAs[Array[Byte]]("pixels").toSeq ==
      (1 to 16).map(_.toByte).toSeq)
    assert(out.getAs[Int]("width") == 2 && out.getAs[Int]("height") == 2)
    assert(out.getAs[Int]("channels") == 4)
  }

  test("bmp_pixels: compressed, palette, and truncated files decode to null, never garbage") {
    val px = Array[Byte](1, 2, 3, 0)
    val rle = bmp(1, 1, 24, 1, px) // BI_RLE8: codec work
    val palette = bmp(1, 1, 8, 0, px) // palette depth: needs the color table
    val truncated = bmp(4, 4, 24, 0, Array[Byte](1, 2, 3)) // pixel array short
    val rows = MultimodalOps.decode(Seq(
        (1L, rle), (2L, palette), (3L, truncated)).toDF("media_id", "bytes"))
      .orderBy("media_id").collect()
    rows.foreach { r =>
      assert(r.getAs[String]("format") == "bmp")
      assert(r.getAs[Array[Byte]]("pixels") == null)
    }
  }

  test("wav_samples: PCM16 normalization is exact, including the endpoints") {
    val data = le2(0) ++ le2(16384) ++ le2(-32768) ++ le2(32767)
    val out = MultimodalOps.decode(Seq((1L, wav(1, 8000, 16, data)))
      .toDF("media_id", "bytes")).collect().head
    assert(out.getAs[collection.Seq[Float]]("samples") ==
      Seq(0.0f, 0.5f, -1.0f, 32767 / 32768.0f))
  }

  test("wav_samples: PCM8 unsigned normalization and chunk-walk tolerance") {
    // LIST metadata chunk with an ODD size (word-alignment pad) before data,
    // and the fmt chunk AFTER data — both legal RIFF layouts
    val data = Array[Byte](128.toByte, 0, 255.toByte)
    val reordered = "RIFF".getBytes ++ le4(200) ++ "WAVE".getBytes ++
      "LIST".getBytes ++ le4(3) ++ Array[Byte](1, 2, 3, 0) ++ // 3+1 pad
      "data".getBytes ++ le4(data.length) ++ data ++ Array[Byte](0) ++ // odd pad
      "fmt ".getBytes ++ le4(16) ++ le2(1) ++ le2(1) ++ le4(8000) ++
      le4(8000) ++ le2(1) ++ le2(8)
    val out = MultimodalOps.decode(Seq((1L, reordered))
      .toDF("media_id", "bytes")).collect().head
    assert(out.getAs[collection.Seq[Float]]("samples") ==
      Seq(0.0f, -1.0f, 127 / 128.0f))
  }

  test("wav_samples: float/ADPCM formats, odd bit depths, truncated data → null") {
    val d = le2(1) ++ le2(2)
    val floatFmt = "RIFF".getBytes ++ le4(100) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le4(16) ++ le2(3) ++ le2(1) ++ le4(8000) ++
      le4(32000) ++ le2(4) ++ le2(32) ++ "data".getBytes ++ le4(4) ++ d
    val bits24 = wav(1, 8000, 24, d)
    val overrun = "RIFF".getBytes ++ le4(100) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le4(16) ++ le2(1) ++ le2(1) ++ le4(8000) ++
      le4(16000) ++ le2(2) ++ le2(16) ++ "data".getBytes ++ le4(9999) ++ d
    val rows = MultimodalOps.decode(Seq(
        (1L, floatFmt), (2L, bits24), (3L, overrun)).toDF("media_id", "bytes"))
      .orderBy("media_id").collect()
    rows.foreach(r => assert(r.getAs[collection.Seq[Float]]("samples") == null))
  }

  test("resizeMeta: aspect preserved, never upscales") {
    val out = MultimodalOps.resizeMeta(MultimodalOps.decode(media), maxDim = 100)
      .collect()
    out.foreach { r =>
      assert(r.getAs[Int]("out_width") <= 100 && r.getAs[Int]("out_height") <= 100)
      assert(r.getAs[Int]("out_width") <= r.getAs[Int]("width"))
    }
  }

  test("frameSample: one row per sampled frame, stub clock") {
    val vid = media.filter(col("kind") === "video")
    val frames = MultimodalOps.frameSample(vid, everyNth = 10).collect()
    assert(frames.nonEmpty)
    assert(frames.map(_.getAs[Int]("frame_idx")).forall(_ % 10 == 0))
    assert(frames.forall(r =>
      r.getAs[Long]("frame_ts_ms") == r.getAs[Int]("frame_idx") * 33L))
  }

  test("features: fixed 8-dim vector per row, empty bytes safe") {
    val f = MultimodalOps.features(spark, media).collect()
    assert(f.length == 3)
    assert(f.forall(_.getAs[collection.Seq[Float]]("features").length == 8))
    val empty = f.find(_.getAs[Long]("media_id") == 3L).get
    assert(empty.getAs[collection.Seq[Float]]("features").forall(_ == 0.0f))
  }

  test("features: byte entropy is exact Shannon bits/byte") {
    // 4 distinct bytes, equal frequency → exactly 2 bits/byte; constant → 0
    val known = Seq(
      (10L, "i", Array[Byte](0, 1, 2, 3, 0, 1, 2, 3)),
      (11L, "i", Array[Byte](7, 7, 7, 7))).toDF("media_id", "kind", "bytes")
    val e = MultimodalOps.features(spark, known).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Double]("entropy")).toMap
    assert(math.abs(e(10L) - 2.0) < 1e-12)
    assert(e(11L) == 0.0)
  }

  test("features: waveform stats over real decoded PCM are exact") {
    // square wave ±0.5 → mean 0, rms 0.5, zcr 1, two equal amplitude bins → 1 bit
    val data = le2(16384) ++ le2(-16384) ++ le2(16384) ++ le2(-16384)
    val decoded = MultimodalOps.decode(Seq((1L, wav(1, 8000, 16, data)))
      .toDF("media_id", "bytes"))
    val f = MultimodalOps.features(spark, decoded).collect().head
    val v = f.getAs[collection.Seq[Float]]("features")
    assert(math.abs(v(0)) < 1e-7) // mean
    assert(math.abs(v(1) - 0.5f) < 1e-7) // rms
    assert(v(2) == -0.5f && v(3) == 0.5f) // min / max
    assert(v(4) == 1.0f) // zero-crossing rate: every adjacent pair flips
    assert(v(5) == 0.5f) // mean |s|
    assert(math.abs(v(6) - 0.5f) < 1e-7 && math.abs(v(7) - 0.5f) < 1e-7)
    assert(math.abs(f.getAs[Double]("entropy") - 1.0) < 1e-12)
  }

  test("features: pixel stats run over decoded pixels, not the container bytes") {
    // 2×2 24-bpp, every pixel (7,7,7): pixel entropy is exactly 0 even
    // though the raw file bytes (header + padding) are far from constant
    val stored = Array[Byte](7, 7, 7, 7, 7, 7, 0, 0, 7, 7, 7, 7, 7, 7, 0, 0)
    val decoded = MultimodalOps.decode(Seq((1L, bmp(2, 2, 24, 0, stored)))
      .toDF("media_id", "bytes"))
    val f = MultimodalOps.features(spark, decoded).collect().head
    assert(f.getAs[Double]("entropy") == 0.0)
    // stripe mean: 12 pixel bytes, stripe 0 sees indices 0 and 8 → 2·(7/255)
    assert(math.abs(f.getAs[collection.Seq[Float]]("features").head - 2 * 7 / 255.0f) < 1e-6)
  }

  test("container builders round-trip through the real decode path") {
    // BMP: one 64-px row (192 bytes, height 1) — decoded pixels are the
    // stored bytes BGR→RGB swizzled per pixel
    val rowBytes = Array.tabulate[Byte](192)(i => (i % 251).toByte)
    val audioBytes = Array[Byte](0, 0, 0, 64, 0, 128.toByte) // 0, 0.5, -1.0
    val out = MultimodalOps.decode(Seq(
        (1L, MultimodalOps.bmpOf(rowBytes)), (2L, MultimodalOps.wavOf(audioBytes)))
      .toDF("media_id", "bytes")).orderBy("media_id").collect()
    assert(out(0).getAs[String]("format") == "bmp")
    assert(out(0).getAs[Int]("width") == 64 && out(0).getAs[Int]("height") == 1)
    val px = out(0).getAs[Array[Byte]]("pixels")
    assert(px.length == 192)
    (0 until 64).foreach { x =>
      assert(px(x * 3) == rowBytes(x * 3 + 2) && px(x * 3 + 1) == rowBytes(x * 3 + 1) &&
        px(x * 3 + 2) == rowBytes(x * 3), s"pixel $x")
    }
    assert(out(1).getAs[Int]("channels") == 1)
    assert(out(1).getAs[collection.Seq[Float]]("samples") == Seq(0.0f, 0.5f, -1.0f))
  }

  test("mediaPipeline: image rows carry real container dims end-to-end") {
    val stats = MultimodalOps.mediaPipeline(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[String]("kind") -> r).toMap
    assert(stats.keySet == Set("image", "audio", "video"))
    // the BMP builder writes width 64 and resizeMeta never upscales, so the
    // per-kind average width is exactly the REAL header width, not a hash
    assert(stats("image").getAs[Double]("avg_w") == 64.0)
    assert(stats("audio").getAs[Long]("n") > 0 && stats("video").getAs[Long]("n") > 0)
  }

  test("mediaStats: per-kind pipeline stats are exact on decodable fixtures") {
    val bmpBytes = bmp(2, 2, 24, 0,
      Array[Byte](7, 7, 7, 7, 7, 7, 0, 0, 7, 7, 7, 7, 7, 7, 0, 0))
    val wavBytes = wav(1, 8000, 16,
      le2(16384) ++ le2(-16384) ++ le2(16384) ++ le2(-16384))
    val textBytes = Array[Byte](0, 1, 2, 3, 0, 1, 2, 3) // 4 equal bytes → 2 bits
    val out = MultimodalOps.mediaStats(spark, Seq(
        (1L, "image", bmpBytes), (2L, "audio", wavBytes), (3L, "video", textBytes))
      .toDF("media_id", "kind", "bytes")).collect()
    val byKind = out.map(r => r.getAs[String]("kind") -> r).toMap
    assert(byKind("image").getAs[Long]("n") == 1)
    assert(byKind("image").getAs[Double]("avg_w") == 2.0) // real dims survive
    assert(byKind("image").getAs[Double]("avg_h") == 2.0)
    assert(math.abs(byKind("image").getAs[Double]("avg_f0") - 2 * 7 / 255.0) < 1e-6)
    assert(byKind("image").getAs[Double]("avg_entropy") == 0.0)
    assert(byKind("audio").getAs[Long]("n") == 1)
    assert(math.abs(byKind("audio").getAs[Double]("avg_f0")) < 1e-7)
    assert(math.abs(byKind("audio").getAs[Double]("avg_entropy") - 1.0) < 1e-12)
    assert(byKind("video").getAs[Long]("n") == 1)
    assert(math.abs(byKind("video").getAs[Double]("avg_entropy") - 2.0) < 1e-12)
  }

  test("sniffHeaders: real magic-byte formats and true PNG/GIF/BMP dims") {
    def be4(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def le2(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    def le4(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte,
      (v >>> 16).toByte, (v >>> 24).toByte)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A) ++
      be4(13) ++ "IHDR".getBytes ++ be4(640) ++ be4(480) ++ Array[Byte](8, 6)
    val gif = "GIF89a".getBytes ++ le2(320) ++ le2(240) ++ Array[Byte](0, 0, 0)
    val bmp = "BM".getBytes ++ le4(1000) ++ le4(0) ++ le4(54) ++ le4(40) ++
      le4(800) ++ le4(600)
    val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte) ++
      "....JFIF".getBytes
    val junk = "not a media file".getBytes
    val out = MultimodalOps.sniffHeaders(Seq(
        (1L, png), (2L, gif), (3L, bmp), (4L, jpeg), (5L, junk))
      .toDF("media_id", "bytes")).collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[String]("format"),
          Option(r.getAs[java.lang.Long]("hdr_width")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("hdr_height")).map(_.toLong)))).toMap
    assert(out(1L) == (("png", Some(640L), Some(480L))))
    assert(out(2L) == (("gif", Some(320L), Some(240L))))
    assert(out(3L) == (("bmp", Some(800L), Some(600L))))
    assert(out(4L) == (("jpeg", None, None)))
    assert(out(5L) == (("unknown", None, None)))
  }

  test("sniffHeaders: top-down BMP (negative height) and truncated headers") {
    def le4(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte,
      (v >>> 16).toByte, (v >>> 24).toByte)
    // top-down BMP stores height as a NEGATIVE signed int32
    val topDown = "BM".getBytes ++ le4(1000) ++ le4(0) ++ le4(54) ++ le4(40) ++
      le4(800) ++ le4(-600)
    val truncated = "BM".getBytes ++ le4(1000) ++ Array[Byte](0x0A, 0x00)
    val shortPng = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    val out = MultimodalOps.sniffHeaders(Seq(
        (1L, topDown), (2L, truncated), (3L, shortPng)).toDF("media_id", "bytes"))
      .collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[String]("format"),
          Option(r.getAs[java.lang.Long]("hdr_width")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("hdr_height")).map(_.toLong)))).toMap
    assert(out(1L) == (("bmp", Some(800L), Some(600L)))) // |−600|, not 4294966696
    assert(out(2L) == (("bmp", None, None))) // too short → null, not garbage
    assert(out(3L) == (("png", None, None)))
  }

  test("sniffHeaders: JPEG SOF marker walk — baseline, progressive, malformed") {
    def be2(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
    def m(a: Int, b: Int) = Array(a.toByte, b.toByte)
    val app0 = m(0xFF, 0xE0) ++ be2(16) ++ "JFIF".getBytes ++ Array.fill[Byte](10)(0)
    def sof(marker: Int, w: Int, h: Int) =
      m(0xFF, marker) ++ be2(11) ++ Array[Byte](8) ++ be2(h) ++ be2(w) ++
        Array[Byte](1, 0, 0, 0)
    val soi = m(0xFF, 0xD8)
    val baseline = soi ++ app0 ++ sof(0xC0, 640, 480) ++ Array[Byte](1, 2, 3)
    val progressive = soi ++ app0 ++ app0 ++ sof(0xC2, 1024, 768)
    // standalone RST marker (no length field) must be stepped over
    val withRst = soi ++ m(0xFF, 0xD0) ++ sof(0xC1, 32, 16)
    // DHT (C4) carries no dims and must be skipped, not parsed as SOF
    val dhtFirst = soi ++ (m(0xFF, 0xC4) ++ be2(5) ++ Array[Byte](0, 0, 0)) ++
      sof(0xC0, 8, 4)
    // valid SOI+APP0, then the next marker position holds a non-FF byte
    val misaligned = soi ++ m(0xFF, 0xE0) ++ be2(4) ++ Array[Byte](0, 0) ++
      Array[Byte](0x00, 0x11, 0x22, 0x33)
    val truncatedSof = soi ++ m(0xFF, 0xC0) ++ be2(11) ++ Array[Byte](8)
    val out = MultimodalOps.sniffHeaders(Seq(
        (1L, baseline), (2L, progressive), (3L, withRst), (4L, dhtFirst),
        (5L, misaligned), (6L, truncatedSof))
      .toDF("media_id", "bytes")).collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[String]("format"),
          Option(r.getAs[java.lang.Long]("hdr_width")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("hdr_height")).map(_.toLong)))).toMap
    assert(out(1L) == (("jpeg", Some(640L), Some(480L))))
    assert(out(2L) == (("jpeg", Some(1024L), Some(768L))))
    assert(out(3L) == (("jpeg", Some(32L), Some(16L))))
    assert(out(4L) == (("jpeg", Some(8L), Some(4L))))
    assert(out(5L) == (("jpeg", None, None)))
    assert(out(6L) == (("jpeg", None, None)))
  }

  test("sniffHeaders: WAV canonical fmt chunk — channels + sample rate") {
    def le2(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    def le4(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte,
      (v >>> 16).toByte, (v >>> 24).toByte)
    val wav = "RIFF".getBytes ++ le4(1000) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le4(16) ++ le2(1) ++ le2(2) ++ le4(44100) ++
      le4(176400) ++ le2(4) ++ le2(16)
    // RIFF/WAVE but a nonstandard first chunk: format known, fields null
    val listFirst = "RIFF".getBytes ++ le4(1000) ++ "WAVE".getBytes ++
      "LIST".getBytes ++ le4(16) ++ Array.fill[Byte](16)(0)
    val avi = "RIFF".getBytes ++ le4(1000) ++ "AVI ".getBytes ++
      Array.fill[Byte](24)(0)
    val out = MultimodalOps.sniffHeaders(Seq(
        (1L, wav), (2L, listFirst), (3L, avi)).toDF("media_id", "bytes"))
      .collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[String]("format"),
          Option(r.getAs[java.lang.Long]("hdr_channels")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("hdr_sample_rate")).map(_.toLong)))).toMap
    assert(out(1L) == (("riff", Some(2L), Some(44100L))))
    assert(out(2L) == (("riff", None, None)))
    assert(out(3L) == (("riff", None, None)))
  }

  test("sniffHeaders: BMP DIB variants — OS/2 core header dims, unknown header null") {
    def le2(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    def le4(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte,
      (v >>> 16).toByte, (v >>> 24).toByte)
    // BITMAPCOREHEADER: 12-byte DIB header, 2-byte unsigned dims at 18/20
    val core = "BM".getBytes ++ le4(500) ++ le4(0) ++ le4(26) ++ le4(12) ++
      le2(320) ++ le2(200) ++ le2(1) ++ le2(8)
    // INFOHEADER offsets read against this layout would stripe across
    // width/height/planes: leInt(19,4) = 200<<16 | 320 = 13107520 — garbage
    // a hypothetical 16-byte DIB header: neither layout is known → null dims
    val odd = "BM".getBytes ++ le4(500) ++ le4(0) ++ le4(30) ++ le4(16) ++
      le4(640) ++ le4(480)
    val out = MultimodalOps.sniffHeaders(Seq((1L, core), (2L, odd))
      .toDF("media_id", "bytes")).collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[String]("format"),
          Option(r.getAs[java.lang.Long]("hdr_width")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("hdr_height")).map(_.toLong)))).toMap
    assert(out(1L) == (("bmp", Some(320L), Some(200L))))
    assert(out(2L) == (("bmp", None, None)))
  }

  test("codec decode: PNG round-trips payload bytes losslessly through ImageIO") {
    val payload = Array.tabulate[Byte](300)(i => (i * 7 % 256).toByte)
    val out = MultimodalOps.decodeCodecs(spark,
        Seq((1L, MultimodalOps.pngOf(payload))).toDF("media_id", "bytes"))
      .collect().head
    assert(out.getAs[Int]("cwidth") == 64 && out.getAs[Int]("cheight") == 1)
    val px = out.getAs[Array[Byte]]("pixels")
    assert(px.length == 192)
    // PNG is lossless: the first 192 payload bytes come back bit-exact
    assert(px.toSeq == payload.take(192).toSeq)
  }

  test("codec decode: JPEG/GIF/BMP dims via ImageIO; garbage reports null pixels") {
    System.setProperty("java.awt.headless", "true")
    def imageBytes(fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(5, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val out = MultimodalOps.decodeCodecs(spark, Seq(
        (1L, imageBytes("jpg")), (2L, imageBytes("gif")), (3L, imageBytes("bmp")),
        (4L, Array[Byte](1, 2, 3)))
      .toDF("media_id", "bytes")).collect()
      .map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Int]("cwidth"), r.getAs[Int]("cheight")))).toMap
    assert(out(1L) == ((5, 4)) && out(2L) == ((5, 4)) && out(3L) == ((5, 4)))
    assert(out(4L) == ((0, 0)))
  }

  test("codec decode: oversized dimension declarations are rejected before allocation") {
    System.setProperty("java.awt.headless", "true")
    val img = new java.awt.image.BufferedImage(5, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    // 20 declared pixels against a 10-pixel budget: the header check must
    // refuse the row (null pixels, zero dims) without decoding anything
    val out = MultimodalOps.decodeCodecs(spark,
        Seq((1L, bos.toByteArray)).toDF("media_id", "bytes"), maxPixels = 10L)
      .collect().head
    assert(out.getAs[Int]("cwidth") == 0 && out.getAs[Array[Byte]]("pixels") == null)
  }

  test("codec pipeline entropy equals the native-BMP pipeline's (two decode stacks, one answer)") {
    // same payloads, one in a PNG (JDK-codec decode), one in a BMP (native
    // expression decode). The BMP path's flip+BGR-swap is a permutation of
    // the same padded byte multiset, so per-document entropy must be EQUAL
    val payloads = Seq(
      (1L, Array.tabulate[Byte](500)(i => (i % 97).toByte)),
      (2L, Array.tabulate[Byte](200)(i => (i * 31 % 256).toByte)))
    val pngFeats = MultimodalOps.features(spark,
      MultimodalOps.decodeCodecs(spark,
        payloads.map { case (id, p) => (id, MultimodalOps.pngOf(p)) }
          .toDF("media_id", "bytes")))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("entropy")).toMap
    val bmpFeats = MultimodalOps.features(spark,
      MultimodalOps.decode(
        payloads.map { case (id, p) => (id, MultimodalOps.bmpOf(p)) }
          .toDF("media_id", "bytes")))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("entropy")).toMap
    payloads.foreach { case (id, _) =>
      assert(pngFeats(id) == bmpFeats(id), s"doc $id")
    }
  }

  // ---- perceptual near-dup (r12): dHash + banded pairs -----------------

  /** Independent in-spec dHash reference — the structure pin the native
    * expression answers to, entry for entry (the xxhash-tier discipline).
    */
  private def refDHash(px: Array[Byte], w: Int, h: Int, c: Int): Long = {
    val avg = Array.tabulate(8, 9) { (gy, gx) =>
      val (x0, x1) = (gx * w / 9, (gx + 1) * w / 9)
      val (y0, y1) = (gy * h / 8, (gy + 1) * h / 8)
      val cells = for (y <- y0 until y1; x <- x0 until x1) yield {
        val i = (y * w + x) * c
        77L * (px(i) & 0xff) + 151L * (px(i + 1) & 0xff) + 28L * (px(i + 2) & 0xff)
      }
      cells.sum / cells.size
    }
    (for (gy <- 0 until 8; gx <- 0 until 8
      if avg(gy)(gx + 1) > avg(gy)(gx))
      yield 1L << (gy * 8 + gx)).foldLeft(0L)(_ | _)
  }

  private def exprDHash(rows: Seq[(Long, Array[Byte], Int, Int, Int)])
      : Map[Long, java.lang.Long] = {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    rows.toDF("id", "px", "w", "h", "c")
      .select(col("id"), graft.functions.VectorFunctions.dhash64(
        col("px"), col("w"), col("h"), col("c")).as("dh"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1))))
      .toMap
  }

  test("dhash64: analytic bit pins — constant image hashes to 0, a strict " +
      "horizontal gradient to all-ones, a vertical gradient to 0") {
    val (w, h) = (18, 16)
    def img(f: (Int, Int) => Int): Array[Byte] =
      Array.tabulate(w * h * 3)(i => f((i / 3) % w, i / 3 / w).toByte)
    val flat = img((_, _) => 100)
    val horiz = img((x, _) => x * 10) // strictly increasing per column
    val vert = img((_, y) => y * 10) // constant within each row
    val got = exprDHash(Seq((1L, flat, w, h, 3), (2L, horiz, w, h, 3),
      (3L, vert, w, h, 3)))
    assert(got(1L) == 0L)
    assert(got(2L) == -1L, // all 64 comparison bits set
      s"horizontal gradient hashed to ${got(2L)}")
    assert(got(3L) == 0L)
    // brightness invariance: a uniform +30 shift moves every cell average
    // equally, so no comparison flips
    val brighter = img((x, _) => x * 10 + 30)
    assert(exprDHash(Seq((4L, brighter, w, h, 3)))(4L) == -1L)
  }

  test("dhash64: bit-identical to the in-spec reference on pseudo-random " +
      "images, RGBA alpha ignored, malformed inputs null") {
    val rnd = new scala.util.Random(42)
    val imgs = (0 until 6).map { k =>
      val (w, h) = (9 + rnd.nextInt(40), 8 + rnd.nextInt(40))
      val px = Array.fill((w * h * 3))(rnd.nextInt(256).toByte)
      (k.toLong, px, w, h, 3)
    }
    val got = exprDHash(imgs)
    imgs.foreach { case (id, px, w, h, c) =>
      assert(got(id) == refDHash(px, w, h, c), s"img $id")
    }
    // RGBA: the alpha byte must not affect the hash
    val (_, px0, w0, h0, _) = imgs.head
    val rgba = Array.tabulate(w0 * h0 * 4) { i =>
      if (i % 4 == 3) rnd.nextInt(256).toByte else px0(i / 4 * 3 + i % 4)
    }
    assert(exprDHash(Seq((99L, rgba, w0, h0, 4)))(99L) == got(0L))
    // malformation posture: short payload, sub-grid dims, bad channels
    val bad = exprDHash(Seq(
      (50L, px0.take(10), w0, h0, 3),
      (51L, px0, 8, h0, 3), // width < 9
      (52L, px0, w0, 7, 3), // height < 8
      (53L, px0, w0, h0, 2)))
    Seq(50L, 51L, 52L, 53L).foreach(id => assert(bad(id) == null, s"$id"))
  }

  test("banded near-dup pairs equal the brute-force Hamming scan exactly " +
      "(the pigeonhole recall guarantee), on the full sf0.001 corpus") {
    val out = MultimodalOps.imageNearDup(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // brute-force oracle: every pairwise Hamming ≤ 3 over the same hashes
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        Option(r.getString(1)).getOrElse("").getBytes("UTF-8"))
    val hashes = docs.map { case (id, p) =>
      // the v2 chain's closed-form reference: PNG is lossless and the
      // codec decode returns top-down row-major RGB verbatim, so the
      // decoded grid IS the tiled payload — no decoder in the oracle
      id -> refDHash(MultimodalOps.tiledPayload(p),
        MultimodalOps.tileDim, MultimodalOps.tileDim, 3)
    }
    val expect = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d.toLong)).sortBy(x => (x._1, x._2))
    assert(expect.nonEmpty, "corpus should contain near-dup images " +
      "(exact-dup documents pack to identical pixels)")
    assert(out.toSeq === expect.toSeq)
  }

  /** Independent in-spec audio envelope-hash reference — the structure
    * pin [[graft.functions.AudioEnvHash64Expr]] answers to.
    */
  private def refAudioHash(vs: Array[Int]): Long = {
    val n = vs.length
    val env = Array.tabulate(65) { w =>
      val (i0, i1) = (w * n / 65, (w + 1) * n / 65)
      vs.slice(i0, i1).map(v => math.abs(v).toLong).sum / (i1 - i0)
    }
    (for (w <- 0 until 64 if env(w + 1) > env(w)) yield 1L << w)
      .foldLeft(0L)(_ | _)
  }

  private def exprAudioHash(rows: Seq[(Long, Array[Float])])
      : Map[Long, java.lang.Long] = {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    rows.toDF("id", "s")
      .select(col("id"),
        graft.functions.VectorFunctions.audioEnvHash64(col("s")).as("ah"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1))))
      .toMap
  }

  test("audio_env_hash64: analytic pins — constant amplitude hashes to 0, " +
      "a strictly rising envelope to all-ones; gain preserves comparisons " +
      "whose margin clears the truncation step; reference-fold equality; " +
      "malformed inputs null") {
    def pcm(f: Int => Int): Array[Float] =
      Array.tabulate(650)(i => f(i) / 32768.0f)
    val flat = pcm(_ => 1000)
    val rising = pcm(i => i * 50) // each window strictly louder
    val got = exprAudioHash(Seq((1L, flat), (2L, rising)))
    assert(got(1L) == 0L)
    assert(got(2L) == -1L, s"rising envelope hashed to ${got(2L)}")
    // gain robustness: halving this fixture's samples preserves every
    // comparison because each window's mean margin stays above the
    // integer-truncation step — NOT a general invariance (a margin
    // under one step can collapse, e.g. means 2<3 halving to 1=1; the
    // Hamming gate is what absorbs those low-margin bit flips)
    val halved = pcm(i => i * 50 / 2)
    assert(exprAudioHash(Seq((3L, halved)))(3L) == -1L)
    // reference-fold equality on pseudo-random PCM
    val rnd = new scala.util.Random(11)
    val ints = Array.fill(1234)(rnd.nextInt(65536) - 32768)
    val gotR = exprAudioHash(Seq((4L, ints.map(_ / 32768.0f))))
    assert(gotR(4L) == refAudioHash(ints))
    // malformation: null for < 65 samples
    assert(exprAudioHash(Seq((5L, Array.fill(64)(0.5f))))(5L) == null)
  }

  test("audio banded near-dup pairs equal the brute-force Hamming scan " +
      "exactly on the full sf0.001 corpus") {
    val out = MultimodalOps.audioNearDup(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        Option(r.getString(1)).getOrElse("").getBytes("UTF-8"))
    val hashes = docs.map { case (id, p) =>
      // the query's exact synthesis chain: tiled payload → PCM16 WAV →
      // int16 LE samples → envelope fold
      val t = MultimodalOps.tiledPayload(p)
      val vs = Array.tabulate(t.length / 2)(i =>
        ((t(2 * i) & 0xff) | (t(2 * i + 1) << 8)).toShort.toInt)
      id -> refAudioHash(vs)
    }
    val expect = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d.toLong)).sortBy(x => (x._1, x._2))
    assert(expect.nonEmpty)
    assert(out.toSeq === expect.toSeq)
  }

  test("planted near-dups: small pixel perturbations are recovered with " +
      "EXACT recall under the banded gate, none missed, none spurious") {
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val rnd = new scala.util.Random(7)
    val (w, h) = (32, 24)
    val originals = (0 until 15).map { k =>
      (k.toLong, Array.fill(w * h * 3)(rnd.nextInt(200).toByte))
    }
    // each copy perturbs 2 pixels slightly — near-identical content
    val copies = originals.map { case (id, px) =>
      val p2 = px.clone()
      (0 until 2).foreach { _ =>
        val i = rnd.nextInt(p2.length)
        p2(i) = ((p2(i) & 0xff) + 20).toByte
      }
      (id + 1000L, p2)
    }
    val all = (originals ++ copies).map { case (id, px) => (id, px, w, h, 3) }
    val hs = exprDHash(all).map { case (k, v) => k -> v.longValue() }
    val hashedDf = hs.toSeq.toDF("media_id", "h")
    val got = MultimodalOps.dhashBandPairs(hashedDf, bands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the oracle over the same hashes: banded recall must be EXACT
    val expect = (for {
      (a, ha) <- hs.toSeq; (b, hb) <- hs.toSeq if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(got === expect)
    // the floor binds: the planted (orig, copy) pairs within the gate are
    // all recovered, and most plants land within it (tiny perturbations)
    val planted = originals.map(_._1).filter(id =>
      java.lang.Long.bitCount(hs(id) ^ hs(id + 1000L)) <= 3)
    assert(planted.size >= 10,
      s"only ${planted.size}/15 plants landed under the gate")
    planted.foreach(id => assert(got.contains(
      (id, id + 1000L, java.lang.Long.bitCount(hs(id) ^ hs(id + 1000L)).toLong))))
  }

  test("v2 perceptual image pipeline (PNG container + JDK codec decode): " +
      "every hash equals the closed-form reference fold over the RAW " +
      "tiled payload — PNG's losslessness makes the oracle decoder-free " +
      "— and the v1/v2 code spaces genuinely differ (the family bump is " +
      "load-bearing, not cosmetic)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") % 17 === 0)
      .select("doc_id", "text")
      .unionByName(Seq((990001L, null.asInstanceOf[String]),
        (990002L, "")).toDF("doc_id", "text"))
    def hashesOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val png = hashesOf(MultimodalOps.imageHashesOf(docs))
    assert(png.size > 10)
    // fixture pin: PNG container → JDK inflate → pixels ≡ the packed
    // tile, so the pipeline hash must equal the in-spec reference dHash
    // over the tiled payload bytes directly
    val payloads = docs.collect().map(r => r.getLong(0) ->
      Option(r.getString(1)).getOrElse("").getBytes("UTF-8")).toMap
    png.foreach { case (id, h) =>
      assert(h == refDHash(MultimodalOps.tiledPayload(payloads(id)),
        MultimodalOps.tileDim, MultimodalOps.tileDim, 3),
        s"doc $id: PNG-chain hash drifted from the decoder-free reference")
    }
    // the all-zero tile (null/empty payload) hashes to 0 — present, not
    // dropped: the decode succeeds on a valid container
    assert(png(990001L) == 0L && png(990002L) == 0L)
    // and the v1 native-BMP stack codes DIFFERENTLY on non-constant
    // payloads (its decode row-flips and channel-swaps by the BMP
    // convention) — the reason the family string must bump: v1 and v2
    // hashes band-joined together would pair garbage
    val bmpNative = hashesOf(MultimodalOps.imageHashesOfNativeBmp(docs))
    assert(png.keySet == bmpNative.keySet)
    assert(png.exists { case (id, h) => bmpNative(id) != h },
      "v1 and v2 unexpectedly coincide — if the chains now agree, the " +
        "families could merge; re-examine before trusting this")
  }
}
