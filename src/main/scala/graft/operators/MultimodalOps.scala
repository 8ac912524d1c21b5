package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column operators for training-data pipelines: image/audio/
  * video travel as opaque `binary` columns with typed metadata, and the
  * decode / feature / resize / frame-sample stages are structured exactly
  * as they would be against real codecs.
  *
  * Decode is a FORMAT DISPATCH with two real paths:
  *
  *  - NATIVE (codegen'd Catalyst expressions, null on malformation):
  *    header dimensions for PNG/GIF/BMP/JPEG/WAV ([[sniffHeaders]]),
  *    pixel rows for uncompressed BMP
  *    ([[graft.functions.BmpPixelsExpr]]) and PCM sample frames for WAV
  *    ([[graft.functions.WavSamplesExpr]]) — zero serialization fence,
  *    the scale path for the codec-free layouts;
  *  - JDK CODECS ([[decodeCodecs]], mapPartitions with per-partition
  *    context init): REAL pixel decode for the compressed image formats
  *    Java SE itself ships — PNG deflate, GIF LZW, JPEG DCT, BMP — via
  *    `javax.imageio`, no external library. MultimodalSpec pins the two
  *    stacks against each other (PNG round-trip is lossless and must
  *    reproduce the native-BMP pipeline's statistics exactly).
  *
  * Only video containers and MP3 frames remain un-decodable (the JDK
  * carries no codec for them); for those and unknown blobs [[decode]]
  * falls back to a clearly-marked deterministic synthetic geometry so
  * downstream metadata stages always have values. Swapping in a real
  * video/audio codec changes only that fallback.
  *
  * The per-partition feature extractor is the Scala analog of an
  * arrow-batched UDF: one initialization per partition (where a codec
  * context would be opened), then row-at-a-time decode within the batch.
  */
object MultimodalOps {

  /** Decoded-media metadata schema — what a real image decode returns. */
  final case class MediaMeta(mediaId: Long, kind: String, nBytes: Long,
      width: Int, height: Int, channels: Int)

  /** Fixed-width embedding from raw bytes (stub for a vision/audio model)
    * plus the REAL byte-entropy of the payload (a genuine corpus-quality /
    * compression signal — ~8 bits/byte means already-compressed media,
    * low entropy means padding or synthetic data).
    */
  final case class MediaFeatures(mediaId: Long, features: Array[Float],
      entropy: Double)

  /** REAL container-header decode (no codec required): format from magic
    * bytes, and for PNG/GIF/BMP the true pixel dimensions parsed straight
    * out of the header — big/little-endian field extraction as hex/conv
    * column expressions, fully inside whole-stage codegen. Payload decode
    * (pixels/samples) still needs a codec; everything here is exact.
    *
    *  - PNG: 8-byte signature, IHDR width/height as 4-byte big-endian at
    *    offsets 16/20
    *  - GIF: "GIF8?a", 2-byte little-endian logical-screen dims at 6/8
    *  - BMP: dims depend on the DIB header variant, discriminated by its
    *    size field at offset 14: >= 40 (BITMAPINFOHEADER and successors) →
    *    signed 4-byte little-endian dims at 18/22; == 12 (OS/2
    *    BITMAPCOREHEADER) → unsigned 2-byte dims at 18/20; anything else →
    *    null, never a misaligned read
    *  - JPEG: dims need a variable-length SOF marker walk — still pure
    *    header parsing, done by the native [[graft.functions.JpegDimsExpr]]
    *    expression (codegen'd static walk, null on any malformation)
    *  - WAV (RIFF/WAVE with the canonical "fmt " chunk at offset 12):
    *    channels and sample rate as little-endian fields; a nonstandard
    *    chunk order reports null, never a misread
    *  - MP3: format identified; frame-header fields left null
    */
  def sniffHeaders(media: DataFrame, bytesCol: String = "bytes"): DataFrame = {
    graft.functions.VectorFunctions.ensureRegistered(media.sparkSession)
    def byteAt(i: Int): Column = hex(substring(col(bytesCol), i, 1))
    def beInt(start: Int, n: Int): Column =
      conv(hex(substring(col(bytesCol), start, n)), 16, 10).cast("long")
    def leInt(start: Int, n: Int): Column =
      conv(concat((start + n - 1 to start by -1).map(byteAt): _*), 16, 10).cast("long")
    // BMP dims are SIGNED int32 (negative biHeight = top-down row order;
    // the pixel height is the magnitude)
    def leSigned(start: Int): Column = {
      val v = leInt(start, 4)
      when(v > Int.MaxValue.toLong, v - 4294967296L).otherwise(v)
    }
    val len = length(col(bytesCol))
    val magic = hex(substring(col(bytesCol), 1, 8))
    val format = when(magic.startsWith("89504E47"), "png")
      .when(magic.startsWith("47494638"), "gif")
      .when(magic.startsWith("424D"), "bmp")
      .when(magic.startsWith("FFD8FF"), "jpeg")
      .when(magic.startsWith("52494646"), "riff")
      .when(magic.startsWith("494433"), "mp3")
      .otherwise("unknown")
    // BMP's DIB header size field discriminates the layout: >= 40 means
    // INFOHEADER-family signed 4-byte dims; 12 means the OS/2 COREHEADER's
    // unsigned 2-byte dims at different widths. An unknown variant reads
    // as null — reading INFOHEADER offsets against a CORE header would
    // stripe the parse across width/height/planes and report garbage.
    val dib = leInt(15, 4)
    val bmpInfo = col("format") === "bmp" && len >= 26 && dib >= 40
    val bmpCore = col("format") === "bmp" && len >= 22 && dib === 12
    val jdims = graft.functions.VectorFunctions.jpegDims(col(bytesCol))
    // WAV: RIFF container whose form type is "WAVE" and whose first chunk
    // is the canonical "fmt " at offset 12 — anything else is a RIFF of
    // unknown layout and reports null
    val isWav = col("format") === "riff" && len >= 36 &&
      hex(substring(col(bytesCol), 9, 8)) === lit("57415645666D7420")
    // dims only when the header is long enough to actually contain them —
    // a truncated file keeps its format but reports null, never garbage
    media.withColumn("format", format)
      .withColumn("hdr_width",
        when(col("format") === "png" && len >= 24, beInt(17, 4))
          .when(col("format") === "gif" && len >= 10, leInt(7, 2))
          .when(bmpInfo, abs(leSigned(19)))
          .when(bmpCore, leInt(19, 2))
          .when(col("format") === "jpeg", element_at(jdims, 1).cast("long")))
      .withColumn("hdr_height",
        when(col("format") === "png" && len >= 24, beInt(21, 4))
          .when(col("format") === "gif" && len >= 10, leInt(9, 2))
          .when(bmpInfo, abs(leSigned(23)))
          .when(bmpCore, leInt(21, 2))
          .when(col("format") === "jpeg", element_at(jdims, 2).cast("long")))
      .withColumn("hdr_channels",
        when(isWav, leInt(23, 2))
          // PNG IHDR color type byte: 0 gray, 2 RGB, 3 palette, 4 gray+A, 6 RGBA
          .when(col("format") === "png" && len >= 26,
            when(beInt(26, 1) === 0 || beInt(26, 1) === 3, 1L)
              .when(beInt(26, 1) === 2, 3L)
              .when(beInt(26, 1) === 4, 2L)
              .when(beInt(26, 1) === 6, 4L))
          .when(col("format") === "gif" && len >= 10, lit(3L))
          // BMP bit count: stored channel count for the truecolor depths,
          // 1 for palette-indexed; 16-bit RGB555 and exotic depths → null
          .when(bmpInfo && len >= 30,
            when(leInt(29, 2) === 24, 3L)
              .when(leInt(29, 2) === 32, 4L)
              .when(leInt(29, 2) === 8, 1L)))
      .withColumn("hdr_sample_rate", when(isWav, leInt(25, 4)))
  }

  /** Format-dispatched decode — REAL wherever the format is codec-free,
    * all native codegen'd column expressions (no serialization fence):
    *
    *  - `width`/`height`/`channels`: true header values for PNG/GIF/BMP/
    *    JPEG/WAV via [[sniffHeaders]]
    *  - `pixels`: decoded top-down RGB(A) rows for uncompressed BMP
    *    ([[graft.functions.BmpPixelsExpr]] — bottom-up row flip, 4-byte
    *    row padding stripped, BGR→RGB), null for codec-bound formats
    *  - `samples`: normalized interleaved PCM frames for WAV
    *    ([[graft.functions.WavSamplesExpr]]), null otherwise
    *
    * SYNTHETIC FALLBACK (the only remaining stub surface): payloads whose
    * geometry needs a codec (compressed image/video bodies, unknown
    * blobs) get deterministic hash-derived dims so metadata stages
    * downstream always see values; a real codec integration replaces
    * exactly this `coalesce` fallback and nothing else.
    */
  def decode(media: DataFrame, bytesCol: String = "bytes"): DataFrame = {
    val h = abs(xxhash64(col(bytesCol)))
    sniffHeaders(media, bytesCol)
      .withColumn("pixels", when(col("format") === "bmp",
        graft.functions.VectorFunctions.bmpPixels(col(bytesCol))))
      .withColumn("samples", when(col("format") === "riff",
        graft.functions.VectorFunctions.wavSamples(col(bytesCol))))
      .withColumn("n_bytes", length(col(bytesCol)).cast("long"))
      .withColumn("width",
        coalesce(col("hdr_width"), h % 1920 + 1).cast("int"))
      .withColumn("height",
        coalesce(col("hdr_height"), (h / 1920) % 1080 + 1).cast("int"))
      .withColumn("channels",
        coalesce(col("hdr_channels"), h % 3 + 1).cast("int"))
  }

  /** Resize metadata: target dims preserving aspect ratio, never
    * upscaling. Operates on whatever [[decode]] produced — real header
    * dims for the parseable formats; the pixel resample itself would
    * happen in a codec kernel.
    */
  def resizeMeta(decoded: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim) / greatest(col("width"), col("height")).cast("double"))
    decoded
      .withColumn("out_width", ceil(col("width") * scale).cast("int"))
      .withColumn("out_height", ceil(col("height") * scale).cast("int"))
  }

  /** Frame sampling for video rows: one output row per sampled frame.
    * Declarative explode — distributes with the data, no driver loop.
    * Frame count is STUB-derived from size (real: container duration).
    */
  def frameSample(media: DataFrame, everyNth: Int, bytesCol: String = "bytes"): DataFrame = {
    val nFrames = (length(col(bytesCol)).cast("long") % 240 + 1).cast("int")
    media
      .withColumn("n_frames", nFrames)
      .select(col("*"),
        posexplode(sequence(lit(0), col("n_frames") - 1, lit(everyNth)))
          .as(Seq("sample_idx", "frame_idx")))
      .withColumn("frame_ts_ms", col("frame_idx") * 33L) // ~30fps stub clock
  }

  /** Per-partition batched feature extraction (the mapInPandas-shaped
    * path): iterate the partition once, initialize per-partition state
    * once, emit a fixed 8-float vector per row. When the frame carries
    * [[decode]]'s outputs, the statistics are computed over REAL decoded
    * data: PCM waveform stats for rows with `samples`, pixel-byte
    * moments for rows whose `pixels` decoded; raw payload bytes
    * otherwise. A model forward pass would replace exactly these two
    * stat kernels.
    */
  def features(spark: SparkSession, media: DataFrame,
      idCol: String = "media_id", bytesCol: String = "bytes"): DataFrame = {
    import spark.implicits._
    val hasPixels = media.columns.contains("pixels")
    val hasBytes = media.columns.contains(bytesCol)
    val payload =
      if (hasPixels && hasBytes) coalesce(col("pixels"), col(bytesCol))
      else if (hasPixels) col("pixels")
      else col(bytesCol)
    val samples =
      if (media.columns.contains("samples")) col("samples")
      else lit(null).cast("array<float>")
    val src = media.select(col(idCol).cast("long"), payload, samples)
      .as[(Long, Array[Byte], Array[Float])]
    src.mapPartitions { it =>
      // per-partition init happens HERE (codec/model context in real impl)
      val hist = new Array[Long](256)
      it.map { case (id, bytes, pcm) =>
        if (pcm != null) audioFeatures(id, pcm, hist)
        else byteFeatures(id, bytes, hist)
      }
    }(Encoders.product[MediaFeatures]).toDF("media_id", "features", "entropy")
  }

  private val featureDim = 8

  /** Byte-level stats: per-stripe byte means + exact Shannon entropy in
    * bits/byte. For decoded BMP rows the input is real pixel data, so
    * these are true image statistics; for opaque payloads they are
    * content statistics (high entropy ≈ already-compressed media).
    */
  private[operators] def byteFeatures(id: Long, bytes: Array[Byte],
      hist: Array[Long]): MediaFeatures = {
    val f = new Array[Float](featureDim)
    var entropy = 0.0
    if (bytes != null && bytes.length > 0) {
      java.util.Arrays.fill(hist, 0L)
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        f(i % featureDim) += b / 255.0f
        hist(b) += 1
        i += 1
      }
      val n = math.max(1, bytes.length / featureDim)
      var j = 0
      while (j < featureDim) { f(j) /= n.toFloat; j += 1 }
      var k = 0
      while (k < 256) {
        if (hist(k) > 0) {
          val p = hist(k).toDouble / bytes.length
          entropy -= p * math.log(p) / math.log(2)
        }
        k += 1
      }
    }
    MediaFeatures(id, f, entropy)
  }

  /** Waveform stats over REAL decoded PCM samples: mean, RMS, min, max,
    * zero-crossing rate, mean |s|, and per-half RMS (a coarse temporal
    * envelope); entropy over the 8-bit-requantized amplitude histogram.
    */
  private[operators] def audioFeatures(id: Long, pcm: Array[Float],
      hist: Array[Long]): MediaFeatures = {
    val f = new Array[Float](featureDim)
    var entropy = 0.0
    if (pcm.length > 0) {
      java.util.Arrays.fill(hist, 0L)
      var sum = 0.0; var sumSq = 0.0; var sumAbs = 0.0
      var mn = Float.MaxValue; var mx = Float.MinValue
      var crossings = 0
      val half = pcm.length / 2
      var sumSqA = 0.0
      var i = 0
      while (i < pcm.length) {
        val s = pcm(i)
        sum += s; sumSq += s * s; sumAbs += math.abs(s)
        if (s < mn) mn = s
        if (s > mx) mx = s
        if (i > 0 && (s >= 0) != (pcm(i - 1) >= 0)) crossings += 1
        if (i < half) sumSqA += s * s
        val bin = math.max(0, math.min(255, ((s + 1.0f) * 127.5f).toInt))
        hist(bin) += 1
        i += 1
      }
      val n = pcm.length
      f(0) = (sum / n).toFloat
      f(1) = math.sqrt(sumSq / n).toFloat
      f(2) = mn
      f(3) = mx
      f(4) = if (n > 1) crossings.toFloat / (n - 1) else 0.0f
      f(5) = (sumAbs / n).toFloat
      f(6) = if (half > 0) math.sqrt(sumSqA / half).toFloat else 0.0f
      f(7) = if (n - half > 0) math.sqrt((sumSq - sumSqA) / (n - half)).toFloat else 0.0f
      var k = 0
      while (k < 256) {
        if (hist(k) > 0) {
          val p = hist(k).toDouble / n
          entropy -= p * math.log(p) / math.log(2)
        }
        k += 1
      }
    }
    MediaFeatures(id, f, entropy)
  }

  /** The pipeline core: decode → resize → features → per-kind stats.
    * Value-checkable on deterministic fixtures (MultimodalSpec builds
    * real BMP/WAV payloads and asserts these stats exactly).
    */
  def mediaStats(spark: SparkSession, media: DataFrame): DataFrame = {
    val decoded = resizeMeta(decode(media), maxDim = 512)
    val feats = features(spark, decoded)
    kindStats(decoded.join(feats, "media_id"),
      col("kind"), col("out_width"), col("out_height"))
      .orderBy("kind")
  }

  /** The per-kind stat aggregate shared by [[mediaStats]] and
    * [[mediaCodecPipeline]] — ONE list of statistics, so the two
    * rows-only pipelines can never drift apart when a stat is added.
    */
  private def kindStats(joined: DataFrame, kind: Column,
      wCol: Column, hCol: Column): DataFrame =
    joined
      .groupBy(kind.as("kind"))
      .agg(count(lit(1)).as("n"),
        avg(wCol).as("avg_w"),
        avg(hCol).as("avg_h"),
        avg(element_at(col("features"), 1)).as("avg_f0"),
        avg(col("entropy")).as("avg_entropy"))

  /** Deterministic REAL media containers around arbitrary payload bytes —
    * the corpus-synthesis role (a fixture builder, not a decode path):
    * an uncompressed 24-bpp bottom-up BMP whose pixel rows carry the
    * bytes, and a PCM16 mono WAV whose sample frames carry them.
    * Everything DOWNSTREAM of these is the engine's real decode path.
    */
  /** Shared payload→pixel packing for the container builders: 64-wide,
    * height clamped to [1, 1024], truncating copy. ONE definition — the
    * cross-stack entropy-equality test (PNG-codec vs native-BMP) is only
    * valid while both containers pack the same padded byte multiset.
    */
  private val packWidth = 64
  private def packPayload(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val rowBytes = packWidth * 3 // 192 ≡ 0 (mod 4): no BMP row padding
    val height = math.max(1, math.min(bytes.length / rowBytes, 1024))
    val px = new Array[Byte](rowBytes * height)
    System.arraycopy(bytes, 0, px, 0, math.min(bytes.length, px.length))
    (packWidth, height, px)
  }

  private[graft] def bmpOf(bytes: Array[Byte]): Array[Byte] = {
    val (width, height, px) = packPayload(bytes)
    val out = java.nio.ByteBuffer.allocate(54 + px.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + px.length)
      .putInt(0).putInt(54) // reserved, pixel-data offset
      .putInt(40).putInt(width).putInt(height) // BITMAPINFOHEADER
      .putShort(1).putShort(24).putInt(0).putInt(px.length) // planes/bpp/BI_RGB
      .putInt(0).putInt(0).putInt(0).putInt(0) // resolution + palette
      .put(px)
    out.array()
  }

  private[graft] def wavOf(bytes: Array[Byte]): Array[Byte] = {
    val n = math.max(2, bytes.length & ~1) // whole 16-bit frames
    val data = java.util.Arrays.copyOf(bytes, n)
    val out = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes).putInt(36 + n).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(1).putInt(8000) // PCM, mono, 8 kHz
      .putInt(16000).putShort(2).putShort(16) // byte rate, block, bits
      .put("data".getBytes).putInt(n).put(data)
    out.array()
  }

  /** Decoded-pixel record from the JDK-codec path. */
  final case class CodecDecoded(mediaId: Long, cwidth: Int, cheight: Int,
      cchannels: Int, pixels: Array[Byte])

  /** REAL compressed-image decode via the JDK's own codecs
    * (`javax.imageio` — PNG deflate, GIF LZW, JPEG DCT, BMP; part of
    * Java SE, no external library). This is the mapPartitions shape the
    * [[features]] docs call the right altitude for codec work: one
    * headless-AWT/reader context per partition, row-at-a-time decode
    * within it. Output pixels are top-down row-major RGB triplets
    * (normalized through `getRGB`, so the source's band layout or palette
    * never leaks); undecodable payloads report null pixels and zero dims,
    * never a task failure.
    *
    * With this path the engine decodes every JDK-supported image format
    * for real — the synthetic-geometry fallback in [[decode]] remains
    * only for video containers and unknown blobs.
    */
  def decodeCodecs(spark: SparkSession, media: DataFrame,
      idCol: String = "media_id", bytesCol: String = "bytes",
      maxPixels: Long = 16L * 1024 * 1024): DataFrame = {
    import spark.implicits._
    val src = media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
    src.mapPartitions { it =>
      // per-partition codec context init
      System.setProperty("java.awt.headless", "true")
      javax.imageio.ImageIO.setUseCache(false)
      val miss = (id: Long) => CodecDecoded(id, 0, 0, 0, null)
      it.map { case (id, bytes) =>
        try {
          // header-first: read dimensions WITHOUT decoding pixels and
          // reject oversized declarations BEFORE any allocation happens —
          // a decompression-bomb PNG claiming 50000×50000 would otherwise
          // OOM the task inside ImageIO (an Error, uncatchable by policy),
          // not merely fail the row
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) miss(id)
            else {
              val reader = readers.next()
              try {
                reader.setInput(iis)
                val w = reader.getWidth(0); val h = reader.getHeight(0)
                if (w <= 0 || h <= 0 || w.toLong * h > maxPixels) miss(id)
                else {
                  val img = reader.read(0)
                  // bulk row read: one getRGB call per image, not per pixel
                  val rgb = img.getRGB(0, 0, w, h, null, 0, w)
                  val px = new Array[Byte](w * h * 3)
                  var i = 0; var j = 0
                  while (j < rgb.length) {
                    val v = rgb(j)
                    px(i) = ((v >> 16) & 0xff).toByte
                    px(i + 1) = ((v >> 8) & 0xff).toByte
                    px(i + 2) = (v & 0xff).toByte
                    i += 3; j += 1
                  }
                  CodecDecoded(id, w, h, 3, px)
                }
              } finally reader.dispose()
            }
          // setUseCache(false) makes these memory-backed streams, but
          // each still pins its buffer until closed — on a large
          // partition that's avoidable allocation pressure, so close
          // eagerly instead of leaving them to GC
          } finally if (iis != null) iis.close()
        } catch { case _: Exception => miss(id) }
      }
    }.toDF("media_id", "cwidth", "cheight", "cchannels", "pixels")
  }

  /** Deterministic REAL PNG container around payload bytes (the [[bmpOf]]
    * corpus-synthesis role for the compressed-format path): bytes pack as
    * top-down row-major RGB triplets of a 64-wide image, losslessly
    * recoverable — PNG is the lossless member of the JDK codec set, so
    * [[decodeCodecs]] must return exactly these bytes back.
    */
  private[graft] def pngOf(bytes: Array[Byte]): Array[Byte] = {
    val (width, height, px) = packPayload(bytes)
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0; var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, ((px(i) & 0xff) << 16) | ((px(i + 1) & 0xff) << 8)
          | (px(i + 2) & 0xff))
        i += 3; x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Compressed-format pipeline (rows-only driver check): document bytes
    * ride in REAL PNG containers, decode through the JDK codec path, and
    * the decoded pixels feed the same feature kernels as the native-BMP
    * pipeline. PNG is lossless, so MultimodalSpec pins this pipeline's
    * per-document entropy EQUAL to the native BMP path's on the same
    * payloads — two independent decode stacks, one answer.
    */
  def mediaCodecPipeline(spark: SparkSession, dir: String): DataFrame = {
    graft.IntraQueryCache.newGeneration(s"media:$dir")
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    val media = docs.mapPartitions { it =>
      System.setProperty("java.awt.headless", "true")
      it.map { case (id, payload) =>
        val p = if (payload == null) Array.empty[Byte] else payload
        (id, "png", pngOf(p))
      }
    }.toDF("media_id", "kind", "bytes")
    // persisted: the decoded frame feeds both the feature pass and the
    // stat join — without it the pngOf encode AND the ImageIO decode (the
    // dominant cost of this pipeline) execute twice. Generation-scoped
    // like the engine's other intra-query persists (warm on rerun,
    // budget-evicted under pressure)
    val decoded = graft.IntraQueryCache.scoped(decodeCodecs(spark, media))
    val feats = features(spark, decoded)
    kindStats(decoded.withColumn("kind", lit("png")).join(feats, "media_id"),
      col("kind"), col("cwidth"), col("cheight"))
  }

  /** Tile payload bytes into a full fixed-size (64×64 RGB) image buffer
    * for the perceptual fixtures: driver documents are a few hundred
    * bytes — shorter than the dHash grid's 9×8 minimum under straight
    * packing — so the near-dup fixture repeats the payload until the
    * buffer fills. Deterministic, content-preserving (near-identical
    * payloads tile to near-identical pixels), and every document gets a
    * hashable image regardless of length.
    */
  private[graft] val tileDim = 64
  private[graft] def tiledPayload(bytes: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](tileDim * tileDim * 3)
    if (bytes.isEmpty) return out
    var off = 0
    while (off < out.length) {
      val n = math.min(bytes.length, out.length - off)
      System.arraycopy(bytes, 0, out, off, n)
      off += n
    }
    out
  }

  /** One row per (hash, band): the contiguous bit slices a 64-bit
    * perceptual hash splits into for the banded candidate joins. The
    * band array is built over the ALREADY-PROJECTED hash attribute
    * (shifts of a column reference, never the hash kernel itself), so
    * GenerateExec's no-subexpression-elimination pitfall cannot
    * re-evaluate the kernel per element.
    */
  private def bandedOf(hashed: DataFrame, bands: Int): DataFrame = {
    val width = 64 / bands
    val mask = (1L << width) - 1
    val bandCols = array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        shiftright(col("h"), b * width).bitwiseAND(lit(mask)).as("bv"))): _*)
    hashed
      .select(col("media_id"), col("h"), explode(bandCols).as("tb"))
      .select(col("media_id"), col("h"),
        col("tb.band").as("band"), col("tb.bv").as("bv"))
  }

  /** The banded CANDIDATE join alone (doc_a, doc_b, ha, hb — distinct
    * pairs agreeing on at least one band): split out so the probe can
    * measure candidate-pair volume separately from the confirm filter.
    */
  private[graft] def dhashBandCandidates(hashed: DataFrame,
      bands: Int): DataFrame = {
    val banded = bandedOf(hashed, bands)
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("doc_a"), col("b.media_id").as("doc_b"),
        col("a.h").as("ha"), col("b.h").as("hb"))
      // a pair colliding in several bands emits once
      .distinct()
  }

  /** TWO-SIDED banded near-dup join — [[dhashBandPairs]]' construction
    * with distinct probe and corpus sides (the stream-vs-history shape
    * [[graft.streaming.MediaStream]] serves): candidates agree exactly
    * on at least one (band, value) key, the exact Hamming confirm gates
    * emission, and the pigeonhole recall guarantee (EXACT for
    * maxHamming < bands) carries over unchanged. Same-id pairs are
    * excluded — a replayed document probing against an index that
    * already holds it must not report itself as its own near-dup.
    * Output: (media_id, corpus_id, hamming), one row per pair.
    */
  private[graft] def dhashBandJoin(probe: DataFrame, corpus: DataFrame,
      bands: Int = 4, maxHamming: Int = 3): DataFrame = {
    require(maxHamming < bands,
      s"banded recall is exact only for maxHamming < bands " +
        s"(got $maxHamming vs $bands) — a wider gate needs more bands")
    bandedOf(probe, bands).as("a")
      .join(bandedOf(corpus, bands).as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.media_id") =!= col("b.media_id"))
      .select(col("a.media_id").as("media_id"),
        col("b.media_id").as("corpus_id"),
        col("a.h").as("ha"), col("b.h").as("hb"))
      // a pair colliding in several bands emits once
      .distinct()
      .withColumn("hamming",
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("media_id", "corpus_id", "hamming")
  }

  /** Banded pair generation over 64-bit perceptual hashes — the
    * minhash-LSH candidate shape at BIT-BAND grain: each hash splits
    * into `bands` contiguous bit slices, candidates are pairs agreeing
    * EXACTLY on at least one (band, value) key (a bucket equi-join,
    * never all-pairs), and the exact Hamming distance (`bit_count` of
    * the XOR — codegen'd) confirms. By pigeonhole, a pair within
    * Hamming < bands shares at least one intact band, so banded recall
    * is EXACT (not probabilistic) for any `maxHamming ≤ bands − 1` —
    * the spec-pinned floor. 100 TB posture: candidate volume per band
    * is Σ bucket², bounded by hash dispersion for non-dup content
    * (random pairs collide on a 16-bit band at ~2⁻¹⁶ per band) and
    * output-sensitive for true near-dup clusters.
    */
  private[graft] def dhashBandPairs(hashed: DataFrame, bands: Int = 4,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming < bands,
      s"banded recall is exact only for maxHamming < bands " +
        s"(got $maxHamming vs $bands) — a wider gate needs more bands")
    dhashBandCandidates(hashed, bands)
      .withColumn("hamming",
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** One per-document perceptual-hash pipeline for BOTH modalities:
    * tiled payload → real container ([[bmpOf]]/[[wavOf]]) → native
    * decode → hash column, with the null posture shared (undecodable
    * payloads and sub-grid inputs drop out on both sides of the pair
    * join). The modality supplies its container builder, the decoded
    * column the hash consumes, and the hash expression itself. Takes a
    * (doc_id, text) FRAME (not a dataset dir) so the exact same chain
    * hashes a corpus build, a maintained-index append slice, and a
    * streaming micro-batch — the hash FAMILY contract
    * ([[imageHashFamily]]/[[audioHashFamily]]) is only sound because
    * there is one pipeline to drift.
    */
  private def perceptualHashesOf(docs: DataFrame,
      container: Array[Byte] => Array[Byte],
      decodeFn: DataFrame => DataFrame, decodedCol: String,
      hash: Column): DataFrame = {
    val spark = docs.sparkSession
    graft.functions.VectorFunctions.ensureRegistered(spark)
    import spark.implicits._
    val media = docs
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // container builders may enter AWT (the PNG encoder) — init the
        // headless context once per partition, the decodeCodecs shape
        System.setProperty("java.awt.headless", "true")
        it.map { case (id, p0) =>
          val p = if (p0 == null) Array.empty[Byte] else p0
          (id, container(tiledPayload(p)))
        }
      }.toDF("media_id", "bytes")
    decodeFn(media)
      .filter(col(decodedCol).isNotNull)
      .select(col("media_id"), hash.as("h"))
      .filter(col("h").isNotNull)
  }

  /** Hash-pipeline FAMILY identifiers — the code-space contract the
    * maintained [[MediaHashIndex]] artifacts carry in `_meta`: a hash is
    * only comparable to hashes produced by the identical packing +
    * container + decode + hash chain, so any change to [[tiledPayload]],
    * the container builders, or the hash expressions must bump the
    * family (hashes from drifted pipelines band-join to garbage pairs,
    * the cross-family failure mode the winnow/vector `_family`/`_meta`
    * gates exist to refuse).
    */
  private[graft] val imageHashFamily = "dhash64-png-tile64-v2"
  private[graft] val audioHashFamily = "audioenv64-wav-tile64-v1"

  /** [[perceptualHashesOf]] at the image modality — since r14 a REAL
    * COMPRESSION CODEC at ingest: tiled payloads ride in PNG containers
    * ([[pngOf]]) and decode through the JDK codec path
    * ([[decodeCodecs]] — deflate inflation, bomb guard, per-partition
    * reader context), replacing the v1 BMP + native-header chain. PNG
    * is lossless and the codec decode returns the packed grid VERBATIM
    * (top-down row-major RGB), which buys the strongest possible pin:
    * every pipeline hash equals a decoder-free reference fold over the
    * raw tiled payload (MultimodalSpec). The v1 chain's decode
    * row-flips and channel-swaps by the BMP convention, so v1 and v2
    * hashes are NOT comparable — the family bump to v2 is load-bearing:
    * every maintained artifact and stream gate built against v1
    * refuses-and-rebuilds instead of band-joining garbage across code
    * spaces (the cascade, exercised for real by this bump). It also
    * makes the media artifact's economics honest at last: the decode
    * term the [[MediaHashIndex]] artifact amortizes per query is now a
    * genuine codec inflation, not a header parse.
    */
  private[graft] def imageHashesOf(docs: DataFrame): DataFrame =
    perceptualHashesOf(docs, pngOf,
      m => decodeCodecs(m.sparkSession, m), "pixels",
      graft.functions.VectorFunctions.dhash64(col("pixels"),
        col("cwidth"), col("cheight"), col("cchannels")))

  /** The v1 image chain (BMP container + native header/pixel decode) —
    * kept as the INDEPENDENT second stack the PNG pipeline is pinned
    * against (MultimodalSpec: same payloads, same hashes), the
    * [[mediaCodecPipeline]] entropy-pin precedent raised to hash level.
    */
  private[graft] def imageHashesOfNativeBmp(docs: DataFrame): DataFrame =
    perceptualHashesOf(docs, bmpOf, decode(_), "pixels",
      graft.functions.VectorFunctions.dhash64(col("pixels"),
        col("width"), col("height"), col("channels")))

  /** [[perceptualHashesOf]] at the audio modality: tiled-payload PCM16
    * WAV fixtures through the native decode + envelope-hash chain.
    */
  private[graft] def audioHashesOf(docs: DataFrame): DataFrame =
    perceptualHashesOf(docs, wavOf, decode(_), "samples",
      graft.functions.VectorFunctions.audioEnvHash64(col("samples")))

  /** The per-document perceptual hashes the near-dup pipeline pairs
    * over: tiled-BMP fixtures through the native decode + dHash chain.
    */
  private[graft] def imageHashes(spark: SparkSession,
      dir: String): DataFrame =
    imageHashesOf(Tables.documents(spark, dir).select("doc_id", "text"))

  /** Image perceptual near-dup (rows-only driver check — the hash is
    * codec/packing-defined): document bytes ride in REAL BMP containers
    * ([[bmpOf]]), decode through the native header + pixel path, hash
    * with the exact-integer [[graft.functions.DHash64Expr]], and pair
    * through [[dhashBandPairs]]' banded equi-join — the LLM-pipeline
    * image-dedup modality, structured exactly like the text minhash-LSH
    * tier (band → bucket join → exact confirm, never all-pairs).
    * Exact-duplicate documents pack to identical pixels (Hamming 0);
    * near-identical payloads land within the gate. MultimodalSpec pins
    * the hash bit-exactly on analytic fixtures, pins the banded recall
    * floor on planted near-dups, and pins this pipeline against a
    * straight in-memory recompute.
    */
  def imageNearDup(spark: SparkSession, dir: String,
      maxHamming: Int = 3): DataFrame = {
    graft.IntraQueryCache.newGeneration(s"imagend:$dir")
    // persisted: the banded self-join consumes the hashes twice, and
    // without the persist the BMP encode + decode + hash pipeline — the
    // dominant cost — would execute once per side
    val hashed = graft.IntraQueryCache.scoped(imageHashes(spark, dir))
    dhashBandPairs(hashed, bands = 4, maxHamming = maxHamming)
      .orderBy("doc_a", "doc_b")
  }

  /** The per-document audio envelope hashes the near-dup pipeline pairs
    * over: tiled-payload PCM16 WAV fixtures through the native decode +
    * envelope-hash chain.
    */
  private[graft] def audioHashes(spark: SparkSession,
      dir: String): DataFrame =
    audioHashesOf(Tables.documents(spark, dir).select("doc_id", "text"))

  /** Audio perceptual near-dup (rows-only driver check — the hash is
    * codec/packing-defined): document bytes ride in REAL PCM16 WAV
    * containers ([[wavOf]]), decode through the native sample path, hash
    * with the exact-integer [[graft.functions.AudioEnvHash64Expr]]
    * energy-envelope fold, and pair through [[dhashBandPairs]]' banded
    * equi-join — the [[imageNearDup]] construction at waveform grain,
    * completing the perceptual near-dup family across both decodable
    * media modalities (band → bucket join → exact Hamming confirm,
    * never all-pairs; the pigeonhole recall guarantee is the same).
    * MultimodalSpec pins the hash on analytic fixtures, entry-for-entry
    * against an independent reference fold, gain-shift behavior, and
    * banded ≡ brute-force on the full corpus.
    */
  def audioNearDup(spark: SparkSession, dir: String,
      maxHamming: Int = 3): DataFrame = {
    graft.IntraQueryCache.newGeneration(s"audiond:$dir")
    // persisted: the banded self-join consumes the hashes twice (the
    // imageNearDup rationale — WAV encode + decode + hash dominate)
    val hashed = graft.IntraQueryCache.scoped(audioHashes(spark, dir))
    dhashBandPairs(hashed, bands = 4, maxHamming = maxHamming)
      .orderBy("doc_a", "doc_b")
  }

  /** Driver-surface demo pipeline (rows-only check): documents' text bytes
    * are wrapped in REAL containers per kind — image rows become valid
    * uncompressed BMPs, audio rows valid PCM WAVs (video stays a raw blob;
    * no codec-free video layout exists) — so the pipeline's decode stage
    * exercises the real header + pixel/sample decode end-to-end, with the
    * synthetic-geometry fallback reached only by the video kind.
    */
  def mediaPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    val media = docs.mapPartitions(_.map { case (id, payload) =>
      val p = if (payload == null) Array.empty[Byte] else payload
      (id % 3) match {
        case 0 => (id, "image", bmpOf(p))
        case 1 => (id, "audio", wavOf(p))
        case _ => (id, "video", p)
      }
    }).toDF("media_id", "kind", "bytes")
    mediaStats(spark, media)
  }
}
