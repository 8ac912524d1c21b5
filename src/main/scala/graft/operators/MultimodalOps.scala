package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column operators for training-data pipelines: image/audio/
  * video travel as opaque `binary` columns with typed metadata, and the
  * decode / feature / resize / frame-sample stages are structured exactly
  * as they would be against real codecs.
  *
  * STUB NOTE: no media codecs exist in this environment, so `decode` is a
  * deterministic fake — every derived quantity is a pure function of the
  * bytes (xxhash64-seeded), clearly marked below. The Spark-side contract —
  * schemas, nullability, batch iteration shape, partitioning behavior — is
  * real and tested; swapping in a codec changes only the marked functions.
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
      .withColumn("hdr_channels", when(isWav, leInt(23, 2)))
      .withColumn("hdr_sample_rate", when(isWav, leInt(25, 4)))
  }

  /** STUB decode: dimensions derived deterministically from the content
    * hash (a real implementation parses the container header — see
    * [[sniffHeaders]] for the formats where that needs no codec). Native
    * column expressions — stays in codegen, no serialization fence.
    */
  def decodeStub(media: DataFrame, bytesCol: String = "bytes"): DataFrame = {
    val h = abs(xxhash64(col(bytesCol)))
    media
      .withColumn("n_bytes", length(col(bytesCol)).cast("long"))
      .withColumn("width", (h % 1920 + 1).cast("int"))
      .withColumn("height", ((h / 1920) % 1080 + 1).cast("int"))
      .withColumn("channels", (h % 3 + 1).cast("int"))
  }

  /** STUB resize: recompute target dims preserving aspect ratio — metadata
    * math is real, pixel work would happen in the decode kernel.
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
    * once, emit a fixed 8-float vector per row. STUB math: byte histogram
    * moments; a real extractor runs the model forward pass here.
    */
  def features(spark: SparkSession, media: DataFrame,
      idCol: String = "media_id", bytesCol: String = "bytes"): DataFrame = {
    val dim = 8
    import spark.implicits._
    val src = media.select(col(idCol).cast("long"), col(bytesCol)).as[(Long, Array[Byte])]
    src.mapPartitions { it =>
      // per-partition init happens HERE (codec/model context in real impl)
      val hist = new Array[Long](256)
      it.map { case (id, bytes) =>
        val f = new Array[Float](dim)
        var entropy = 0.0
        if (bytes != null && bytes.length > 0) {
          java.util.Arrays.fill(hist, 0L)
          var i = 0
          while (i < bytes.length) {
            val b = bytes(i) & 0xff
            f(i % dim) += b / 255.0f
            hist(b) += 1
            i += 1
          }
          val n = math.max(1, bytes.length / dim)
          var j = 0
          while (j < dim) { f(j) /= n.toFloat; j += 1 }
          // REAL Shannon entropy in bits/byte over the byte histogram
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
    }(Encoders.product[MediaFeatures]).toDF("media_id", "features", "entropy")
  }

  /** Driver-surface demo pipeline (rows-only check): documents' text bytes
    * stand in for media payloads; decode-stub → resize → per-kind stats.
    */
  def mediaPipeline(spark: SparkSession, dir: String): DataFrame = {
    val media = Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        (col("doc_id") % 3).cast("int").as("k"),
        col("text").cast("binary").as("bytes"))
      .withColumn("kind",
        when(col("k") === 0, "image").when(col("k") === 1, "audio").otherwise("video"))
    val decoded = resizeMeta(decodeStub(sniffHeaders(media)), maxDim = 512)
    val feats = features(spark, decoded)
    decoded.join(feats, "media_id")
      .groupBy("kind")
      .agg(count(lit(1)).as("n"),
        avg(col("out_width")).as("avg_w"),
        avg(col("out_height")).as("avg_h"),
        avg(element_at(col("features"), 1)).as("avg_f0"),
        avg(col("entropy")).as("avg_entropy"))
      .orderBy("kind")
  }
}
