package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, FloatType}

/** Native PIXEL decode for the codec-free image format: uncompressed
  * (BI_RGB) 24/32-bit BMP. Unlike PNG/JPEG/GIF — whose payloads need
  * deflate/DCT/LZW codecs — a BI_RGB pixel array is a pure byte layout:
  * little-endian BGR(A) triples/quads, rows padded to 4-byte boundaries,
  * stored bottom-up unless the height field is negative. Decoding it is
  * the same altitude as the [[JpegDimsExpr]] header walk: deterministic
  * byte arithmetic, null on ANY malformation, never garbage.
  *
  * Output: packed top-down row-major interleaved bytes, BGR(A) normalized
  * to RGB(A) — `width*height*channels` bytes, channels 3 (24 bpp) or
  * 4 (32 bpp). Null for: non-BMP, non-BITMAPINFOHEADER-family DIB,
  * compressed (BI_RLE/BITFIELDS), palette depths, truncated pixel data,
  * or dimensions past the 64 MiB decode guard (an adversarial header
  * must not be able to demand an arbitrary allocation).
  */
case class BmpPixelsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${child.dataType.sql}")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    BmpPixelsExpr.pixels(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = BmpPixelsExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, bytes => {
      s"""
         |${ev.value} = ($helper).pixels($bytes);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BmpPixelsExpr =
    copy(child = newChild)

  override def prettyName: String = "bmp_pixels"
}

object BmpPixelsExpr {

  /** Decode guard: refuse headers demanding more than 64 MiB of pixels. */
  val MaxPixelBytes: Long = 64L * 1024 * 1024

  private def le2(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le4(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
      ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)

  /** Top-down row-major RGB(A) bytes, or null. */
  def pixels(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length < 54) return null
    if (b(0) != 'B' || b(1) != 'M') return null
    val dataOffset = le4(b, 10)
    val dibSize = le4(b, 14)
    if (dibSize < 40) return null // CORE/OS2 headers never carry BI_RGB truecolor here
    val width = le4(b, 18) // signed; non-positive width is malformed
    val heightRaw = le4(b, 22)
    val topDown = heightRaw < 0
    val height = math.abs(heightRaw.toLong).toInt
    if (width <= 0 || height <= 0 || heightRaw == Int.MinValue) return null
    if (le2(b, 26) != 1) return null // planes must be 1
    val bpp = le2(b, 28)
    if (bpp != 24 && bpp != 32) return null // palette/16-bit depths need masks/LUTs
    if (le4(b, 30) != 0) return null // BI_RGB only: RLE/bitfields are codec work
    val channels = bpp / 8
    val rowBytes = width.toLong * channels
    val stride = (rowBytes + 3) & ~3L // rows pad to 4-byte boundaries
    val outLen = rowBytes * height
    if (outLen > MaxPixelBytes) return null
    if (dataOffset < 54 || dataOffset.toLong + stride * height > b.length) return null
    val out = new Array[Byte](outLen.toInt)
    var row = 0
    while (row < height) {
      // bottom-up files store the LAST image row first
      val srcRow = if (topDown) row else height - 1 - row
      var src = dataOffset + (stride * srcRow).toInt
      var dst = (rowBytes * row).toInt
      var x = 0
      while (x < width) {
        // stored BGR(A) → emitted RGB(A)
        out(dst) = b(src + 2)
        out(dst + 1) = b(src + 1)
        out(dst + 2) = b(src)
        if (channels == 4) out(dst + 3) = b(src + 3)
        src += channels
        dst += channels
        x += 1
      }
      row += 1
    }
    out
  }
}

/** Native SAMPLE decode for the codec-free audio format: RIFF/WAVE PCM
  * (format tag 1) at 8 or 16 bits. A PCM data chunk is little-endian
  * interleaved sample frames — a pure byte layout, no codec. The chunk
  * walk honors RIFF word alignment (odd-sized chunks pad one byte) and
  * accepts any fmt/data chunk order, so files with LIST/INFO metadata
  * between them decode too (stricter than [[graft.operators.MultimodalOps
  * .sniffHeaders]]'s fixed-offset metadata read, which only reports the
  * canonical layout).
  *
  * Output: `array<float>` of interleaved samples normalized to [-1, 1):
  * 16-bit signed LE / 32768, 8-bit unsigned (v-128)/128. Null for:
  * non-WAVE RIFF, compressed/float formats, bit depths outside {8,16},
  * a data chunk that overruns the payload, or more samples than the
  * 16M-sample decode guard.
  */
case class WavSamplesExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    WavSamplesExpr.samples(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = WavSamplesExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, bytes => {
      s"""
         |${ev.value} = ($helper).samples($bytes);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WavSamplesExpr =
    copy(child = newChild)

  override def prettyName: String = "wav_samples"
}

object WavSamplesExpr {

  /** Decode guard: refuse data chunks demanding more than 16M samples. */
  val MaxSamples: Long = 16L * 1024 * 1024

  private def le2(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le4(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
      ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)).toLong & 0xFFFFFFFFL

  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0) && b(i + 1) == t.charAt(1) &&
      b(i + 2) == t.charAt(2) && b(i + 3) == t.charAt(3)

  /** Interleaved normalized sample frames, or null. */
  def samples(b: Array[Byte]): GenericArrayData = {
    if (b == null || b.length < 44) return null
    if (!tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return null
    var bits = -1
    var dataOff = -1
    var dataLen = -1L
    var i = 12
    // chunk walk: any chunk order, odd sizes pad to word boundaries
    while (i + 8 <= b.length && (bits < 0 || dataOff < 0)) {
      val size = le4(b, i + 4)
      val body = i + 8
      if (tag(b, i, "fmt ")) {
        if (size < 16 || body + 16 > b.length) return null
        if (le2(b, body) != 1) return null // PCM only: float/ADPCM are codec work
        if (le2(b, body + 2) < 1) return null // channel count
        bits = le2(b, body + 14)
        if (bits != 8 && bits != 16) return null
      } else if (tag(b, i, "data")) {
        dataOff = body
        dataLen = size
      }
      i = body + size.toInt + (size.toInt & 1)
      if (i <= body) return null // zero/overflowing chunk size: no progress
    }
    if (bits < 0 || dataOff < 0) return null
    if (dataOff + dataLen > b.length) return null // truncated data: null, not a short read
    val bytesPer = bits / 8
    val n = dataLen / bytesPer
    if (n > MaxSamples) return null
    val out = new Array[Float](n.toInt)
    var s = 0
    if (bits == 16) {
      while (s < out.length) {
        val v = ((b(dataOff + 2 * s) & 0xFF) |
          (b(dataOff + 2 * s + 1) << 8)).toShort
        out(s) = v / 32768.0f
        s += 1
      }
    } else {
      while (s < out.length) {
        out(s) = ((b(dataOff + s) & 0xFF) - 128) / 128.0f
        s += 1
      }
    }
    new GenericArrayData(out)
  }
}
