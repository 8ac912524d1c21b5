package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** Native 64-bit DIFFERENCE HASH (dHash) over decoded pixel bytes — the
  * image face of the perceptual near-dup family (the minhash/simhash
  * role at pixel grain): two images whose CONTENT is close hash to
  * nearby 64-bit codes (small Hamming distance) even when their bytes
  * differ, so near-duplicate images band and bucket-join exactly like
  * the text tiers ([[graft.operators.MultimodalOps.imageNearDup]]),
  * never all-pairs.
  *
  * The fold is EXACT INTEGER end-to-end (the engine's oracle-tier
  * discipline — every engine replaying it bit-agrees):
  *  1. grayscale per pixel: `(77·R + 151·G + 28·B) ` (the classic
  *     integer Rec.601 weights summing to 256; alpha, when present, is
  *     ignored) — kept as an integer SUM per grid cell, never floats;
  *  2. a 9×8 grid of box averages: cell (gx, gy) averages the pixel box
  *     `[gx·W/9, (gx+1)·W/9) × [gy·H/8, (gy+1)·H/8)` (integer bounds,
  *     at least one pixel per cell — requires W ≥ 9, H ≥ 8) via exact
  *     integer division of the cell sum by its pixel count;
  *  3. 64 bits: bit `gy·8 + gx` is 1 iff cell (gx+1, gy) > cell
  *     (gx, gy) — horizontal brightness deltas, robust to uniform
  *     brightness/contrast shifts by construction.
  *
  * Null (never garbage) for null/short pixel payloads, non-positive or
  * sub-grid dimensions, or channels outside {3, 4} — the
  * [[JpegDimsExpr]] malformation posture. Codegen is a static call
  * around the tight pixel loop, inside whole-stage codegen.
  */
case class DHash64Expr(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == BinaryType && second.dataType == IntegerType &&
      third.dataType == IntegerType && fourth.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, int, int, int) arguments, got " +
        s"(${first.dataType.sql}, ${second.dataType.sql}, " +
        s"${third.dataType.sql}, ${fourth.dataType.sql})")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def nullSafeEval(px: Any, w: Any, h: Any, c: Any): Any =
    DHash64Expr.hash(px.asInstanceOf[Array[Byte]], w.asInstanceOf[Int],
      h.asInstanceOf[Int], c.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val helper = DHash64Expr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (px, w, h, c) => {
      val r = ctx.freshName("dhash")
      s"""
         |java.lang.Long $r = ($helper).hash($px, $w, $h, $c);
         |${ev.isNull} = $r == null;
         |${ev.value} = ${ev.isNull} ? 0L : $r.longValue();
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): DHash64Expr =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)

  override def prettyName: String = "dhash64"
}

/** Native 64-bit ENERGY-ENVELOPE difference hash over decoded PCM
  * sample frames — the audio face of the perceptual near-dup family
  * (the [[DHash64Expr]] construction in one dimension): the waveform
  * splits into 65 windows, each window's mean |amplitude| is an exact
  * integer (samples come from [[WavSamplesExpr]] as `int16 / 32768.0f`
  * — a power-of-two division, so `round(s · 32768)` recovers the
  * original integer sample exactly; sums and the window division stay
  * in longs), and bit `w` is 1 iff window w+1 is louder than window w.
  * Robust to uniform GAIN in the minhash-banding sense, not invariant:
  * a positive scale preserves the ORDER of the true window means, but
  * the integer-mean truncation can collapse a comparison whose margin
  * shrinks below one truncation step (e.g. means 2<3 halving to 1=1),
  * flipping that bit — so gain-shifted copies land NEAR each other
  * (few low-margin bits move, the Hamming gate absorbs them), while
  * comparisons with margin above the step are preserved exactly (the
  * brightness analog in [[DHash64Expr]] has the same fine print). Null
  * (never garbage) for null or sub-grid (< 65 samples) input.
  */
case class AudioEnvHash64Expr(child: Expression) extends
    org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float>, got ${other.sql}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    AudioEnvHash64Expr.hash(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val helper = AudioEnvHash64Expr.getClass.getName.stripSuffix("$") +
      "$.MODULE$"
    nullSafeCodeGen(ctx, ev, samples => {
      val r = ctx.freshName("ahash")
      s"""
         |java.lang.Long $r = ($helper).hash($samples);
         |${ev.isNull} = $r == null;
         |${ev.value} = ${ev.isNull} ? 0L : $r.longValue();
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): AudioEnvHash64Expr = copy(child = newChild)

  override def prettyName: String = "audio_env_hash64"
}

object AudioEnvHash64Expr {

  private val windows = 65 // 64 adjacent-window comparisons

  /** The 64-bit envelope hash, or null for < 65 samples. */
  def hash(samples: org.apache.spark.sql.catalyst.util.ArrayData)
      : java.lang.Long = {
    if (samples == null) return null
    val n = samples.numElements()
    if (n < windows) return null
    val env = new Array[Long](windows)
    var w = 0
    while (w < windows) {
      val i0 = (w.toLong * n / windows).toInt
      val i1 = ((w + 1).toLong * n / windows).toInt
      var sum = 0L
      var i = i0
      while (i < i1) {
        // exact int16 recovery: WavSamplesExpr normalizes by 2^15.
        // Round in LONG space (math.round(Float) saturates at
        // Int.MinValue, whose abs is still negative) and clamp the
        // per-sample magnitude: the function is SQL-registered, so
        // arbitrary float arrays must stay "null or sane", and the
        // clamp bounds the window sum under 2^62 (window < 2^31
        // samples × 2^31 magnitude). Int16-range inputs are far below
        // the clamp, so the decoded-WAV hash is bit-identical.
        val r = math.round(samples.getFloat(i).toDouble * 32768d)
        sum += (if (r < -(1L << 31) || r > (1L << 31)) 1L << 31
                else math.abs(r))
        i += 1
      }
      env(w) = sum / (i1 - i0)
      w += 1
    }
    var bits = 0L
    w = 0
    while (w < windows - 1) {
      if (env(w + 1) > env(w)) bits |= 1L << w
      w += 1
    }
    java.lang.Long.valueOf(bits)
  }
}

object DHash64Expr {

  private val gridW = 9
  private val gridH = 8

  /** The 64-bit dHash, or null on any malformation (see class doc). */
  def hash(px: Array[Byte], width: Int, height: Int,
      channels: Int): java.lang.Long = {
    if (px == null || width < gridW || height < gridH) return null
    if (channels != 3 && channels != 4) return null
    if (px.length < width.toLong * height * channels) return null
    // cell averages: exact integer box sums / pixel counts
    val avg = new Array[Long](gridW * gridH)
    var gy = 0
    while (gy < gridH) {
      val y0 = gy * height / gridH
      val y1 = (gy + 1) * height / gridH
      var gx = 0
      while (gx < gridW) {
        val x0 = gx * width / gridW
        val x1 = (gx + 1) * width / gridW
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          val rowOff = y.toLong * width
          while (x < x1) {
            val i = ((rowOff + x) * channels).toInt
            sum += 77L * (px(i) & 0xff) + 151L * (px(i + 1) & 0xff) +
              28L * (px(i + 2) & 0xff)
            x += 1
          }
          y += 1
        }
        avg(gy * gridW + gx) = sum / ((y1 - y0).toLong * (x1 - x0))
        gx += 1
      }
      gy += 1
    }
    var bits = 0L
    gy = 0
    while (gy < gridH) {
      var gx = 0
      while (gx < gridW - 1) { // 8 comparisons per row (gx vs gx+1)
        if (avg(gy * gridW + gx + 1) > avg(gy * gridW + gx))
          bits |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    java.lang.Long.valueOf(bits)
  }
}
