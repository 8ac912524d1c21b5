package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}

/** Fused native kernels for the winnow fingerprint family (r16 —
  * optimization round). The declarative forms they replace were built
  * from higher-order functions (`transform(sequence(...), ...)`), which
  * are CodegenFallback in Spark 4 — every window evaluated an
  * interpreted expression tree, and the md5 tier additionally rendered
  * a 32-char hex string per gram and re-parsed 15 chars of it with
  * `conv` (`md5` → `substring` → `conv`). Each kernel is one primitive
  * loop per row producing exactly the same values:
  *
  *  - [[Md5Gram60Expr]]   ≡ transform(sequence(1, n−k+1), s =>
  *                            conv(substring(md5(concat_ws(" ",
  *                            tk[s..s+k−1])), 1, 15), 16, 10)::long
  *  - [[XxGram64Expr]]    ≡ the same windows under xxhash64
  *  - [[WinnowSelectExpr]] ≡ array_distinct(transform(sequence(1, n−w+1),
  *                            j => struct(min of hs[j..j+w−1],
  *                            rightmost position of that min)))
  *
  * Equivalence is pinned entry-for-entry by WinnowKernelSpec against the
  * original expression trees, so the DuckDB oracle replay (and the
  * maintained WinnowIndex artifact's stored fingerprints) are untouched.
  */
private[functions] object GramHash {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val digestBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }
  private val space = Array[Byte](' ')
  // reusable gram byte buffer for the xx tier (xxhash64 needs one
  // contiguous block; md5 streams via update())
  private val gramBuf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](256)
  }

  /** All k-gram 60-bit md5 prefixes of a token array: window s..s+k-1
    * joined by single spaces with NULL TOKENS SKIPPED (concat_ws
    * semantics — no separator is emitted for a null), md5 of the UTF-8
    * bytes, first 60 bits as a long.
    */
  def md5Grams(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    val out = new Array[Long](n - k + 1)
    val d = md.get()
    val buf = digestBuf.get()
    var s = 0
    while (s <= n - k) {
      d.reset()
      var emitted = false
      var j = 0
      while (j < k) {
        if (!toks.isNullAt(s + j)) {
          if (emitted) d.update(space)
          val t = toks.getUTF8String(s + j)
          d.update(t.getBytes)
          emitted = true
        }
        j += 1
      }
      d.digest(buf, 0, 16)
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (buf(i) & 0xffL); i += 1 }
      out(s) = v >>> 4
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** All k-gram xxhash64 values of a token array — the same joined-gram
    * bytes as [[md5Grams]] under Spark's xxhash64 (seed 42).
    */
  def xxGrams(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    val out = new Array[Long](n - k + 1)
    var s = 0
    while (s <= n - k) {
      var buf = gramBuf.get()
      var len = 0
      var emitted = false
      var j = 0
      while (j < k) {
        if (!toks.isNullAt(s + j)) {
          val t = toks.getUTF8String(s + j)
          val tb = t.numBytes()
          val need = len + tb + 1
          if (need > buf.length) {
            val grown = new Array[Byte](math.max(need, buf.length * 2))
            System.arraycopy(buf, 0, grown, 0, len)
            gramBuf.set(grown)
            buf = grown
          }
          if (emitted) { buf(len) = ' '; len += 1 }
          t.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + len)
          len += tb
          emitted = true
        }
        j += 1
      }
      out(s) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L)
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Winnow window-min selection over a gram-hash array: per window
    * start j (1-based, windows of `w`), the minimum hash and the
    * RIGHTMOST position holding it, deduplicated to first occurrences —
    * `array_distinct` of the declarative when-chain tree, exactly.
    * Null hashes (never produced by the gram kernels, but legal input)
    * follow least()/when() semantics: skipped for the min; a window of
    * all-null hashes selects (p = j, v = null).
    */
  def select(hs: ArrayData, w: Int): ArrayData = {
    val n = hs.numElements()
    if (n < w) return new GenericArrayData(new Array[Any](0))
    val pairs = new scala.collection.mutable.ArrayBuffer[InternalRow]()
    // duplicate (p, v) selections are always CONSECUTIVE window runs:
    // two windows j1 < j2 selecting the same (p, v) overlap at p (so
    // j2 − j1 ≤ w−1), their union has min v, and every window between
    // contains p, has min v, and has no v to p's right — so it selects
    // (p, v) too. array_distinct over the run therefore reduces to a
    // compare-with-last (WinnowKernelSpec pins kernel ≡ declarative
    // tree, distinct included).
    var lastP = -1L
    var lastV = 0L
    var lastVNull = false
    var have = false
    var j = 1
    while (j <= n - w + 1) {
      var v = Long.MaxValue
      var any = false
      var o = 0
      while (o < w) {
        if (!hs.isNullAt(j + o - 1)) {
          val x = hs.getLong(j + o - 1)
          if (!any || x < v) { v = x; any = true }
        }
        o += 1
      }
      // rightmost position equal to the min (the when-chain checks
      // o = w−1 first); all-null windows fall through to p = j
      var p = j.toLong
      if (any) {
        var o = w - 1
        var found = false
        while (o >= 1 && !found) {
          if (!hs.isNullAt(j + o - 1) && hs.getLong(j + o - 1) == v) {
            p = (j + o).toLong; found = true
          }
          o -= 1
        }
        if (!found) p = j.toLong // position 0 of the window (els base)
      }
      val dup = have && lastP == p &&
        (if (any) !lastVNull && lastV == v else lastVNull)
      if (!dup) {
        pairs += new GenericInternalRow(Array[Any](p,
          if (any) java.lang.Long.valueOf(v) else null))
        lastP = p; lastV = v; lastVNull = !any; have = true
      }
      j += 1
    }
    new GenericArrayData(pairs.toArray[Any])
  }
}

/** `md5_gram60(toks, k)` — array of per-window 60-bit md5 gram hashes. */
case class Md5Gram60Expr(first: Expression, second: Expression)
    extends BinaryExpression {
  override def left: Expression = first
  override def right: Expression = second

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, int), got $other")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = first.nullable || second.nullable

  override protected def nullSafeEval(toks: Any, k: Any): Any =
    GramHash.md5Grams(toks.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = GramHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (t, k) => s"${ev.value} = ($helper).md5Grams($t, $k);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression): Md5Gram60Expr =
    copy(first = newFirst, second = newSecond)

  override def prettyName: String = "md5_gram60"
}

/** `xx_gram64(toks, k)` — array of per-window xxhash64 gram hashes. */
case class XxGram64Expr(first: Expression, second: Expression)
    extends BinaryExpression {
  override def left: Expression = first
  override def right: Expression = second

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, int), got $other")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = first.nullable || second.nullable

  override protected def nullSafeEval(toks: Any, k: Any): Any =
    GramHash.xxGrams(toks.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = GramHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (t, k) => s"${ev.value} = ($helper).xxGrams($t, $k);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression): XxGram64Expr =
    copy(first = newFirst, second = newSecond)

  override def prettyName: String = "xx_gram64"
}

/** `winnow_select(hs, w)` — distinct (p, v) window-min selections. */
case class WinnowSelectExpr(first: Expression, second: Expression)
    extends BinaryExpression {
  override def left: Expression = first
  override def right: Expression = second

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType) match {
      case (ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, int), got $other")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("p", LongType, nullable = false),
    StructField("v", LongType, nullable = true))), containsNull = false)
  override def nullable: Boolean = first.nullable || second.nullable

  override protected def nullSafeEval(hs: Any, w: Any): Any =
    GramHash.select(hs.asInstanceOf[ArrayData], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = GramHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (h, w) => s"${ev.value} = ($helper).select($h, $w);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression): WinnowSelectExpr =
    copy(first = newFirst, second = newSecond)

  override def prettyName: String = "winnow_select"
}
