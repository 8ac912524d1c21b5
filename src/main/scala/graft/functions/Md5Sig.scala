package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Shared md5/60-bit kernel of the cross-engine oracle hash family:
  * `h60(s) = conv(substring(md5(s), 1, 15), 16, 10)` — the first 15 hex
  * characters of the md5 digest as a 60-bit integer, computed here
  * directly from the digest bytes (the first 15 nibbles are the
  * big-endian first 8 bytes shifted right by one nibble), skipping the
  * hex-string render and decimal parse entirely. Digest instances and
  * output buffers are thread-local — zero per-call allocation beyond
  * the UTF-8 byte view.
  */
private[functions] object Md5H60 {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val buf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }

  /** 60-bit md5 prefix of (prefix ++ bytes) — prefix may be empty. */
  def h60(prefix: Array[Byte], bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    if (prefix.length > 0) d.update(prefix)
    d.update(bytes)
    val out = buf.get()
    d.digest(out, 0, 16)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (out(i) & 0xffL); i += 1 }
    v >>> 4
  }
}

/** Native fused md5-tier minhash signature over an `array<string>`
  * element column: entry i of the k-long result is
  * `min over elems of h60(i + "|" + elem)` — exactly the
  * `array_min(transform(elems, s => h60(concat(lit("i|"), s))))` tree
  * per hash function it replaces
  * ([[graft.operators.TextOps.MinHashMd5]]), with three wins folded
  * into one primitive loop: ONE pass over the element array for all k
  * functions (not k interpreted traversals), no hex-string/conv
  * round-trip per hash (digest bytes to long directly), and no
  * CodegenFallback — the k HOF trees dropped their whole Project out
  * of whole-stage codegen. Null elements are skipped (array_min
  * semantics); an entry with no contributing element is null (the
  * empty-array array_min), so outputs are field-for-field identical
  * and the DuckDB oracle replay is untouched.
  */
case class Md5MinSigExpr(first: Expression, second: Expression)
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

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = true)
  override def nullable: Boolean = first.nullable || second.nullable

  override protected def nullSafeEval(elems: Any, k: Any): Any =
    Md5MinSigExpr.sig(elems.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = Md5MinSigExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (e, k) =>
      s"${ev.value} = ($helper).sig($e, $k);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression): Md5MinSigExpr =
    copy(first = newFirst, second = newSecond)

  override def prettyName: String = "md5_min_sig"
}

object Md5MinSigExpr {
  // seed prefixes "0|".."63|" are stable — cache the byte forms once
  private val prefixes: Array[Array[Byte]] =
    Array.tabulate(64)(i => s"$i|".getBytes("UTF-8"))

  def sig(elems: ArrayData, k: Int): ArrayData = {
    // a clean contract error beats an ArrayIndexOutOfBounds mid-job:
    // the function is session-registered, so any SQL caller can pass k
    if (k < 0 || k > prefixes.length) {
      throw new IllegalArgumentException(
        s"md5_min_sig supports 0 <= k <= ${prefixes.length}, got $k")
    }
    val mins = new Array[Long](k)
    val seen = new Array[Boolean](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = elems.numElements()
    var e = 0
    while (e < n) {
      if (!elems.isNullAt(e)) {
        val bytes = elems.getUTF8String(e).getBytes
        var i = 0
        while (i < k) {
          val h = Md5H60.h60(prefixes(i), bytes)
          if (h < mins(i)) { mins(i) = h; seen(i) = true }
          i += 1
        }
      }
      e += 1
    }
    val out = new Array[Any](k)
    var i = 0
    while (i < k) {
      out(i) = if (seen(i)) java.lang.Long.valueOf(mins(i)) else null
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native element-wise h60 over an `array<string>` column — the
  * `transform(arr, s => h60(s))` form without the higher-order-function
  * CodegenFallback (the simhash md5 tier's token-hash pass,
  * [[graft.operators.TextOps.SimHashMd5]]). Null elements map to null
  * elements, preserving transform semantics exactly.
  */
case class Md5H60ArrayExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = true)

  override protected def nullSafeEval(elems: Any): Any =
    Md5H60ArrayExpr.hashes(elems.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = Md5H60ArrayExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, e =>
      s"${ev.value} = ($helper).hashes($e);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5H60ArrayExpr =
    copy(child = newChild)

  override def prettyName: String = "md5_h60_array"
}

object Md5H60ArrayExpr {
  private val empty = new Array[Byte](0)

  def hashes(elems: ArrayData): ArrayData = {
    val n = elems.numElements()
    val out = new Array[Any](n)
    var e = 0
    while (e < n) {
      out(e) =
        if (elems.isNullAt(e)) null
        else java.lang.Long.valueOf(
          Md5H60.h60(empty, elems.getUTF8String(e).getBytes))
      e += 1
    }
    new GenericArrayData(out)
  }
}
