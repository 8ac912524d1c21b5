package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused native kernels for the row-wise text hot paths (r16 —
  * optimization round). Like the winnow kernels, each replaces a
  * higher-order-function expression tree (CodegenFallback in Spark 4:
  * interpreted per element, a struct or string allocation per step)
  * with one primitive loop per row producing exactly the same values —
  * TextKernelSpec pins every kernel against the declarative tree it
  * replaced, so the DuckDB oracle replays are untouched.
  */
private[functions] object TextKernels {

  private def hashStr(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  /** Σ length(token) — `aggregate(toks, 0L, (a, t) => a + length(t))`:
    * character (not byte) lengths; a null element nulls the whole sum
    * (`a + length(null)` null-propagates and never recovers).
    */
  def tokLenSum(toks: ArrayData): Any = {
    val n = toks.numElements()
    var sum = 0L
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) return null
      sum += toks.getUTF8String(i).numChars()
      i += 1
    }
    java.lang.Long.valueOf(sum)
  }

  /** Longest equal-run over a sorted view — the modeCount fold:
    * `aggregate(array_sort(arr), ("", 0, 0), ...)`. array_sort orders
    * ascending with nulls LAST; a null element never extends a run
    * (null === prev is null → run restarts at 1), so each null
    * contributes max(best, 1), exactly like any singleton.
    */
  private def modeOf(elems: Array[UTF8String], nNulls: Int): Long = {
    java.util.Arrays.sort(elems, (a: UTF8String, b: UTF8String) => a.compareTo(b))
    var best = if (nNulls > 0) 1L else 0L
    var run = 0L
    var i = 0
    while (i < elems.length) {
      if (i > 0 && elems(i).equals(elems(i - 1))) run += 1L
      else run = 1L
      if (run > best) best = run
      i += 1
    }
    best
  }

  /** modeCount(arr) — most frequent element's count, 0 for empty. */
  def modeCount(arr: ArrayData): Long = {
    val n = arr.numElements()
    var nn = 0
    var i = 0
    while (i < n) { if (!arr.isNullAt(i)) nn += 1; i += 1 }
    val elems = new Array[UTF8String](nn)
    var j = 0
    i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { elems(j) = arr.getUTF8String(i); j += 1 }
      i += 1
    }
    modeOf(elems, n - nn)
  }

  /** modeCount(bigrams(toks)) — most frequent space-joined adjacent
    * token pair; a pair with a null member is a null bigram (`concat`
    * null-propagates); < 2 tokens → 0 (the empty-array fold).
    */
  def bigramModeCount(toks: ArrayData): Long = {
    val n = toks.numElements()
    if (n < 2) return 0L
    var nn = 0
    var i = 0
    while (i < n - 1) {
      if (!toks.isNullAt(i) && !toks.isNullAt(i + 1)) nn += 1
      i += 1
    }
    val elems = new Array[UTF8String](nn)
    var j = 0
    i = 0
    while (i < n - 1) {
      if (!toks.isNullAt(i) && !toks.isNullAt(i + 1)) {
        elems(j) = UTF8String.concat(toks.getUTF8String(i),
          TextKernels.space, toks.getUTF8String(i + 1))
        j += 1
      }
      i += 1
    }
    modeOf(elems, (n - 1) - nn)
  }

  private val space = UTF8String.fromString(" ")
  private val struct2Fields = StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false)))

  /** The span family's per-window 128-bit keys — windowOccs' tree:
    * th = xxhash64 per token (null token → the bare seed 42, like the
    * single-null-child builtin), then per window start s (1-based,
    * windows of w): h1 = xxhash64(th[s..s+w−1]) and
    * h2 = xxhash64(0x9E3779B97F4A7C15, th[s..s+w−1]) — the builtin's
    * left-to-right hashLong folding from seed 42. In window order
    * (posexplode consumes positions); fewer than w tokens → empty.
    */
  def windowKeys2(toks: ArrayData, w: Int): ArrayData = {
    val n = toks.numElements()
    if (n < w) return new GenericArrayData(new Array[Any](0))
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = if (toks.isNullAt(i)) 42L else hashStr(toks.getUTF8String(i), 42L)
      i += 1
    }
    val out = new Array[Any](n - w + 1)
    var s = 0
    while (s <= n - w) {
      var h1 = 42L
      var h2 = XXH64.hashLong(-7046029254386353131L, 42L) // 0x9E3779B97F4A7C15
      var j = 0
      while (j < w) {
        h1 = XXH64.hashLong(th(s + j), h1)
        h2 = XXH64.hashLong(th(s + j), h2)
        j += 1
      }
      out(s) = new GenericInternalRow(Array[Any](h1, h2))
      s += 1
    }
    new GenericArrayData(out)
  }

  /** The chunk family's distinct per-chunk 128-bit keys — chunkKeys'
    * tree: token hashes fold per fixed-stride chunk (starts 1, 1+n,
    * 1+2n, …; the final chunk truncates) under two salt accumulators
    * with `acc = xxhash64(acc, x)` chaining; distinct by first
    * occurrence (array_distinct).
    */
  def chunkKeys2(toks: ArrayData, cn: Int): ArrayData = {
    val n = toks.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = if (toks.isNullAt(i)) 42L else hashStr(toks.getUTF8String(i), 42L)
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow]()
    val seen = new scala.collection.mutable.HashSet[(Long, Long)]()
    var s = 0
    while (s < n) {
      var h1 = 1469598103934665603L
      var h2 = -7046029254386353131L
      val end = math.min(s + cn, n)
      var j = s
      while (j < end) {
        // xxhash64(acc, x): seed 42, fold acc then x
        h1 = XXH64.hashLong(th(j), XXH64.hashLong(h1, 42L))
        h2 = XXH64.hashLong(th(j), XXH64.hashLong(h2, 42L))
        j += 1
      }
      if (seen.add((h1, h2))) out += new GenericInternalRow(Array[Any](h1, h2))
      s += cn
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** In-order space-joined word n-grams (topNgrams' explode input):
    * window starts 1..len−n+1, concat_ws null-skip semantics; fewer
    * than n tokens → empty (the caller's size gate).
    */
  def gramStrings(toks: ArrayData, gn: Int): ArrayData = {
    val n = toks.numElements()
    if (n < gn) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](n - gn + 1)
    var s = 0
    while (s <= n - gn) {
      out(s) = joinWindow(toks, s, gn)
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct space-joined word n-grams under the minhash windowing
    * (starts 0..max(len−n, 0) — one PARTIAL window when the document
    * is shorter than n, out-of-range lookups skipped like
    * try_element_at + concat_ws), distinct by first occurrence.
    */
  def gramStringsDistinct(toks: ArrayData, gn: Int): ArrayData = {
    val n = toks.numElements()
    val last = math.max(n - gn, 0)
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    val seen = new scala.collection.mutable.HashSet[UTF8String]()
    var s = 0
    while (s <= last) {
      val g = joinWindow(toks, s, math.min(gn, n - s))
      if (seen.add(g)) out += g
      s += 1
    }
    new GenericArrayData(out.toArray)
  }

  private def joinWindow(toks: ArrayData, start: Int, len: Int): UTF8String = {
    val parts = new Array[UTF8String](len)
    var j = 0
    while (j < len) {
      // null tokens stay null — concatWs skips them without a separator
      parts(j) = if (toks.isNullAt(start + j)) null
        else toks.getUTF8String(start + j)
      j += 1
    }
    UTF8String.concatWs(space, parts: _*)
  }
}

private[functions] trait TextArrayKernel extends BinaryExpression {
  def first: Expression
  def second: Expression
  override def left: Expression = first
  override def right: Expression = second
  override def nullable: Boolean = first.nullable || second.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, int), got $other")
    }
  protected def helperCall(e: String, k: String): String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, k) => s"${ev.value} = ${helperCall(e, k)};")
  protected val helper: String =
    TextKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
}

/** `tok_len_sum(toks)` — Σ length(token), null on any null token. */
case class TokLenSumExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override protected def nullSafeEval(toks: Any): Any =
    TextKernels.tokLenSum(toks.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = TextKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val tmp = ctx.freshName("lenSum")
    nullSafeCodeGen(ctx, ev, e =>
      s"""Object $tmp = ($helper).tokLenSum($e);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((java.lang.Long) $tmp).longValue(); }""".stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): TokLenSumExpr =
    copy(child = newChild)
  override def prettyName: String = "tok_len_sum"
}

/** `mode_count(arr)` — the most frequent element's occurrence count. */
case class ModeCountExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override protected def nullSafeEval(arr: Any): Any =
    TextKernels.modeCount(arr.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = TextKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, e => s"${ev.value} = ($helper).modeCount($e);")
  }
  override protected def withNewChildInternal(newChild: Expression): ModeCountExpr =
    copy(child = newChild)
  override def prettyName: String = "mode_count"
}

/** `bigram_mode_count(toks)` — mode_count over space-joined adjacent
  * token pairs, fused (no bigram string array materialized in the plan).
  */
case class BigramModeCountExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override protected def nullSafeEval(arr: Any): Any =
    TextKernels.bigramModeCount(arr.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = TextKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, e => s"${ev.value} = ($helper).bigramModeCount($e);")
  }
  override protected def withNewChildInternal(newChild: Expression): BigramModeCountExpr =
    copy(child = newChild)
  override def prettyName: String = "bigram_mode_count"
}

/** `window_keys2(toks, w)` — per-window (h1, h2) span keys, in order. */
case class WindowKeys2Expr(first: Expression, second: Expression)
    extends TextArrayKernel {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false))), containsNull = false)
  override protected def nullSafeEval(toks: Any, w: Any): Any =
    TextKernels.windowKeys2(toks.asInstanceOf[ArrayData], w.asInstanceOf[Int])
  override protected def helperCall(e: String, k: String): String =
    s"($helper).windowKeys2($e, $k)"
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression): WindowKeys2Expr =
    copy(first = newFirst, second = newSecond)
  override def prettyName: String = "window_keys2"
}

/** `chunk_keys2(toks, n)` — distinct fixed-stride chunk (h1, h2) keys. */
case class ChunkKeys2Expr(first: Expression, second: Expression)
    extends TextArrayKernel {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false))), containsNull = false)
  override protected def nullSafeEval(toks: Any, cn: Any): Any =
    TextKernels.chunkKeys2(toks.asInstanceOf[ArrayData], cn.asInstanceOf[Int])
  override protected def helperCall(e: String, k: String): String =
    s"($helper).chunkKeys2($e, $k)"
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression): ChunkKeys2Expr =
    copy(first = newFirst, second = newSecond)
  override def prettyName: String = "chunk_keys2"
}

/** `gram_strings(toks, n)` — in-order space-joined n-grams. */
case class GramStringsExpr(first: Expression, second: Expression)
    extends TextArrayKernel {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(toks: Any, gn: Any): Any =
    TextKernels.gramStrings(toks.asInstanceOf[ArrayData], gn.asInstanceOf[Int])
  override protected def helperCall(e: String, k: String): String =
    s"($helper).gramStrings($e, $k)"
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression): GramStringsExpr =
    copy(first = newFirst, second = newSecond)
  override def prettyName: String = "gram_strings"
}

/** `gram_strings_distinct(toks, n)` — distinct n-grams under the
  * minhash windowing (partial window for short docs).
  */
case class GramStringsDistinctExpr(first: Expression, second: Expression)
    extends TextArrayKernel {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(toks: Any, gn: Any): Any =
    TextKernels.gramStringsDistinct(toks.asInstanceOf[ArrayData],
      gn.asInstanceOf[Int])
  override protected def helperCall(e: String, k: String): String =
    s"($helper).gramStringsDistinct($e, $k)"
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression): GramStringsDistinctExpr =
    copy(first = newFirst, second = newSecond)
  override def prettyName: String = "gram_strings_distinct"
}
