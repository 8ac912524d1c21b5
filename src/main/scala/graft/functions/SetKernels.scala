package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused native kernels for the jaccard pair-engine's scan-side set
  * builders (r17 — optimization round 2). The pair engine's per-document
  * sorted distinct hash sets were built with interpreted HOF chains
  * (`sort_array(array_distinct(transform(tokens, xxhash64)))` and the
  * word-n-gram `shingles` tree) — CodegenFallback in Spark 4, a boxed
  * Long per element per step plus three intermediate arrays. Each kernel
  * below is one primitive loop per row producing exactly the same sorted
  * distinct `array<bigint>`; SetKernelSpec pins every kernel against the
  * declarative tree it replaced, so the DuckDB oracle replays are
  * untouched.
  */
private[functions] object SetKernels {

  private def hashStr(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  /** Sort ascending and dedup in place; returns an unboxed primitive
    * array wrapped as UnsafeArrayData (containsNull = false).
    */
  private def sortedDistinct(hs: Array[Long]): ArrayData = {
    java.util.Arrays.sort(hs)
    var w = 0
    var i = 0
    while (i < hs.length) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(hs, w))
  }

  /** `hash_set_sorted(toks)` ≡
    * `sort_array(array_distinct(transform(toks, x => xxhash64(x))))`:
    * the unigram token-hash set. A null token hashes to the bare seed 42
    * (the single-null-child xxhash64 builtin).
    */
  def hashSetSorted(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      hs(i) = if (toks.isNullAt(i)) 42L else hashStr(toks.getUTF8String(i), 42L)
      i += 1
    }
    sortedDistinct(hs)
  }

  /** `shingle_set_sorted(toks, n)` ≡ `sort_array(shingles-tree)`: the
    * word-n-gram shingle-hash set. Token hashes fold per overlapping
    * n-window left-to-right from seed 42 (`xxhash64(th[s], …)`); window
    * starts are 0‥max(len−n, 0) — one PARTIAL window when the document
    * is shorter than n (out-of-range `try_element_at` lookups are null
    * and xxhash64 skips null children), and an EMPTY token array yields
    * the one all-null window, i.e. `[42]`, exactly like the tree.
    */
  def shingleSetSorted(toks: ArrayData, gn: Int): ArrayData = {
    val n = toks.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = if (toks.isNullAt(i)) 42L else hashStr(toks.getUTF8String(i), 42L)
      i += 1
    }
    val last = math.max(n - gn, 0)
    val hs = new Array[Long](last + 1)
    var s = 0
    while (s <= last) {
      var h = 42L
      val end = math.min(s + gn, n)
      var j = s
      while (j < end) {
        h = XXH64.hashLong(th(j), h)
        j += 1
      }
      hs(s) = h
      s += 1
    }
    sortedDistinct(hs)
  }

  /** Sketch width in 64-bit words (1024 bits): sized so document-scale
    * hash sets (up to ~2000 distinct elements) keep bit occupancy below
    * saturation and the XOR-popcount prescreen stays discriminative.
    */
  private[functions] val SketchWords = 16

  /** `set_sketch(hs)` — the pair engine's 1024-bit membership bitmap:
    * each element hash sets ONE bit (its low 10 bits). The load-bearing
    * property (pinned in SetKernelSpec): for any two sets,
    * `popcount(sketch(A) XOR sketch(B)) <= |A △ B|` — every XOR bit
    * needs a witness element present in exactly one set, and one
    * element sets exactly one bit — so a `popcount(xor) <= f(|A|,|B|)`
    * gate derived from the similarity threshold can NEVER reject a true
    * pair. It is a prescreen only; exact verification always follows.
    */
  def setSketch(hs: ArrayData): ArrayData = {
    val words = new Array[Long](SketchWords)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = if (hs.isNullAt(i)) 0L else hs.getLong(i)
      val bit = (h & 1023L).toInt
      words(bit >> 6) |= 1L << (bit & 63)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(words)
  }

  /** `sketch_xor_popcnt(a, b)` — Hamming distance of two sketches.
    * Registered as a session SQL function, so arbitrary array<bigint>
    * inputs are reachable: a short array must ERROR, not read past an
    * UnsafeArrayData's end and return garbage.
    */
  def xorPopcount(a: ArrayData, b: ArrayData): Int = {
    require(a.numElements() == SketchWords && b.numElements() == SketchWords,
      s"sketch_xor_popcnt requires two ${SketchWords}-word set_sketch " +
        s"values, got lengths ${a.numElements()} and ${b.numElements()}")
    var c = 0
    var i = 0
    while (i < SketchWords) {
      c += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    c
  }
}

/** `hash_set_sorted(toks)` — sorted distinct xxhash64 token set. */
case class HashSetSortedExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(toks: Any): Any =
    SetKernels.hashSetSorted(toks.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = SetKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, e => s"${ev.value} = ($helper).hashSetSorted($e);")
  }
  override protected def withNewChildInternal(newChild: Expression): HashSetSortedExpr =
    copy(child = newChild)
  override def prettyName: String = "hash_set_sorted"
}

/** `shingle_set_sorted(toks, n)` — sorted distinct word-n-gram
  * shingle-hash set (partial-window semantics for short documents).
  */
case class ShingleSetSortedExpr(first: Expression, second: Expression)
    extends BinaryExpression {
  override def left: Expression = first
  override def right: Expression = second
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType) match {
      case (ArrayType(StringType, _), IntegerType) =>
        second match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _)
              if v <= 0 =>
            TypeCheckResult.TypeCheckFailure(
              s"$prettyName requires a positive shingle width, got $v")
          case _ => TypeCheckResult.TypeCheckSuccess
        }
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, int), got $other")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(toks: Any, gn: Any): Any = {
    val n = gn.asInstanceOf[Int]
    // non-literal width reaching eval: same guard as the type check —
    // a non-positive width would loop forever in the window walk
    require(n >= 1, s"$prettyName requires a positive shingle width, got $n")
    SetKernels.shingleSetSorted(toks.asInstanceOf[ArrayData], n)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = SetKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (e, k) =>
      s"""if ($k < 1) { throw new IllegalArgumentException(
         |  "shingle_set_sorted requires a positive shingle width, got " + $k); }
         |${ev.value} = ($helper).shingleSetSorted($e, $k);""".stripMargin)
  }
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression): ShingleSetSortedExpr =
    copy(first = newFirst, second = newSecond)
  override def prettyName: String = "shingle_set_sorted"
}

/** `set_sketch(hs)` — 1024-bit membership bitmap of a long-hash set
  * (16 longs); the pair engine's candidate prescreen. See
  * [[SetKernels.setSketch]] for the never-rejects-a-true-pair bound.
  */
case class SetSketchExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(hs: Any): Any =
    SetKernels.setSketch(hs.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = SetKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, e => s"${ev.value} = ($helper).setSketch($e);")
  }
  override protected def withNewChildInternal(newChild: Expression): SetSketchExpr =
    copy(child = newChild)
  override def prettyName: String = "set_sketch"
}

/** `sketch_xor_popcnt(a, b)` — Hamming distance between two
  * [[SetSketchExpr]] bitmaps: the candidate-join prescreen value
  * (`popcount(xor) <= |A △ B|`, so a threshold-derived gate on it is a
  * NECESSARY condition for the exact similarity — never a filter of
  * true pairs).
  */
case class SketchXorPopcntExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<bigint>), got $other")
    }
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetKernels.xorPopcount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = SetKernels.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = ($helper).xorPopcount($a, $b);")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SketchXorPopcntExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sketch_xor_popcnt"
}
