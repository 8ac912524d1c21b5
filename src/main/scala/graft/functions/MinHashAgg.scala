package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Distributed minhash sketch: aggregates a group's 64-bit element hashes
  * into the group's 16-permutation minhash signature — the
  * `TypedImperativeAggregate` sketch slot SURVEY §4 reserved beyond
  * `approx_count_distinct`.
  *
  * This is the sketch shape that survives 100 TB: `update` folds each
  * element into 16 running minima (a fixed 128-byte buffer), `merge` is an
  * element-wise min of two buffers, so Spark's partial aggregation
  * computes per-partition sketches map-side and the shuffle moves ONE
  * buffer per (partition, group) — never the elements. Signature equals
  * the row-wise [[graft.operators.TextOps.minhashSig]] on the same
  * element-hash set bit-for-bit (same xxhash64 seed chain: seed_i =
  * xxhash64(int i; seed 42), sig_i = min xxhash64(element; seed_i)), so
  * the batch doc-level LSH family, the streaming dedup stage and this
  * group-level sketch all speak one signature space — estimated Jaccard
  * is comparable across all three. Minhash is multiplicity-invariant, so
  * pre-distincting input is unnecessary.
  */
case class MinHashAgg(child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  private val k = graft.operators.TextOps.minhashNumHashes

  // ONE seed-chain definition shared with the row-wise kernel — the
  // aggregate/row-wise bit-identity pin holds by construction only
  // while both read the same chain
  private lazy val seeds: Array[Long] = XxMinSigExpr.seedChain(k)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint element-hash column, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val th = v.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val h = XxHash64Function.hash(th, LongType, seeds(i))
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(k * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)

  override def prettyName: String = "minhash_agg"
}

/** Row-wise native twin of [[MinHashAgg]]'s fold — the production-tier
  * minhash signature (`TextOps.minhashSig`'s
  * `array_min(transform(ths, xxhash64(lit(i), x)))` tree per hash
  * function) as ONE pass over the token-hash array: k=16 seeded re-hash
  * minima per row, inside whole-stage codegen instead of k
  * higher-order-function CodegenFallback trees (the md5_min_sig
  * rationale on the xxhash64 tier — this is the projection StreamDedup
  * runs per micro-batch and per corpus-index refresh). Seed chain
  * identical to the aggregate and the Column form: seed_i =
  * xxhash64(int i; seed 42), value = xxhash64(long th; seed_i). A null
  * element contributes seeds(i) itself (the Column form's semantics —
  * a null child leaves the running hash at the seed), and an empty
  * array yields k null entries (array_min of empty) — Md5SigSpec pins
  * both against the replaced tree. The ONE documented divergence: a
  * null ARRAY yields null (standard binary null propagation) where the
  * replaced CreateArray tree yielded a non-null array of k nulls —
  * every caller filters `size(ths) > 0` first (which also drops null
  * arrays), so no production row can observe it; Md5SigSpec pins the
  * documented behavior.
  */
case class XxMinSigExpr(first: Expression, second: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = first
  override def right: Expression = second

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType) match {
      case (ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, int), got $other")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = first.nullable || second.nullable

  override protected def nullSafeEval(ths: Any, k: Any): Any =
    XxMinSigExpr.sig(
      ths.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      k.asInstanceOf[Int])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val helper = XxMinSigExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (e, k) =>
      s"${ev.value} = ($helper).sig($e, $k);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression): XxMinSigExpr =
    copy(first = newFirst, second = newSecond)

  override def prettyName: String = "xx_min_sig"
}

object XxMinSigExpr {
  // seed chain cache: seeds(i) = xxhash64(int i; seed 42)
  private val seedCache: Array[Long] =
    Array.tabulate(64)(i => XxHash64Function.hash(i, IntegerType, 42L))

  /** The first k seeds — the ONE chain [[MinHashAgg]] and this kernel
    * share (their bit-identity pin assumes it).
    */
  private[functions] def seedChain(k: Int): Array[Long] = {
    require(k >= 0 && k <= seedCache.length,
      s"seed chain supports 0 <= k <= ${seedCache.length}, got $k")
    seedCache.take(k)
  }

  def sig(ths: org.apache.spark.sql.catalyst.util.ArrayData,
      k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (k < 0 || k > seedCache.length) {
      throw new IllegalArgumentException(
        s"xx_min_sig supports 0 <= k <= ${seedCache.length}, got $k")
    }
    val n = ths.numElements()
    // empty array: array_min of an empty transform per function — k nulls
    if (n == 0) return new GenericArrayData(Array.fill[Any](k)(null))
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var e = 0
    while (e < n) {
      if (ths.isNullAt(e)) {
        // Column-form semantics: xxhash64(lit(i), null) = seeds(i)
        var i = 0
        while (i < k) {
          if (seedCache(i) < mins(i)) mins(i) = seedCache(i)
          i += 1
        }
      } else {
        val th = ths.getLong(e)
        var i = 0
        while (i < k) {
          val h = XxHash64Function.hash(th, LongType, seedCache(i))
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      e += 1
    }
    new GenericArrayData(mins)
  }
}
