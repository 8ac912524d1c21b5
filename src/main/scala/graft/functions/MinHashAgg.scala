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

  // the seed chain the Column form xxhash64(lit(i), x) produces
  private lazy val seeds: Array[Long] =
    Array.tabulate(k)(i => XxHash64Function.hash(i, IntegerType, 42L))

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
