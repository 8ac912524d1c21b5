package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** K-minimum-values distinct-count sketch over a 64-bit element-hash
  * column — the [[MinHashAgg]] pattern pointed at cardinality instead of
  * similarity, built ONLY as a measured altitude probe against Spark's
  * `approx_count_distinct` (HyperLogLog++): the ScaleProbe sketch section
  * times both on the same groups at 1×/10× to document which altitude the
  * engine should use (SCALE.md records the verdict; the built-in wins).
  *
  * Sketch: the `k` smallest DISTINCT hash values seen (a bounded
  * TreeSet — re-inserting a duplicate hash is a no-op, which is what
  * makes the estimator multiplicity-invariant like minhash). With fewer
  * than `k` distinct hashes the set IS the exact answer; past that the
  * classic unbiased KMV estimate `(k-1) / u_k` applies, where `u_k` is
  * the k-th minimum normalized to (0,1] from the full unsigned 64-bit
  * hash space. Relative error concentrates around `1/sqrt(k-2)` (~3.2%
  * at the default k=1024, matching `approx_count_distinct`'s default
  * 5% envelope; KmvAggSpec pins both regimes).
  *
  * Distribution shape is identical to [[MinHashAgg]]: `update` folds
  * into a bounded buffer, `merge` unions two buffers and re-trims, so
  * partial sketches combine map-side and the shuffle moves ≤ 8·k bytes
  * per (partition, group), never the elements.
  */
case class KmvAgg(child: Expression, k: Int = 1024, spaceBits: Int = 64,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 16, s"kmv sketch needs k >= 16, got $k")
  require(spaceBits == 64 || spaceBits == 60,
    s"kmv hash space must be 64 (xxhash64) or 60 (md5 oracle tier), got $spaceBits")
  // the exact-integer 60-bit estimator below needs (k-1) * 2^53 to fit
  // in a signed long: k - 1 < 2^10
  require(spaceBits == 64 || k <= 1024,
    s"60-bit kmv tier supports k <= 1024, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint element-hash column, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  // TreeSet over the UNSIGNED order of the hash — KMV's "minimum" must
  // agree with the uniform mapping onto (0,1], and Long.compare would
  // put negative (= upper-half unsigned) hashes first
  private def newSet() = new java.util.TreeSet[java.lang.Long](
    (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compareUnsigned(a, b))

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] = newSet()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // only admit hashes that would rank in the current top-k minima —
      // past warmup almost every row short-circuits on this compare
      if (buf.size < k || java.lang.Long.compareUnsigned(h, buf.last()) < 0) {
        buf.add(h)
        if (buf.size > k) buf.pollLast()
      }
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    var done = false
    while (it.hasNext && !done) {
      val h = it.next()
      // b2 iterates ascending; once one element fails the admit test,
      // every later one would too
      if (b1.size < k || java.lang.Long.compareUnsigned(h, b1.last()) < 0) {
        b1.add(h)
        if (b1.size > k) b1.pollLast()
      } else done = true
    }
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toLong
    else if (spaceBits == 60) {
      // EXACT-INTEGER estimator for the md5 oracle tier (the
      // [[graft.operators.TextOps.h60]] hash space): u_k ≈
      // ((h_k >> 7) + 1) / 2^53, estimate = floor((k-1) * 2^53 / that
      // denominator) — every step a positive-long multiply/shift/divide
      // both engines floor identically (DuckDB `//`), so the driver row
      // is hash-exact. (k-1)*2^53 fits: k <= 1024 is required above.
      ((k - 1).toLong * (1L << 53)) / ((buf.last() >> 7) + 1L)
    } else {
      // u_k = kth minimum as a fraction of the unsigned 64-bit space
      val uk = (java.lang.Long.divideUnsigned(buf.last(), 1L << 11).toDouble + 1.0) /
        (1L << 53).toDouble
      math.round((k - 1).toDouble / uk)
    }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    buf.forEach(h => bb.putLong(h))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = newSet()
    var i = 0
    while (i < n) { s.add(bb.getLong()); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)

  override def prettyName: String = "kmv_count_distinct"
}

