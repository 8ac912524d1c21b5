package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared mechanics for the deterministic quantile-summary family
  * (r14 — the [[Kmv]] pattern pointed at rank statistics): the partial
  * state is the EXACT per-group value histogram (value → count), and
  * the approximation enters only at READ time through ONE deterministic
  * band-compression + rank rule, both defined in pure integer
  * arithmetic so the estimate is bit-reproducible across engines
  * (DuckDB replays the identical walk with window functions — the
  * sketch face is ORACLE-CHECKABLE, unlike approx_percentile's
  * merge-order-dependent Greenwald-Khanna summaries).
  *
  * Design note vs the classic "pin a merge order" remedy: stream-built
  * quantile sketches (GK/KLL) are order-SENSITIVE, so a routed
  * materialized view serving them must pin a deterministic merge order
  * (e.g. sorted day list) to be replay-stable. This family removes the
  * hazard at the root instead: exact histograms are a commutative
  * monoid (counter addition), so per-day partials merge to the SAME
  * multiset in ANY order — order-invariance by construction, a strictly
  * stronger property — and the single compression at eval is a pure
  * function of that multiset. The price is state bounded by the
  * group's DISTINCT-value cardinality rather than a fixed k: the right
  * trade for bounded-cardinality numeric gauges (the events.value
  * contract — 2-decimal readings); an unbounded-cardinality metric
  * quantizes to a grid at the leaf first ([[QHist.quantize]] — the
  * q-digest universe move, r15), bounding state by occupied cells.
  *
  * The read rule, shared verbatim by the Spark faces and the DuckDB
  * oracle: with the group's sorted distinct values v_1..v_m, weights
  * w_i, cumulative c_i, total n, and budget `b`, value i lands in band
  * ceil(c_i·b/n) (integer: (c_i·b + n − 1) div n) and the LAST value of
  * each band is kept — ≤ b kept pairs, rank error ≤ ceil(n/b). The
  * basis-point percentile bp/10000 reads rank r = ceil(n·bp/10000)
  * (integer: (n·bp + 9999) div 10000) and answers the first kept value
  * with c ≥ r.
  */
private[graft] object QHist {

  type Hist = java.util.TreeMap[java.lang.Double, java.lang.Long]

  def newHist(): Hist = new java.util.TreeMap[java.lang.Double, java.lang.Long]()

  def add(h: Hist, v: Double, w: Long): Unit =
    h.merge(v, w, (a: java.lang.Long, b: java.lang.Long) =>
      java.lang.Long.valueOf(a + b)): Unit

  /** The optional UNIVERSE GRID (r15) — the q-digest leaf-quantization
    * move for metrics whose distinct-value cardinality is unbounded
    * (high-resolution gauges, latencies): keep only the top `g`
    * significant bits of the mantissa (truncation toward zero — pure
    * integer arithmetic on the IEEE bit pattern, so the grid is
    * deterministic and engine-reproducible). The map is monotone
    * (non-strict), so it only MERGES adjacent values into grid cells:
    * per-group state is bounded by the number of occupied cells —
    * ≤ 2^g per binary order of magnitude — instead of the raw distinct
    * count, and every cell's representative is within relative 2^-g of
    * the values it absorbed, so any rank statistic read off the
    * quantized histogram answers with VALUE error ≤ 2^-g relative on
    * top of the band compression's rank error ≤ n/b (the two bounds
    * compose; rank error from cell-merging is additionally bounded by
    * the cell's occupancy, which the value bound already prices).
    * `g = 0` (the default everywhere, and the only shape the routed
    * faces match) disables the grid — bit-identical to r14 behavior.
    */
  def quantize(v: Double, g: Int): Double =
    if (g <= 0 || g >= 52 || v == 0.0 || v.isNaN || v.isInfinite) v
    else java.lang.Double.longBitsToDouble(
      java.lang.Double.doubleToRawLongBits(v) & (-1L << (52 - g)))

  def mergeInto(h1: Hist, h2: Hist): Hist = {
    h2.forEach((v, w) => add(h1, v, w))
    h1
  }

  /** The deterministic band-compressed estimates — the ONE read rule
    * (see object doc). `bps` are basis points over 10000, ascending.
    */
  def estimates(h: Hist, b: Int, bps: Seq[Int]): Array[Double] = {
    var n = 0L
    h.forEach((_, w) => n += w)
    require(n > 0, "qhist estimate over an empty histogram")
    val targets = bps.map(bp => (n * bp + 9999L) / 10000L)
    val out = Array.fill(bps.size)(Double.NaN)
    var c = 0L
    var prevBand = 0L
    var ti = 0
    val it = h.entrySet().iterator()
    // walk ascending; an entry is KEPT when its band differs from the
    // NEXT entry's (it is the last of its band), so each entry resolves
    // one step behind (pending). Targets resolve against kept entries
    // only — the compressed summary — first kept c >= target wins.
    var pendingV = Double.NaN
    var pendingC = 0L
    var havePending = false
    while (it.hasNext) {
      val e = it.next()
      c += e.getValue
      val band = (c * b + n - 1) / n
      if (havePending && band != prevBand) {
        // the pending entry was the last of its band — it is kept
        while (ti < targets.size && pendingC >= targets(ti)) {
          out(ti) = pendingV; ti += 1
        }
      }
      pendingV = e.getKey
      pendingC = c
      prevBand = band
      havePending = true
    }
    // the final entry is always kept, and its c = n covers every
    // remaining target
    while (ti < targets.size) { out(ti) = pendingV; ti += 1 }
    out
  }

  /** Fold a stored state array into a buffer with the family's LOUD
    * malformed-state refusals (null elements, non-positive weights) —
    * ONE definition shared by the merge-state and percentile faces, so
    * a hardening of the refusal rules can never fork them
    * (review-found, r14).
    */
  def foldState(buf: Hist, arr: ArrayData, who: String): Hist = {
    var i = 0
    while (i < arr.numElements()) {
      require(!arr.isNullAt(i),
        s"$who: NULL element at $i in a histogram state — " +
          "malformed state; refusing to fold it")
      val row = arr.getStruct(i, 2)
      val w = row.getLong(1)
      require(w > 0,
        s"$who: non-positive weight $w in a histogram state — " +
          "malformed state; refusing to fold it")
      add(buf, row.getDouble(0), w)
      i += 1
    }
    buf
  }

  def serialize(h: Hist): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + h.size * 16)
    bb.putInt(h.size)
    h.forEach((v, w) => { bb.putDouble(v); bb.putLong(w) })
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Hist = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = newHist()
    var i = 0
    while (i < n) { h.put(bb.getDouble, bb.getLong); i += 1 }
    h
  }

  val stateType: DataType = ArrayType(StructType(Seq(
    StructField("v", DoubleType, nullable = false),
    StructField("w", LongType, nullable = false))), containsNull = false)

  def toState(h: Hist): ArrayData = {
    val rows = new Array[Any](h.size)
    var i = 0
    h.forEach((v, w) => {
      rows(i) = InternalRow(v.doubleValue(), w.longValue()); i += 1
    })
    new GenericArrayData(rows)
  }
}

/** The EXACT per-group value histogram as a stored value — the
  * merge-closed partial a maintained rollup persists per (day, group)
  * grain ([[graft.plans.QuantileRoute]]'s materialized view). Emitted
  * as a value-ascending `array<struct<v double, w bigint>>`; what lands
  * on disk is exactly what [[QHistMergeAgg]] re-folds, and because
  * histogram union is commutative the stored partials are
  * replay-stable with NO pinned merge order.
  */
case class QHistStateAgg(child: Expression, gridBits: Int = 0,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QHist.Hist] with UnaryLike[Expression] {

  require(gridBits >= 0 && gridBits <= 52,
    s"qhist grid must be 0 (off) .. 52 significant bits, got $gridBits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double value column, got ${child.dataType.sql}")
  override def dataType: DataType = QHist.stateType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): QHist.Hist = QHist.newHist()

  override def update(buf: QHist.Hist, input: InternalRow): QHist.Hist = {
    val v = child.eval(input)
    // quantization happens at the LEAF (ingest) only — merges and reads
    // see already-gridded values, so the monoid and its order-invariance
    // are untouched ([[QHist.quantize]]; g = 0 is the identity)
    if (v != null)
      QHist.add(buf, QHist.quantize(v.asInstanceOf[Double], gridBits), 1L)
    buf
  }

  override def merge(b1: QHist.Hist, b2: QHist.Hist): QHist.Hist =
    QHist.mergeInto(b1, b2)

  override def eval(buf: QHist.Hist): Any = QHist.toState(buf)

  override def serialize(buf: QHist.Hist): Array[Byte] = QHist.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QHist.Hist =
    QHist.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QHistStateAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QHistStateAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QHistStateAgg =
    copy(child = newChild)
  override def prettyName: String = "qhist_state"
}

/** Merge stored histogram partials back into a histogram STATE — the
  * face incremental rollup maintenance re-folds with (stored day state
  * ∪ delta day state → new day state, exact counter addition). Same
  * malformed-state refusals as [[QHistMergeAgg]].
  */
case class QHistMergeStateAgg(child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QHist.Hist] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _) if s.length == 2 &&
        s(0).dataType == DoubleType && s(1).dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<struct<v double, w bigint>> state " +
        s"column, got ${other.sql}")
  }
  override def dataType: DataType = QHist.stateType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): QHist.Hist = QHist.newHist()

  override def update(buf: QHist.Hist, input: InternalRow): QHist.Hist = {
    val v = child.eval(input)
    if (v != null) QHist.foldState(buf, v.asInstanceOf[ArrayData], prettyName)
    buf
  }

  override def merge(b1: QHist.Hist, b2: QHist.Hist): QHist.Hist =
    QHist.mergeInto(b1, b2)

  override def eval(buf: QHist.Hist): Any = QHist.toState(buf)

  override def serialize(buf: QHist.Hist): Array[Byte] = QHist.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QHist.Hist =
    QHist.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QHistMergeStateAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QHistMergeStateAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QHistMergeStateAgg =
    copy(child = newChild)
  override def prettyName: String = "qhist_merge_state"
}

/** Merge stored histogram partials and read the band-compressed
  * percentile estimates (`bps` basis points over 10000) — the face the
  * routed q_percentiles_approx serves through, and by the monoid
  * argument bit-identical to folding the raw rows. Refuses malformed
  * state LOUDLY (null elements, non-positive weights) — the
  * [[KmvMergeAgg]] r13-ADVICE posture.
  */
case class QHistMergeAgg(child: Expression, bps: Seq[Int], b: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QHist.Hist] with UnaryLike[Expression] {

  require(b >= 2, s"qhist band budget must be >= 2, got $b")
  require(bps.nonEmpty && bps.forall(bp => bp >= 1 && bp <= 10000) &&
    bps == bps.sorted,
    s"qhist percentiles must be ascending basis points in [1, 10000], got $bps")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _) if s.length == 2 &&
        s(0).dataType == DoubleType && s(1).dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<struct<v double, w bigint>> state " +
        s"column, got ${other.sql}")
  }
  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): QHist.Hist = QHist.newHist()

  override def update(buf: QHist.Hist, input: InternalRow): QHist.Hist = {
    val v = child.eval(input)
    if (v != null) QHist.foldState(buf, v.asInstanceOf[ArrayData], prettyName)
    buf
  }

  override def merge(b1: QHist.Hist, b2: QHist.Hist): QHist.Hist =
    QHist.mergeInto(b1, b2)

  override def eval(buf: QHist.Hist): Any =
    if (buf.isEmpty) null
    // box explicitly — GenericArrayData over a primitive double array
    // would ClassCastException at read
    else new GenericArrayData(
      QHist.estimates(buf, b, bps).map(d => d: Any))

  override def serialize(buf: QHist.Hist): Array[Byte] = QHist.serialize(buf)
  override def deserialize(bytes: Array[Byte]): QHist.Hist =
    QHist.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QHistMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QHistMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QHistMergeAgg =
    copy(child = newChild)
  override def prettyName: String = "qhist_percentiles"
}
