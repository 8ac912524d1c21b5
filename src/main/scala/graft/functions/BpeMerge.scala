package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge round applied row-wise: greedy LEFT-TO-RIGHT,
  * non-overlapping replacement of every adjacent `(left, right)` symbol
  * occurrence in a token array with the single merged symbol
  * `left + " " + right` — the apply step of byte-pair-encoding tokenizer
  * training lifted from characters to corpus tokens (reference counts the
  * same adjacent-pair statistic: b1naryth1ef/yamon has no tokenizer, this
  * is the beyond-reference LLM-pipeline surface).
  *
  * Greedy LTR semantics matter for runs: `a a a` under rule `(a,a)`
  * yields `[aa, a]` (the first two merge, the survivor does NOT re-merge
  * with the merged symbol), and `a a a a` yields `[aa, aa]`. A merged
  * symbol can never equal its own left constituent (the right part is
  * non-empty), so one scan with a two-token lookahead is exact.
  *
  * One tight pass per row inside whole-stage codegen (static helper
  * call, the [[SimHash64Expr]] pattern) — the per-round cost is a
  * row-wise projection, no shuffle; the iteration driver lives in
  * `TextOps.bpeMerges`.
  */
case class BpeMergeStepExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), StringType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, string, string), got $other")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable

  override protected def nullSafeEval(arr: Any, l: Any, r: Any): Any =
    BpeMergeStepExpr.merge(arr.asInstanceOf[ArrayData],
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = BpeMergeStepExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (arr, l, r) =>
      s"${ev.value} = ($helper).merge($arr, $l, $r);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BpeMergeStepExpr =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "bpe_merge_step"
}

object BpeMergeStepExpr {
  private[functions] val space = UTF8String.fromString(" ")

  /** Greedy LTR non-overlapping merge of adjacent (l, r) into l+" "+r.
    * Null elements never match and pass through unchanged.
    */
  def merge(arr: ArrayData, l: UTF8String, r: UTF8String): ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val cur = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      if (cur != null && i + 1 < n && !arr.isNullAt(i + 1) &&
          cur.equals(l) && arr.getUTF8String(i + 1).equals(r)) {
        out.add(UTF8String.concat(l, space, r))
        i += 2
      } else {
        out.add(cur)
        i += 1
      }
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size())))
  }
}

/** [[BpeMergeStepExpr]] fused with PAIR-COUNT DELTA extraction — the
  * incremental-count trick every production BPE trainer uses
  * (HF-tokenizers, SentencePiece): applying merge (l, r) → m only
  * changes pair counts AROUND merge sites, so one pass emits both the
  * merged sequence and the per-row count deltas:
  *
  *   at each greedy-LTR site:  -(l, r);
  *   left boundary  (prev OUTPUT token p exists):  -(p, l)  +(p, m);
  *   right boundary (next INPUT token q exists):   -(r, q)  +(m, q).
  *
  * Left-on-output / right-on-input is exact for greedy LTR: a previous
  * adjacent site has already rewritten the crossing pair to (m', l)
  * via its own right-boundary delta, and p = m' is precisely what this
  * site must retract. Aggregated deltas equal full-recount(new) −
  * full-recount(old) (BpeMergeSpec pins this on randomized arrays).
  *
  * Scale consequence, measured in the TextOps.bpeMerges loop: per
  * training round the shuffle carries delta rows (merge-site-local)
  * plus the vocabulary-bounded count table, never the corpus's
  * exploded token pairs — at 100 TB that is the difference between a
  * per-round corpus-wide exchange and a vocabulary-sized one.
  *
  * Returns struct<toks: array<string>, deltas: array<struct<p1, p2,
  * dn>>>; null neighbor tokens ride through as null struct fields,
  * grouping exactly like the full recount's null pair members.
  */
case class BpeMergeDeltaExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), StringType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, string, string), got $other")
    }

  override def dataType: DataType = BpeMergeDeltaExpr.outType
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable

  override protected def nullSafeEval(arr: Any, l: Any, r: Any): Any =
    BpeMergeDeltaExpr.mergeWithDeltas(arr.asInstanceOf[ArrayData],
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = BpeMergeDeltaExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (arr, l, r) =>
      s"${ev.value} = ($helper).mergeWithDeltas($arr, $l, $r);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BpeMergeDeltaExpr =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "bpe_merge_delta"
}

object BpeMergeDeltaExpr {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
  import org.apache.spark.sql.types.{LongType, StructField, StructType}

  val deltaType: StructType = StructType(Seq(
    StructField("p1", StringType, nullable = true),
    StructField("p2", StringType, nullable = true),
    StructField("dn", LongType, nullable = false)))

  val outType: StructType = StructType(Seq(
    StructField("toks", ArrayType(StringType, containsNull = true), nullable = false),
    StructField("deltas", ArrayType(deltaType, containsNull = false), nullable = false)))

  def mergeWithDeltas(arr: ArrayData, l: UTF8String, r: UTF8String): InternalRow = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    val deltas = new java.util.ArrayList[InternalRow]()
    def d(p1: UTF8String, p2: UTF8String, dn: Long): Unit =
      deltas.add(new GenericInternalRow(Array[Any](p1, p2, dn)))
    val m = UTF8String.concat(l, BpeMergeStepExpr.space, r)
    var i = 0
    while (i < n) {
      val cur = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      if (cur != null && i + 1 < n && !arr.isNullAt(i + 1) &&
          cur.equals(l) && arr.getUTF8String(i + 1).equals(r)) {
        d(l, r, -1L)
        if (!out.isEmpty) {
          val p = out.get(out.size - 1)
          d(p, l, -1L); d(p, m, 1L)
        }
        if (i + 2 < n) {
          val q = if (arr.isNullAt(i + 2)) null else arr.getUTF8String(i + 2)
          d(r, q, -1L); d(m, q, 1L)
        }
        out.add(m)
        i += 2
      } else {
        out.add(cur)
        i += 1
      }
    }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(out.toArray(new Array[AnyRef](out.size()))),
      new GenericArrayData(deltas.toArray(new Array[AnyRef](deltas.size())))))
  }
}
