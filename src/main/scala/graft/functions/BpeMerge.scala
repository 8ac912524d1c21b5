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
  private val space = UTF8String.fromString(" ")

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
