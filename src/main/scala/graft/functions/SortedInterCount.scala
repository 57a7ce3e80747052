package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.Cols
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Intersection size of two SORTED long arrays as a native Catalyst
  * expression with whole-stage codegen — the exact-Jaccard verify kernel
  * (Dedup.verifyJaccardSh).
  *
  * Replaces `size(array_intersect(sh1, sh2))`: the Jaccard predicate is
  * pushed into the pair join's condition, where the intersect subexpression
  * is inlined 2x (numerator and union denominator) and then re-evaluated in
  * the output projection — and EACH array_intersect evaluation builds a
  * per-row hash set plus a materialized result array just to be size()d.
  * This kernel is a two-pointer merge over unsafe array data: zero
  * allocation, so even the optimizer's duplicated evaluations cost only
  * the O(n1+n2) walk. Equal to size(array_intersect) whenever both inputs
  * are duplicate-free, which withShingles guarantees (distinct-set arrays,
  * sorted in the kernel).
  */
case class SortedInterCount(a: Expression, b: Expression)
    extends BinaryExpression {

  override def left: Expression = a
  override def right: Expression = b

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (a.dataType, b.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sorted_inter_count requires (array<bigint>, array<bigint>), got $other")
    }

  override def prettyName: String = "sorted_inter_count"

  override def nullSafeEval(x: Any, y: Any): Any =
    SortedInterCount.compute(x.asInstanceOf[ArrayData],
      y.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) =>
      s"graft.functions.SortedInterCount.compute($x, $y)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedInterCount =
    copy(a = newLeft, b = newRight)
}

object SortedInterCount {

  /** Two-pointer merge count — no boxing, codegen-callable. Inputs must be
    * ascending-sorted; null elements fail loudly (a raw ArrayData read
    * would silently treat them as 0).
    */
  def compute(x: ArrayData, y: ArrayData): Long = {
    val xn = x.numElements()
    val yn = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < xn && j < yn) {
      if (x.isNullAt(i) || y.isNullAt(j))
        throw new IllegalArgumentException(
          "sorted_inter_count: null element in input array")
      val u = x.getLong(i)
      val v = y.getLong(j)
      if (u == v) { c += 1L; i += 1; j += 1 }
      else if (u < v) i += 1
      else j += 1
    }
    c
  }

  /** Column wrapper. */
  def sortedInterCount(a: Column, b: Column): Column =
    Cols.ofExpr(SortedInterCount(Cols.exprOf(a), Cols.exprOf(b)))
}
