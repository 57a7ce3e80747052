package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Squared Euclidean distance of two array<double|float> columns as a
  * native Catalyst expression with whole-stage codegen — the k-means
  * assignment kernel. Lloyd assignment evaluates k of these per row per
  * iteration; a higher-order-function column is interpreted per row and a
  * Scala UDF boxes per call, so the distance loop reads unsafe array data
  * directly (same rationale as CosineSim).
  *
  * Accumulates Σ(aᵢ−bᵢ)² in index order (left-to-right, like the
  * `aggregate(zip_with(...))` column formulation and DuckDB's list
  * kernels), min length is used when lengths differ.
  */
case class SqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def isFloatArr(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType | FloatType, _),
            ArrayType(DoubleType | FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sq_dist requires two array<double|float> inputs, got " +
          s"${left.dataType} and ${right.dataType}")
    }

  override def prettyName: String = "sq_dist"

  override def nullSafeEval(a: Any, b: Any): Any =
    SqDist.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloatArr(left.dataType), isFloatArr(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SqDist.compute($a, $b, " +
        s"${isFloatArr(left.dataType)}, ${isFloatArr(right.dataType)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDist =
    copy(left = newLeft, right = newRight)
}

object SqDist {

  /** Plain-loop kernel over unsafe array data — no boxing, codegen-callable.
    * Float elements are widened per index, matching `v.cast("double")` in
    * the column formulation bit-for-bit.
    */
  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean,
      bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      acc += d * d
      i += 1
    }
    acc
  }

  def sqDist(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftx.Cols
    Cols.ofExpr(SqDist(Cols.exprOf(a), Cols.exprOf(b)))
  }
}
