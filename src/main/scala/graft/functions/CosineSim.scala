package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity of two array<double> columns as a native Catalyst
  * expression with whole-stage codegen. The pair-join dedup/ANN paths
  * evaluate this at hash-join probe volume (potentially millions of
  * candidate pairs); a Scala UDF pays Seq boxing + catalyst-converter
  * allocation per call, and a higher-order-function column is interpreted
  * per row — this kernel reads the unsafe array data directly.
  *
  * Same contract as the reference _cosine_similarity
  * (entity_deduplication.py:558-571): zero norm → 0.0; lengths may differ
  * (min length is used, matching the previous compiled-UDF kernel).
  */
case class CosineSim(left: Expression, right: Expression)
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
        s"cosine_sim requires two array<double|float> inputs, got " +
          s"${left.dataType} and ${right.dataType}")
    }

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloatArr(left.dataType), isFloatArr(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CosineSim.compute($a, $b, " +
        s"${isFloatArr(left.dataType)}, ${isFloatArr(right.dataType)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {

  /** Plain-loop kernel over unsafe array data — no boxing, codegen-callable.
    * Float elements are widened per index, matching `v.cast("double")` in
    * the column formulation bit-for-bit (same accumulation order).
    */
  def compute(a: ArrayData, b: ArrayData, aFloat: Boolean,
      bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  def cosineSim(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftx.Cols
    Cols.ofExpr(CosineSim(Cols.exprOf(a), Cols.exprOf(b)))
  }
}
