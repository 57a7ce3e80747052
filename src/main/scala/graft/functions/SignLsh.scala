package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Sign-LSH bucket id of an embedding column as a native Catalyst
  * expression: one bit per hyperplane = sign of the projection onto a
  * deterministic pseudo-random plane. The column-algebra formulation
  * (aggregate ∘ zip_with per plane, hashing stringified indices) is
  * interpreted per row and allocates a string per element — this kernel is
  * a plain double loop inside whole-stage codegen, with plane components
  * derived from a SplitMix64 stream over (plane, dim).
  *
  * Bucket values are an internal blocking artifact (never compared against
  * an external oracle): any deterministic plane family works, and
  * positively-scaled copies of a vector land in the same bucket under all
  * of them (sign-invariance), which is the recall contract the ANN/near-dup
  * oracles check.
  */
case class SignLsh(child: Expression, planes: Int) extends UnaryExpression {

  require(planes >= 1 && planes <= 64, "planes must be in [1, 64]")

  override def dataType: DataType = LongType

  private def isFloatArr: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType | FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"sign_lsh requires an array<double|float> input, got $dt")
  }

  override def prettyName: String = "sign_lsh"

  override def nullSafeEval(input: Any): Any =
    SignLsh.compute(input.asInstanceOf[ArrayData], planes, isFloatArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SignLsh.compute($c, $planes, $isFloatArr)")

  override protected def withNewChildInternal(newChild: Expression): SignLsh =
    copy(child = newChild)
}

object SignLsh {

  /** Deterministic plane component for (plane, dim) in [-1, 1):
    * SplitMix64 of the packed key, top 53 bits as a uniform double.
    */
  private def component(plane: Int, dim: Int): Double = {
    var z = (plane.toLong << 32 | (dim.toLong & 0xffffffffL)) +
      0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    ((z >>> 11) * (1.0 / (1L << 53))) * 2.0 - 1.0
  }

  def compute(a: ArrayData, planes: Int, aFloat: Boolean): Long = {
    val n = a.numElements()
    var out = 0L
    var p = 0
    while (p < planes) {
      var proj = 0.0
      var i = 0
      while (i < n) {
        val v = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
        proj += v * component(p, i)
        i += 1
      }
      if (proj >= 0.0) out |= (1L << p)
      p += 1
    }
    out
  }

  def signLsh(c: Column, planes: Int): Column = {
    import org.apache.spark.sql.graftx.Cols
    Cols.ofExpr(SignLsh(Cols.exprOf(c), planes))
  }
}
