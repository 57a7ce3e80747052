package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a text column as a native Catalyst expression with
  * whole-stage codegen (doGenCode delegates to the static kernel), so the
  * fingerprint projection stays inside the codegen'd scan stage — no UDF
  * serialization, no codegen fence.
  *
  * Algorithm (standard Charikar simhash): whitespace-tokenize the
  * lowercased text; per token compute a 64-bit hash (SplitMix64 finalizer
  * over a polynomial seed — deterministic everywhere); per bit accumulate
  * +1/-1; sign of each counter becomes the output bit.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires a string input, got ${child.dataType}")
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHash64.compute($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  /** Deterministic 64-bit token hash (polynomial + SplitMix64 finalizer). */
  def tokenHash(s: String): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < s.length) { h = h * 31 + s.charAt(i); i += 1 }
    var z = h + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def compute(text: String): Long = {
    val counters = new Array[Int](64)
    var i = 0
    val n = text.length
    val sb = new java.lang.StringBuilder(16)
    def flush(): Unit = {
      if (sb.length() > 0) {
        val h = tokenHash(sb.toString)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
          b += 1
        }
        sb.setLength(0)
      }
    }
    while (i < n) {
      val c = text.charAt(i)
      if (Character.isWhitespace(c)) flush()
      else sb.append(Character.toLowerCase(c))
      i += 1
    }
    flush()
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def simhash64(c: Column): Column = {
    import org.apache.spark.sql.graftx.Cols
    Cols.ofExpr(SimHash64(Cols.exprOf(c)))
  }
}
