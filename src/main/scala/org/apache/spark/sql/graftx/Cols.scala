package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionColumnNode}

/** Bridge between user-facing `Column` and catalyst `Expression` for the
  * custom expressions in graft.functions. Spark 4 routes Column through
  * ColumnNode and keeps the classic converters private[sql], so this
  * object lives inside the org.apache.spark.sql package — the standard
  * extension-point pattern for libraries shipping custom expressions.
  */
object Cols {
  def ofExpr(e: Expression): Column =
    Column(ExpressionColumnNode(e))

  def exprOf(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)
}
