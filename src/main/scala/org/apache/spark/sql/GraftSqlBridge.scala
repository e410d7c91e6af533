package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Compile-time bridge into the sql-package-private Column ⇄ Expression
  * converters of Spark 4's classic API (`classic.ExpressionUtils` is
  * `private[sql]`). Standard pattern for libraries that ship custom Catalyst
  * expressions; nothing here touches session or execution state.
  */
object GraftSqlBridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Rendered table head (the engine's `show(n)` without printing —
    * `Dataset.showString` is `private[sql]`). `truncate = 0` keeps cells
    * whole, matching the reference's `show(truncate=False)` diagnostics. */
  def showString(df: Dataset[Row], n: Int, truncate: Int = 0): String =
    df.asInstanceOf[classic.Dataset[Row]].showString(n, truncate,
      vertical = false)
}
