package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for custom Catalyst expressions. Spark 4
  * made `Column` wrap a connect-compatible ColumnNode and gated the
  * classic conversion behind `private[sql]`; third-party expression
  * libraries reach it through an `org.apache.spark.sql` subpackage — the
  * supported pattern for engine extensions that ship native expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** `AbstractDataType` is `private[sql]` in Spark 4; expressions outside
    * the sql package that mix in `ExpectsInputTypes` need the alias to
    * write an `inputTypes` override.
    */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}
