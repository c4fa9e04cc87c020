package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ⇄ Expression converters (Spark 4
  * split the public Column API from catalyst Expressions in the connect
  * refactor; classic-mode extensions reach the converters through the sql
  * package). This is the standard pattern for third-party catalyst
  * extensions — no Spark internals are modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Bridge to `private[spark]` DataType.asNullable — the canonical
  * "most-permissive nullability" form, used by schema union-merge to
  * treat nested nullability flags (array containsNull, map
  * valueContainsNull, struct field nullable) as mergeable metadata
  * rather than a retype: parquet round-trips and catalyst analysis both
  * legitimately flip them.
  */
object TypeBridge {
  def asNullable(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = dt.asNullable
}
