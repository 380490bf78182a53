package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ catalyst Expression bridge.
  *
  * Spark 4 made these conversions `private[sql]` (`ExpressionUtils` in
  * `org.apache.spark.sql.classic`), so a library shipping its own native
  * `Expression`s needs a shim compiled under `org.apache.spark.sql` to reach
  * them — the same approach established Spark-extension libraries use. Only
  * public-source Spark API knowledge involved; no behavior is modified. */
private[sql] object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Public face of the bridge for graft code. */
object GraftColumnBridge {
  def column(e: Expression): Column = Bridge.column(e)
  def expression(c: Column): Expression = Bridge.expression(c)
}
