package graft.ext

import org.apache.spark.sql.Column

/** Shared fixed-point arithmetic primitive for integer-exact operators
  * ([[Graph.pageRankExact]], [[Dsir]]): truncating integral division as a
  * Column op (Spark's `div` operator, catalyst `IntegralDivide`), matching
  * DuckDB's `//` on BIGINTs for non-negative operands. Exposed via the
  * expression bridge because `div` has no `functions._` form. */
private[ext] object FixedPoint {
  implicit final class DivOps(private val c: Column) extends AnyVal {
    def divLong(d: Column): Column = {
      import org.apache.spark.sql.graftbridge.GraftColumnBridge
      GraftColumnBridge.column(
        org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          GraftColumnBridge.expression(c.cast("long")),
          GraftColumnBridge.expression(d.cast("long"))))
    }

    /** [[divLong]] without the long casts — for operands the caller has
      * already widened to DECIMAL(38,0) because the product would overflow
      * Long (matches DuckDB's `//` on HUGEINT; result is BIGINT). */
    def divBig(d: Column): Column = {
      import org.apache.spark.sql.graftbridge.GraftColumnBridge
      GraftColumnBridge.column(
        org.apache.spark.sql.catalyst.expressions.IntegralDivide(
          GraftColumnBridge.expression(c),
          GraftColumnBridge.expression(d)))
    }
  }
}
