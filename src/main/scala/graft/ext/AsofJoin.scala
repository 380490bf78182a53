package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join — for each left row, the most recent right row
  * with `right.ts <= left.ts` within the same key. The canonical telemetry /
  * market-data operator that plain Spark has no built-in for.
  *
  * Implementation is the scalable sort-merge restatement, NOT a range cross
  * join: tag both sides, union, one shuffle on the join key, then a running
  * `last_value(ignoreNulls)` over the per-key timeline carries each right
  * row forward to the left rows that follow it. Cost = one exchange on
  * `key` + one sort — the same shape as a windowed aggregation, linear in
  * |left| + |right|, no quadratic candidate set, skew-safe to the same
  * degree as any keyed window (salt the key if a single key dominates).
  *
  * The carried payload is a STRUCT of the right-side value columns, not the
  * columns themselves: the struct is non-null exactly on right rows, so the
  * ignoreNulls carry marks "a right row precedes this left row" — a right
  * row whose value column is genuinely NULL carries that NULL forward
  * (matching DuckDB/pandas ASOF semantics) instead of resurrecting an older
  * non-null value, which is what a per-column carry would do.
  *
  * Equal timestamps match (`>=` semantics): right rows sort before left rows
  * at the same instant.
  */
object AsofJoin {

  /** @param left      probe side; all its columns pass through
    * @param right     reference side: (key, ts, valueCols…)
    * @param key       equi-join key column present on both sides
    * @param tsCol     event-time column present on both sides
    * @param valueCols right-side columns to carry onto left rows (null when
    *                  no right row precedes the left row) */
  def asof(left: DataFrame, right: DataFrame, key: String, tsCol: String,
           valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadType = StructType(valueCols.map(c => right.schema(c)))
    // right rows carry the value struct; left rows carry a NULL struct there
    val taggedRight = right.select(
      (Seq(col(key), col(tsCol), lit(1).as("_is_right"),
        struct(valueCols.map(col): _*).as("_vs")) ++
        leftCols.filterNot(c => c == key || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val taggedLeft = left.select(
      (Seq(col(key), col(tsCol), lit(0).as("_is_right"),
        lit(null).cast(payloadType).as("_vs")) ++
        leftCols.filterNot(c => c == key || c == tsCol).map(col)): _*)

    // one shuffle on key; right-before-left at equal ts gives >= semantics
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol).asc, col("_is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedLeft.unionByName(taggedRight)
      .select(col("*"), last(col("_vs"), ignoreNulls = true).over(w).as("_asof"))

    carried.where(col("_is_right") === 0)
      .select(leftCols.map(col) ++
        valueCols.map(c => col("_asof").getField(c).as(s"asof_$c")): _*)
  }
}
