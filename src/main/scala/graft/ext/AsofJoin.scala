package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, the most recent right row
  * with `right.ts <= left.ts` within the same key. The canonical telemetry /
  * market-data operator that plain Spark has no built-in for.
  *
  * Implementation is the scalable sort-merge restatement, NOT a range cross
  * join: tag both sides, union, one shuffle on the join key, then a running
  * `last_value(ignoreNulls)` over the per-key timeline carries each right
  * value forward to the left rows that follow it. Cost = one exchange on
  * `key` + one sort — the same shape as a windowed aggregation, linear in
  * |left| + |right|, no quadratic candidate set, skew-safe to the same
  * degree as any keyed window (salt the key if a single key dominates).
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
    // right rows carry the values; left rows carry nulls there
    val taggedRight = right.select(
      (Seq(col(key), col(tsCol), lit(1).as("_is_right")) ++
        valueCols.map(c => col(c).as(s"_v_$c")) ++
        leftCols.filterNot(c => c == key || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val taggedLeft = left.select(
      (Seq(col(key), col(tsCol), lit(0).as("_is_right")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_v_$c")) ++
        leftCols.filterNot(c => c == key || c == tsCol).map(col)): _*)

    // one shuffle on key; right-before-left at equal ts gives >= semantics
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol).asc, col("_is_right").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedLeft.unionByName(taggedRight)
      .select(col("*") +:
        valueCols.map(c =>
          last(col(s"_v_$c"), ignoreNulls = true).over(w).as(s"_asof_$c")): _*)

    carried.where(col("_is_right") === 0)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"_asof_$c").as(s"asof_$c")): _*)
  }
}
