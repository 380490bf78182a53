package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: densify each key's event stream onto a regular
  * minute grid and carry the last observation forward — the gap-filling
  * step between raw telemetry and anything that assumes an evenly-spaced
  * series (rate computation, windowed models, chart backends). The
  * reference's minute-truncation dimension (`Transform`, SURVEY §2 rows
  * 15-18) buckets observations; this is the inverse-shaped consumer that
  * SUPPLIES the missing buckets.
  *
  * Scale shape: the grid is generated per key from its own [min, max]
  * minute span (a generator projection off one small per-key aggregate —
  * no driver-side range, no cross join with a calendar table); the
  * grid-to-observation join is keyed on (key, minute); the carry is a
  * per-key ordered window whose partition size is the key's time span in
  * minutes — bounded by wall-clock coverage, not event volume (a hot key
  * with millions of events still has ≤ minutes-per-month grid rows).
  */
object Resample {

  /** One row per (key, minute) of the key's observed span:
    * `(key, minute, <valueCol> carried forward, is_observed)`. Within an
    * observed minute the LATEST observation wins, ordered by
    * `(tsCol, tieCol)` — the deterministic tie-break every replayed feed
    * needs. A minute with no observation carries the previous minute's
    * value (NULL before a key's first observation — left semantics, as in
    * [[AsofJoin.asof]]). A genuinely-NULL observed value is carried OVER
    * (ignoreNulls), so emit a sentinel instead of NULL if "observed null"
    * must be distinguishable downstream. */
  def gapFillMinutes(df: DataFrame, keyCol: String, tsCol: String,
                     valueCol: String, tieCol: String): DataFrame = {
    val obs = df
      .groupBy(col(keyCol), date_trunc("minute", col(tsCol)).as("minute"))
      .agg(max_by(col(valueCol), struct(col(tsCol), col(tieCol))).as("_obs"))
    val grid = df.groupBy(col(keyCol))
      .agg(date_trunc("minute", min(col(tsCol))).as("_from"),
        date_trunc("minute", max(col(tsCol))).as("_to"))
      .select(col(keyCol),
        explode(sequence(col("_from"), col("_to"),
          expr("INTERVAL 1 MINUTE"))).as("minute"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("minute"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq(keyCol, "minute"), "left")
      .select(col(keyCol), col("minute"),
        last(col("_obs"), ignoreNulls = true).over(w).as(valueCol),
        col("_obs").isNotNull.as("is_observed"))
  }
}
