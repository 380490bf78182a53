package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — match points to intervals containing them —
  * without the cross-join + filter plan Spark's optimizer produces for a
  * plain inequality join.
  *
  * Bucketization: the number line is cut into `bucketWidth` cells; each
  * interval is exploded into the cells it covers, each point hashes to its
  * cell, and the join becomes an EQUI-join on the cell id (shuffle key =
  * cell) followed by the exact containment filter. Cost: |intervals| ×
  * avg-cells-per-interval + |points|, distributed by cell — the standard
  * spatial-binning trade (pick `bucketWidth` near the median interval
  * length; too small explodes interval replicas, too large fattens cells). */
object RangeJoin {

  /** Join each point row to every interval row whose [lo, hi) contains the
    * point. Output = point columns + interval columns. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("_cell", floor(col(pointCol) / bucketWidth))
    val iv = intervals.withColumn("_cell",
      explode(sequence(floor(col(loCol) / bucketWidth),
        floor(col(hiCol) / bucketWidth))))
    p.join(iv, "_cell")
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_cell")
  }

  /** Interval-overlap join: every (a, b) pair whose half-open intervals
    * intersect — `a.lo < b.hi AND b.lo < a.hi` — as an equi-join, not the
    * cross-join + filter a plain inequality join plans to. The
    * time-range/genomic-region shape: reservations × outages, reads ×
    * genes, ad slots × sessions.
    *
    * Both sides explode into the `bucketWidth` cells they cover, the join
    * keys on the cell, and the containment filter runs per cell. A pair
    * overlapping across several shared cells would match once per cell, so
    * the pair is EMITTED ONLY IN THE CELL WHERE THE OVERLAP STARTS
    * (`floor(greatest(a.lo, b.lo) / bucketWidth)` — each overlapping pair
    * has exactly one such cell): exactly-once without a `distinct`, which
    * at scale would be a second corpus-wide shuffle on the full pair set.
    *
    * Output: left columns + right columns. Suffix/rename collisions are the
    * caller's to resolve before the call (both frames keep all columns).
    * Cost: Σ cells-per-interval on each side, distributed by cell — same
    * binning trade as [[pointInInterval]]; a single interval spanning the
    * whole line replicates into every cell, so clamp pathological interval
    * lengths upstream. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lLo: String, lHi: String, rLo: String, rHi: String,
                      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "rename colliding columns before the overlap join")
    val a = left.withColumn("_cell",
      explode(sequence(floor(col(lLo) / bucketWidth),
        floor(col(lHi) / bucketWidth))))
    val b = right.withColumn("_cell",
      explode(sequence(floor(col(rLo) / bucketWidth),
        floor(col(rHi) / bucketWidth))))
    a.join(b, "_cell")
      .where(col(lLo) < col(rHi) && col(rLo) < col(lHi) &&
        col("_cell") === floor(greatest(col(lLo), col(rLo)) / bucketWidth))
      .drop("_cell")
  }
}
