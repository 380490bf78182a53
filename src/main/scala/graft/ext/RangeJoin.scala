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
}
