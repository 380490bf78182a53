package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental MATERIALIZED-AGGREGATE maintenance — keep a summary table
  * (per-key count/sum/min/max) current under append-only ingest by merging
  * per-batch PARTIALS instead of recomputing over history.
  *
  * Why it matters at 100 TB: the naive refresh re-aggregates the full fact
  * table on every batch — O(history) per batch, which is the whole table
  * every few minutes. The mergeable-aggregate shape is O(batch) + a merge
  * keyed on only the TOUCHED keys: [[partial]] collapses the batch map-side
  * (the same partial-aggregation Spark already does inside one job, lifted
  * across jobs), and [[merge]] folds that partial into the standing summary
  * with a union + re-aggregate whose input is |summary| + |partial| rows —
  * never the fact history. This is the materialized-view maintenance loop of
  * a streaming lakehouse (Delta's aggregate MV refresh, Flink's upsert
  * sink), expressed as two plain DataFrame transforms the caller persists
  * via the atomic versioned publish ([[Pipeline]]) or any table format.
  *
  * Only MERGEABLE aggregates are offered: `count` and `sum` merge by
  * summing, `min`/`max` by re-min/re-max. Averages are a consumer-side
  * division of (sum, count); non-mergeable exact aggregates (median,
  * distinct) belong to the sketch family (`ext.Sketches` — HLL registers
  * and histograms merge the same way). Append-only semantics: a late or
  * corrective batch ADDS deltas; retraction needs CDC ([[Cdc]]) upstream.
  */
object Materialize {

  /** One summary column: `fn` ∈ count|sum|min|max over input `col`
    * (ignored for count), emitted as `as`. */
  final case class AggSpec(fn: String, col: String, as: String) {
    require(Set("count", "sum", "min", "max")(fn),
      s"unsupported aggregate '$fn' — mergeable set is count|sum|min|max")
  }

  /** Collapse one batch to its per-key partial: one row per touched key,
    * each spec as its partial value (count as BIGINT so merges never
    * overflow an int). O(batch) work, shuffled only on `keys` — the same
    * partitioning the merge consumes. */
  def partial(batch: DataFrame, keys: Seq[String], aggs: Seq[AggSpec]): DataFrame = {
    require(keys.nonEmpty, "partial: no keys")
    require(aggs.nonEmpty, "partial: no aggregates")
    require(aggs.map(_.as).distinct.size == aggs.size,
      s"partial: duplicate output names in ${aggs.map(_.as)}")
    require(!keys.exists(aggs.map(_.as).contains),
      s"partial: an aggregate output shadows a key column")
    val exprs = aggs.map {
      case AggSpec("count", _, as) => count(lit(1)).as(as)
      case AggSpec("sum", c, as)   => sum(col(c)).as(as)
      case AggSpec("min", c, as)   => min(col(c)).as(as)
      case AggSpec("max", c, as)   => max(col(c)).as(as)
      case other => throw new IllegalArgumentException(other.toString)
    }
    batch.groupBy(keys.map(col): _*).agg(exprs.head, exprs.tail: _*)
  }

  /** Fold a batch partial into the standing summary. Input is
    * |summary| + |partial| already-collapsed rows; a key present on both
    * sides merges (counts/sums add, min/max re-extremize), a key on one
    * side passes through (union + group handles both without an outer-join
    * null dance). The result REPLACES the summary — publish it atomically
    * and feed it to the next merge. */
  def merge(summary: DataFrame, partialDf: DataFrame, keys: Seq[String],
            aggs: Seq[AggSpec]): DataFrame = {
    require(keys.nonEmpty, "merge: no keys")
    require(aggs.nonEmpty, "merge: no aggregates")
    val exprs = aggs.map {
      case AggSpec("count", _, as) => sum(col(as)).as(as)
      case AggSpec("sum", _, as)   => sum(col(as)).as(as)
      case AggSpec("min", _, as)   => min(col(as)).as(as)
      case AggSpec("max", _, as)   => max(col(as)).as(as)
      case other => throw new IllegalArgumentException(other.toString)
    }
    summary.unionByName(partialDf)
      .groupBy(keys.map(col): _*).agg(exprs.head, exprs.tail: _*)
  }
}
