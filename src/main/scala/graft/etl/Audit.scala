package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Data-audit profiling (SURVEY §2 rows 26-27).
  *
  * The reference logs `len(raw)` (total records) and a per-column
  * `max(len(v))` loop used to size Redshift VARCHARs
  * (`lambda_s3/lambda_function_s3.py:67-68,108-110`; summary.pdf
  * §"Extraction, validation, clean and transformation").
  *
  * The reference's loop is one Python pass per column; ours is ONE Spark job
  * computing all max-lengths at once (a single aggregate over the scan) —
  * at 100 TB the difference is |columns| full passes vs one.
  */
object Audit {

  /** Total record count (`lambda_function_s3.py:67-68`). */
  def recordCount(df: DataFrame): Long = df.count()

  /** Per-string-column max length, one job
    * (`lambda_function_s3.py:108-110`). Returns a 1-row frame with a
    * `maxlen_<col>` column per string column. */
  def maxLengths(df: DataFrame): DataFrame = {
    val stringCols = df.schema.fields.collect {
      case f if f.dataType == StringType => f.name
    }
    require(stringCols.nonEmpty, "no string columns to audit")
    df.agg(
      max(length(col(stringCols.head))).as(s"maxlen_${stringCols.head}"),
      stringCols.tail.map(c => max(length(col(c))).as(s"maxlen_$c")): _*
    )
  }

  /** Count + max-lengths in one pass (the reference's full audit). */
  def profile(df: DataFrame): DataFrame = {
    val stringCols = df.schema.fields.collect {
      case f if f.dataType == StringType => f.name
    }
    val aggs = count(lit(1)).as("n_records") +:
      stringCols.map(c => max(length(col(c))).as(s"maxlen_$c"))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Full per-column profile — null count, exact distinct count, min/max
    * string length — as one ROW PER COLUMN: the audit a warehouse load
    * actually wants (the reference stops at max length). Still a single
    * aggregation job over one scan (the multiple distinct counts expand
    * into one pass per Spark's Expand operator, not |columns| scans); the
    * wide 1-row result is unpivoted to long form with `stack`, a pure
    * projection. */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    // internal aliases are INDEX-based, and the only caller-controlled text
    // entering the stack() SQL is an escaped string literal — so column
    // names with dashes/dots/quotes profile fine instead of breaking the
    // expression parser
    val indexed = cols.zipWithIndex
    val aggs = indexed.flatMap { case (c, i) => Seq(
      sum(df(c).isNull.cast("long")).as(s"_nn_$i"),
      countDistinct(df(c)).as(s"_nd_$i"),
      min(length(df(c))).as(s"_mn_$i"),
      max(length(df(c))).as(s"_mx_$i")) }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    def q(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
    val stackArgs = indexed
      .map { case (c, i) => s"'${q(c)}', _nn_$i, _nd_$i, _mn_$i, _mx_$i" }
      .mkString(", ")
    wide.select(expr(
      s"stack(${cols.length}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_len, max_len)"))
  }

  /** CDC-style SNAPSHOT DIFF between two versions of a table — the audit
    * consumer of [[StarStore.readVersion]] time travel, and the general
    * "what changed between yesterday's publish and today's" reconciliation
    * every warehouse load answers before trusting an incremental feed:
    * full outer join on the primary key, per-key status
    * added / removed / changed / unchanged (non-key columns compared
    * NULL-SAFELY, so a value going null or non-null counts as changed,
    * not as a silent join miss), aggregated to one row per status.
    *
    * Scale shape: ONE shuffle keyed on the PK (the full outer join — AQE
    * picks sort-merge vs broadcast by actual size), then a count-by-status
    * with map-side partials. No window, no driver loop; the canonical
    * two-snapshot reconciliation plan at any scale. Both inputs must carry
    * `pk` and `compareCols` (default: every non-PK column of `oldDf`). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, pk: Seq[String],
                   compareCols: Seq[String] = null): DataFrame = {
    require(pk.nonEmpty, "snapshotDiff: empty primary key")
    val cmp = Option(compareCols).getOrElse(
      oldDf.columns.toSeq.filterNot(pk.contains))
    val o = oldDf.select(
      pk.map(col) ++ cmp.map(c => col(c).as(s"_o_$c")): _*)
    val n = newDf.select(
      pk.map(col) ++ cmp.map(c => col(c).as(s"_n_$c")) :+
        lit(1).as("_in_new"): _*)
    // presence flags survive the outer join (a PK column would too, but
    // only via per-side aliases; a literal flag keeps the key columns
    // coalesced by the USING-style join)
    val j = o.withColumn("_in_old", lit(1)).join(n, pk, "full_outer")
    val same = cmp.map(c => col(s"_o_$c") <=> col(s"_n_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    j.select(
        when(col("_in_old").isNull, "added")
          .when(col("_in_new").isNull, "removed")
          .when(same, "unchanged").otherwise("changed").as("status"))
      .groupBy(col("status")).agg(count(lit(1)).as("n_rows"))
  }
}
