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
    val aggs = cols.flatMap(c => Seq(
      sum(col(c).isNull.cast("long")).as(s"_nn_$c"),
      countDistinct(col(c)).as(s"_nd_$c"),
      min(length(col(c))).as(s"_mn_$c"),
      max(length(col(c))).as(s"_mx_$c")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', _nn_$c, _nd_$c, _mn_$c, _mx_$c").mkString(", ")
    wide.select(expr(
      s"stack(${cols.length}, $stackArgs) AS (col_name, n_nulls, n_distinct, min_len, max_len)"))
  }
}
