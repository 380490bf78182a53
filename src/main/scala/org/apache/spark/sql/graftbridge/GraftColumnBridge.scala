package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.StructType

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
  def internalCreateDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
                              schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
  def inSession(spark: SparkSession, df: DataFrame): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      df.queryExecution.analyzed)
}

/** Public face of the bridge for graft code. */
object GraftColumnBridge {
  def column(e: Expression): Column = Bridge.column(e)
  def expression(c: Column): Expression = Bridge.expression(c)

  /** Wrap an `RDD[InternalRow]` back into a DataFrame without the
    * InternalRow→Row→InternalRow round trip `createDataFrame(rdd.rdd, schema)`
    * pays (`SparkSession.internalCreateDataFrame` is `private[sql]`). The
    * rows must be safe to hold (copied if the producer reuses buffers). */
  def internalCreateDataFrame(spark: SparkSession, rdd: RDD[InternalRow],
                              schema: StructType): DataFrame =
    Bridge.internalCreateDataFrame(spark, rdd, schema)

  /** Re-host an already-ANALYZED frame on another session of the same
    * SparkContext (`Dataset.ofRows` is `private[sql]`). The use case is
    * running a query under session-local SQL confs (a `newSession()` clone)
    * without mutating the caller's shared conf — the analyzed plan carries
    * its resolved relations, so no re-resolution against the clone's (empty)
    * temp-view catalog happens. */
  def inSession(spark: SparkSession, df: DataFrame): DataFrame =
    Bridge.inSession(spark, df)
}
