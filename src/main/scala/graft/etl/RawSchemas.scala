package graft.etl

import org.apache.spark.sql.types._

/** Explicit schemas for the video-events star schema.
  *
  * The reference declares these on the warehouse side
  * (`lambda_redshift/lambda_function_redishift.py:56-98`,
  * `ETL-load to snowflake/snow pipe.sql:6-11`) and lets pandas infer the raw
  * side (`lambda_s3/lambda_function_s3.py:65`). We declare everything
  * explicitly for determinism — schema inference re-reads the data and can
  * drift between files, which matters at 100 TB.
  */
object RawSchemas {

  /** Raw source table `(DateTime, VideoTitle, events)` — all strings, per
    * `snow pipe.sql:6-11` (`SRC_CREDIT(datetime varchar(50), video_title
    * varchar(200), events varchar(200))`).
    */
  val raw: StructType = StructType(Seq(
    StructField("DateTime", StringType),
    StructField("VideoTitle", StringType),
    StructField("events", StringType)
  ))

  /** DimDate: minute-grain key `yyyyMMddHHmm`
    * (`lambda_function_redishift.py:71-73`). */
  val dimDate: StructType = StructType(Seq(
    StructField("DATETIME_SKEY", LongType, nullable = false),
    StructField("DATETIME", StringType)
  ))

  /** dim_time delta-table shape with date parts
    * (`lambda_function_s3.py:80-88`, `lambda_function_redishift.py:57-63`). */
  val dimTime: StructType = StructType(Seq(
    StructField("DateTime", TimestampType),
    StructField("year", IntegerType),
    StructField("month", IntegerType),
    StructField("day", IntegerType),
    StructField("hour", IntegerType),
    StructField("minute", IntegerType)
  ))

  val dimTitle: StructType = StructType(Seq(
    StructField("TITLE_SKEY", LongType, nullable = false),
    StructField("TITLE", StringType)
  ))

  val dimSite: StructType = StructType(Seq(
    StructField("SITE_SKEY", LongType, nullable = false),
    StructField("SITE", StringType)
  ))

  val dimPlatform: StructType = StructType(Seq(
    StructField("PLATFORM_SKEY", LongType, nullable = false),
    StructField("PLATFORM", StringType)
  ))

  /** FACTVIDEOSTART (`lambda_function_redishift.py:93-98`). */
  val factVideoStart: StructType = StructType(Seq(
    StructField("factid", LongType, nullable = false),
    StructField("DATETIME_SKEY", LongType),
    StructField("PLATFORM_SKEY", LongType),
    StructField("SITE_SKEY", LongType),
    StructField("TITLE_SKEY", LongType)
  ))
}
