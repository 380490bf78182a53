package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's transform semantics (`lambda_s3/lambda_function_s3.py:40-119`
  * and the Snowflake task at `ETL-load to snowflake/snow pipe.sql:76-93`) as
  * pure Column expressions.
  *
  * Everything here is built-in Catalyst expressions — no UDFs — so the whole
  * pipeline stays inside whole-stage codegen and filters push down to the
  * scan. The reference applies these as interpreted per-row Python lambdas
  * (`lambda_function_s3.py:41-62`); the semantics are identical, the
  * execution model is not.
  *
  * Where the two reference implementations disagree, the Python-lambda
  * semantics are canonical (they match the requirement doc); the Snowflake
  * variants are exposed under `sf*` names (SURVEY §2 rows 12, 23).
  */
object Transform {

  /** VideoStart code. A VideoStart is a row whose `events` code list contains
    * `206` (requirement doc; `lambda_function_s3.py:70-71`). */
  val VideoStartCode = "206"

  /** Canonical VideoStart filter: exact element membership in the
    * comma-separated code list — `'206' in events.split(',')`
    * (`lambda_function_s3.py:71`). NOT a substring match: `"1206"` must not
    * pass. SURVEY §2 row 11. */
  def isVideoStart(events: Column): Column =
    array_contains(split(events, ","), VideoStartCode)

  /** Snowflake variant: `events like '%206%'` (`snow pipe.sql:91`) — also
    * matches e.g. `"1206"`. Documented semantic divergence; SURVEY §2 row 12. */
  def sfIsVideoStart(events: Column): Column =
    events.like(s"%$VideoStartCode%")

  /** Malformed-title filter: discard rows whose VideoTitle has no `'|'`
    * (`lambda_function_s3.py:73-74`; SF `regexp_count(videotitle,'\\|') != 0`
    * at `snow pipe.sql:92`). SURVEY §2 row 13. */
  def hasValidTitle(videoTitle: Column): Column =
    size(split(videoTitle, "\\|")) > 1

  /** Raw timestamp `2017-01-11T00:00:31.000Z` → minute-grain timestamp.
    * The reference slices off `:SS.mmmZ` with `DateTime[:-8]` then parses
    * `'%Y-%m-%dT%H:%M'` (`lambda_function_s3.py:79,41-47`); we parse fully
    * and truncate — same result, and tolerant of offset-bearing inputs.
    * SURVEY §2 rows 15-16. */
  def minuteTs(dateTime: Column): Column =
    // try_to_timestamp, not to_timestamp: under ANSI mode (Spark 4 default)
    // one malformed row would abort the whole job; unparseable → NULL, and
    // clean() quarantines NULLs instead of crashing the batch.
    date_trunc("minute", try_to_timestamp(dateTime, lit("yyyy-MM-dd'T'HH:mm:ss.SSSX")))

  /** Canonical minute key `yyyyMMddHHmm` — the DimDate natural key
    * (`lambda_function_s3.py:87-88`; `populate_dimension_fact_tables.sql:47`
    * `to_char(datetime,'YYYYMMDDHH24MI')`). SURVEY §2 row 18. */
  def dateKey(ts: Column): Column =
    date_format(ts, "yyyyMMddHHmm")

  /** First `'|'`-piece of VideoTitle — platform/site source
    * (`lambda_function_s3.py:50,59`). */
  def titleHead(videoTitle: Column): Column =
    element_at(split(videoTitle, "\\|"), 1)

  /** Last `'|'`-piece — the video title proper (`lambda_function_s3.py:91`;
    * SF `regexp_substr(videotitle,'[^|]*$')` at `snow pipe.sql:89`).
    * SURVEY §2 row 20. */
  def titleTail(videoTitle: Column): Column =
    element_at(split(videoTitle, "\\|"), -1)

  /** Platform classifier (`like_platform`, `lambda_function_s3.py:49-55`):
    * first pipe-piece containing Android→Android, iPhone→iPhone, iPad→iPad,
    * else Desktop. SURVEY §2 row 21. */
  def platformOf(videoTitle: Column): Column = {
    val head = titleHead(videoTitle)
    when(head.contains("Android"), "Android")
      .when(head.contains("iPhone"), "iPhone")
      .when(head.contains("iPad"), "iPad")
      .otherwise("Desktop")
  }

  /** Site classifier (`like_site`, `lambda_function_s3.py:57-62`): split the
    * first pipe-piece on spaces; if any token is a platform word
    * {Android, iPhone, iPad, Web} the site is NULL, else the piece itself.
    * SURVEY §2 row 22. */
  def siteOf(videoTitle: Column): Column = {
    val head = titleHead(videoTitle)
    val platformWords = array(lit("Android"), lit("iPhone"), lit("iPad"), lit("Web"))
    when(arrays_overlap(split(head, " "), platformWords), lit(null))
      .otherwise(head)
  }

  /** Snowflake classifier variant (`snow pipe.sql:83-88`): regex CASE —
    * `regexp_like(lower(trim(piece)), 'iphone|android|ipad|app')` → the piece,
    * `'news'` → 'Desktop', else 'unknow' (sic). Looser than [[platformOf]];
    * exposed for capability parity. SURVEY §2 row 23. */
  def sfPlatformOf(videoTitle: Column): Column = {
    val piece = lower(trim(titleHead(videoTitle)))
    when(piece.rlike("iphone|android|ipad|app"), trim(titleHead(videoTitle)))
      .when(piece.rlike("news"), "Desktop")
      .otherwise("unknow")
  }

  /** Snowflake site variant (`snow pipe.sql:87-88`): `'news'` → the piece,
    * else 'unknow'. */
  def sfSiteOf(videoTitle: Column): Column = {
    val piece = lower(trim(titleHead(videoTitle)))
    when(piece.rlike("news"), trim(titleHead(videoTitle))).otherwise("unknow")
  }

  /** First failing gate for a raw row, NULL when the row passes all of
    * [[clean]]'s filters. Conditions are coalesced to false so a NULL input
    * column lands in quarantine instead of slipping through both frames —
    * [[clean]] and [[quarantine]] partition the raw frame exactly. */
  def rejectReason(dateTime: Column, videoTitle: Column, events: Column): Column =
    when(!coalesce(isVideoStart(events), lit(false)), "not_videostart")
      .when(!coalesce(hasValidTitle(videoTitle), lit(false)), "malformed_title")
      .when(minuteTs(dateTime).isNull, "bad_timestamp")
      .otherwise(lit(null).cast("string"))

  /** The rows [[clean]] drops, each tagged with its reject reason — the
    * capture side of the filters. The reference only logs aggregate counts
    * to CloudWatch (`lambda_function_s3.py:67-68`); at pipeline scale the
    * rejects themselves are the debugging surface, so they stay a frame a
    * caller can count, sample, or sink next to the published star. */
  def quarantine(raw: DataFrame): DataFrame =
    raw
      .select(col("*"), rejectReason(col("DateTime"), col("VideoTitle"),
        col("events")).as("reject_reason"))
      .where(col("reject_reason").isNotNull)

  /** Full clean/derive step over the raw frame — the lazy-DAG restatement of
    * `data_process` (`lambda_function_s3.py:40-119`): both filters, minute
    * truncation, date parts, platform/site/title derivation, then drop the
    * source columns (`:102-103`). One narrow (shuffle-free) stage. */
  def clean(raw: DataFrame, extras: Seq[String] = Nil): DataFrame = {
    val ts = minuteTs(col("DateTime"))
    raw
      .where(isVideoStart(col("events")) && hasValidTitle(col("VideoTitle")) &&
        ts.isNotNull) // quarantine unparseable timestamps (see minuteTs)
      .select(Seq(
        // named minute_ts, not DateTime: Spark resolution is case-insensitive
        // by default, and the string key below is DATETIME (reference DDL name)
        ts.as("minute_ts"),
        dateKey(ts).as("DATETIME"),
        year(ts).as("year"),
        month(ts).as("month"),
        dayofmonth(ts).as("day"),
        hour(ts).as("hour"),
        minute(ts).as("minute"),
        platformOf(col("VideoTitle")).as("PLATFORM"),
        siteOf(col("VideoTitle")).as("SITE"),
        titleTail(col("VideoTitle")).as("TITLE")
        // schema evolution: caller-named raw columns ride through the
        // clean unchanged (the derived set above is fixed by the
        // reference's contract; extras are the add-only columns
        // StarStore.runBatch threads into the fact)
      ) ++ extras.map(col): _*)
  }
}
