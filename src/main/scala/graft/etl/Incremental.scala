package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental/streaming wrapper (SURVEY §2 rows 33-37).
  *
  * The reference's orchestration is: S3 event → transform Lambda → second
  * Lambda loads to Redshift (`lambda_s3/lambda_function_s3.py:15-28`), or
  * Snowpipe auto-ingest → STREAM → scheduled TASK chain
  * (`ETL-load to snowflake/snow pipe.sql:35-79,96-97`). All of that is a
  * file-arrival-driven incremental pipeline with idempotent at-least-once
  * semantics (no watermarks anywhere — dedup is by anti-join/MERGE on natural
  * keys, SURVEY §2 row 37).
  *
  * Spark restatement: a Structured Streaming file source discovers new files
  * (the S3-event / Snowpipe role), `foreachBatch` runs the same batch core
  * transform→merge (the task-chaining role, row 36), and the checkpoint
  * replaces the Snowflake STREAM offset (row 34). The reference's 60-minute
  * task cadence (`snow pipe.sql:78`) maps to `Trigger.ProcessingTime`;
  * `Trigger.AvailableNow` gives the batch-like drain used in tests.
  */
object Incremental {

  /** Stream raw CSVs from `stageDir` into the star at `storeRoot`.
    *
    * @param cadence None → `Trigger.AvailableNow` (drain and stop);
    *                Some(interval) → `Trigger.ProcessingTime` (the
    *                reference's `schedule='60 minute'`, `snow pipe.sql:78`;
    *                `system$stream_has_data` gating is implicit — empty
    *                micro-batches are near-free).
    */
  def run(spark: SparkSession, stageDir: String, storeRoot: String,
          checkpointDir: String, cadence: Option[String] = None): StreamingQuery = {
    val raw = spark.readStream
      .schema(RawSchemas.raw)
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\\")
      .option("ignoreLeadingWhiteSpace", "true")
      .csv(stageDir)

    val store = StarStore(spark, storeRoot)
    val trigger = cadence.map(Trigger.ProcessingTime(_)).getOrElse(Trigger.AvailableNow())

    raw.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Transform → merge chained inside one micro-batch (SURVEY §2 row 36);
        // anti-join upserts make replays idempotent (row 37).
        store.runBatch(batch, batchId.toString): Unit
      }
      .start()
  }
}
