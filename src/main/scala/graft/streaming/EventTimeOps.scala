package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Event-time operators for the streaming side of the engine (SURVEY §2.7).
  *
  * The reference pipeline needs no watermarks (its contract is idempotent
  * at-least-once merge — `graft.etl.Incremental`); these are the event-time
  * operators a general telemetry pipeline adds on top. All of them work
  * identically over a batch DataFrame or a `readStream` frame — the batch
  * form is what the DuckDB oracle checks, the streaming form is covered by
  * the MemoryStream spec.
  *
  * Scale notes: windowed aggregation state is partitioned by (window, key) —
  * the shuffle key is the state key, so state distributes with no hotspots
  * unless a single key dominates (salt the key if so). Watermarks bound state
  * size; without one, streaming state grows forever.
  */
object EventTimeOps {

  /** Watermarked tumbling-window counts per key. */
  def tumblingCounts(events: DataFrame, tsCol: String, keyCol: String,
                     windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"))

  /** Sliding-window counts (window/slide), watermarked. */
  def slidingCounts(events: DataFrame, tsCol: String, keyCol: String,
                    windowLen: String, slide: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen, slide), col(keyCol))
      .agg(count(lit(1)).as("n"))

  /** Session windows (gap-based) per key: events closer than `gap` merge into
    * one session. Built-in `session_window` keeps this inside Catalyst
    * (codegen + native state store) — no custom state needed. */
  def sessionCounts(events: DataFrame, tsCol: String, keyCol: String,
                    gap: String, watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(events.withWatermark(tsCol, _))
    src.groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n"))
  }

  /** Streaming exact dedup: drop re-arrivals of the same normalized text
    * within the watermark horizon — the streaming form of
    * [[graft.ext.Dedup.exactGroups]]'s fingerprint, for continuous document
    * ingestion. `dropDuplicatesWithinWatermark` keeps one state row per
    * fingerprint and EVICTS it once the watermark passes (plain
    * dropDuplicates state grows forever on a stream); duplicates farther
    * apart in event time than the watermark are the at-least-once residue
    * the downstream idempotent merge absorbs. Works identically on a batch
    * frame via the batch fallback (duplicates drop globally). */
  def streamingExactDedup(docs: DataFrame, textCol: String,
                          tsCol: String, watermark: String): DataFrame =
    docs
      .withColumn("_fingerprint", md5(lower(col(textCol))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("_fingerprint")
      .drop("_fingerprint") // schema matches the input, like batch exactDedup

  final case class KeyedEvent(key: Long, ts: java.sql.Timestamp)
  final case class RunningStats(key: Long, n: Long, first_ts: java.sql.Timestamp,
                                last_ts: java.sql.Timestamp)

  /** Custom keyed state via `mapGroupsWithState` — the escape hatch for
    * semantics the built-in windows can't express (here: a running per-key
    * profile surviving across micro-batches).
    *
    * `idleTimeout`: None (default) = state lives forever (fine for bounded
    * key spaces). Some(duration) enables processing-time eviction of idle
    * keys — NOTE that with a processing-time timeout the engine schedules
    * continuous empty micro-batches to evaluate timeouts, so only use it on
    * long-running production streams, never with `processAllAvailable`-style
    * draining. */
  def runningStats(events: Dataset[KeyedEvent],
                   idleTimeout: Option[String] = None): Dataset[RunningStats] = {
    import events.sparkSession.implicits._
    val timeoutConf = if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
                      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.key)
      .mapGroupsWithState[RunningStats, RunningStats](timeoutConf) {
        (key: Long, rows: Iterator[KeyedEvent], state: GroupState[RunningStats]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            last
          } else {
            val batch = rows.toSeq
            val prev = state.getOption
            val n = prev.map(_.n).getOrElse(0L) + batch.size
            val first = prev.map(_.first_ts)
              .getOrElse(batch.minBy(_.ts.getTime).ts)
            val last = (prev.map(_.last_ts).toSeq ++ batch.map(_.ts))
              .maxBy(_.getTime)
            val next = RunningStats(key, n, first, last)
            state.update(next)
            idleTimeout.foreach(state.setTimeoutDuration)
            next
          }
      }
  }
}
