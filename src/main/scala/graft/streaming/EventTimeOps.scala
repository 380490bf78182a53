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

  /** Windowed PORTABLE-HLL register table over a stream: per (window,
    * bucket) the max rho — `max` is associative/commutative, so the sketch
    * accumulates incrementally in the state store across micro-batches and
    * the final registers equal the batch run's bit-for-bit (EventTimeSpec
    * pins it). The streaming twin of [[graft.ext.Sketches.hllRegisters]]:
    * state per window is ≤ 64 rows, evicted at the watermark — distinct
    * counting over an unbounded stream in bounded state. */
  def streamingHllRegisters(events: DataFrame, tsCol: String, keyCol: String,
                            windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen),
        graft.ext.Sketches.hllBucket(col(keyCol)).as("bucket"))
      .agg(max(graft.ext.Sketches.hllRho(col(keyCol))).as("register"))

  /** Windowed portable-HISTOGRAM counters over a stream — the quantile
    * sketch's streaming twin (counts are sums, so the state store
    * accumulates them incrementally exactly like the HLL registers' max):
    * ≤ nBuckets rows of state per window, evicted at the watermark. The
    * batch consumer (`Sketches.histogramQuantiles`'s cumulative selection)
    * reads the final counter table unchanged — EventTimeSpec pins
    * streamed counters == batch counters. */
  def streamingHistogramCounts(events: DataFrame, tsCol: String,
                               valueCol: String, width: Double, nBuckets: Int,
                               windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen),
        least(floor(col(valueCol) / width), lit(nBuckets - 1))
          .cast("int").as("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Windowed portable-CMS counters over a stream — the frequency member
    * of the sketch triad streamed exactly like the HLL registers and
    * histogram counters (counters are SUMS, so the state store accumulates
    * them incrementally across micro-batches): ≤ d·2^wBits rows of state
    * per window, evicted at the watermark. The batch consumer
    * ([[graft.ext.Sketches.cmsEstimatesFromCounters]]) reads the final
    * counter table unchanged; EventTimeSpec pins streamed counters ==
    * [[graft.ext.Sketches.cmsCountersBy]] over the same events. */
  def streamingCmsCounters(events: DataFrame, tsCol: String, keyCol: String,
                           windowLen: String, watermark: String,
                           d: Int = 4, wBits: Int = 8): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), posexplode(
        graft.ext.Sketches.cmsBucketArray(col(keyCol), d, wBits))
        .as(Seq("j", "bucket")))
      .groupBy(window(col(tsCol), windowLen), col("j"), col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Session windows (gap-based) per key: events closer than `gap` merge into
    * one session. Built-in `session_window` keeps this inside Catalyst
    * (codegen + native state store) — no custom state needed. */
  def sessionCounts(events: DataFrame, tsCol: String, keyCol: String,
                    gap: String, watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(events.withWatermark(tsCol, _))
    src.groupBy(session_window(col(tsCol), gap), col(keyCol))
      .agg(count(lit(1)).as("n"))
  }

  /** Watermarked stream-stream interval join — the canonical two-stream
    * enrichment (click joined to every impression of the same key within a
    * lag bound; attribution, funnel stitching, request/response pairing).
    * Emits left rows paired with each right row of the same key whose
    * timestamp falls in `[leftTs - maxLag, leftTs]`.
    *
    * On streams BOTH sides carry the watermark and the join condition
    * carries the time bound — exactly the two things Structured Streaming
    * requires to bound the buffered state of a stream-stream inner join
    * (each side's buffer holds only rows younger than watermark + lag;
    * without the bound the join is rejected/unbounded). On batch frames the
    * same call is a plain inner join with the range condition — Catalyst
    * plans it keyed on `keyCol` with the range as a join filter, so nothing
    * cartesian appears and the shuffle is the key exchange both streams
    * already need. The right key is renamed internally to keep the output
    * unambiguous; both timestamp columns pass through (they must be named
    * differently).
    *
    * Cross-batch matching (a right row buffered in one micro-batch joining
    * a left row arriving in a later one) is pinned in EventTimeSpec; the
    * batch-driven form is the `q_stream_stream_join` oracle row.
    *
    * `joinType = "left_outer"` gives the unmatched-left variant (the
    * attribution question "which purchases had NO preceding view"): on
    * streams, Structured Streaming emits the null-extended left row only
    * once the watermark passes the end of its match window — finality, not
    * latency, is the contract (EventTimeSpec pins the delayed emission);
    * on batch frames it is a plain left join. Only inner and left_outer
    * are accepted: right/full outer would need the LEFT side's window
    * re-derived on the right's clock, a different operator. */
  def streamStreamJoin(left: DataFrame, right: DataFrame, keyCol: String,
                       leftTsCol: String, rightTsCol: String,
                       maxLag: String, watermark: String,
                       joinType: String = "inner"): DataFrame = {
    require(leftTsCol != rightTsCol,
      s"timestamp columns must differ (both pass through): $leftTsCol")
    require(joinType == "inner" || joinType == "left_outer",
      s"streamStreamJoin supports inner/left_outer, got: $joinType")
    val rk = "__rk"
    require(!left.columns.contains(rk) && !right.columns.contains(rk),
      s"'$rk' column would collide with the internal right-key alias")
    val l = if (left.isStreaming) left.withWatermark(leftTsCol, watermark)
      else left
    val r0 = right.withColumnRenamed(keyCol, rk)
    val r = if (r0.isStreaming) r0.withWatermark(rightTsCol, watermark)
      else r0
    l.join(r, col(keyCol) === col(rk) &&
        col(rightTsCol) >= col(leftTsCol) - expr(s"INTERVAL $maxLag") &&
        col(rightTsCol) <= col(leftTsCol), joinType)
      .drop(rk)
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

  final case class BandDoc(band_key: Long, id: Long, sig: Array[Long])
  final case class NearDupCandidate(a_id: Long, b_id: Long, n_agree: Int,
                                    est_jaccard: Double)

  /** Streaming near-duplicate detection: stateful MinHash LSH across
    * micro-batches — the streaming form of
    * [[graft.ext.Dedup.nearDuplicatesFast]], for flagging near-dups at
    * ingest time instead of in a nightly batch. Each document's xxhash64
    * signature (`numHashes` seeds) explodes into 1-row bands; state is
    * keyed by the band bucket and remembers the bucket's most recent
    * `maxPerBucket` (id, signature) residents; an arrival is scored against
    * residents by signature-position agreement (agree / numHashes — the
    * standard unbiased Jaccard estimate). The decision is estimate-based
    * (exact verification would need unbounded shingle state per bucket);
    * route flagged pairs through the exact batch verifier when false
    * positives matter.
    *
    * Emissions are canonical (a_id < b_id) but the same pair can surface
    * from several agreeing bands — dedup downstream by (a_id, b_id)
    * (`dropDuplicatesWithinWatermark`, or a distinct in the sink).
    *
    * Scale shape: the shuffle is keyed on the band bucket, exactly like the
    * batch LSH join; per-bucket state is hard-bounded at `maxPerBucket`
    * signatures (oldest evicted — a pair whose earlier member was evicted
    * is the at-least-once residue the downstream idempotent merge absorbs);
    * a single micro-batch's arrivals into one bucket are ALSO bounded: only
    * the `maxBatchPerBucket` lowest-id arrivals are processed (bounded-heap
    * selection, so the task never materializes a degenerate band — the
    * streaming analog of the batch path's `maxBucketSize` mega-bucket cap;
    * agreement on a near-universal band carries ~no similarity signal).
    * `idleTimeout` additionally evicts cold buckets (same
    * processing-time-timeout caveat as [[runningStats]]). Within a
    * micro-batch, arrivals are processed in id order, so the emitted pair
    * SET is deterministic under any partitioning — in batch mode this
    * processes the whole frame as one "batch" and subsumes the single-pass
    * candidate generation. */
  def streamingNearDedup(docs: DataFrame, idCol: String, textCol: String,
                         shingleLen: Int = 3, numHashes: Int = 16,
                         threshold: Double = 0.5, maxPerBucket: Int = 64,
                         maxBatchPerBucket: Int = 4096,
                         idleTimeout: Option[String] = None,
                         signature: Option[Column] = None,
                         tok: graft.ext.Tokenizer = graft.ext.Tokenizer.Whitespace)
      : Dataset[NearDupCandidate] = {
    import docs.sparkSession.implicits._
    import graft.ext.Dedup
    // The state tuple keys ids as primitive Long: a non-numeric id column
    // would cast to NULL and die opaquely in the typed encoder — fail fast
    // on the contract instead.
    val idType = docs.schema(idCol).dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"streamingNearDedup requires a numeric id column ('$idCol' is $idType) — state keys ids as Long")
    // the signature FAMILY is pluggable (must be array<long> of length
    // numHashes over the same text column): the default is the xxhash64
    // fast path; [[graft.ext.Dedup.minhashSignature60]] is the portable
    // md5 family an external oracle can restate — the banding, state,
    // eviction, and agreement machinery is identical for both
    // `tok` governs BOTH the default signature's shingles and the
    // pre-filter: a script-aware caller passing only a custom `signature`
    // would otherwise have its CJK docs dropped by a whitespace-token
    // count before ever being signed. Whitespace compiles to the exact
    // historical expressions (gated hashes unchanged).
    val sig = signature.getOrElse(Dedup.minhashSignatureFast(
      Dedup.hashedWordShingles(col(textCol), shingleLen, tok), numHashes))
    val bands = docs
      // non-empty shingle set via the CHEAP raw-text precondition — a
      // filter on the signature itself would be pushed down as a clone of
      // the whole kernel (the projection-collapse recompute pathology)
      .where(size(Dedup.words(col(textCol), tok)) >= shingleLen)
      .select(col(idCol).cast("long").as("id"), sig.as("sig"))
      .select(col("id"), col("sig"),
        posexplode(col("sig")).as(Seq("band", "v")))
      .select(xxhash64(col("band"), col("v")).as("band_key"), col("id"),
        col("sig"))
      .as[BandDoc]
    val timeoutConf = if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
                      else GroupStateTimeout.NoTimeout
    bands
      .groupByKey(_.band_key)
      .flatMapGroupsWithState[List[(Long, Array[Long])], NearDupCandidate](
        org.apache.spark.sql.streaming.OutputMode.Append(), timeoutConf) {
        (_, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var residents = state.getOption.getOrElse(Nil) // newest first
            val out = List.newBuilder[NearDupCandidate]
            // keep the maxBatchPerBucket lowest ids without materializing
            // the whole group (max-heap of bounded size)
            val heap = scala.collection.mutable.PriorityQueue
              .empty[BandDoc](Ordering.by[BandDoc, Long](_.id))
            rows.foreach { d =>
              heap.enqueue(d)
              if (heap.size > maxBatchPerBucket) { heap.dequeue(); () }
            }
            val batch = new scala.collection.mutable.ArrayBuffer[BandDoc](heap.size)
            while (heap.nonEmpty) batch += heap.dequeue() // descending id
            batch.reverseIterator.foreach { d =>
              residents.foreach { case (rid, rsig) =>
                if (rid != d.id) {
                  var agree = 0
                  var i = 0
                  while (i < rsig.length) {
                    if (rsig(i) == d.sig(i)) agree += 1
                    i += 1
                  }
                  if (agree.toDouble / numHashes >= threshold)
                    out += NearDupCandidate(math.min(rid, d.id),
                      math.max(rid, d.id), agree, agree.toDouble / numHashes)
                }
              }
              residents = ((d.id, d.sig) :: residents).take(maxPerBucket)
            }
            state.update(residents)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }

  final case class FpBand(band_key: Long, id: Long, fp: Long)
  final case class HammingCandidate(a_id: Long, b_id: Long, hamming: Int)

  /** Streaming PERCEPTUAL near-duplicate detection: stateful 64-bit
    * Hamming LSH across micro-batches — the streaming twin of
    * [[graft.ext.Dedup.hammingAgainstStore64]] and the fingerprint-space
    * sibling of [[streamingNearDedup]], for flagging re-encoded images /
    * re-levelled audio at ingest time. Input is the (id, fingerprint)
    * frame a decode stage produces (dHash, audio print, any 64-bit
    * locality hash); each fingerprint explodes into 8 bands of 8 bits,
    * state is keyed by the band bucket and remembers its most recent
    * `maxPerBucket` (id, fingerprint) residents, and an arrival emits a
    * candidate per resident within `maxHamming` (exact popcount on the
    * full fingerprint — unlike the minhash stream there is NO estimate:
    * the fingerprint IS the state, so the emitted distance is the true
    * one, and with unbounded buckets the pair set equals the batch join's
    * by pigeonhole for maxHamming < 8).
    *
    * Emissions are canonical (a_id < b_id); the same pair can surface from
    * several agreeing bands — dedup downstream by (a_id, b_id). State is 16
    * bytes per resident; the shuffle keys on the band bucket exactly like
    * the batch join. Same bounded-heap batch cap, id-order determinism, and
    * idle-timeout eviction as [[streamingNearDedup]]. */
  def streamingHammingDedup(fps: DataFrame, idCol: String, fpCol: String,
                            maxHamming: Int = 4, maxPerBucket: Int = 64,
                            maxBatchPerBucket: Int = 4096,
                            idleTimeout: Option[String] = None)
      : Dataset[HammingCandidate] = {
    import fps.sparkSession.implicits._
    require(maxHamming >= 0 && maxHamming < 8,
      s"banded candidates are exact only for maxHamming < 8 bands, got $maxHamming")
    val idType = fps.schema(idCol).dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"streamingHammingDedup requires a numeric id column ('$idCol' is $idType) — state keys ids as Long")
    val bands = fps
      .select(col(idCol).cast("long").as("id"), col(fpCol).cast("long").as("fp"))
      .select(col("id"), col("fp"),
        graft.ext.Dedup.fpBands(col("fp"), 8, 8).as(Seq("band", "v")))
      .select(xxhash64(col("band"), col("v")).as("band_key"), col("id"),
        col("fp"))
      .as[FpBand]
    val timeoutConf = if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
                      else GroupStateTimeout.NoTimeout
    bands
      .groupByKey(_.band_key)
      .flatMapGroupsWithState[List[(Long, Long)], HammingCandidate](
        org.apache.spark.sql.streaming.OutputMode.Append(), timeoutConf) {
        (_, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var residents = state.getOption.getOrElse(Nil) // newest first
            val out = List.newBuilder[HammingCandidate]
            val heap = scala.collection.mutable.PriorityQueue
              .empty[FpBand](Ordering.by[FpBand, Long](_.id))
            rows.foreach { d =>
              heap.enqueue(d)
              if (heap.size > maxBatchPerBucket) { heap.dequeue(); () }
            }
            val batch = new scala.collection.mutable.ArrayBuffer[FpBand](heap.size)
            while (heap.nonEmpty) batch += heap.dequeue() // descending id
            batch.reverseIterator.foreach { d =>
              residents.foreach { case (rid, rfp) =>
                if (rid != d.id) {
                  val h = java.lang.Long.bitCount(rfp ^ d.fp)
                  if (h <= maxHamming)
                    out += HammingCandidate(math.min(rid, d.id),
                      math.max(rid, d.id), h)
                }
              }
              residents = ((d.id, d.fp) :: residents).take(maxPerBucket)
            }
            state.update(residents)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }

  final case class ScdObs(key: Long, ts: Long, attr: String, tie: Long)
  final case class ScdClosed(key: Long, attr: String, valid_from: Long,
                             valid_to: Long, version: Long)
  final case class ScdOpen(attr: String, valid_from: Long, version: Long)

  /** Streaming SCD Type-2 — the stateful twin of [[graft.etl.Scd]]: maintain
    * each key's dimension history continuously, emitting a version the
    * moment the attribute CHANGES (append mode can only emit finalized
    * rows, and a version is final exactly when its successor opens). The
    * open run lives in keyed state: (attr, valid_from, version) — three
    * fields per key, bounded by the dimension's key cardinality, not by the
    * observation volume.
    *
    * Emitted closed versions are identical to
    * `Scd.historize(allObservations).where(!is_current)` (EventTimeSpec
    * pins the equivalence; the batch-driven catalog twin `q_streaming_scd2`
    * oracle-checks it against DuckDB), under the same contract as
    * [[graft.etl.Scd.upsert]]: per key, observations never arrive with a
    * smaller ts than an already-processed batch's (within a micro-batch,
    * order is free — the group sorts by (ts, tie) before folding).
    * Re-observing an unchanged attribute extends the run and emits nothing,
    * so replays mint no history.
    *
    * `idleTimeout` evicts a key's OPEN run from state: correct only for
    * retired keys (a re-appearing key would restart at version 1), which is
    * why the default keeps state forever. */
  def streamingScd2(obs: Dataset[ScdObs],
                    idleTimeout: Option[String] = None): Dataset[ScdClosed] = {
    import obs.sparkSession.implicits._
    val timeoutConf = if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
                      else GroupStateTimeout.NoTimeout
    obs
      .groupByKey(_.key)
      .flatMapGroupsWithState[ScdOpen, ScdClosed](
        org.apache.spark.sql.streaming.OutputMode.Append(), timeoutConf) {
        (key, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toArray.sortBy(o => (o.ts, o.tie))
            val out = List.newBuilder[ScdClosed]
            var cur = state.getOption
            sorted.foreach { o =>
              cur match {
                case None =>
                  cur = Some(ScdOpen(o.attr, o.ts, 1L))
                case Some(c) if c.attr == o.attr => () // run extension
                case Some(c) =>
                  out += ScdClosed(key, c.attr, c.valid_from, o.ts, c.version)
                  cur = Some(ScdOpen(o.attr, o.ts, c.version + 1L))
              }
            }
            cur.foreach(state.update)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }

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

  final case class StepEvent(key: Long, ts: Long, step: Int)
  final case class FunnelTransition(key: Long, depth: Int, ts: Long)
  final case class FunnelOpen(depth: Int, ts: Long)

  /** Streaming ordered funnel — the stateful twin of
    * [[graft.ext.Funnel.funnelDepth]]: track each key's progress through a
    * fixed step sequence continuously, emitting a transition row
    * `(key, depth, ts)` the moment the funnel advances (transitions are
    * final under earliest-transition semantics the instant they happen, so
    * append mode emits them immediately — no watermark needed for
    * finality). Keyed state is two fields (depth, last transition ts) per
    * key — bounded by key cardinality, not event volume, and FAR smaller
    * than buffering events.
    *
    * Input events carry the 1-based index of their step in the funnel
    * (resolve `event_type` → index before grouping; non-step events should
    * be filtered out — they would be ignored but still shuffle).
    *
    * The transition set equals the batch operator's chain (`t_{k+1} = min
    * ts STRICTLY after t_k`; the deepest transition per key is exactly
    * [[graft.ext.Funnel.funnelDepth]]'s row — EventTimeSpec pins the
    * equivalence, and the batch-driven catalog twin `q_streaming_funnel`
    * oracle-checks the full transition set against DuckDB's iterative join
    * chain), under the same cross-batch contract as [[streamingScd2]]: per
    * key, a batch never carries a ts smaller than an already-processed
    * batch's (within a micro-batch, order is free — the group sorts by
    * (ts, step) before folding). A step re-observed at the current depth
    * advances nothing and emits nothing, so replays are harmless.
    *
    * `idleTimeout` evicts a key's progress: correct only for retired keys
    * (a re-appearing key would restart at depth 0). */
  def streamingFunnel(events: Dataset[StepEvent], nSteps: Int,
                      idleTimeout: Option[String] = None)
      : Dataset[FunnelTransition] = {
    require(nSteps >= 1, s"nSteps must be positive: $nSteps")
    import events.sparkSession.implicits._
    val timeoutConf = if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
                      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[FunnelOpen, FunnelTransition](
        org.apache.spark.sql.streaming.OutputMode.Append(), timeoutConf) {
        (key, rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val sorted = rows.toArray.sortBy(e => (e.ts, e.step))
            val out = List.newBuilder[FunnelTransition]
            var cur = state.getOption.getOrElse(FunnelOpen(0, Long.MinValue))
            sorted.foreach { e =>
              if (cur.depth < nSteps && e.step == cur.depth + 1 &&
                  (cur.depth == 0 || e.ts > cur.ts)) {
                cur = FunnelOpen(cur.depth + 1, e.ts)
                out += FunnelTransition(key, cur.depth, e.ts)
              }
            }
            if (cur.depth > 0) state.update(cur)
            idleTimeout.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }

  final case class HHCand(window_start: Long, shard: Int, key: Long, lb: Long)

  /** STREAMING heavy-hitter candidates — the streaming twin of
    * `Sketches.heavyHitters`, same contract: a Misra–Gries summary whose
    * survivors are a SUPERSET of every key above the window's
    * share-of-traffic bound; the sketch prunes, a downstream exact verify
    * (batch over the window's candidates, or `streamingHistogramCounts`-
    * style counters over only them) decides. State per (event-time
    * window × shard) group is a counter map hard-bounded by `capacity` —
    * the property that lets the state store survive any key cardinality.
    * Sharding by `key mod shards` keeps one window from collapsing onto
    * one task (the window-start-keyed naive version is a hotspot at
    * scale); per-shard MG preserves the superset property per shard, and
    * a key's traffic lands wholly in its own shard, so the union of shard
    * survivors is a superset of the window's heavy keys with the bound
    * `count > windowShardRows/(capacity+1)`.
    *
    * Emits each invocation's surviving (window, shard, key, lower-bound)
    * rows — update-stream semantics like `streamingNearDedup`: consumers
    * take the LATEST (max lb) row per key. Integral keys only (state
    * keys them as Long; fractional keys would truncate-merge).
    *
    * STATE LIFECYCLE: the grouping key includes the window start, so on a
    * continuous stream groups accrue one per (window × shard) forever —
    * pass `idleTimeout` (the sibling stateful ops' discipline) to evict a
    * group's counters once its window has gone quiet for that long; with
    * `None` the state grows with the stream's window count (bounded only
    * per group, not across groups — fine for bounded replays, wrong for a
    * long-running query). The event-time cast strips the watermark
    * attribute before the stateful op, so the watermark here bounds the
    * WINDOW ASSIGNMENT of late data upstream but cannot itself evict
    * state — idleTimeout is the eviction path. */
  def streamingHeavyHitterCandidates(events: DataFrame, tsCol: String,
                                     keyCol: String, windowLen: String,
                                     watermark: String, capacity: Int = 256,
                                     shards: Int = 8,
                                     idleTimeout: Option[String] = None): Dataset[HHCand] = {
    require(capacity >= 1, s"capacity must be positive: $capacity")
    require(shards >= 1, s"shards must be positive: $shards")
    import events.sparkSession.implicits._
    graft.ext.Sketches.requireIntegralKey(events, keyCol,
      "streamingHeavyHitterCandidates")
    val timeoutConf = if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
                      else GroupStateTimeout.NoTimeout
    events
      .withWatermark(tsCol, watermark)
      .select(
        window(col(tsCol), windowLen).getField("start").cast("long").as("ws"),
        col(keyCol).cast("long").as("k"))
      .where(col("k").isNotNull)
      .withColumn("shard", pmod(col("k"), lit(shards.toLong)).cast("int"))
      .as[(Long, Long, Int)]
      .groupByKey(r => (r._1, r._3))
      .flatMapGroupsWithState[Map[Long, Long], HHCand](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        timeoutConf) { (wk, rows, state) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          val m = scala.collection.mutable.HashMap.empty[Long, Long]
          state.getOption.foreach(m ++= _)
          rows.foreach { case (_, k, _) =>
            graft.ext.Sketches.mgUpdate(m, k, capacity)
          }
          state.update(m.toMap)
          idleTimeout.foreach(state.setTimeoutDuration)
          m.iterator.map { case (k, lb) => HHCand(wk._1, wk._2, k, lb) }
            .toList.iterator
        }
      }
  }
}
