package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 (Kimball): keep the HISTORY of a
  * dimension attribute as validity intervals instead of overwriting in
  * place. The reference's star schema is SCD1 — its dim upsert inserts
  * absent members only and an attribute change silently rewrites nothing
  * (`populate_dimension_fact_tables.sql:60-82`,
  * `lambda_redshift/lambda_function_redishift.py:130-150`); SCD2 is the
  * standard warehouse extension a consumer of that schema reaches for next,
  * so it ships as a first-class operator.
  *
  * Scale shape: every window here is PARTITIONED BY the dimension's natural
  * key — per-key history lengths are bounded (a user's attribute changes,
  * not the corpus), so no unpartitioned window appears anywhere on this
  * path (the classic SCD2-via-global-sort trap). The change-point filter
  * runs BEFORE interval assembly, so consecutive same-value rows collapse
  * early and the second window sees only genuine transitions.
  */
object Scd {

  /** Historize a change stream into SCD2 validity intervals.
    *
    * Input: one row per observation `(key, ts, attr, tie)` — `tie` breaks
    * equal timestamps deterministically (an event id; retries/replays make
    * same-ts observations routine). Output: one row per RUN of equal
    * consecutive attribute values per key:
    * `(key, attr, valid_from, valid_to, version, is_current)` where
    * `valid_to` is the next run's `valid_from` (NULL for the open interval)
    * and `version` numbers runs 1..n per key.
    *
    * Consecutive equal values (including NULL == NULL, null-safe) belong to
    * one run — re-observing an unchanged attribute must not open a new
    * version, or replayed batches would mint spurious history. */
  def historize(changes: DataFrame, keyCol: String, tsCol: String,
                attrCol: String, tieCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val changePoints = changes
      .withColumn("__prev", lag(col(attrCol), 1).over(byKey))
      .withColumn("__rn", row_number().over(byKey))
      // first observation always opens a run; later ones only on a
      // null-safe value change (lag's NULL at the frame edge must not be
      // conflated with a NULL attribute value — __rn distinguishes them)
      .where(col("__rn") === 1 || !(col("__prev") <=> col(attrCol)))
      .select(col(keyCol), col(attrCol), col(tsCol).as("valid_from"), col(tieCol))
    val byRun = Window.partitionBy(col(keyCol)).orderBy(col("valid_from"), col(tieCol))
    changePoints
      .select(
        col(keyCol), col(attrCol), col("valid_from"),
        lead(col("valid_from"), 1).over(byRun).as("valid_to"),
        row_number().over(byRun).cast("long").as("version"),
        lead(col("valid_from"), 1).over(byRun).isNull.as("is_current"))
  }

  /** Incremental SCD2 upsert: fold a new batch of observations into an
    * existing historized dimension. Closed versions are immutable — only
    * each key's CURRENT row can be closed by a change arriving after its
    * `valid_from`; new keys open at version 1.
    *
    * Contract (asserted in ScdSpec): for any split point,
    * `upsert(historize(first), second) == historize(first ∪ second)`,
    * provided the split respects STRICT time order per key: every batch
    * observation's ts exceeds the key's current `valid_from` (the watermark
    * contract every incremental warehouse load already has). A batch
    * observation at EXACTLY the current run's valid_from with a different
    * attribute is outside the contract — the re-injected current row
    * carries a NULL tie (sorting first), so the fold places it before the
    * same-ts newcomer regardless of the newcomer's tie, which a full
    * rebuild (ordering by the original ties) may disagree with. Equal-ts
    * REPLAYS of the run-opening observation are safe: same attribute,
    * so the run extends regardless of order.
    *
    * Scale shape: the existing dim's closed rows pass through untouched
    * (no shuffle); only current rows + the batch enter the per-key window
    * re-historization. */
  def upsert(existing: DataFrame, batch: DataFrame, keyCol: String,
             tsCol: String, attrCol: String, tieCol: String): DataFrame = {
    val closed = existing.where(!col("is_current"))
    // Re-historize each key's open run together with its new observations.
    // The current row re-enters as a pseudo-observation at its valid_from;
    // version offsets restore the key's absolute version numbers.
    val currentAsObs = existing.where(col("is_current"))
      .select(col(keyCol), col("valid_from").as(tsCol), col(attrCol),
        lit(null).cast(batch.schema(tieCol).dataType).as(tieCol),
        (col("version") - 1L).as("__offset"))
    // null-safe on the key (a NULL natural key is still a key — historize's
    // window groups it as one; a plain equi-join would lose its offset and
    // silently restart its versions at 1)
    val offsets = currentAsObs.select(col(keyCol).as("__ok"), col("__offset"))
    val rehist = historize(
      currentAsObs.drop("__offset")
        .unionByName(batch.select(col(keyCol), col(tsCol), col(attrCol), col(tieCol))),
      keyCol, tsCol, attrCol, tieCol)
    val reopened = rehist
      .join(offsets, rehist(keyCol) <=> col("__ok"), "left")
      .withColumn("version", col("version") + coalesce(col("__offset"), lit(0L)))
      .drop("__offset", "__ok")
    closed.unionByName(reopened)
  }

  /** Point-in-time resolve: join each fact row to the dimension version
    * valid AT its event time — the canonical consumer of [[historize]], and
    * the query every SCD2 warehouse exists to answer ("which attribute did
    * this key have when the fact happened", summary.pdf §NOTE's Type-2
    * discussion). Equivalent to the interval join
    * `ON key AND ts >= valid_from AND (ts < valid_to OR valid_to IS NULL)`;
    * facts before a key's first version resolve to NULLs (left semantics).
    *
    * Implementation is NOT that interval join: because [[historize]]'s
    * intervals TILE each key's timeline (every `valid_to` is the next run's
    * `valid_from`), the valid version is exactly the one with the greatest
    * `valid_from <= ts` — an as-of carry ([[graft.ext.AsofJoin.asof]]):
    * one exchange keyed on the natural key + one per-key sorted window,
    * linear in |facts| + |dim|, no range-predicate join for Catalyst to
    * plan as a per-key cross product. Facts at EXACTLY a version's
    * `valid_from` resolve to that version (`>=` boundary), matching the
    * interval form, because the previous version's `valid_to` excludes the
    * boundary instant. When two runs of one key open at the same instant
    * (same-ts observations with different ties), the earlier run's interval
    * is empty — only the highest version at that instant can match, so the
    * dim is deduplicated to it before the carry, keeping the as-of result
    * identical to the interval join's.
    *
    * @param facts   probe side; all columns pass through; must not already
    *                carry `asof_`-prefixed output columns
    * @param dim     a [[historize]]/[[upsert]]-shaped frame:
    *                (key, attr, valid_from, valid_to, version, is_current)
    * @param keyCol  natural key column, present on both sides
    * @param tsCol   fact event-time column; compared against `valid_from`
    * @param attrCol the dimension attribute column to resolve
    * @return facts + (asof_<attrCol>, asof_valid_from, asof_version) */
  def resolveAtTime(facts: DataFrame, dim: DataFrame, keyCol: String,
                    tsCol: String, attrCol: String): DataFrame = {
    val byStart = Window.partitionBy(col(keyCol), col("valid_from"))
      .orderBy(col("version").desc)
    val versions = dim
      .select(col(keyCol), col(attrCol), col("valid_from"), col("version"))
      .withColumn("__rn", row_number().over(byStart))
      .where(col("__rn") === 1)
      .select(col(keyCol), col("valid_from").as(tsCol),
        col(attrCol), col("valid_from"), col("version"))
    graft.ext.AsofJoin.asof(facts, versions, keyCol, tsCol,
      Seq(attrCol, "valid_from", "version"))
  }
}
