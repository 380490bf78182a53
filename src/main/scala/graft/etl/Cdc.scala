package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture apply: merge a changelog of insert/update/delete
  * operations into a base snapshot, latest-wins per key — the general MERGE
  * the reference's pipeline approximates with its insert-only dim upsert
  * (`populate_dimension_fact_tables.sql:60-82`) and the batch half of what
  * Debezium/DMS-style CDC feeds demand downstream.
  *
  * Semantics: each changelog row is `(key…, seq, op, payload…)` with
  * `op ∈ {I, U, D}`. For every key, ONLY the row with the highest `seq`
  * matters (intermediate states of a key within one batch are superseded —
  * the standard "compact then apply" CDC contract): `D` removes the key,
  * `I`/`U` both upsert the payload (an insert arriving for an existing key
  * behaves as an update — replays and at-least-once feeds make the
  * distinction unreliable, so it is deliberately not load-bearing). Keys
  * untouched by the changelog pass through unchanged.
  *
  * Scale shape: the changelog compaction windows per KEY (bounded by a
  * key's changes in the batch, never corpus-sized), and the base-side
  * anti-join is keyed on the batch's keys — a batch ≪ base (the CDC
  * regime) broadcasts, so the BASE IS NEVER SHUFFLED (PlanSpec pins it);
  * for a batch too big to broadcast but far smaller than the base,
  * [[graft.ext.BloomJoin.prefilteredEquiJoin]] with `left_anti` is the
  * drop-in upgrade — bloom-negative base rows bypass even the join.
  *
  * Determinism: `seq` must totally order each key's changes (a log offset
  * or LSN). Ties on `(key, seq)` would make the survivor engine-dependent,
  * so they are the caller's bug, not a tiebreak here.
  */
object Cdc {

  /** Apply `changes` to `base`. `changes` must carry `base`'s exact columns
    * (the payload) plus `seqCol` and `opCol`. Returns the post-apply
    * snapshot with `base`'s schema.
    *
    * `broadcastKeys = true` (the CDC regime: batch ≪ base) pins the
    * changed-key set to a broadcast anti-join so the base never shuffles;
    * set false when a backfill-sized changelog would not fit a broadcast —
    * the anti-join then shuffles both sides (honest price at that size). */
  def applyChangelog(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
                     seqCol: String, opCol: String,
                     broadcastKeys: Boolean = true): DataFrame = {
    require(keyCols.nonEmpty, "applyChangelog needs at least one key column")
    val payload = base.columns
    val expected = payload.toSet ++ Set(seqCol, opCol)
    require(changes.columns.toSet == expected,
      s"changelog columns ${changes.columns.toSet} must be base's " +
        s"(${payload.toSet}) plus $seqCol/$opCol")
    require(keyCols.forall(payload.contains), s"keys $keyCols must be base columns")
    val byKey = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(seqCol).desc)
    val latest = changes
      .withColumn("_rn", row_number().over(byKey))
      .where(col("_rn") === 1)
    val changedKeys = latest.select(keyCols.map(col): _*).distinct()
    val untouched = base.join(
      if (broadcastKeys) broadcast(changedKeys) else changedKeys,
      keyCols, "left_anti")
    val applied = latest
      .where(upper(col(opCol)) =!= "D")
      .select(payload.map(col): _*)
    untouched.unionByName(applied)
  }
}
