package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event log: how far through a fixed step
  * sequence (e.g. signup → view → purchase) each user progressed, under
  * earliest-transition semantics — step k+1 is matched by the FIRST
  * occurrence strictly after the time step k was reached, with step 1
  * matched by its first occurrence overall. Equivalent to the iterative
  * formulation `t1 = min(ts | type = s1)`, `t_{k+1} = min(ts | type =
  * s_{k+1}, ts > t_k)` — which is exactly how the DuckDB oracle restates
  * it, so the equivalence of the greedy fold to the join chain is itself
  * oracle-checked.
  *
  * Scale shape: ONE exchange, keyed on the user. Non-funnel event types are
  * filtered before the shuffle (an `isin` that reaches the parquet scan),
  * then a groupBy collects each user's (ts, type) pairs and a codegen'd
  * `aggregate` fold walks them in time order — no per-step join chain (k
  * shuffles for a k-step funnel) and no window. Per-user state is the
  * user's own funnel-step events only; a pathological user with millions of
  * step events is a data-quality problem before it is a memory one (cap
  * upstream with [[Sampling.capPerGroup]] if needed).
  *
  * Strictness: transitions require STRICTLY increasing timestamps. Two
  * steps at the same instant do not chain (no engine-dependent tie order —
  * the fold and the SQL restatement agree by construction).
  */
object Funnel {

  /** Per-user funnel depth: (user_id, steps_completed, t_reached) for every
    * user who completed at least step 1, where `steps_completed` ∈ [1, n]
    * counts the longest earliest-transition prefix of `steps` and
    * `t_reached` is the time of the deepest completed step. */
  def funnelDepth(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct: $steps")
    val n = steps.size
    val stepArr = array(steps.map(lit): _*)
    val relevant = events
      .where(col(typeCol).isin(steps: _*))
      .select(col(userCol).as("user_id"), col(typeCol).as("et"),
        col(tsCol).as("ts"))
    val perUser = relevant
      .groupBy("user_id")
      .agg(array_sort(collect_list(struct(col("ts"), col("et")))).as("evs"))
    val fold = aggregate(col("evs"),
      struct(lit(0).as("depth"), lit(null).cast("timestamp").as("t")),
      (acc: Column, e: Column) => {
        val depth = acc.getField("depth")
        // least() keeps the lookup index in range when the funnel is
        // already complete — ANSI mode throws on out-of-bounds element_at,
        // and `when` does not guarantee the untaken branch goes unevaluated
        val want = element_at(stepArr, least(depth + 1, lit(n)))
        val advances = depth < n && e.getField("et") === want &&
          (depth === 0 || e.getField("ts") > acc.getField("t"))
        when(advances,
            struct((depth + 1).as("depth"), e.getField("ts").as("t")))
          .otherwise(acc)
      })
    perUser
      .select(col("user_id"), fold.as("f"))
      .select(col("user_id"), col("f.depth").as("steps_completed"),
        col("f.t").as("t_reached"))
      .where(col("steps_completed") > 0)
  }

  /** Conversion summary derived from [[funnelDepth]]: one row per step with
    * the number of users whose depth reached it — the funnel chart. Counts
    * are cumulative-from-the-top by construction (reached step k implies
    * reached step k-1). */
  def funnelCounts(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, steps: Seq[String]): DataFrame = {
    val depth = funnelDepth(events, userCol, typeCol, tsCol, steps)
    val stepNames = array(steps.map(lit): _*)
    depth
      .select(explode(sequence(lit(1), col("steps_completed"))).as("step"))
      .groupBy("step")
      .agg(count(lit(1)).as("n_users"))
      .select(col("step").cast("int").as("step"),
        element_at(stepNames, col("step")).as("step_name"), col("n_users"))
      .orderBy("step")
  }
}
