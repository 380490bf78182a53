package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * First line of defense at scale is AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) — it re-splits
  * oversized sort-merge partitions at runtime with no code change. Salting
  * is for the cases AQE can't fix: a single key too hot for any split to
  * help on the BUILD side, aggregations with `count(distinct)` on a hot
  * group, or when the skewed side must hash-join. The salt turns one hot
  * partition into `saltFactor` cooler ones at the cost of replicating the
  * other (small) side `saltFactor`×.
  */
object SkewJoin {

  /** Equi-join `big ⋈ small` on `key`, salted: each big-side row gets a
    * deterministic pseudo-random salt in [0, saltFactor); the small side is
    * replicated once per salt value, so the shuffle key becomes
    * (key, salt) and a hot key spreads over `saltFactor` partitions.
    *
    * Join types: inner / left / left_semi / left_anti (the big side stays
    * exactly-once). Right/full-outer are rejected — replication would
    * duplicate unmatched small-side rows. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
                     saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti").contains(joinType.toLowerCase),
      s"salting preserves only big-side-exact join types, not $joinType")
    require(saltFactor > 0, "saltFactor must be positive")
    // Salt from a hash of the whole row: deterministic (re-runs agree),
    // uniform, and no dependence on a random() that breaks retries.
    val salted = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(saltFactor.toLong))
        .cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Two-phase (partial → final) distinct count for a hot group key:
    * `groupBy(key).agg(countDistinct(v))` shuffles every (key, v) pair to
    * one reducer per key; pre-aggregating on (key, v) first removes
    * duplicates map-side and spreads the hot key across partitions.
    * Keys whose values are ALL null get (key, 0) — countDistinct skips
    * nulls but the group itself still exists, so the null pre-filter alone
    * would silently drop those keys; the left join against the distinct key
    * set restores them. */
  def skewSafeDistinctCount(df: DataFrame, key: String, valueCol: String): DataFrame = {
    val keys = df.select(col(key)).distinct()
    val counts = df.select(col(key), col(valueCol))
      .where(col(valueCol).isNotNull) // countDistinct skips nulls — match it
      .distinct()                     // shuffle on (key, value)
      .groupBy(col(key)).agg(count(lit(1)).as("n_distinct"))
    keys.join(counts, Seq(key), "left")
      .select(col(key), coalesce(col("n_distinct"), lit(0L)).as("n_distinct"))
  }
}
