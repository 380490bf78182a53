package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy auditing for release pipelines — k-ANONYMITY over quasi-
  * identifier (QI) columns: a released row is re-identifiable when its QI
  * combination is shared by fewer than k rows, so the census ("how many
  * groups/rows sit below k?") is the gate a dataset must pass before
  * export, and suppression ("drop the groups below k") is the enforcement.
  * The PII scrub (`TextStats.scrubPii`) removes identifiers INSIDE text;
  * this audits the identifying power of the released SCHEMA itself —
  * complementary halves of the privacy story for a training-data release.
  *
  * Shape at 100 TB: one groupBy on the QI columns collapses the table to
  * its group-size frame (map-side partial combine, |groups| rows), and
  * every threshold is answered from THAT frame — the data is scanned once
  * no matter how many k's are audited. Suppression re-keys the data on the
  * same QI columns, so under one partitioning both the census and the
  * filter reuse a single shuffle.
  */
object Privacy {

  /** Census frame: one row per threshold k — how many QI groups (and data
    * rows) fall below it — plus the dataset-wide `min_group_size` (the
    * dataset's actual k-anonymity) and total `n_groups`, repeated per row
    * so each census row is self-contained. Null QI values group together
    * (SQL GROUP BY semantics): "unknown" is itself a quasi-identifier
    * value and must be audited like any other. */
  def kAnonymityCensus(df: DataFrame, qi: Seq[String],
                       thresholds: Seq[Int]): DataFrame = {
    require(qi.nonEmpty, "kAnonymityCensus: no quasi-identifier columns")
    require(thresholds.nonEmpty, "kAnonymityCensus: no thresholds")
    val groups = df.groupBy(qi.map(col): _*).agg(count(lit(1)).as("__gsz"))
    // explode the (small, constant) threshold list against the group-size
    // frame: map-side multiply, then one aggregation keyed on k
    groups
      .select(col("__gsz"),
        explode(array(thresholds.map(t => lit(t)): _*)).as("k"))
      .groupBy(col("k"))
      .agg(
        sum(when(col("__gsz") < col("k"), 1L).otherwise(0L))
          .as("n_groups_below"),
        sum(when(col("__gsz") < col("k"), col("__gsz")).otherwise(0L))
          .as("n_rows_below"),
        min(col("__gsz")).as("min_group_size"),
        count(lit(1)).as("n_groups"))
  }

  /** Enforcement: keep only rows whose QI group has ≥ k members — the
    * released frame is k-anonymous on `qi` BY CONSTRUCTION. One group-size
    * aggregation + a semi-join back on the QI key (both shuffles share the
    * QI partitioning); the group frame is data-derived and can be large,
    * so no broadcast is forced — Catalyst/AQE picks one when it fits. */
  def suppressToK(df: DataFrame, qi: Seq[String], k: Long): DataFrame = {
    require(qi.nonEmpty, "suppressToK: no quasi-identifier columns")
    require(k >= 1, s"suppressToK: k must be positive, got $k")
    val keep = df.groupBy(qi.map(col): _*).agg(count(lit(1)).as("__gsz"))
      .where(col("__gsz") >= k)
      .select(qi.map(col): _*)
    // null-safe semi-join: null QI values grouped together above, so the
    // join must match them together too (<=> per column)
    val cond = qi.map(c => df(c) <=> keep(c)).reduce(_ && _)
    df.join(keep, cond, "left_semi")
  }

  /** PSEUDONYMIZATION — replace direct identifiers with a stable salted
    * surrogate: md5(salt ‖ value). Deterministic, so the SAME value maps
    * to the SAME token in every table sharing the salt — joins and
    * group-bys on the identifier keep working on the released data
    * (referential integrity survives the de-identification), while the
    * raw identifier never leaves the pipeline. Purely scalar (codegen'd
    * md5 at the scan — no shuffle, no state); re-identification risk is
    * governed by salt custody, the standard tokenization trade. Null
    * identifiers stay null (no token must mean no identity). Non-string
    * columns are cast to string first, so the token is type-independent. */
  def pseudonymize(df: DataFrame, cols: Seq[String], salt: String): DataFrame = {
    require(cols.nonEmpty, "pseudonymize: no columns")
    require(salt.nonEmpty, "pseudonymize: empty salt defeats tokenization")
    cols.foldLeft(df) { (acc, c) =>
      acc.withColumn(c,
        md5(concat(lit(salt), col(c).cast("string"))))
    }
  }

  /** MASKING — redact all but the last `keep` characters ("************
    * 1234"): the display-safe form of a value whose tail is needed for
    * human reconciliation. Values at or under `keep` chars mask nothing
    * (the tail IS the value — callers wanting full redaction should
    * [[pseudonymize]] instead). Null in, null out. */
  def maskKeepLast(c: Column, keep: Int): Column = {
    require(keep >= 0, s"maskKeepLast: negative keep $keep")
    // explicit short-value branch: negative-position substring edge
    // semantics differ across engines; the contract must not
    when(length(c) <= keep, c).otherwise(concat(
      repeat(lit("*"), length(c) - keep),
      substring(c, -keep, keep)))
  }
}
