package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the composition a user actually runs —
  * exact dedup → near-dup cluster dedup → quality gate — over a documents
  * table. Each stage is one of the §2.8 operators; this wires them with the
  * survivor policy made explicit (min-id wins everywhere, so the pipeline is
  * deterministic and re-runs are idempotent).
  *
  * Scale shape: stages communicate by doc_id (semi/anti joins on the id,
  * never by re-shipping text); the only heavyweight stages are the two dedup
  * shuffles, both keyed on hash/bucket values. */
object Curation {

  final case class Config(
      shingleLen: Int = 3,
      numHashes: Int = 8,
      jaccardThreshold: Double = 0.5,
      minTokens: Int = 30,
      maxStopwordRatio: Double = 0.25,
      stopwords: Seq[String] = Seq("data", "table", "row", "value"))

  /** Surviving documents after the full pipeline. Output = input rows of the
    * survivors (all columns pass through). */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             cfg: Config = Config()): DataFrame = {
    // 1. exact dedup: keep the min-id copy of each normalized text
    val afterExact = Dedup.exactDedup(docs, idCol, textCol)

    // 2. near-dup cluster dedup: MinHash pairs → components → keep each
    //    component's min id (non-members pass through untouched)
    val pairs = Dedup.nearDuplicates(afterExact, idCol, textCol,
      cfg.shingleLen, cfg.numHashes, cfg.jaccardThreshold)
    val losers = Dedup.duplicateClusters(pairs)
      .where(col("id") =!= col("rep"))
      .select(col("id").as(idCol))
    val afterNear = afterExact.join(losers, Seq(idCol), "left_anti")

    // 3. quality gate: enough tokens, bounded stopword share
    afterNear.where(
      TextStats.nTokens(col(textCol)) >= cfg.minTokens &&
        TextStats.stopwordRatio(col(textCol), cfg.stopwords) <= cfg.maxStopwordRatio)
  }

  /** Per-stage funnel counts — the audit a curation run reports. */
  def funnel(docs: DataFrame, idCol: String, textCol: String,
             cfg: Config = Config()): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val n0 = docs.count()
    val afterExact = Dedup.exactDedup(docs, idCol, textCol)
    val n1 = afterExact.count()
    val pairs = Dedup.nearDuplicates(afterExact, idCol, textCol,
      cfg.shingleLen, cfg.numHashes, cfg.jaccardThreshold)
    val losers = Dedup.duplicateClusters(pairs)
      .where(col("id") =!= col("rep")).select(col("id").as(idCol))
    val afterNear = afterExact.join(losers, Seq(idCol), "left_anti")
    val n2 = afterNear.count()
    val n3 = curate(docs, idCol, textCol, cfg).count()
    Seq(("0_input", n0), ("1_exact_dedup", n1), ("2_neardup_dedup", n2),
      ("3_quality_gate", n3)).toDF("stage", "n_docs")
  }
}
