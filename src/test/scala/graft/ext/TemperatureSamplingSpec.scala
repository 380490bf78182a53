package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Sampling.sampleByTemperature]] contract: α=1 identity, the smallest
  * group survives whole at every α, flattening is monotone in group size,
  * α=0 equalizes expected counts to the smallest group. */
class TemperatureSamplingSpec extends SparkSpec {
  import spark.implicits._

  // skewed corpus: group sizes 160 / 40 / 10
  private lazy val docs = (
    (0 until 160).map(i => (i.toLong, "big")) ++
    (160 until 200).map(i => (i.toLong, "mid")) ++
    (200 until 210).map(i => (i.toLong, "small"))
  ).toDF("doc_id", "grp")

  test("alpha = 1 is the identity") {
    val kept = Sampling.sampleByTemperature(docs, "grp", "doc_id", alpha = 1.0)
    assert(kept.count() === docs.count())
  }

  test("the smallest group is always fully kept") {
    for (a <- Seq(0.0, 0.5)) {
      val kept = Sampling.sampleByTemperature(docs, "grp", "doc_id", alpha = a)
        .where(col("grp") === "small")
      assert(kept.count() === 10L, s"alpha=$a must keep the smallest group")
    }
  }

  test("flattening is monotone: larger groups keep smaller fractions") {
    val kept = Sampling.sampleByTemperature(docs, "grp", "doc_id", alpha = 0.5)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    val fBig = kept.getOrElse("big", 0L).toDouble / 160
    val fMid = kept.getOrElse("mid", 0L).toDouble / 40
    val fSmall = kept.getOrElse("small", 0L).toDouble / 10
    assert(fBig < fMid && fMid <= fSmall,
      s"kept fractions must rise as groups shrink: $fBig / $fMid / $fSmall")
    // target fraction for the big group is sqrt(10/160) = 0.25 — the
    // deterministic hash realizes it within sampling noise
    assert(math.abs(fBig - 0.25) < 0.15, s"big-group fraction off: $fBig")
  }

  test("alpha = 0 targets equal counts per group") {
    val kept = Sampling.sampleByTemperature(docs, "grp", "doc_id", alpha = 0.0)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    // expected ~10 per group; hash realization within noise
    kept.foreach { case (g, n) =>
      assert(n >= 3 && n <= 20, s"group $g kept $n, expected ~10")
    }
  }

  test("unsupported alpha is rejected; empty input passes through") {
    intercept[IllegalArgumentException] {
      Sampling.sampleByTemperature(docs, "grp", "doc_id", alpha = 0.3)
    }
    val empty = docs.where(lit(false))
    assert(Sampling.sampleByTemperature(empty, "grp", "doc_id").count() === 0L)
  }

  test("weightedPrioritySample: bounded TakeOrdered plan, inclusion tracks weight, bad weights excluded") {
    import spark.implicits._
    // 1000 keys, weight 20 for ids < 100 (heavy decile), 1 otherwise
    val df = spark.range(1000).select(col("id").as("k"),
      when(col("id") < 100, 20).otherwise(1).as("w"))
    val kept = Sampling.weightedPrioritySample(df, "k", "w", k = 100)
    // plan: a bounded heap (TakeOrderedAndProject), never a global sort
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"selection must be a bounded TakeOrdered:\n$plan")
    val rows = kept.collect()
    assert(rows.length === 100)
    assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq === (1 to 100))
    // the heavy decile holds 100·20 / (100·20 + 900·1) = 69% of the mass;
    // with k=100 draws its share lands far above the unweighted 10%
    val heavy = rows.count(_.getAs[Long]("k") < 100L)
    assert(heavy > 40, s"weighting too weak: $heavy/100 heavy keys")
    // deterministic: same call, same keys, same order
    val again = Sampling.weightedPrioritySample(df, "k", "w", k = 100)
      .collect().map(_.getAs[Long]("k")).toSeq
    assert(again === rows.map(_.getAs[Long]("k")).toSeq)
    // w <= 0 / null rows are excluded, not crashed on
    val bad = Seq((1L, Some(0)), (2L, Some(-3)), (3L, Option.empty[Int]),
      (4L, Some(5))).toDF("k", "w")
    val keptBad = Sampling.weightedPrioritySample(bad, "k", "w", k = 10)
      .collect().map(_.getAs[Long]("k")).toSeq
    assert(keptBad === Seq(4L))
  }
}
