package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MixtureWeightsSpec extends SparkSpec {
  import spark.implicits._

  test("one MW round matches the hand computation exactly") {
    // a: losses 2,4 → lq = 3·2^20; b: loss 9 → lq = 9·2^20
    // A = 6·2^20; a's factor = (4A − 3·2^20)/4A = 7/8, b's = 9/8
    val df = Seq(("a", 2L), ("a", 4L), ("b", 9L)).toDF("g", "loss")
    val r = Sampling.mixtureWeightsMW(df, "g", col("loss"), rounds = 1)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r("a") === ((3L << 20, 917504L, 437500L)))
    assert(r("b") === ((9L << 20, 1179648L, 562500L)))
  }

  test("MW invariants: hard domains gain, equal domains stay equal, shares sum to ~1e6") {
    val df = Seq(("x", 10L), ("y", 10L), ("z", 50L), ("z", 30L))
      .toDF("g", "loss")
    val rows = Sampling.mixtureWeightsMW(df, "g", col("loss"), rounds = 3)
      .collect().map(x => x.getString(0) -> (x.getLong(2), x.getLong(3))).toMap
    // identical losses ⇒ identical trajectories, never drifting apart
    assert(rows("x") === rows("y"))
    // the above-average domain ends above its uniform start, others below
    assert(rows("z")._1 > Sampling.MwScale && rows("x")._1 < Sampling.MwScale)
    val total = rows.values.map(_._2).sum
    assert(total <= 1000000L && total > 1000000L - 4,
      s"shares must sum to 1e6 modulo truncation: $total")
  }

  test("guards: empty input, nonpositive loss, and overflow risk are loud") {
    val empty = Seq.empty[(String, Long)].toDF("g", "loss")
    val e1 = intercept[IllegalArgumentException](
      Sampling.mixtureWeightsMW(empty, "g", col("loss"), 2))
    assert(e1.getMessage.contains("empty"))
    val zero = Seq(("a", 0L)).toDF("g", "loss")
    val e2 = intercept[IllegalArgumentException](
      Sampling.mixtureWeightsMW(zero, "g", col("loss"), 2))
    assert(e2.getMessage.contains("positive loss"))
    val huge = Seq(("a", 1L << 34), ("b", 1L << 34)).toDF("g", "loss")
    val e3 = intercept[IllegalArgumentException](
      Sampling.mixtureWeightsMW(huge, "g", col("loss"), 2))
    assert(e3.getMessage.contains("overflow"))
    // an unbounded etaDen would wrap the update's etaDen·avg term long
    // before the domain-count guard noticed
    val e4 = intercept[IllegalArgumentException](
      Sampling.mixtureWeightsMW(Seq(("a", 1L)).toDF("g", "loss"), "g",
        col("loss"), 1, etaDen = 1L << 45))
    assert(e4.getMessage.contains("etaDen"))
  }
}
