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

  test("guard boundary: the certified region is exact — a loss at the edge never wraps a long") {
    // etaDen=4, 2 domains ⇒ guard factor max(2, 4+1)=5; the certified
    // region is 5·maxLq·2^28 < 2^63 ⇒ maxLq < 2^35/5. loss=6553 puts
    // lq = 6553·2^20 at 99.99% of that edge and must still pass the guard.
    val maxLoss = 6553L
    val lqEdge = maxLoss << 20
    assert(BigInt(5) * BigInt(lqEdge) * BigInt(1L << 28) < BigInt(Long.MaxValue))
    assert(BigInt(5) * BigInt((maxLoss + 1) << 20) * BigInt(1L << 28) >
      BigInt(Long.MaxValue) - BigInt(1L << 48),
      "the chosen loss should sit near the guard edge, or the test is vacuous")
    val df = Seq(("hot", maxLoss), ("cold", 3L)).toDF("g", "loss")
    val got = Sampling.mixtureWeightsMW(df, "g", col("loss"), rounds = 16)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // BigInt-exact replica of the recurrence: equality proves the long
    // arithmetic inside the certified region never silently wrapped
    var w = Map("hot" -> BigInt(Sampling.MwScale), "cold" -> BigInt(Sampling.MwScale))
    val lq = Map("hot" -> BigInt(lqEdge), "cold" -> BigInt(3L << 20))
    for (_ <- 1 to 16) {
      val t = w.values.sum
      val a = w.map { case (g, wi) => wi * lq(g) }.sum / t
      w = w.map { case (g, wi) =>
        g -> (wi * (4 * a + (lq(g) - a)) / (4 * a)).max(BigInt(1))
      }
    }
    val tw = w.values.sum
    for (g <- Seq("hot", "cold")) {
      assert(got(g)._1 === lq(g).toLong)
      assert(got(g)._2 === w(g).toLong, s"weight wrapped for $g")
      assert(got(g)._3 === (w(g) * 1000000 / tw).toLong)
    }
  }
}
