package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.GraftColumnBridge
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** [[expressions.TokenNgramsExpr]] must be BIT-IDENTICAL to the HOF twins
  * `adjacentPairs/adjacentTriples(tokens(text))` and the filtered token
  * array — on generated strings (multi-space runs, leading/trailing
  * spaces, mixed case, non-ASCII) and the short-document edges. */
class NgramExprSpec extends SparkSpec {
  import spark.implicits._

  private def native(n: Int) = (c: org.apache.spark.sql.Column) =>
    GraftColumnBridge.column(expressions.TokenNgramsExpr(
      GraftColumnBridge.expression(c), n))

  private def assertAgree(texts: Seq[String]): Unit = {
    val df = texts.toDF("text")
    val rows = df.select(
        TextStats.adjacentPairs(TextStats.tokens(col("text"))).as("hof2"),
        native(2)(col("text")).as("nat2"),
        TextStats.adjacentTriples(TextStats.tokens(col("text"))).as("hof3"),
        native(3)(col("text")).as("nat3"),
        filter(TextStats.tokens(col("text")), x => length(x) > 0).as("hof1"),
        native(1)(col("text")).as("nat1"),
        col("text"))
      .collect()
    rows.foreach { r =>
      assert(r.get(0) === r.get(1), s"pairs diverge for '${r.getString(6)}'")
      assert(r.get(2) === r.get(3), s"triples diverge for '${r.getString(6)}'")
      assert(r.get(4) === r.get(5), s"tokens diverge for '${r.getString(6)}'")
    }
  }

  test("edge cases agree") {
    assertAgree(Seq("", " ", "   ", "a", "a b", "a b c", "a  b   c  ",
      " leading", "trailing ", "MiXeD CaSe TOKENS here",
      "ΣΙΓΜΑ Großes ß end", "tab\there stays one-token",
      "a b c d e f g"))
  }

  test("generated strings agree") {
    val token = Gen.oneOf(Gen.alphaStr.map(_.take(5)), Gen.const(""),
      Gen.const("ÜBER"), Gen.const("x1"))
    val textGen = Gen.choose(0, 10).flatMap(n =>
      Gen.listOfN(n, token).map(_.mkString(" ")))
    (1 to 6).foreach { i =>
      Gen.listOfN(32, textGen)
        .apply(Gen.Parameters.default, Seed(i.toLong * 65537))
        .foreach(assertAgree)
    }
  }
}
