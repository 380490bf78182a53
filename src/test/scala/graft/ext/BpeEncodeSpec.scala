package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** [[expressions.BpeEncodeExpr]] must be BIT-IDENTICAL to a naive in-memory
  * BPE model — same lowest-rank-first selection, same scan-skip merge of all
  * occurrences in one left-to-right pass, same fixed round budget — on
  * generated strings (multi-space runs, parens, overlap-heavy "aaa" words)
  * and on hand-picked edges. Also pins the restatement invariant the DuckDB
  * oracle relies on: any round budget at or beyond convergence yields the
  * same tokens. */
class BpeEncodeSpec extends SparkSpec {
  import spark.implicits._

  // overlap-heavy table: (a,a) exercises scan-skip; (aa,a) re-merges the
  // merged symbol; (t,h)+(th,e) is the rank-precedence chain
  private val merges: Seq[(String, String)] =
    Seq("a" -> "a", "aa" -> "a", "t" -> "h", "th" -> "e", "e" -> "r")

  private def naiveWord(word: String, rounds: Int): Seq[String] = {
    var syms = word.map(_.toString).toVector
    var r = 0
    var done = false
    while (r < rounds && !done) {
      merges.find { case (a, b) =>
        syms.indices.init.exists(j => syms(j) == a && syms(j + 1) == b)
      } match {
        case None => done = true
        case Some((a, b)) =>
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
              out += (a + b); j += 2
            } else { out += syms(j); j += 1 }
          }
          syms = out.result()
          r += 1
      }
    }
    syms
  }

  private def naive(text: String, rounds: Int): Seq[String] =
    text.toLowerCase.split(' ').filter(_.nonEmpty).toSeq
      .flatMap(naiveWord(_, rounds))

  private def assertAgree(texts: Seq[String], rounds: Int): Unit = {
    val rows = texts.toDF("text")
      .select(col("text"),
        TextStats.bpeEncode(col("text"), merges, rounds).as("toks"))
      .collect()
    rows.foreach { r =>
      val got = r.getSeq[String](1)
      val want = naive(r.getString(0), rounds)
      assert(got === want, s"diverges for '${r.getString(0)}' rounds=$rounds")
    }
  }

  test("edge cases agree with the naive model") {
    val edges = Seq("", " ", "   ", "a", "aa", "aaa", "aaaa", "aaaaa",
      "the", "ther", "there", "THE THEATER", "a(b) (th)e",
      "aaa aaa the", " leading", "trailing ", "mixed Aa aA tThH")
    Seq(1, 2, 3, 8).foreach(r => assertAgree(edges, r))
  }

  test("generated strings agree with the naive model") {
    val word = Gen.oneOf(
      Gen.listOfN(6, Gen.oneOf('a', 't', 'h', 'e', 'r', '(', ')'))
        .map(_.mkString),
      Gen.const("aaaaaaa"), Gen.const("theethe"), Gen.const(""))
    val textGen = Gen.choose(0, 6).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))
    (1 to 4).foreach { i =>
      val texts = Gen.listOfN(40, textGen)
        .apply(Gen.Parameters.default, Seed(i.toLong * 7919)).get
      assertAgree(texts, rounds = 8)
    }
  }

  test("tokens round-trip: concatenation rebuilds the lowercased words") {
    val texts = Seq("The Quick Brown", "aaa aaaa", "the theater  there ", "")
    texts.toDF("text")
      .select(col("text"),
        TextStats.bpeEncode(col("text"), merges, 8).as("toks"))
      .collect().foreach { r =>
        val rebuilt = r.getSeq[String](1).mkString("")
        val want = r.getString(0).toLowerCase.split(' ').filter(_.nonEmpty).mkString("")
        assert(rebuilt === want, s"round-trip broke for '${r.getString(0)}'")
      }
  }

  test("any budget at or beyond convergence yields the same tokens") {
    val texts = Seq("aaaaaaaa theater there", "aaa the era", "a t h e r")
    val df = texts.toDF("text")
    val at = df.select(TextStats.bpeEncode(col("text"), merges, 8).as("t"))
      .collect().map(_.getSeq[String](0)).toSeq
    val beyond = df.select(TextStats.bpeEncode(col("text"), merges, 50).as("t"))
      .collect().map(_.getSeq[String](0)).toSeq
    assert(at === beyond)
  }
}
