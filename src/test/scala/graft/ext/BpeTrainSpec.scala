package graft.ext

import graft.SparkSpec

/** [[TextStats.bpeTrainMerges]] must agree with a naive in-memory Sennrich
  * trainer — same overlapping-position weighted pair counts, same
  * (count DESC, a, b) argmax, same scan-skip application — on corpora that
  * exercise overlap counting ("aaa" words), tie-breaks, merged-symbol
  * re-merging, and early convergence (fewer pairs than requested merges). */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  private def naive(texts: Seq[String], nMerges: Int): Seq[(String, String, Long)] = {
    val freq = scala.collection.mutable.LinkedHashMap.empty[Vector[String], Long]
    texts.flatMap(_.toLowerCase.split(' ').filter(_.nonEmpty)).foreach { w =>
      val k = w.map(_.toString).toVector
      freq(k) = freq.getOrElse(k, 0L) + 1L
    }
    var state: Seq[(Vector[String], Long)] = freq.toSeq
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var continue = true
    while (out.length < nMerges && continue) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (syms, cnt) =>
        syms.indices.init.foreach { j =>
          val p = (syms(j), syms(j + 1))
          counts(p) = counts.getOrElse(p, 0L) + cnt
        }
      }
      if (counts.isEmpty) continue = false
      else {
        val ((a, b), c) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((a, b, c))
        state = state.map { case (syms, cnt) =>
          val ns = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
              ns += (a + b); j += 2
            } else { ns += syms(j); j += 1 }
          }
          (ns.result(), cnt)
        }
      }
    }
    out.toSeq
  }

  private def assertAgree(texts: Seq[String], nMerges: Int): Unit = {
    val got = TextStats.bpeTrainMerges(texts.toDF("text"), "text", nMerges)
    val want = naive(texts, nMerges)
    assert(got === want, s"trainer diverges on $texts")
  }

  test("learns the expected chain on a hand corpus") {
    // (h,e) and (t,h) tie at 9 — lexicographic tie-break picks (h,e),
    // then (t,he) dominates
    val corpus = Seq("the the the then", "there the other", "rather the")
    val got = TextStats.bpeTrainMerges(corpus.toDF("text"), "text", 2)
    assert(got.map(m => (m._1, m._2)) === Seq("h" -> "e", "t" -> "he"))
    assertAgree(corpus, 5)
  }

  test("overlap counting and scan-skip application agree") {
    assertAgree(Seq("aaa aaaa aa", "aaa baab", "aa aa aa"), 4)
  }

  test("tie-breaks are lexicographic on (a, b)") {
    // "ab" and "ba" pairs appear equally often
    assertAgree(Seq("ab ba", "ab ba"), 3)
  }

  test("early convergence emits fewer merges than requested") {
    val got = TextStats.bpeTrainMerges(Seq("a b c").toDF("text"), "text", 8)
    assert(got.isEmpty)
    assertAgree(Seq("ab a b", "ab"), 8) // converges after a couple of rounds
  }

  test("mixed corpus agrees with the naive model") {
    assertAgree(Seq("the quick brown fox", "then there is the rest",
      "aaa the aaa", "rather longer words here", "(parens) stay! in-tact",
      "MiXeD Case THE the"), 8)
  }
}
