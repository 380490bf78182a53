package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: [[TextStats.bigramBackoffScore]] against a plain-Scala
  * reference model on random small corpora — the PageRank exactness
  * pattern. Catches join/null/branch bugs the hand-checked case can't:
  * every (hit, backoff, OOV) mix the generator produces must agree with
  * the naive in-memory computation EXACTLY (the scores are integer fixed
  * point, so equality is bit-for-bit, no tolerance). */
class BigramPropertySpec extends SparkSpec {
  import spark.implicits._

  private def forSamples[A](gen: Gen[A], n: Int = 6)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      val seed = Seed(i.toLong * 104729)
      gen.apply(Gen.Parameters.default, seed) match {
        case Some(a) =>
          try body(a)
          catch { case e: Throwable =>
            throw new AssertionError(s"property failed for seed $i: $e", e) }
        case None => ()
      }
    }

  // small shared vocabulary so hits, backoffs, and OOVs all occur; "zz*"
  // tokens exist only in scored docs → genuine OOV branch coverage
  private val refTokenGen = Gen.oneOf("a", "b", "c", "d", "e")
  private val anyTokenGen = Gen.frequency(
    4 -> refTokenGen, 1 -> Gen.oneOf("zz1", "zz2"))
  private def docGen(tok: Gen[String]): Gen[String] = for {
    n <- Gen.choose(0, 12)
    ts <- Gen.listOfN(n, tok)
  } yield ts.mkString(" ")
  private val corpusGen: Gen[(List[String], List[String])] = for {
    nRef <- Gen.choose(1, 6)
    ref <- Gen.listOfN(nRef, docGen(refTokenGen))
    nDoc <- Gen.choose(1, 8)
    docs <- Gen.listOfN(nDoc, docGen(anyTokenGen))
  } yield (ref, docs)

  /** The naive model, straight from the scaladoc contract. */
  private def naive(ref: List[String], docs: List[String])
      : Map[Long, (Long, Long, Long)] = {
    val FP = 1L << 20
    def toks(s: String) = s.split(" ").filter(_.nonEmpty).toList
    def pairs(s: String) = { val t = toks(s); t.zip(t.drop(1)) }
    val c1 = ref.flatMap(toks).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c2 = ref.flatMap(pairs).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = c1.values.sum
    docs.zipWithIndex.flatMap { case (d, i) =>
      val ps = pairs(d)
      if (ps.isEmpty) None
      else {
        val scores = ps.map { p =>
          c2.get(p) match {
            case Some(cc) => math.floor(FP.toDouble * cc / c1(p._1)).toLong
            case None => c1.get(p._2) match {
              case Some(cw) => math.floor(FP.toDouble * cw / (2.0 * n)).toLong
              case None => 0L
            }
          }
        }
        val hits = ps.count(c2.contains)
        Some(i.toLong -> ((ps.size.toLong, hits.toLong, scores.sum)))
      }
    }.toMap
  }

  test("bigramBackoffScore matches the naive model exactly on random corpora") {
    forSamples(corpusGen) { case (ref, docs) =>
      val refDf = ref.zipWithIndex.map { case (t, i) => (1000L + i, t) }
        .toDF("doc_id", "text")
      val docDf = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = TextStats.bigramBackoffScore(docDf, "doc_id", "text",
          reference = refDf)
        .select("doc_id", "n_bigrams", "hit_bigrams", "score_fp")
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got === naive(ref, docs))
    }
  }
}
