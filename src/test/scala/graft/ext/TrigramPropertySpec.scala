package graft.ext

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: [[TextStats.trigramBackoffScore]] against a plain-Scala
  * reference model on random small corpora — same pattern as
  * [[BigramPropertySpec]], one backoff level deeper: every
  * (trigram-hit, tail-bigram backoff, unigram backoff, OOV) mix the
  * generator produces must agree with the naive in-memory computation
  * EXACTLY (integer fixed point ⟹ bit-for-bit equality, no tolerance). */
class TrigramPropertySpec extends SparkSpec {
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

  // tiny vocabulary ⟹ trigram hits actually occur in 12-token docs; "zz*"
  // tokens exist only in scored docs → genuine OOV branch coverage
  private val refTokenGen = Gen.oneOf("a", "b", "c")
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
      : Map[Long, (Long, Long, Long, Long)] = {
    val FP = 1L << 20
    def toks(s: String) = s.split(" ").filter(_.nonEmpty).toList
    def pairs(s: String) = { val t = toks(s); t.zip(t.drop(1)) }
    def triples(s: String) = {
      val t = toks(s); t.lazyZip(t.drop(1)).lazyZip(t.drop(2)).toList
    }
    val c1 = ref.flatMap(toks).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c2 = ref.flatMap(pairs).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c3 = ref.flatMap(triples).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = c1.values.sum
    docs.zipWithIndex.flatMap { case (d, i) =>
      val ts = triples(d)
      if (ts.isEmpty) None
      else {
        val scores = ts.map { case tr @ (w1, w2, w3) =>
          c3.get(tr) match {
            case Some(cc) =>
              math.floor(FP.toDouble * cc / c2((w1, w2))).toLong
            case None => c2.get((w2, w3)) match {
              case Some(cb) =>
                math.floor(FP.toDouble * cb / (2.0 * c1(w2))).toLong
              case None => c1.get(w3) match {
                case Some(cu) =>
                  math.floor(FP.toDouble * cu / (4.0 * n)).toLong
                case None => 0L
              }
            }
          }
        }
        val hits3 = ts.count(c3.contains)
        val hits2 = ts.count(tr => !c3.contains(tr) && c2.contains((tr._2, tr._3)))
        Some(i.toLong -> ((ts.size.toLong, hits3.toLong, hits2.toLong, scores.sum)))
      }
    }.toMap
  }

  test("trigramBackoffScore matches the naive model exactly on random corpora") {
    forSamples(corpusGen) { case (ref, docs) =>
      val refDf = ref.zipWithIndex.map { case (t, i) => (1000L + i, t) }
        .toDF("doc_id", "text")
      val docDf = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = TextStats.trigramBackoffScore(docDf, "doc_id", "text",
          reference = refDf)
        .select("doc_id", "n_trigrams", "hit_trigrams", "hit_bigrams", "score_fp")
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      assert(got === naive(ref, docs))
    }
  }

  test("docs shorter than three tokens emit no row") {
    val docDf = Seq((0L, "a b"), (1L, "a"), (2L, ""), (3L, "a b c"))
      .toDF("doc_id", "text")
    val got = TextStats.trigramBackoffScore(docDf, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(3L))
  }
}
