package graft.ext

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: [[TextStats.knTrigramScore]] against a plain-Scala
  * interpolated-KN reference model on random small corpora — the same
  * pattern as [[TrigramPropertySpec]] with interpolation instead of hard
  * backoff: every branch mix (seen context, unseen context, unseen tail,
  * full OOV, bigram-free reference) must agree EXACTLY (the per-trigram
  * probability is a fixed IEEE tree floored to 2^20, so bit-for-bit). */
class KnPropertySpec extends SparkSpec {
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

  /** The naive model, straight from the scaladoc contract: d = 0.75,
    * continuation counts from the c3/c2 key sets, interpolation weight 1
    * on an unseen context, the identical operation order. */
  private def naive(ref: List[String], docs: List[String])
      : Map[Long, (Long, Long, Long)] = {
    val FP = 1L << 20
    val D = 0.75
    def toks(s: String) = s.split(" ").filter(_.nonEmpty).toList
    def pairs(s: String) = { val t = toks(s); t.zip(t.drop(1)) }
    def triples(s: String) = {
      val t = toks(s); t.lazyZip(t.drop(1)).lazyZip(t.drop(2)).toList
    }
    val c2 = ref.flatMap(pairs).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c3 = ref.flatMap(triples).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n12dot = c3.keySet.groupBy(t => (t._1, t._2)).view.mapValues(_.size.toLong).toMap
    val ndot23 = c3.keySet.groupBy(t => (t._2, t._3)).view.mapValues(_.size.toLong).toMap
    val ndot2dot = c3.keySet.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n2dot = c2.keySet.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val ndot3 = c2.keySet.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nBigrams = c2.size.toLong
    def p1(w3: String): Double =
      if (nBigrams > 0) ndot3.getOrElse(w3, 0L).toDouble / nBigrams.toDouble
      else 0.0
    def p2(w2: String, w3: String): Double = ndot2dot.get(w2) match {
      case Some(den) =>
        math.max(ndot23.getOrElse((w2, w3), 0L).toDouble - D, 0.0) / den.toDouble +
          ((D * n2dot.getOrElse(w2, 0L).toDouble) / den.toDouble) * p1(w3)
      case None => p1(w3)
    }
    def p3(w1: String, w2: String, w3: String): Double = c2.get((w1, w2)) match {
      case Some(den) =>
        math.max(c3.getOrElse((w1, w2, w3), 0L).toDouble - D, 0.0) / den.toDouble +
          ((D * n12dot.getOrElse((w1, w2), 0L).toDouble) / den.toDouble) * p2(w2, w3)
      case None => p2(w2, w3)
    }
    docs.zipWithIndex.flatMap { case (d, i) =>
      val ts = triples(d)
      if (ts.isEmpty) None
      else {
        val score = ts.map { case (w1, w2, w3) =>
          math.floor(FP.toDouble * p3(w1, w2, w3)).toLong
        }.sum
        val hits = ts.count(c3.contains)
        Some(i.toLong -> ((ts.size.toLong, hits.toLong, score)))
      }
    }.toMap
  }

  test("knTrigramScore matches the naive interpolated-KN model exactly") {
    forSamples(corpusGen) { case (ref, docs) =>
      val refDf = ref.zipWithIndex.map { case (t, i) => (1000L + i, t) }
        .toDF("doc_id", "text")
      val docDf = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = TextStats.knTrigramScore(docDf, "doc_id", "text",
          reference = refDf)
        .select("doc_id", "n_trigrams", "hit_trigrams", "score_fp")
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got === naive(ref, docs))
    }
  }

  test("continuation counts discriminate where raw counts cannot") {
    // "x" is FREQUENT but appears only after "san": raw-frequency backoff
    // overrates it; KN's continuation count (1 distinct left context) must
    // score fresh-context "x" below equally-frequent wide-context "c"
    val ref = Seq((1000L, "san x san x san x san x"),
      (1001L, "a c b c a c b c")).toDF("doc_id", "text")
    val docs = Seq((0L, "b a x"), (1L, "b a c")).toDF("doc_id", "text")
    val got = TextStats.knTrigramScore(docs, "doc_id", "text", reference = ref)
      .select("doc_id", "score_fp").as[(Long, Long)].collect().toMap
    assert(got(0L) < got(1L),
      s"context-bound 'x' must score below wide-context 'c': $got")
  }

  test("docs shorter than three tokens emit no row") {
    val docDf = Seq((0L, "a b"), (1L, "a"), (2L, ""), (3L, "a b c"))
      .toDF("doc_id", "text")
    val got = TextStats.knTrigramScore(docDf, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(3L))
  }
}
