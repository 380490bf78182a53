package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: [[Similarity.semanticDedup]] against a plain-Scala model.
  * The model mirrors the engine's float ops EXACTLY — dot as a strict left
  * fold, cosine as dot/(sqrt·sqrt product), zero-norm coalesced to -2,
  * argmax keeping the earlier (lowest-cent-id) centroid on exact ties — so
  * assignment AND the dup rule compare with no tolerance. Random vectors
  * exercise tie-breaks, zero vectors, and cells of every size. */
class SemanticDedupPropertySpec extends SparkSpec {
  import spark.implicits._

  private def forSamples[A](gen: Gen[A], n: Int = 6)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      val seed = Seed(i.toLong * 15485863)
      gen.apply(Gen.Parameters.default, seed) match {
        case Some(a) =>
          try body(a)
          catch { case e: Throwable =>
            throw new AssertionError(s"property failed for seed $i: $e", e) }
        case None => ()
      }
    }

  // small integer-grid components (incl. negatives and zero vectors) in 3-D
  private val vecGen: Gen[Seq[Float]] =
    Gen.listOfN(3, Gen.choose(-3, 3).map(_.toFloat)).map(_.toSeq)
  private val corpusGen: Gen[List[Seq[Float]]] = for {
    n <- Gen.choose(3, 14)
    vs <- Gen.listOfN(n, vecGen)
  } yield vs

  private def naive(vecs: List[Seq[Float]], nCells: Int, threshold: Double)
      : Map[Long, (Long, Boolean)] = {
    val v = vecs.zipWithIndex.map { case (x, i) =>
      i.toLong -> x.map(_.toDouble).toArray }
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.foldLeft(0.0)(_ + _)
    def cosine(a: Array[Double], b: Array[Double]): Option[Double] = {
      val d = math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))
      if (d == 0.0) None else Some(dot(a, b) / d)
    }
    val cents = v.take(nCells) // lowest ids, ascending
    def cell(x: Array[Double]): Long =
      cents.map { case (cid, cv) => cid -> cosine(x, cv).getOrElse(-2.0) }
        .foldLeft((-1L, -3.0)) { case ((bi, bs), (ci, cs)) =>
          if (cs > bs) (ci, cs) else (bi, bs) }._1 // strict > keeps earlier
    val assigned = v.map { case (id, x) => (id, cell(x), x) }
    assigned.map { case (id, c, x) =>
      val dup = assigned.exists { case (id2, c2, x2) =>
        id2 < id && c2 == c && cosine(x2, x).exists(_ >= threshold) }
      id -> ((c, dup))
    }.toMap
  }

  test("semanticDedup matches the naive model exactly on random vector sets") {
    forSamples(corpusGen) { vecs =>
      val df = vecs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
        .toDF("vec_id", "embedding")
      Seq(2, 3).foreach { nCells =>
        val got = Similarity.semanticDedup(df, "vec_id", "embedding",
            nCells = nCells, threshold = 0.8)
          .as[(Long, Long, Boolean)].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap
        assert(got === naive(vecs, nCells, 0.8), s"nCells=$nCells vecs=$vecs")
      }
    }
  }
}
