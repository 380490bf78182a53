package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: [[Similarity.kmeansAssignPortable]] against a plain-Scala
  * model. Every stage of the engine pipeline is mirrored exactly — int8
  * quantization (`floor(x·127/max|x| + ½)`), cosine over the integer-valued
  * doubles (exact, so plain arithmetic suffices), argmax keeping the earlier
  * (lowest-cent-id) centroid on exact ties, zero-norm coalesced to -2, and
  * the truncating Long-division centroid mean — so assignments AND scores
  * compare with NO tolerance. Random vectors exercise ties, zero vectors,
  * cells of every size, and cells that empty mid-fit. */
class KmeansPortableSpec extends SparkSpec {
  import spark.implicits._

  private def forSamples[A](gen: Gen[A], n: Int = 6)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      val seed = Seed(i.toLong * 32452843)
      gen.apply(Gen.Parameters.default, seed) match {
        case Some(a) =>
          try body(a)
          catch { case e: Throwable =>
            throw new AssertionError(s"property failed for seed $i: $e", e) }
        case None => ()
      }
    }

  // small integer-grid components (incl. negatives and zero vectors) in 4-D
  private val vecGen: Gen[Seq[Float]] =
    Gen.listOfN(4, Gen.choose(-3, 3).map(_.toFloat)).map(_.toSeq)
  private val corpusGen: Gen[List[Seq[Float]]] = for {
    n <- Gen.choose(4, 16)
    vs <- Gen.listOfN(n, vecGen)
  } yield vs

  /** The in-memory model: returns id -> (cell, score) after `updates` Lloyd
    * rounds plus the final assignment. */
  private def naive(vecs: List[Seq[Float]], k: Int, updates: Int)
      : Map[Long, (Long, Double)] = {
    def quantize(v: Seq[Double]): Array[Long] = {
      val ma = v.map(math.abs).max
      if (ma == 0.0) Array.fill(v.size)(0L)
      else v.map(x => math.floor(x * 127.0 / ma + 0.5).toLong).toArray
    }
    val q = vecs.zipWithIndex.map { case (x, i) =>
      i.toLong -> quantize(x.map(_.toDouble)) }
    def cosine(a: Array[Long], b: Array[Long]): Double = {
      val d = math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble)
      if (d == 0.0) -2.0
      else a.zip(b).map { case (x, y) => (x * y).toDouble }.sum / d
    }
    var cents: Seq[(Long, Array[Long])] = q.take(k)
    def assign(x: Array[Long]): (Long, Double) =
      cents.foldLeft((-1L, -3.0)) { case ((bi, bs), (ci, cv)) =>
        val s = cosine(x, cv)
        if (s > bs) (ci, s) else (bi, bs)
      }
    for (_ <- 1 to updates) {
      val byCell = q.groupBy { case (_, x) => assign(x)._1 }
      cents = cents.map { case (cid, cv) =>
        byCell.get(cid) match {
          case Some(members) =>
            val n = members.size.toLong
            cid -> cv.indices.map(p =>
              members.map(_._2(p)).sum / n).toArray
          case None => cid -> cv
        }
      }
    }
    q.map { case (id, x) => id -> assign(x) }.toMap
  }

  private def run(vecs: List[Seq[Float]], k: Int, updates: Int)
      : Map[Long, (Long, Double)] = {
    val df = vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
    Similarity.kmeansAssignPortable(df, "vec_id", "embedding", k, updates)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
  }

  test("matches the naive model bit-for-bit (assignments and scores)") {
    forSamples(corpusGen) { vecs =>
      val got = run(vecs, k = 4, updates = 2)
      val want = naive(vecs, k = 4, updates = 2)
      assert(got === want)
    }
  }

  test("one Lloyd round moves the centroid: two tight groups separate") {
    // seeds 0 and 1 both sit in group A's direction; after one update the
    // cell-1 centroid is pulled to the mean of its members and the groups
    // land in distinct cells
    val vecs = List[Seq[Float]](
      Seq(10f, 0f, 0f, 0f), Seq(9f, 1f, 0f, 0f), // seeds
      Seq(10f, 1f, 0f, 0f), Seq(9f, 0f, 0f, 0f), // group A
      Seq(0f, 0f, 9f, 1f), Seq(0f, 0f, 10f, 0f), Seq(0f, 0f, 10f, 1f))
    val got = run(vecs, k = 2, updates = 2)
    val cellsA = Set(0L, 2L, 3L).map(got(_)._1)
    val cellsB = Set(4L, 5L, 6L).map(got(_)._1)
    assert(cellsA.size === 1 && cellsB.size === 1 && cellsA != cellsB)
    assert(got === naive(vecs, k = 2, updates = 2))
  }

  test("zero-norm vector lands in the lowest-id cell at score -2") {
    val vecs = List[Seq[Float]](
      Seq(1f, 2f, 3f, 4f), Seq(-1f, 2f, -3f, 4f), Seq(0f, 0f, 0f, 0f))
    val got = run(vecs, k = 2, updates = 1)
    assert(got(2L) === ((0L, -2.0)))
  }

  test("a cell that loses every member keeps its previous centroid") {
    // seeds 0 and 1 are IDENTICAL directions, so min-id ties send every
    // member to cell 0 in round 1 and cell 1 updates over zero members: it
    // must RETAIN (127,0,0,0). The retention is observable — after cell 0's
    // centroid drifts to the all-member mean (95,31,0,0), the x-axis
    // vectors score higher against the retained cell-1 centroid (cos 1.0
    // exactly) and migrate there; a dropped or zeroed cell could not win
    // them back. The model encodes exactly this.
    val vecs = List[Seq[Float]](
      Seq(1f, 0f, 0f, 0f), Seq(2f, 0f, 0f, 0f),
      Seq(3f, 0f, 0f, 0f), Seq(0f, 5f, 0f, 0f))
    val got = run(vecs, k = 2, updates = 2)
    assert(got(2L)._1 === 1L, "retained cell-1 centroid must win back v2")
    assert(got === naive(vecs, k = 2, updates = 2))
  }
}
