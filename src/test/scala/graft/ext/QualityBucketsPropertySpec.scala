package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: [[Sampling.qualityBuckets]]' skew-safe path must label
  * identically to the window twin on random inputs — heavy score ties,
  * singleton groups, and null scores included. The twin IS the oracle
  * restatement, so this equivalence is what the driver gate relies on. */
class QualityBucketsPropertySpec extends SparkSpec {
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

  // few groups, tiny score range → massive ties; ~1/8 null scores
  private val rowGen: Gen[(String, Option[Long])] = for {
    g <- Gen.oneOf("g1", "g2", "g3")
    s <- Gen.frequency(7 -> Gen.choose(0L, 4L).map(Some(_)),
      1 -> Gen.const(None))
  } yield (g, s)
  private val tableGen: Gen[List[(String, Option[Long])]] = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(n, rowGen)
  } yield rows

  test("skew-safe buckets ≡ window-twin buckets under heavy ties and nulls") {
    forSamples(tableGen) { rows =>
      val df = rows.zipWithIndex.map { case ((g, s), i) =>
        (i.toLong, g, s.map(java.lang.Long.valueOf).orNull)
      }.toDF("id", "grp", "score")
      def labels(skewSafe: Boolean) =
        Sampling.qualityBuckets(df, "grp", "id", col("score"),
            skewSafe = skewSafe)
          .select("id", "bucket").as[(Long, String)].collect().toMap
      val heap = labels(skewSafe = true)
      val window = labels(skewSafe = false)
      assert(heap === window, s"paths diverged on rows=$rows")
      // null-score rows are absent from both
      val nullIds = rows.zipWithIndex.collect {
        case ((_, None), i) => i.toLong }.toSet
      assert(heap.keySet.intersect(nullIds).isEmpty)
    }
  }
}
