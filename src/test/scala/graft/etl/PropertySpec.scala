package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5 item 4): classifier totality, dim
  * uniqueness / SKEY bijectivity, fact-count conservation, upsert
  * idempotency — over generated raw batches, not fixtures.
  *
  * Uses raw ScalaCheck generators with explicit seeds (the scalatest bridge
  * artifact isn't in the offline cache); failures print the seed. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic forAll replacement: n samples from fixed seeds. */
  private def forSamples[A](gen: Gen[A], n: Int = 8)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      val seed = Seed(i.toLong * 7919)
      gen.apply(Gen.Parameters.default, seed) match {
        case Some(a) =>
          try body(a)
          catch { case e: Throwable =>
            throw new AssertionError(s"property failed for seed $i: $e", e) }
        case None => ()
      }
    }

  private val pieceGen: Gen[String] = Gen.oneOf(
    "Android App", "iPhone", "iPad App", "news", "9news", "CNN News",
    "App Web", "Desktop Site", "x")
  private val titleGen: Gen[String] = for {
    n <- Gen.choose(1, 4)
    ps <- Gen.listOfN(n, pieceGen)
  } yield ps.mkString("|")
  private val eventsGen: Gen[String] = for {
    n <- Gen.choose(1, 6)
    codes <- Gen.listOfN(n, Gen.oneOf("206", "1206", "101", "157", "20", "6"))
  } yield codes.mkString(",")
  private val rowGen: Gen[(String, String, String)] = for {
    mi <- Gen.choose(0, 59)
    se <- Gen.choose(0, 59)
    t <- titleGen
    e <- eventsGen
  } yield (f"2017-01-11T00:$mi%02d:$se%02d.000Z", t, e)
  private val batchGen: Gen[List[(String, String, String)]] =
    Gen.listOfN(25, rowGen)

  test("platform classifier is total and site classifier nulls exactly the platform words") {
    forSamples(batchGen) { rows =>
      val df = rows.toDF("DateTime", "VideoTitle", "events")
      val out = df.select(
        Transform.platformOf($"VideoTitle").as("p"),
        Transform.siteOf($"VideoTitle").as("s"),
        Transform.titleHead($"VideoTitle").as("h")).collect()
      out.foreach { r =>
        assert(Set("Android", "iPhone", "iPad", "Desktop").contains(r.getString(0)))
        val headToks = r.getString(2).split(" ").toSet
        val expectNull = headToks.intersect(Set("Android", "iPhone", "iPad", "Web")).nonEmpty
        assert((r.getString(1) == null) === expectNull)
      }
    }
  }

  test("star invariants: fact conservation, dim uniqueness, SKEY bijectivity, idempotency") {
    forSamples(batchGen, n = 4) { rows =>
      val df = rows.toDF("DateTime", "VideoTitle", "events")
      val root = tmpDir("graft-prop")
      val store = StarStore(spark, root)
      val appended = store.runBatch(df, "p1")

      // conservation: fact rows == rows passing both filters
      val expected = df.where(Transform.isVideoStart($"events") &&
        Transform.hasValidTitle($"VideoTitle")).count()
      assert(appended === expected)
      if (expected > 0) {
        assert(store.fact.count() === expected)
        // dims: natural key unique, SKEY unique, bijective
        Seq(store.dimPlatform -> "PLATFORM", store.dimSite -> "SITE",
            store.dimDate -> "DATETIME", store.dimTitle -> "TITLE").foreach {
          case (dim, k) =>
            val n = dim.count()
            assert(dim.select(k).distinct().count() === n)
            assert(dim.select(k + "_SKEY").distinct().count() === n)
        }
        // no orphan FKs
        assert(store.fact.where($"PLATFORM_SKEY".isNull || $"SITE_SKEY".isNull ||
          $"DATETIME_SKEY".isNull || $"TITLE_SKEY".isNull).count() === 0)

        // idempotency: same batch id → no-op; new id, same data → dims unchanged
        assert(store.runBatch(df, "p1") === 0)
        val dimsBefore = store.dimPlatform.collect().toSet
        store.runBatch(df, "p2")
        assert(store.dimPlatform.collect().toSet === dimsBefore)
      }
    }
  }
}
