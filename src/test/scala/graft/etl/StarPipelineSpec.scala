package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden end-to-end star build: dims/fact/SKEY integrity + idempotency
  * (SURVEY §5 item 3; FIXTURES.md §2). */
class StarPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def rawBatch1 = Seq(
    ("2017-01-11T00:00:53.000Z", "news| Shark attacks spearfisherman", "127,206"),
    ("2017-01-11T00:00:59.000Z", "news| Shark attacks spearfisherman", "206"), // same minute → one dim row
    ("2017-01-11T00:02:00.000Z", "iPhone|Clips|Some Video", "206"),
    ("2017-01-11T00:02:02.000Z", "JustOnePiece", "206"),                       // dropped
    ("2017-01-11T00:02:01.000Z", "Android|Clips|V", "1206,101")                // dropped (no exact 206)
  ).toDF("DateTime", "VideoTitle", "events")

  private def rawBatch2 = Seq(
    ("2017-01-11T00:05:00.000Z", "9news|Local|V3", "101,206"),                 // new everything
    ("2017-01-11T00:00:53.000Z", "news| Shark attacks spearfisherman", "127,206") // replay of batch-1 row
  ).toDF("DateTime", "VideoTitle", "events")

  test("batch build: dim uniqueness, fact count, FK integrity, idempotent dims") {
    val root = tmpDir("graft-star")
    val store = StarStore(spark, root)

    assert(store.runBatch(rawBatch1, "b1") === 3)
    // dims: distinct natural keys, unique skeys
    assert(store.dimDate.count() === 2)      // minutes 00:00 and 00:02
    assert(store.dimPlatform.select("PLATFORM").as[String].collect().toSet
      === Set("Desktop", "iPhone"))
    assert(store.dimSite.select("SITE").as[String].collect().toSet
      === Set("news", Fact.NoneMember))      // NULL site → designated member
    val skeys = store.dimPlatform.select("PLATFORM_SKEY").as[Long].collect()
    assert(skeys.toSet.size === skeys.length && skeys.min === 1L)

    // fact: 3 rows, zero orphan SKEYs (total join — no NULL keys)
    val fact = store.fact
    assert(fact.count() === 3)
    assert(fact.where($"DATETIME_SKEY".isNull || $"PLATFORM_SKEY".isNull ||
      $"SITE_SKEY".isNull || $"TITLE_SKEY".isNull).count() === 0)
    assert(fact.select("factid").as[Long].collect().toSet === Set(1L, 2L, 3L))

    // batch 2: dims grow only by genuinely-new members; existing skeys stable
    val platSkeyBefore = store.dimPlatform.where($"PLATFORM" === "iPhone")
      .select("PLATFORM_SKEY").as[Long].head()
    assert(store.runBatch(rawBatch2, "b2") === 2)
    assert(store.dimSite.select("SITE").as[String].collect().toSet
      === Set("news", "9news", Fact.NoneMember))
    val platSkeyAfter = store.dimPlatform.where($"PLATFORM" === "iPhone")
      .select("PLATFORM_SKEY").as[Long].head()
    assert(platSkeyBefore === platSkeyAfter) // SKEY stability across batches
    assert(store.fact.count() === 5)
    assert(store.dimDate.count() === 3)

    // replaying an already-published batch id is a no-op (exactly-once on
    // top of at-least-once redelivery)
    assert(store.runBatch(rawBatch2, "b2") === 0)
    assert(store.fact.count() === 5)
    // factids stay unique and contiguous across batches
    val ids = store.fact.select("factid").as[Long].collect().sorted
    assert(ids.toSeq === (1L to 5L))

    // compaction: one live dir afterwards, same rows, replay still guarded
    assert(store.compact() === 2) // two deltas merged
    assert(store.fact.count() === 5)
    assert(store.runBatch(rawBatch1, "b1") === 0) // applied history survives
    assert(store.fact.count() === 5)
    assert(store.compact() === 0) // already compact → no-op

    // SQL surface over the published star
    store.registerViews()
    val perPlatform = spark.sql(
      """SELECT p.PLATFORM, count(*) AS n
        |FROM fact_videostart f JOIN dim_platform p USING (PLATFORM_SKEY)
        |GROUP BY p.PLATFORM ORDER BY p.PLATFORM""".stripMargin)
      .as[(String, Long)].collect().toMap
    assert(perPlatform("Desktop") === 4L && perPlatform("iPhone") === 1L)
  }

  test("publish survives a crashed predecessor: orphan version dir + lost CURRENT") {
    val root = tmpDir("graft-crash")
    val store = StarStore(spark, root)
    assert(store.runBatch(rawBatch1, "c1") === 3)

    // crash scenario 1: a version dir was renamed into place but CURRENT
    // was never swapped — the orphan must not wedge later publishes
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$root/versions/v00000002/junk"))
    assert(store.runBatch(rawBatch2, "c2") === 2)
    assert(store.fact.count() === 5)

    // crash scenario 2: CURRENT lost mid-swap — highest version wins
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$root/CURRENT"))
    assert(store.fact.count() === 5)
    assert(store.dimDate.count() === 3)
  }

  test("audit: count + one-job max-lengths (rows 26-27)") {
    val prof = Audit.profile(rawBatch1).head()
    assert(prof.getAs[Long]("n_records") === 5)
    assert(prof.getAs[Int]("maxlen_DateTime") === 24)
    assert(prof.getAs[Int]("maxlen_VideoTitle") ===
      "news| Shark attacks spearfisherman".length)
  }

  test("incremental: file-source stream + foreachBatch merge (rows 33-37)") {
    val stage = tmpDir("graft-stage")
    val root = tmpDir("graft-star-inc")
    val ckpt = tmpDir("graft-ckpt")

    def drop(name: String, rows: Seq[String]): Unit =
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$stage/$name"),
        ("DateTime,VideoTitle,events" +: rows).mkString("\n"))

    drop("f1.csv", Seq("2017-01-11T00:00:53.000Z,news| Shark attack, \"127,206\""))
    Incremental.run(spark, stage, root, ckpt).awaitTermination()

    val store = StarStore(spark, root)
    assert(store.fact.count() === 1)

    // second file arrives → next AvailableNow drain picks up ONLY the new file
    drop("f2.csv", Seq("2017-01-11T00:05:00.000Z,iPhone|Clips|V, \"206\""))
    Incremental.run(spark, stage, root, ckpt).awaitTermination()
    assert(store.fact.count() === 2)
    assert(store.dimPlatform.count() === 2)
  }
}
