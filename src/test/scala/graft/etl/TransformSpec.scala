package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Per-operator semantics from FIXTURES.md §1 (decoded raw sample + edge
  * rows) — SURVEY §2 rows 11-24. */
class TransformSpec extends SparkSpec {
  import spark.implicits._

  private val sample = Seq(
    // (DateTime, VideoTitle, events) — verbatim decoded sample rows
    ("2017-01-11T00:00:31.000Z", "App Web|Clips|a-current-affair;2016|William Tyrrell twist", "157,120,160,104,162,161,163,164,165,166,171,229"),
    ("2017-01-11T00:00:53.000Z", "news| Shark attacks spearfisherman", "127,157,120,160,104,162,161,171,206"),
    ("2017-01-11T00:01:27.000Z", "news| Chilean navy films UFO", "157,120,160,104,162,161,170,171,237"),
    // edge rows (FIXTURES.md table)
    ("2017-01-11T00:02:00.000Z", "iPhone|Clips|Some Video", "206"),
    ("2017-01-11T00:02:01.000Z", "Android|Clips|V", "1206,101"),
    ("2017-01-11T00:02:02.000Z", "JustOnePiece", "206"),
    ("2017-01-11T00:02:03.000Z", "iPad App|News|V2", "206"),
    ("2017-01-11T00:02:04.000Z", "9news|Local|V3", "101,206"),
    ("2017-01-11T00:02:05.000Z", "news|Café résumé 日本", "206")
  ).toDF("DateTime", "VideoTitle", "events")

  test("isVideoStart: exact code membership, not substring (rows 11 vs 12)") {
    val kept = sample.where(Transform.isVideoStart($"events"))
      .select($"DateTime").as[String].collect().toSet
    assert(kept === Set("2017-01-11T00:00:53.000Z", "2017-01-11T00:02:00.000Z",
      "2017-01-11T00:02:02.000Z", "2017-01-11T00:02:03.000Z",
      "2017-01-11T00:02:04.000Z", "2017-01-11T00:02:05.000Z"))
    // "1206,101" must NOT pass the canonical filter…
    assert(!kept.contains("2017-01-11T00:02:01.000Z"))
    // …but DOES pass the documented Snowflake like-variant
    val likeKept = sample.where(Transform.sfIsVideoStart($"events"))
      .select($"DateTime").as[String].collect().toSet
    assert(likeKept.contains("2017-01-11T00:02:01.000Z"))
  }

  test("hasValidTitle drops single-piece titles (row 13)") {
    val kept = sample.where(Transform.hasValidTitle($"VideoTitle"))
      .select($"VideoTitle").as[String].collect().toSet
    assert(!kept.contains("JustOnePiece"))
    assert(kept.contains("news| Shark attacks spearfisherman"))
  }

  test("minute truncation + date key (rows 15-18)") {
    val r = sample.select(
      Transform.dateKey(Transform.minuteTs($"DateTime")).as("k")
    ).as[String].head()
    assert(r === "201701110000")
  }

  test("platform classifier truth table (row 21)") {
    def p(t: String): String =
      Seq(t).toDF("v").select(Transform.platformOf($"v")).as[String].head()
    assert(p("App Web|Clips|x") === "Desktop") // no Android/iPhone/iPad substring
    assert(p("iPhone|Clips|x") === "iPhone")
    assert(p("iPad App|News|x") === "iPad")
    assert(p("Android|Clips|x") === "Android")
    assert(p("news| x") === "Desktop")
    assert(p("9news|Local|x") === "Desktop")
  }

  test("site classifier truth table (row 22)") {
    def s(t: String): Option[String] =
      Option(Seq(t).toDF("v").select(Transform.siteOf($"v")).collect()(0).getString(0))
    assert(s("App Web|Clips|x") === None)     // token Web ∈ platform words
    assert(s("iPhone|Clips|x") === None)
    assert(s("iPad App|News|x") === None)
    assert(s("news| x") === Some("news"))
    assert(s("9news|Local|x") === Some("9news"))
  }

  test("pipe head/tail (row 20)") {
    val r = sample.where($"DateTime" === "2017-01-11T00:00:31.000Z")
      .select(Transform.titleHead($"VideoTitle"), Transform.titleTail($"VideoTitle"))
      .as[(String, String)].head()
    assert(r === ("App Web", "William Tyrrell twist"))
  }

  test("sf classifier variants (row 23)") {
    def sp(t: String): String =
      Seq(t).toDF("v").select(Transform.sfPlatformOf($"v")).as[String].head()
    assert(sp("iPhone|x") === "iPhone")      // regex matches 'iphone'
    assert(sp("App Web|x") === "App Web")    // contains 'app'
    assert(sp("news|x") === "Desktop")
    assert(sp("Other|x") === "unknow")
  }

  test("clean: end-to-end derivation incl. UTF-8 round-trip (rows 15-24)") {
    val cleaned = Transform.clean(sample)
    assert(cleaned.columns.toSeq === Seq("minute_ts", "DATETIME", "year", "month",
      "day", "hour", "minute", "PLATFORM", "SITE", "TITLE"))
    assert(cleaned.count() === 5) // 6 pass 206-filter, minus JustOnePiece
    val utf = cleaned.where($"TITLE" === "Café résumé 日本")
    assert(utf.count() === 1)
    val row = cleaned.where($"DATETIME" === "201701110000").head()
    assert(row.getAs[Int]("year") === 2017 && row.getAs[Int]("minute") === 0)
  }

  test("quarantine captures exactly the rows clean drops, with reasons") {
    val raw = Seq(
      ("2017-01-11T00:00:53.000Z", "news| Shark attacks", "127,206"), // clean
      ("2017-01-11T00:01:00.000Z", "news| Video", "1206"),            // no exact 206
      ("2017-01-11T00:02:00.000Z", "JustOnePiece", "206"),            // malformed title
      ("garbage-timestamp", "news| Video 2", "206"),                  // bad ts
      (null.asInstanceOf[String], "news| Video 3", null.asInstanceOf[String]) // NULLs
    ).toDF("DateTime", "VideoTitle", "events")
    val q = Transform.quarantine(raw)
      .select("VideoTitle", "reject_reason")
      .as[(String, String)].collect().toMap
    assert(q === Map(
      "news| Video" -> "not_videostart",
      "JustOnePiece" -> "malformed_title",
      "news| Video 2" -> "bad_timestamp",
      "news| Video 3" -> "not_videostart"))
    // clean and quarantine partition the input — nothing vanishes silently
    assert(Transform.clean(raw).count() + q.size === raw.count())
  }

  test("CSV round-trip with reference quote/escape semantics (rows 1, 3)") {
    val dir = tmpDir("graft-csv")
    // spaces after comma before quoted field — the raw sample's quirk
    val csv = Seq(
      "DateTime,VideoTitle,events",
      "2017-01-11T00:00:31.000Z,App Web|Clips|x;2016|William Tyrrell twist, \"157,120,206\"",
      "2017-01-11T00:00:53.000Z,news| Shark attacks spearfisherman, \"127,206\""
    ).mkString("\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/raw.csv"), csv)
    val df = Sources.rawCsv(spark, s"$dir/raw.csv")
    assert(df.count() === 2)
    val events = df.select($"events").as[String].collect().toSet
    assert(events === Set("157,120,206", "127,206")) // quoted list = ONE field
    Sources.writeCsv(df, s"$dir/out")
    assert(Sources.rawCsv(spark, s"$dir/out").count() === 2)
  }
}
