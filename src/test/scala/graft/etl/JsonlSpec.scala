package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("meta", StructType(Seq(
      StructField("src", StringType),
      StructField("tags", ArrayType(StringType))))),
    StructField("text", StringType)))

  test("jsonl: explicit schema, nested fields, malformed lines quarantine " +
      "as rows instead of failing (ANSI mode)") {
    val dir = tmpDir("graft-jsonl")
    Seq(
      """{"id": 1, "meta": {"src": "web", "tags": ["en", "good"]}, "text": "hello \"quoted\" world"}""",
      """{"id": 2, "meta": {"src": "book", "tags": []}, "text": "line two"}""",
      """not json at all""",
      """{"id": 3, "meta": {"src": "web"}, "text": null}""",
      """{"id": broken""")
      .toDF("value").repartition(2).write.mode("overwrite").text(dir)
    val df = Sources.jsonl(spark, dir, schema)
    assert(df.count() === 5) // every line is a row — good, partial, or bad
    val good = df.where(col("_corrupt_record").isNull)
    assert(good.count() === 3)
    // nested access works end-to-end
    assert(good.where(col("meta.src") === "web").count() === 2)
    assert(good.select(sum(size(col("meta.tags")))).head().getLong(0) === 2L)
    assert(good.where(col("id") === 1)
      .select(col("text")).head().getString(0) === "hello \"quoted\" world")
    // missing nested fields are null, not corrupt
    assert(good.where(col("id") === 3)
      .select(col("meta.tags")).head().isNullAt(0))
    // the two malformed lines quarantine with the raw line preserved
    val bad = df.where(col("_corrupt_record").isNotNull)
      .select("_corrupt_record").as[String].collect().toSet
    assert(bad === Set("not json at all", """{"id": broken"""))
    // quarantined rows carry null data columns
    assert(df.where(col("_corrupt_record").isNotNull && col("id").isNotNull)
      .count() === 0)
  }

  test("jsonl round-trip: writeJsonl then jsonl is lossless on nested rows") {
    val dir = tmpDir("graft-jsonl-rt")
    val rows = Seq(
      (1L, ("web", Seq("en")), "plain"),
      (2L, ("book", Seq("de", "x\"y")), "with \"quotes\" and \\ backslash"),
      (3L, ("cc", Seq.empty[String]), "unicode: héllo—世界"))
      .toDF("id", "meta", "text")
      .select(col("id"), col("meta").cast("struct<src:string,tags:array<string>>"),
        col("text"))
    Sources.writeJsonl(rows, dir)
    val back = Sources.jsonl(spark, dir, schema)
    assert(back.where(col("_corrupt_record").isNotNull).count() === 0)
    val got = back.select(col("id"), col("meta.src"),
        concat_ws("|", col("meta.tags")), col("text"))
      .as[(Long, String, String, String)].collect().toSet
    assert(got === Set(
      (1L, "web", "en", "plain"),
      (2L, "book", "de|x\"y", "with \"quotes\" and \\ backslash"),
      (3L, "cc", "", "unicode: héllo—世界")))
  }

  test("jsonlStream: two drops land incrementally, streamed == batch, " +
      "quarantine rows flow as stream data") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = tmpDir("graft-jsonl-stream")
    val ckpt = tmpDir("graft-jsonl-ckpt")
    val seen = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    def drop(lines: Seq[String], part: Int): Unit =
      lines.toDF("value").coalesce(1).write.mode("overwrite")
        .text(s"$dir/drop$part")
    def runOnce(): Unit = {
      val q = Sources.jsonlStream(spark, s"$dir/drop*", schema)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach { r =>
            val key =
              if (!r.isNullAt(r.fieldIndex("_corrupt_record")))
                "corrupt:" + r.getAs[String]("_corrupt_record")
              else "id:" + r.getAs[Long]("id")
            seen.merge(key, 1L, _ + _)
          }
        }.start()
      q.awaitTermination()
    }
    drop(Seq("""{"id": 1, "meta": {"src": "web", "tags": []}, "text": "a"}""",
      "garbage one"), 1)
    runOnce()
    assert(seen.size === 2)
    drop(Seq("""{"id": 2, "meta": {"src": "cc", "tags": ["x"]}, "text": "b"}"""), 2)
    runOnce()
    assert(seen.keySet().size === 3)
    assert(seen.containsKey("id:1") && seen.containsKey("id:2"))
    assert(seen.containsKey("corrupt:garbage one"))
    // exactly-once: nothing reprocessed across the two runs
    assert(seen.values().stream().allMatch(_ == 1L),
      "a file was reprocessed despite the checkpoint")
    // streamed record set == batch record set over the same dirs
    val batch = Sources.jsonl(spark, s"$dir/drop*", schema)
    assert(batch.count() === 3)
    assert(batch.where(col("_corrupt_record").isNotNull).count() === 1)
  }

  test("streamed JSONL drives INCREMENTAL curation end-to-end: per-batch " +
      "extraction + dedup, history carries across micro-batches as served " +
      "state, quarantine rides as data") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.ext.{CacheScope, Curation}
    val dir = tmpDir("graft-jsonl-cur")
    val ckpt = tmpDir("graft-jsonl-cur-ckpt")
    val histDir = tmpDir("graft-jsonl-cur-hist") + "/fps"
    val keptIds = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val nQuarantined = new java.util.concurrent.atomic.AtomicLong(0)

    val bodyA = "<p>alpha beta gamma delta epsilon zeta eta theta</p>" +
      "<div>x</div>"
    val chromeOnly = "<div><a href=\"/h\">home link menu</a></div><div>ad</div>"
    val bodyB = "<p>one two three four five six seven eight nine</p>"

    def drop(lines: Seq[String], part: Int): Unit =
      lines.toDF("value").coalesce(1).write.mode("overwrite")
        .text(s"$dir/drop$part")

    // the continuous-ingest recipe: each micro-batch quarantines malformed
    // lines AS DATA, curates the good rows (extraction before dedup), and
    // appends the kept EXTRACTED-text fingerprints to a served history
    // store the NEXT batch probes — exactly-once dedup across drops with
    // the store never re-shuffled (bloom probe + exact confirm)
    def runOnce(): Unit = {
      val q = Sources.jsonlStream(spark, s"$dir/drop*", schema)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          nQuarantined.addAndGet(
            df.where(col("_corrupt_record").isNotNull).count()): Unit
          val good = df.where(col("_corrupt_record").isNull)
            .select(col("id"), col("text"))
          val hist =
            if (new java.io.File(histDir).exists())
              Some(spark.read.parquet(histDir))
            else None
          val scope = new CacheScope
          try {
            val kept = Curation.curate(good, "id", "text",
              Curation.Config(extractMinWords = Some(3), minTokens = 5,
                history = hist), scope)
            // consume once, then persist the new fingerprints as state:
            // fingerprints are of the EXTRACTED text (what curate keeps)
            val rows = kept.select(col("id"),
              md5(lower(col("text"))).as("fingerprint")).collect()
            rows.foreach(r => keptIds.add(r.getLong(0)): Unit)
            if (rows.nonEmpty)
              spark.createDataFrame(
                java.util.Arrays.asList(rows: _*),
                kept.select(col("id"),
                  md5(lower(col("text"))).as("fingerprint")).schema)
                .write.mode("append").parquet(histDir)
          } finally scope.close()
        }.start()
      q.awaitTermination()
    }

    drop(Seq(
      s"""{"id": 1, "meta": {"src": "web", "tags": []}, "text": "${bodyA.replace("\"", "\\\"")}"}""",
      s"""{"id": 2, "meta": {"src": "web", "tags": []}, "text": "${chromeOnly.replace("\"", "\\\"")}"}""",
      "garbage line"), 1)
    runOnce()
    assert(keptIds.contains(1L)) // body page survives extraction + gates
    assert(!keptIds.contains(2L)) // all-chrome page died at extraction
    assert(nQuarantined.get() === 1)

    drop(Seq(
      s"""{"id": 3, "meta": {"src": "cc", "tags": []}, "text": "${bodyA.replace("\"", "\\\"")}"}""",
      s"""{"id": 4, "meta": {"src": "cc", "tags": []}, "text": "$bodyB"}"""), 2)
    runOnce()
    // the cross-drop duplicate died against the SERVED history, the new
    // body survived — no re-read of drop 1's text anywhere
    assert(keptIds.asScala.toSet === Set(1L, 4L))
    // the history store is the union of both batches' kept fingerprints
    assert(spark.read.parquet(histDir).count() === 2)
  }

  test("jsonl rejects a schema that already carries the corrupt column") {
    intercept[IllegalArgumentException] {
      Sources.jsonl(spark, "/nonexistent", schema.add("_corrupt_record",
        StringType))
    }
  }
}
