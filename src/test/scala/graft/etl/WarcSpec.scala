package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private val pages = Seq(5L -> "hello world", 13L -> "gone page",
    7L -> "second doc\r\n\r\nwith a blank line", 10L -> "ten")

  test("segment round-trip: plain and gzip parse to identical records") {
    for (gz <- Seq(false, true)) {
      val recs = Warc.parseSegment(
        Warc.syntheticSegment(pages.iterator, gzipped = gz)).toSeq
      // warcinfo + one request per id%5==0 (5, 10) + 4 responses
      assert(recs.map(_.warc_type).count(_ == "warcinfo") === 1)
      assert(recs.map(_.warc_type).count(_ == "request") === 2)
      val resp = recs.filter(_.warc_type == "response")
      assert(resp.size === 4)
      // bodies survive verbatim — including a payload containing the
      // blank-line sequence a separator-scanning parser would split on
      assert(resp.map(r => r.target_uri -> r.body).toMap ===
        pages.map { case (id, t) =>
          s"http://host${id % 7}.example/p/$id" -> t
        }.toMap)
      // status law: 404 exactly at id % 13 == 0
      assert(resp.filter(_.http_status == 404).map(_.target_uri) ===
        Seq("http://host6.example/p/13"))
    }
  }

  test("malformed tail quarantines: truncated segment keeps the records before the cut") {
    val full = Warc.syntheticSegment(pages.iterator, gzipped = false)
    val cut = full.take(full.length - 30) // truncate inside the last record
    val recs = Warc.parseSegment(cut).toSeq
    assert(recs.nonEmpty && recs.size < 7,
      s"expected a partial parse, got ${recs.size} records")
    // nothing half-parsed: every surviving record has its full body
    assert(recs.filter(_.warc_type == "response")
      .forall(r => pages.toMap.get(r.target_uri.split("/p/")(1).toLong)
        .contains(r.body)))
    assert(Warc.parseSegment(Array.empty[Byte]).isEmpty)
    assert(Warc.parseSegment("not a warc at all".getBytes("UTF-8")).isEmpty)
  }

  test("parseStream: memory bounded by one record — yields records from a " +
      "stream no whole-segment buffer could hold") {
    // an ENDLESS lazily-generated WARC stream (concatenated spec-valid
    // mini-segments): the old walk inflated the whole segment into one
    // byte[] before the first record came back, so it could never yield
    // anything here; the streaming walk must produce records while having
    // consumed only a bounded prefix — the >2 GiB-segment regime in
    // miniature (the bound is per record, not per segment)
    class Endless extends java.io.InputStream {
      private var buf: Array[Byte] = Array.empty
      private var off = 0
      private var i = 0L
      var produced = 0L
      override def read(): Int = {
        if (off >= buf.length) {
          buf = Warc.syntheticSegment(
            Iterator.single((i, "x" * 1000)), gzipped = false)
          i += 1; off = 0
        }
        produced += 1
        val b = buf(off) & 0xff; off += 1; b
      }
    }
    val endless = new Endless
    val got = Warc.parseStream(endless).take(300).toSeq
    val resp = got.filter(_.warc_type == "response")
    assert(resp.size >= 100 && resp.forall(_.body == "x" * 1000))
    assert(endless.produced < 5000000L,
      s"walk consumed ${endless.produced} bytes for 300 records — not " +
        "bounded by one record")
  }

  test("CRLF-less binary tail quarantines at the line cap — never buffers " +
      "the stream into the line accumulator") {
    // one valid record, then a WARC version prefix followed by an ENDLESS
    // byte stream with no CRLF: without the 64 KB line cap, readLine would
    // accumulate the entire (potentially multi-GiB decompressed) stream
    // into one ByteArrayOutputStream — the exact unbounded-memory failure
    // the streaming walk exists to prevent. The walk must yield the valid
    // record, quarantine the tail, and stop after a bounded prefix.
    val head = Warc.syntheticSegment(Iterator.single((1L, "ok")),
      gzipped = false)
    class CrlfLess extends java.io.InputStream {
      private var off = 0
      private val pre = head ++ "WARC/1.0\r\n".getBytes("UTF-8")
      var produced = 0L
      override def read(): Int = {
        produced += 1
        if (off < pre.length) { val b = pre(off) & 0xff; off += 1; b }
        else 'A'.toInt // endless CRLF-less junk
      }
    }
    val s = new CrlfLess
    val recs = Warc.parseStream(s).toSeq
    assert(recs.count(_.warc_type == "response") === 1)
    assert(recs.filter(_.warc_type == "response").head.body === "ok")
    // bounded: head + one capped line (64 KB) + slack, not "forever"
    assert(s.produced < 512 * 1024L,
      s"walk consumed ${s.produced} bytes before quarantining a CRLF-less " +
        "line — the cap did not engage")
  }

  test("streaming ingest: two segment drops land incrementally, streamed == batch") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = tmpDir("graft-warc-stream")
    val ckpt = tmpDir("graft-warc-ckpt")
    val sink = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    def drop(lo: Long, hi: Long, part: Int): Unit =
      Warc.writeSegments(
        spark.range(lo, hi).select(col("id").as("doc_id"),
          concat(lit("page "), col("id")).as("text"))
          .repartition(1).withColumn("doc_id", col("doc_id")), // one segment
        "doc_id", "text", s"$dir/drop$part")
    def runOnce(): Unit = {
      val q = Warc.readStream(spark, s"$dir/drop*")
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.where(col("warc_type") === "response").collect()
            .foreach(r => sink.merge(r.getAs[String]("target_uri"), 1L, _ + _))
        }.start()
      q.awaitTermination()
    }
    drop(0, 10, 1); runOnce()
    assert(sink.size === 10)
    drop(10, 25, 2); runOnce()
    assert(sink.size === 25, "second drop must add exactly the new pages")
    // exactly-once file tracking: nothing reprocessed across restarts
    assert(sink.values().stream().allMatch(_ == 1L),
      "a segment was reprocessed despite the checkpoint")
    // streamed record set == batch record set over the same dirs
    val batch = Warc.read(spark, s"$dir/drop*")
      .where(col("warc_type") === "response")
      .select("target_uri").as[String].collect().toSet
    assert(batch === sink.keySet().stream().toArray.map(_.toString).toSet)
  }

  test("distributed scan: writeSegments + read over multiple part files") {
    val dir = tmpDir("graft-warc")
    val df = spark.range(0, 40).select(col("id").as("doc_id"),
      concat(lit("body of "), col("id")).as("text"))
      .repartition(4, col("doc_id"))
    Warc.writeSegments(df, "doc_id", "text", dir)
    val got = Warc.read(spark, dir)
    assert(got.where(col("warc_type") === "warcinfo").count() === 4) // one per segment
    val resp = got.where(col("warc_type") === "response")
    assert(resp.count() === 40)
    assert(resp.where(col("http_status") === 404).count() ===
      (0 until 40).count(_ % 13 == 0))
    // both plain and gzip segments were written and both parsed
    val names = new java.io.File(dir).list().filter(_.contains(".warc")).toSeq
    assert(names.exists(_.endsWith(".gz")) && names.exists(_.endsWith(".warc")),
      s"expected mixed plain/gzip segments: $names")
  }
}
