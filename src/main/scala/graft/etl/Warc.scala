package graft.etl

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500 / WARC/1.0) source — the Common Crawl container and the
  * missing first hop of the crawl-curation surface (URL parse, host rank,
  * langid, quality gates all consume what a WARC scan produces).
  *
  * Read shape at 100 TB: a crawl is thousands of ~1 GB segment files; the
  * unit of parallelism is the FILE (`binaryFile` source → one task per
  * segment), and the record walk inside a task is a streaming iterator
  * driven by `Content-Length` — the spec's own framing; scanning for
  * separators would corrupt on payloads containing blank lines. Per-record
  * gzip members (Common Crawl's layout) and whole-file gzip both decompress
  * through the same multi-member `GZIPInputStream` path; plain files parse
  * as-is. Malformed tails quarantine: the walk stops at the first record
  * that violates the framing and keeps everything before it, so one
  * truncated segment degrades to partial data instead of failing the job.
  *
  * Write shape (`writeSegments`): one WARC segment file per partition via
  * the Hadoop `FileSystem` API (scheme-agnostic — object stores included),
  * each a spec-valid stream: a `warcinfo` head record, then per page an
  * optional `request` record and the `response` record whose payload is a
  * real HTTP/1.1 message. */
object Warc {

  final case class WarcRecord(warc_type: String, target_uri: String,
                              warc_date: String, content_length: Long,
                              http_status: Int, body: String)

  private val Crlf = "\r\n"

  /** One spec-valid WARC record: version line, named headers, payload,
    * two-CRLF record separator. */
  private def record(out: ByteArrayOutputStream, typ: String,
                     headers: Seq[(String, String)],
                     payload: Array[Byte]): Unit = {
    val h = new StringBuilder("WARC/1.0").append(Crlf)
    h.append("WARC-Type: ").append(typ).append(Crlf)
    headers.foreach { case (k, v) => h.append(k).append(": ").append(v).append(Crlf) }
    h.append("Content-Length: ").append(payload.length).append(Crlf).append(Crlf)
    out.write(h.toString.getBytes("UTF-8"))
    out.write(payload)
    out.write(s"$Crlf$Crlf".getBytes("UTF-8"))
  }

  /** Deterministic spec-valid segment bytes for (id, text) pages: a
    * `warcinfo` head record, a `request` record for every 5th id, and one
    * `response` per page — status 404 for id % 13 == 0, else 200, host
    * `host<id%7>.example`, body = the page text verbatim. The catalog
    * oracle restates exactly this construction. */
  def syntheticSegment(pages: Iterator[(Long, String)],
                       gzipped: Boolean): Array[Byte] = {
    val raw = new ByteArrayOutputStream()
    record(raw, "warcinfo",
      Seq("WARC-Date" -> "2017-01-11T00:00:00Z",
        "WARC-Record-ID" -> "<urn:uuid:00000000-0000-0000-0000-000000000000>",
        "Content-Type" -> "application/warc-fields"),
      s"software: graft$Crlf".getBytes("UTF-8"))
    pages.foreach { case (id, text) =>
      val uri = s"http://host${id % 7}.example/p/$id"
      val date = "2017-01-11T00:00:01Z"
      val rid = f"<urn:uuid:00000000-0000-0000-0000-${id}%012d>"
      if (id % 5 == 0)
        record(raw, "request",
          Seq("WARC-Target-URI" -> uri, "WARC-Date" -> date,
            "WARC-Record-ID" -> rid,
            "Content-Type" -> "application/http; msgtype=request"),
          s"GET /p/$id HTTP/1.1${Crlf}Host: host${id % 7}.example$Crlf$Crlf"
            .getBytes("UTF-8"))
      val status = if (id % 13 == 0) 404 else 200
      val body = text.getBytes("UTF-8")
      val http = new ByteArrayOutputStream()
      http.write((s"HTTP/1.1 $status ${if (status == 200) "OK" else "Not Found"}$Crlf" +
        s"Content-Type: text/html$Crlf" +
        s"Content-Length: ${body.length}$Crlf$Crlf").getBytes("UTF-8"))
      http.write(body)
      record(raw, "response",
        Seq("WARC-Target-URI" -> uri, "WARC-Date" -> date,
          "WARC-Record-ID" -> rid,
          "Content-Type" -> "application/http; msgtype=response"),
        http.toByteArray)
    }
    if (!gzipped) raw.toByteArray
    else {
      val z = new ByteArrayOutputStream()
      val g = new GZIPOutputStream(z)
      g.write(raw.toByteArray); g.close()
      z.toByteArray
    }
  }

  /** Write one synthetic WARC segment per partition of (id, text) rows
    * under `dir` through the path's own Hadoop FileSystem; partitions with
    * odd index gzip their segment (both decode paths stay exercised). */
  def writeSegments(pages: DataFrame, idCol: String, textCol: String,
                    dir: String): Unit = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      pages.sparkSession.sparkContext.hadoopConfiguration)
    pages.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .rdd.map(r => (r.getLong(0), r.getString(1)))
      .foreachPartition { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val rows = it.toArray
        if (rows.nonEmpty) {
          val gz = pid % 2 == 1
          val p = new Path(f"$dir%s/segment-$pid%05d.warc" + (if (gz) ".gz" else ""))
          val fs = p.getFileSystem(conf.value)
          val o = fs.create(p, true)
          try o.write(syntheticSegment(rows.iterator, gz)) finally o.close()
        }
      }
  }

  /** Streaming record walk over one segment's bytes. Framing is
    * Content-Length-driven per the spec; the walk stops (quarantining the
    * tail) on any violated invariant. HTTP response payloads are split at
    * the first blank line into status + body; non-HTTP payloads surface
    * with status -1 and the raw payload as body. */
  def parseSegment(bytes0: Array[Byte]): Iterator[WarcRecord] = {
    val bytes =
      if (bytes0.length > 2 && (bytes0(0) & 0xff) == 0x1f &&
        (bytes0(1) & 0xff) == 0x8b) {
        // multi-member gzip (per-record members or whole-file) — JDK
        // GZIPInputStream walks concatenated members natively. A corrupt or
        // truncated stream throws inside the inflater: quarantine to the
        // bytes decoded so far (partial parse), never a failed task.
        val out = new ByteArrayOutputStream()
        try {
          val in = new GZIPInputStream(new ByteArrayInputStream(bytes0))
          val buf = new Array[Byte](65536)
          var n = in.read(buf)
          while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
        } catch { case _: java.io.IOException => () }
        out.toByteArray
      } else bytes0
    new Iterator[WarcRecord] {
      private var o = 0
      private var nextRec: WarcRecord = null
      private def line(): String = { // CRLF-terminated; null on underrun
        val start = o
        while (o + 1 < bytes.length &&
          !(bytes(o) == '\r' && bytes(o + 1) == '\n')) o += 1
        if (o + 1 >= bytes.length) null
        else {
          val s = new String(bytes, start, o - start, "UTF-8")
          o += 2; s
        }
      }
      private def advance(): Unit = {
        nextRec = null
        while (nextRec == null && o < bytes.length) {
          val v = line()
          if (v == null || !v.startsWith("WARC/")) { o = bytes.length; return }
          var typ = ""; var uri = ""; var date = ""; var len = -1L
          var h = line()
          while (h != null && h.nonEmpty) {
            val i = h.indexOf(':')
            if (i > 0) {
              val k = h.substring(0, i).trim.toLowerCase
              val value = h.substring(i + 1).trim
              k match {
                case "warc-type" => typ = value
                case "warc-target-uri" => uri = value
                case "warc-date" => date = value
                case "content-length" =>
                  len = try value.toLong catch { case _: NumberFormatException => -1L }
                case _ => ()
              }
            }
            h = line()
          }
          if (h == null || len < 0 || o + len > bytes.length) { o = bytes.length; return }
          val payload = java.util.Arrays.copyOfRange(bytes, o, o + len.toInt)
          o += len.toInt
          // the spec's two-CRLF record separator
          (0 until 4).foreach(_ => if (o < bytes.length &&
            (bytes(o) == '\r' || bytes(o) == '\n')) o += 1)
          val (status, body) =
            if (payload.length >= 5 &&
              new String(payload, 0, 5, "UTF-8") == "HTTP/") {
              val sep = payload.indices.drop(3).find(i =>
                payload(i - 3) == '\r' && payload(i - 2) == '\n' &&
                  payload(i - 1) == '\r' && payload(i) == '\n')
              val head = new String(payload, 0,
                sep.map(_ - 3).getOrElse(payload.length), "UTF-8")
              val st = head.split(" ", 3) match {
                case Array(_, code, _*) =>
                  try code.toInt catch { case _: NumberFormatException => -1 }
                case _ => -1
              }
              val b = sep.map(i => new String(payload, i + 1,
                payload.length - i - 1, "UTF-8")).getOrElse("")
              (st, b)
            } else (-1, new String(payload, "UTF-8"))
          nextRec = WarcRecord(typ, uri, date, len, status, body)
        }
      }
      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): WarcRecord = {
        val r = nextRec; advance(); r
      }
    }
  }

  /** Distributed WARC scan: one task per segment file (`binaryFile`
    * source), streaming record walk per task. Returns (warc_type,
    * target_uri, warc_date, content_length, http_status, body). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*").load(dir)
      .select(col("content"))
      .as[Array[Byte]]
      .mapPartitions(_.flatMap(parseSegment))
      .toDF()
  }

  /** Continuous-ingest twin of [[read]]: segments landing in `dir` stream
    * through the same record walk (`binaryFile` is a FileFormat, so the
    * file-stream source discovers new segments per micro-batch — the
    * crawl-drop topology: each dump appends segment files, downstream
    * curation consumes exactly-once via checkpointed file tracking).
    * Combine with `Trigger.AvailableNow` for catch-up runs or a processing
    * -time trigger for a live tail; parse semantics are byte-identical to
    * the batch scan (WarcSpec pins streamed == batch). */
  def readStream(spark: SparkSession, dir: String,
                 maxFilesPerTrigger: Int = 16): DataFrame = {
    import spark.implicits._
    // a file-stream source requires the schema up front; binaryFile's is
    // fixed by the format
    val binaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*.warc*")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir)
      .select(col("content"))
      .as[Array[Byte]]
      .mapPartitions(_.flatMap(parseSegment))
      .toDF()
  }
}
