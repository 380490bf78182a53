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

  /** One record (payload) past this cannot surface as a JVM string — a
    * framing length beyond it quarantines the tail like any other violated
    * invariant. The bound is PER RECORD; the segment itself is unbounded
    * (the walk never materializes more than one record). */
  private val MaxRecordBytes: Long = Int.MaxValue - 16L

  /** Header-line length cap. WARC header lines are short (a version token
    * or `Name: value`); a binary/corrupt segment with no CRLF would
    * otherwise accumulate the whole decompressed stream into the line
    * buffer — the exact unbounded-memory failure the streaming walk exists
    * to prevent. A line past this is a violated framing invariant and
    * quarantines the tail like any other. 64 KB comfortably exceeds any
    * real-world URI or warcinfo field. */
  private val MaxLineBytes: Int = 64 * 1024

  /** Streaming record walk over one segment's BYTES — thin wrapper over
    * [[parseStream]], kept for callers (and fuzzers) that already hold the
    * segment in memory. */
  def parseSegment(bytes0: Array[Byte]): Iterator[WarcRecord] =
    parseStream(new ByteArrayInputStream(bytes0))

  /** Streaming record walk driven by an InputStream: memory is bounded by
    * ONE record, never the segment — a multi-GiB (gzipped or plain)
    * Common Crawl segment walks in constant space, where a whole-segment
    * buffer would hit the JVM array cap around 2 GiB decompressed. Framing
    * is Content-Length-driven per the spec; the walk stops (quarantining
    * the tail) on any violated invariant, on a record past
    * [[MaxRecordBytes]], and on an I/O or inflater error mid-record (every
    * record fully decoded before the fault is kept — the same partial-parse
    * contract the buffered walk had). Gzip is detected from the magic
    * bytes; multi-member streams (per-record members or whole-file — both
    * Common Crawl layouts) decompress through the JDK's native
    * concatenated-member walk. HTTP response payloads split at the first
    * blank line into status + body; non-HTTP payloads surface with status
    * -1 and the raw payload as body. The stream is closed when the walk
    * exhausts or quarantines; a caller abandoning the iterator early owns
    * the close (the distributed scans register a task-completion backstop). */
  def parseStream(in0: java.io.InputStream): Iterator[WarcRecord] = {
    val pb = new java.io.PushbackInputStream(in0, 2)
    val b0 = pb.read(); val b1 = if (b0 >= 0) pb.read() else -1
    if (b1 >= 0) pb.unread(b1)
    if (b0 >= 0) pb.unread(b0)
    val in = new java.io.BufferedInputStream(
      if (b0 == 0x1f && b1 == 0x8b)
        try new GZIPInputStream(pb, 65536)
        catch { case _: java.io.IOException => // corrupt header: no records
          new ByteArrayInputStream(Array.empty[Byte]) }
      else pb, 65536)
    new Iterator[WarcRecord] {
      private var pushed = -1 // one-byte lookahead for the separator walk
      private var done = false
      private var nextRec: WarcRecord = null
      private def read1(): Int =
        if (pushed >= 0) { val r = pushed; pushed = -1; r } else in.read()
      private def readLine(): String = { // CRLF-terminated; null on
        // underrun OR on a line past MaxLineBytes (violated framing — a
        // CRLF-less binary stream must not buffer unboundedly here)
        val buf = new ByteArrayOutputStream(256)
        var b = read1()
        while (b >= 0) {
          if (buf.size > MaxLineBytes) return null
          if (b == '\r') {
            val b2 = read1()
            if (b2 == '\n') return new String(buf.toByteArray, "UTF-8")
            buf.write(b) // lone \r stays line content, like the byte walk
            if (b2 < 0) return null
            b = b2
          } else { buf.write(b); b = read1() }
        }
        null
      }
      private def readFully(len: Int): Array[Byte] = { // null on underrun
        val out = new Array[Byte](len)
        var off = 0
        while (off < len) {
          if (pushed >= 0) { out(off) = pushed.toByte; pushed = -1; off += 1 }
          else {
            val n = in.read(out, off, len - off)
            if (n < 0) return null
            off += n
          }
        }
        out
      }
      private def stop(): Unit = {
        done = true
        try in.close() catch { case _: java.io.IOException => () }
      }
      private def advance(): Unit = {
        nextRec = null
        try {
          while (nextRec == null && !done) {
            val v = readLine()
            if (v == null || !v.startsWith("WARC/")) { stop(); return }
            var typ = ""; var uri = ""; var date = ""; var len = -1L
            var h = readLine()
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
              h = readLine()
            }
            if (h == null || len < 0 || len > MaxRecordBytes) { stop(); return }
            val payload = readFully(len.toInt)
            if (payload == null) { stop(); return }
            // the spec's two-CRLF record separator (tolerant: up to 4
            // leading \r/\n bytes consumed, first other byte pushed back)
            var i = 0
            while (i < 4) {
              val b = read1()
              if (b == '\r' || b == '\n') i += 1
              else { if (b >= 0) pushed = b; i = 4 }
            }
            val (status, body) =
              if (payload.length >= 5 &&
                new String(payload, 0, 5, "UTF-8") == "HTTP/") {
                val sep = payload.indices.drop(3).find(j =>
                  payload(j - 3) == '\r' && payload(j - 2) == '\n' &&
                    payload(j - 1) == '\r' && payload(j) == '\n')
                val head = new String(payload, 0,
                  sep.map(_ - 3).getOrElse(payload.length), "UTF-8")
                val st = head.split(" ", 3) match {
                  case Array(_, code, _*) =>
                    try code.toInt catch { case _: NumberFormatException => -1 }
                  case _ => -1
                }
                val b = sep.map(j => new String(payload, j + 1,
                  payload.length - j - 1, "UTF-8")).getOrElse("")
                (st, b)
              } else (-1, new String(payload, "UTF-8"))
            nextRec = WarcRecord(typ, uri, date, len, status, body)
          }
        } catch {
          // I/O or inflater fault mid-record: quarantine the tail, keep
          // every record decoded before it — never a failed task
          case _: java.io.IOException => nextRec = null; stop()
        }
      }
      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): WarcRecord = {
        val r = nextRec; advance(); r
      }
    }
  }

  /** Open `path` through its own Hadoop FileSystem and walk its records,
    * with a task-completion close backstop for consumers that abandon the
    * iterator early (limits, failures) — the stream otherwise closes
    * itself when the walk exhausts or quarantines. */
  private def openAndWalk(path: String,
      conf: org.apache.hadoop.conf.Configuration): Iterator[WarcRecord] = {
    val p = new Path(path)
    val stream = p.getFileSystem(conf).open(p)
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit](_ =>
      try stream.close() catch { case _: java.io.IOException => () })
    parseStream(stream)
  }

  /** List the segment files `dir` denotes: `dir` may be a directory, a
    * glob of directories (each contributing its immediate `*.warc*`
    * files), or a glob of files. Scheme-agnostic (the path's own
    * FileSystem), matching the old `binaryFile` + pathGlobFilter shape. */
  private def listSegments(spark: SparkSession, dir: String): Seq[String] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Option(fs.globStatus(root)).getOrElse(Array.empty).toSeq
      .flatMap { st =>
        if (st.isDirectory)
          Option(fs.globStatus(new Path(st.getPath, "*.warc*")))
            .getOrElse(Array.empty).toSeq
        else Seq(st)
      }
      .filter(st => st.isFile && st.getPath.getName.contains(".warc"))
      .map(_.getPath.toString).distinct.sorted
  }

  /** Distributed WARC scan: one task per segment file, streaming record
    * walk per task — each task's memory is bounded by ONE record, so
    * multi-GiB segments (a real Common Crawl segment inflates to 4–5 GB)
    * parse completely instead of hitting the JVM-array cap a whole-segment
    * buffer imposes. Returns (warc_type, target_uri, warc_date,
    * content_length, http_status, body). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val files = listSegments(spark, dir)
    if (files.isEmpty) spark.emptyDataset[WarcRecord].toDF()
    else {
      val conf = new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration)
      spark.createDataset(files).repartition(files.size)
        .mapPartitions(_.flatMap(openAndWalk(_, conf.value)))
        .toDF()
    }
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
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // only `path` is selected: binaryFile prunes unrequested columns, so
    // the source never materializes segment CONTENT (or trips its own 2 GiB
    // content cap) — each task re-opens the file and walks it with the same
    // one-record-bounded streaming parse as the batch scan
    spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*.warc*")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dir)
      .select(col("path"))
      .as[String]
      .mapPartitions(_.flatMap(openAndWalk(_, conf.value)))
      .toDF()
  }
}
