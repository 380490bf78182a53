package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.ext.Multimodal.RawAsset

/** WebDataset-style TAR shard source/sink (SURVEY §2.8 extension).
  *
  * Multimodal training corpora ship as TAR shards of per-sample member
  * files — `<key>.jpg`, `<key>.txt`, `<key>.json`, the WebDataset layout —
  * so "walk the shard, group members into samples" is the first operator a
  * multimodal ingest runs. This is the same posture as the WARC and
  * PNG/JPEG paths: the REAL byte format (USTAR headers, octal fields,
  * checksum, 512-byte blocking, prefix field for long paths), parsed with
  * bounded memory, with corruption quarantining to data instead of
  * failing the job.
  *
  * Scale shape: shards arrive as rows of a binary column ([[RawAsset]] —
  * the repo's multimodal convention), so the parse is a `mapPartitions`
  * projection: no shuffle, memory bounded by ONE member file, and the
  * scan parallelizes by shard exactly the way a 100 TB WebDataset corpus
  * is already laid out (thousands of ~1 GB shards). Sample grouping is one
  * aggregation keyed (shard, stem) — bounded by a sample's members.
  */
object Tar {

  /** One member file of a shard. */
  final case class TarEntry(asset_id: Long, name: String, bytes: Array[Byte])

  /** USTAR parse of in-memory shard payloads → one row per member FILE.
    * A malformed shard (bad octal, checksum mismatch, truncated data or
    * missing terminator, junk after the terminator) quarantines to NO
    * rows for that shard — the decode family's convention. Non-file
    * members (directories, links) are skipped; the USTAR `prefix` field
    * is honored, so paths beyond the 100-byte name field round-trip. */
  def entries(shards: Dataset[RawAsset]): Dataset[TarEntry] = {
    import shards.sparkSession.implicits._
    shards.mapPartitions(_.flatMap(a =>
      parseTar(gunzipIfNeeded(a.payload)).toSeq.flatten.map {
        case (n, b) => TarEntry(a.asset_id, n, b)
      }))
  }

  /** `.tar.gz` shards are accepted transparently: payloads starting with
    * the gzip magic inflate fully before the walk (memory = one INFLATED
    * shard — same bound as the uncompressed path, shards are sized by the
    * caller); a corrupt gzip stream quarantines like any other corruption
    * (null → parseTar rejects). */
  private def gunzipIfNeeded(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length < 2 ||
        (b(0) & 0xff) != 0x1f || (b(1) & 0xff) != 0x8b) return b
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      try in.readAllBytes() finally in.close()
    } catch { case _: java.io.IOException => null }
  }

  /** Streaming twin of [[entries]] (the jsonlStream / WARC-stream
    * convention): WebDataset shards LANDING in a directory are walked as
    * they arrive — `readStream(binaryFile)` with exactly-once checkpointed
    * file tracking, one USTAR parse per new shard, corruption quarantining
    * exactly as in batch. `asset_id` is the shard number when the file
    * follows [[writeWebdataset]]'s `shard-N.tar` naming, else a stable
    * 64-bit md5 hash of the path (ids only need to be per-shard stable). */
  def entriesStream(spark: org.apache.spark.sql.SparkSession,
                    dir: String): Dataset[TarEntry] = {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // binaryFile's schema is FIXED by the source, but the streaming path
    // requires it stated explicitly (no inference pass on a stream)
    val binaryFileSchema = StructType(Seq(
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    spark.readStream.format("binaryFile").schema(binaryFileSchema)
      .option("pathGlobFilter", "*.tar*").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (path, bytes) =>
        val id = "shard-(\\d+)\\.tar".r.findFirstMatchIn(path)
          .map(_.group(1).toLong)
          .getOrElse {
            val d = java.security.MessageDigest.getInstance("MD5")
              .digest(path.getBytes("UTF-8"))
            java.nio.ByteBuffer.wrap(d, 0, 8).getLong
          }
        parseTar(gunzipIfNeeded(bytes)).toSeq.flatten.map {
          case (n, b) => TarEntry(id, n, b)
        }
      })
  }

  /** Group members into WebDataset SAMPLES: the sample key (stem) is the
    * member path up to the first dot OF THE BASENAME — `a7.txt` and
    * `a7.cls` are two parts of sample `a7`, and `images.v2/0001.jpg` /
    * `images.v2/0001.txt` group as sample `images.v2/0001` (a dotted
    * DIRECTORY stays in the stem — splitting the full path at its first
    * dot would collapse every sample under such a directory into one).
    * The remainder of the basename is the part's extension. Returns
    * (asset_id, stem, parts: map<ext, bytes>); duplicate extensions
    * within a sample keep the lexicographically-first name's bytes
    * (deterministic, and a shape a valid WebDataset never has). */
  def webdatasetSamples(members: Dataset[TarEntry]): DataFrame =
    members.toDF()
      .withColumn("base", substring_index(col("name"), "/", -1))
      .withColumn("dirp",
        expr("substring(name, 1, length(name) - length(base))"))
      .select(col("asset_id"),
        concat(col("dirp"), substring_index(col("base"), ".", 1)).as("stem"),
        when(col("base").contains("."),
          expr("substring(base, length(substring_index(base, '.', 1)) + 2)"))
          .otherwise(lit("")).as("ext"),
        col("name"), col("bytes"))
      .groupBy(col("asset_id"), col("stem"))
      .agg(map_from_entries(
        aggregate(
          array_sort(collect_list(struct(col("ext"), col("name"),
            col("bytes")))),
          array().cast("array<struct<ext:string,bytes:binary>>"),
          (acc, e) => when(
            exists(acc, p => p.getField("ext") === e.getField("ext")), acc)
            .otherwise(concat(acc, array(struct(
              e.getField("ext").as("ext"),
              e.getField("bytes").as("bytes"))))))).as("parts"),
        count(lit(1)).as("n_parts"))

  /** Write samples as WebDataset TAR shards — the EXPORT half a curated
    * corpus ships as. Each input row is one SAMPLE: `keyCol` names it,
    * `partsCol` is its map<extension, binary>. Samples hash-assign to
    * `nShards` shards ([[graft.ext.Sampling.withShard]]'s deterministic
    * law), each shard becomes ONE `shard-%05d.tar` whose members are
    * `<key>.<ext>` in lexicographic member-name order — with [[archive]]'s
    * fixed metadata the shard files are BYTE-IDENTICAL across re-runs,
    * retries, and cluster layouts, so a delivered shard can be
    * checksummed. The target directory is cleared first (overwrite
    * semantics — stale shards from a previous layout must not survive next
    * to new ones).
    *
    * Scale shape: one MEMBER-level shuffle keyed on the shard
    * (repartition + sortWithinPartitions), then writer tasks stream the
    * sorted row iterator straight into the open tar — per-task memory is
    * ONE MEMBER, never a shard, so a 2 GB shard (or a hot shard after
    * skewed keying) writes fine where a whole-shard aggregation row would
    * hit Spark's 2 GB single-row ceiling. Each shard lands via an
    * attempt-unique temp name renamed into place on success, so a task
    * retry or speculative twin never interleaves bytes at the final path
    * (content is byte-identical across attempts — the first rename wins
    * and the loser discards its temp). Executors open the filesystem from
    * the shipped session configuration; local `file:` paths need none.
    *
    * Returns the (shard_id, n_samples, md5) census for the caller's
    * manifest: `n_samples` counts DISTINCT sample keys written, `md5` is
    * the hex digest of the exact shard file bytes (computed while
    * streaming — a delivery verifies against it without re-reading).
    * Samples whose parts map is empty or null carry no members and are
    * neither written nor counted. */
  def writeWebdataset(df: DataFrame, keyCol: String, partsCol: String,
                      dir: String, nShards: Int): DataFrame = {
    val target = new org.apache.hadoop.fs.Path(dir)
    val driverFs = target.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    driverFs.delete(target, true)
    driverFs.mkdirs(target): Unit
    writeShards(df, keyCol, partsCol, dir, nShards,
      sid => f"shard-$sid%05d.tar")
  }

  /** Per-drop WebDataset export — the sink half of the streaming tar
    * story ([[entriesStream]] is ingest): one drop's samples become
    * `shard-b<batchId>-NNNNN.tar` files ALONGSIDE earlier drops' shards
    * (no directory clear — each batch owns its name namespace, so append
    * delivery composes and the batch-level export is idempotent: a
    * foreachBatch RETRY replays the same deterministic samples into the
    * same names with byte-identical content). Same census contract as
    * [[writeWebdataset]]. Wire it as
    * {{{ stream.writeStream.foreachBatch { (b, id) =>
    *       Tar.writeWebdatasetBatch(b, key, parts, dir, n, id): Unit } }}} */
  def writeWebdatasetBatch(df: DataFrame, keyCol: String, partsCol: String,
                           dir: String, nShards: Int,
                           batchId: Long): DataFrame = {
    require(batchId >= 0, s"batchId must be non-negative: $batchId")
    val target = new org.apache.hadoop.fs.Path(dir)
    val driverFs = target.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    driverFs.mkdirs(target): Unit
    writeShards(df, keyCol, partsCol, dir, nShards,
      sid => f"shard-b$batchId%06d-$sid%05d.tar")
  }

  private def writeShards(df: DataFrame, keyCol: String, partsCol: String,
                          dir: String, nShards: Int,
                          shardFile: Int => String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // ship the SESSION's Hadoop configuration to the writer tasks (the
    // Warc convention) — a bare executor-side Configuration would drop
    // spark.hadoop.* settings (object-store credentials, endpoints) and
    // fail or write to the wrong filesystem
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val members = graft.ext.Sampling.withShard(df, keyCol, nShards)
      .select(col("shard_id"), col(keyCol).cast("string").as("k"),
        explode(col(partsCol)).as(Seq("ext", "bytes")))
      .select(col("shard_id"),
        concat(col("k"), lit("."), col("ext")).as("name"),
        col("k"), col("bytes"))
    // (shard_id, name)-major sort IS the byte contract: members stream in
    // plain lexicographic member-name order (a (k, name) sort can diverge
    // from name order — key 'img1-extra' sorts after 'img1' as a key but
    // its members sort BEFORE 'img1.*' as names, '-' < '.'), so the
    // streamed bytes equal the in-memory [[archive]] of the name-sorted
    // member list for ANY distinct keys. n_samples counts the per-shard
    // key SET (keys need not be name-contiguous when one key is a dotted
    // prefix of another) — memory is the shard's sample keys, orders of
    // magnitude under the member bytes already streaming through.
    val censusRows = members
      .repartition(nShards, col("shard_id"))
      .sortWithinPartitions("shard_id", "name")
      .as[(Int, String, String, Array[Byte])]
      .mapPartitions { rows =>
        val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf.value)
        val out =
          scala.collection.mutable.ArrayBuffer.empty[(Int, Long, String)]
        var cur = -1
        var lastName: String = null
        val keys = scala.collection.mutable.HashSet.empty[String]
        var digest: java.security.MessageDigest = null
        var stream: java.io.OutputStream = null
        var tmp: org.apache.hadoop.fs.Path = null
        // a failed/killed attempt must not leave its _tmp_shard-* behind:
        // the completion listener fires on BOTH success and failure, and
        // `tmp` is nulled once a shard renames, so only a genuinely
        // in-flight temp is swept (retries would otherwise accumulate
        // debris unboundedly — batch mode never clears the directory)
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
          if (tmp != null) {
            try { if (stream != null) stream.close() }
            catch { case _: java.io.IOException => () }
            try fs.delete(tmp, false): Unit
            catch { case _: java.io.IOException => () }
          }
        }
        def finishShard(): Unit = if (cur >= 0) {
          writeTerminator(stream)
          stream.close()
          stream = null
          val md5 = digest.digest().map(b => f"$b%02x").mkString
          val fin = new org.apache.hadoop.fs.Path(s"$dir/${shardFile(cur)}")
          if (!fs.rename(tmp, fin)) {
            // a speculative/retried twin committed first: content is
            // byte-identical by construction, so losing the rename race is
            // success — discard the temp; anything else is a real failure
            if (fs.exists(fin)) fs.delete(tmp, false): Unit
            else sys.error(s"shard finalize failed: $tmp -> $fin")
          }
          tmp = null
          out += ((cur, keys.size.toLong, md5))
        }
        rows.foreach { case (sid, name, k, bytes) =>
          if (sid != cur) {
            finishShard()
            cur = sid; lastName = null; keys.clear()
            digest = java.security.MessageDigest.getInstance("MD5")
            // NO .tar suffix on the temp: a reader racing the writer globs
            // *.tar and must never see a half-written attempt
            val nonce = java.util.UUID.randomUUID().toString.take(8)
            tmp = new org.apache.hadoop.fs.Path(
              f"$dir/_tmp_shard-$sid%05d_$nonce%s")
            stream = new java.security.DigestOutputStream(
              fs.create(tmp, true), digest)
          }
          // strict monotonicity over the full member name: the sort
          // guarantees non-decreasing, so a repeat is a duplicate member —
          // the same (key, ext) emitted twice, which sample-key uniqueness
          // forbids and which would silently break the checksummable byte
          // layout, so it fails loudly
          require(lastName == null || name > lastName,
            s"duplicate sample member '$name' in shard $sid — " +
              "sample keys must be unique")
          keys += k
          writeMemberBlocks(name, bytes, stream)
          lastName = name
        }
        finishShard()
        out.iterator
      }
      .collect().sortBy(_._1).toSeq
    censusRows.toDF("shard_id", "n_samples", "md5")
  }

  // ── the byte format ───────────────────────────────────────────────────

  private def str(b: Array[Byte], o: Int, len: Int): String = {
    var e = o
    val lim = math.min(o + len, b.length)
    while (e < lim && b(e) != 0) e += 1
    new String(b, o, e - o, "US-ASCII")
  }

  private def octal(b: Array[Byte], o: Int, len: Int): Option[Long] = {
    val s = str(b, o, len).trim
    if (s.isEmpty) Some(0L)
    else if (s.forall(c => c >= '0' && c <= '7') && s.length <= 21)
      Some(java.lang.Long.parseLong(s, 8))
    else None
  }

  /** Header checksum per the spec: byte sum with the checksum field read
    * as eight spaces. */
  private def headerSum(b: Array[Byte], off: Int): Long = {
    var sum = 0L; var i = 0
    while (i < 512) {
      sum += (if (i >= 148 && i < 156) ' '.toLong else (b(off + i) & 0xffL))
      i += 1
    }
    sum
  }

  /** Pure parse: Some(members) for a well-formed archive, None for any
    * corruption. Walks 512-byte blocks; never allocates beyond the member
    * being copied out.
    *
    * Extension headers from externally produced shards (Python `tarfile`
    * defaults to PAX) are honored, not skipped: a pax per-file header
    * (typeflag 'x', `path=` record) or a GNU longname ('L') overrides the
    * FOLLOWING member's name — without this, a member whose path exceeds
    * the 100-byte name field would silently surface under its truncated
    * replacement name and mis-stem every sample it belongs to. Extension
    * records this walk cannot honor faithfully (pax `size=` — the following
    * header's size field is then not the real size — global 'g' defaults,
    * GNU 'K' longlink, malformed pax records) quarantine the shard (None)
    * instead of emitting wrong members. */
  private[etl] def parseTar(b: Array[Byte])
      : Option[Seq[(String, Array[Byte])]] = {
    if (b == null || b.length < 1024 || b.length % 512 != 0) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    var off = 0
    var bad = false
    var done = false
    var nameOverride: String = null
    while (!bad && !done && off + 512 <= b.length) {
      var allZero = true
      var i = off
      while (allZero && i < off + 512) { if (b(i) != 0) allZero = false; i += 1 }
      if (allZero) {
        // terminator: everything from here on must be zero padding
        var j = off
        while (!bad && j < b.length) { if (b(j) != 0) bad = true; j += 1 }
        done = true
      } else {
        (octal(b, off + 124, 12), octal(b, off + 148, 8)) match {
          case (Some(size), Some(cksum))
              if size >= 0 && off + 512 + size <= b.length &&
                cksum == headerSum(b, off) =>
            val typ = b(off + 156)
            if (typ == 'x'.toByte) {
              paxPath(b, off + 512, size.toInt) match {
                case Right(p) => nameOverride = p.getOrElse(nameOverride)
                case Left(()) => bad = true // size=/malformed: quarantine
              }
            } else if (typ == 'L'.toByte) {
              // GNU longname: data is the next member's NUL-terminated name
              nameOverride = str(b, off + 512, size.toInt)
              if (nameOverride.isEmpty) bad = true
            } else if (typ == 'g'.toByte || typ == 'K'.toByte) {
              bad = true // unsupported extension semantics: quarantine
            } else {
              val name =
                if (nameOverride != null) nameOverride
                else {
                  val name0 = str(b, off, 100)
                  val prefix = str(b, off + 345, 155)
                  if (prefix.isEmpty) name0 else prefix + "/" + name0
                }
              nameOverride = null // an override binds to ONE member
              if (typ == '0'.toByte || typ == 0.toByte) {
                if (name.isEmpty) bad = true
                else out += ((name, java.util.Arrays.copyOfRange(
                  b, off + 512, off + 512 + size.toInt)))
              }
            }
            off += 512 + (((size + 511) / 512) * 512).toInt
          case _ => bad = true
        }
      }
    }
    if (bad || !done) None else Some(out.toSeq)
  }

  /** Parse a pax extended-header payload ("len key=value\n" records,
    * `len` counting the whole record including itself): Right(Some(path))
    * when a `path=` record is present, Right(None) when only ignorable
    * keys occur, Left(()) for records this walk cannot honor (`size=`
    * would contradict the following header's size field) or malformed
    * framing. Values are UTF-8 per the pax spec. */
  private def paxPath(b: Array[Byte], off: Int, len: Int)
      : Either[Unit, Option[String]] = {
    var p = off
    val end = off + len
    var path: Option[String] = None
    while (p < end) {
      var q = p
      while (q < end && b(q) != ' '.toByte) q += 1
      val lenStr = new String(b, p, q - p, "US-ASCII")
      if (q >= end || !lenStr.forall(_.isDigit) || lenStr.isEmpty)
        return Left(())
      val recLen = lenStr.toInt
      if (recLen <= 0 || p + recLen > end || b(p + recLen - 1) != '\n'.toByte)
        return Left(())
      val body = new String(b, q + 1, p + recLen - 1 - (q + 1), "UTF-8")
      val eq = body.indexOf('=')
      if (eq <= 0) return Left(())
      val key = body.substring(0, eq)
      if (key == "path") path = Some(body.substring(eq + 1))
      else if (key == "size" || key == "linkpath") return Left(())
      p += recLen
    }
    Right(path)
  }

  /** In-memory [[writeArchive]] — fixtures and small shards. */
  def archive(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    writeArchive(members, bos)
    bos.toByteArray
  }

  /** USTAR archive writer — the export half (WebDataset shard writing)
    * and the fixtures' constructor. STREAMS to `out` (memory = the member
    * being written, not the shard — at the ~1 GB shard sizing an
    * in-memory build would transiently hold 3× the bytes and cap at 2 GB).
    * Deterministic bytes: fixed mode/uid/gid/mtime, members in the given
    * order, names over 100 bytes split into the `prefix` field at a '/'
    * boundary (the USTAR rule). Names must be printable ASCII — a lossy
    * US-ASCII transcode would silently rename `café.txt` to `caf?.txt`,
    * so non-ASCII fails loudly instead. */
  def writeArchive(members: Seq[(String, Array[Byte])],
                   bos: java.io.OutputStream): Unit = {
    members.foreach { case (name, data) => writeMemberBlocks(name, data, bos) }
    writeTerminator(bos)
  }

  /** One member's header + data + block padding, streamed to `bos` — the
    * unit [[writeWebdataset]]'s writer tasks emit per sorted row (memory =
    * this member). [[writeArchive]] is members + [[writeTerminator]]. */
  private[etl] def writeMemberBlocks(name: String, data: Array[Byte],
                                     bos: java.io.OutputStream): Unit = {
    {
      require(name.forall(c => c >= 32 && c < 127),
        s"tar member names must be printable ASCII " +
          s"(US-ASCII would silently mangle): $name")
      val nb = name.getBytes("US-ASCII")
      val (prefix, base) =
        if (nb.length <= 100) ("", name)
        else {
          val cut = name.lastIndexWhere(_ == '/',
            math.min(name.length - 1, 155))
          require(cut > 0 && name.length - cut - 1 <= 100,
            s"tar member name does not split into prefix(155)/name(100): $name")
          (name.substring(0, cut), name.substring(cut + 1))
        }
      val h = new Array[Byte](512)
      val bb = base.getBytes("US-ASCII")
      System.arraycopy(bb, 0, h, 0, bb.length)
      def putOctal(v: Long, o: Int, len: Int): Unit = {
        val s = java.lang.Long.toOctalString(v)
        val p = ("0" * (len - 1 - s.length)) + s
        val pb = p.getBytes("US-ASCII")
        System.arraycopy(pb, 0, h, o, pb.length)
        h(o + len - 1) = 0
      }
      putOctal(420, 100, 8)                 // mode 0644
      putOctal(0, 108, 8); putOctal(0, 116, 8) // uid, gid
      putOctal(data.length.toLong, 124, 12)
      putOctal(0, 136, 12)                  // mtime 0: bit-stable shards
      h(156) = '0'
      val magic = Array[Byte]('u', 's', 't', 'a', 'r', 0, '0', '0')
      System.arraycopy(magic, 0, h, 257, magic.length)
      val pb = prefix.getBytes("US-ASCII")
      System.arraycopy(pb, 0, h, 345, pb.length)
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      var sum = 0L; var i = 0
      while (i < 512) { sum += (h(i) & 0xffL); i += 1 }
      val cs = java.lang.Long.toOctalString(sum)
      val cb = (("0" * (6 - cs.length)) + cs).getBytes("US-ASCII")
      System.arraycopy(cb, 0, h, 148, 6)
      h(154) = 0
      h(155) = ' '.toByte
      bos.write(h)
      bos.write(data)
      bos.write(new Array[Byte]((512 - data.length % 512) % 512))
    }
  }

  /** The two zero blocks that end every archive. */
  private[etl] def writeTerminator(bos: java.io.OutputStream): Unit =
    bos.write(new Array[Byte](1024))
}
