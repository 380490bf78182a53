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
    * `<key>.<ext>` in (key, ext) order — with [[archive]]'s fixed
    * metadata the shard files are BYTE-IDENTICAL across re-runs, retries,
    * and cluster layouts, so a delivered shard can be checksummed.
    * The target directory is cleared first (overwrite semantics — stale
    * shards from a previous layout must not survive next to new ones).
    *
    * Scale shape: one shuffle keyed on the shard; one shard's members
    * materialize in its writer task (the WebDataset convention — pick
    * nShards for ~1 GB shards). Executors open the filesystem from their
    * own Hadoop configuration (the standard cluster layout); local `file:`
    * paths need no configuration at all. Returns the (shard_id, n_samples)
    * census for the caller's manifest. */
  def writeWebdataset(df: DataFrame, keyCol: String, partsCol: String,
                      dir: String, nShards: Int): DataFrame = {
    val spark = df.sparkSession
    val target = new org.apache.hadoop.fs.Path(dir)
    val driverFs = target.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    driverFs.delete(target, true)
    driverFs.mkdirs(target): Unit
    // ship the SESSION's Hadoop configuration to the writer tasks (the
    // Warc convention) — a bare executor-side Configuration would drop
    // spark.hadoop.* settings (object-store credentials, endpoints) and
    // fail or write to the wrong filesystem
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val packed = graft.ext.Sampling.withShard(df, keyCol, nShards)
      .select(col("shard_id"), col(keyCol).cast("string").as("k"),
        col(partsCol).as("p"))
      .groupBy(col("shard_id"))
      .agg(collect_list(struct(col("k"), col("p"))).as("samples"),
        count(lit(1)).as("n_samples"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    packed.select(col("shard_id"), col("samples")).foreachPartition {
      (rows: Iterator[org.apache.spark.sql.Row]) =>
        if (rows.hasNext) {
          val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
            conf.value)
          rows.foreach { r =>
            val shard = r.getInt(0)
            val members = r.getSeq[org.apache.spark.sql.Row](1)
              .map(s0 => (s0.getString(0),
                s0.getMap[String, Array[Byte]](1)))
              .flatMap { case (k, parts) =>
                parts.toSeq.map { case (ext, bytes) => (s"$k.$ext", bytes) }
              }
              .sortBy(_._1)
            // byte-stability depends on a TOTAL member order: equal names
            // (a duplicate sample key upstream) would keep collect_list's
            // arrival order and silently break the checksummable contract
            members.iterator.sliding(2).foreach(w =>
              require(w.length < 2 || w(0)._1 != w(1)._1,
                s"duplicate sample member '${w(0)._1}' in shard $shard — " +
                  "sample keys must be unique"))
            val out = fs.create(new org.apache.hadoop.fs.Path(
              f"$dir/shard-$shard%05d.tar"), true)
            try writeArchive(members, out) finally out.close()
          }
        }
    }
    // the census is ≤ nShards rows by construction — materialize it and
    // release the packed frame NOW (leaving the release to a census
    // action would leak the cache for callers that ignore the return)
    val censusRows = packed.select(col("shard_id"), col("n_samples"))
      .orderBy("shard_id").collect().toSeq
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("shard_id",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("n_samples",
        org.apache.spark.sql.types.LongType, nullable = false)))
    packed.unpersist(false)
    spark.createDataFrame(
      spark.sparkContext.parallelize(censusRows, 1), schema)
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
    * being copied out. */
  private[etl] def parseTar(b: Array[Byte])
      : Option[Seq[(String, Array[Byte])]] = {
    if (b == null || b.length < 1024 || b.length % 512 != 0) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    var off = 0
    var bad = false
    var done = false
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
            val name0 = str(b, off, 100)
            val prefix = str(b, off + 345, 155)
            val name = if (prefix.isEmpty) name0 else prefix + "/" + name0
            val typ = b(off + 156)
            if (typ == '0'.toByte || typ == 0.toByte) {
              if (name.isEmpty) bad = true
              else out += ((name, java.util.Arrays.copyOfRange(
                b, off + 512, off + 512 + size.toInt)))
            }
            off += 512 + (((size + 511) / 512) * 512).toInt
          case _ => bad = true
        }
      }
    }
    if (bad || !done) None else Some(out.toSeq)
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
    members.foreach { case (name, data) =>
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
    bos.write(new Array[Byte](1024))
  }
}
