package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT for scan pruning — the `OPTIMIZE ZORDER BY`
  * capability of Delta/Iceberg-class table formats, expressed Spark-first.
  *
  * Why it matters at 100 TB: parquet scans prune row groups from footer
  * min/max statistics, but a table sorted on ONE column only clusters that
  * column — a predicate on any other column reads everything. Interleaving
  * the bits of several columns into one sort key (a Morton / Z-order curve)
  * gives every interleaved column locality at once: a range predicate on
  * ANY of them touches a contiguous-ish fraction of the curve, so most row
  * groups fall outside its min/max envelope and never leave the object
  * store. MeasureZorder quantifies it on sf0.1 lineitem: a 2-D predicate
  * scans ~N/k rows from a z-ordered layout vs ~N from a single-column sort.
  *
  * The key is pure integer bit arithmetic (shift/and/or — whole-stage
  * codegen primitives, no HOF, no UDF), deterministic and engine-exact, so
  * the catalog row (`etl_zorder_key`) is fully oracle-checked against the
  * same unrolled arithmetic in DuckDB.
  */
object Layout {

  /** Morton (Z-order) key: interleave the low `bits` bits of each column —
    * bit `i` of column `j` lands at output bit `i·d + j` (d = column
    * count), so co-located values in EVERY dimension produce nearby keys.
    * Inputs are clamped to `[0, 2^bits)` after a long cast (negative →
    * 0, over-range → max — a clamped coordinate still sorts correctly
    * relative to in-range ones; callers with signed/skewed domains should
    * pre-normalize, e.g. rank or bucket the column first). NULL in any
    * coordinate → NULL key (sorts last under Spark's default NULLS LAST,
    * i.e. a dedicated "unknown" region at the curve's end).
    *
    * `bits · cols.size` must fit a long's 63 value bits. 16 bits × 2-3
    * dims covers row-group-level pruning: the curve only has to separate
    * row groups (thousands per table), not individual rows. */
  def zorderKey(bits: Int, cols: Column*): Column = {
    require(cols.nonEmpty, "zorderKey needs at least one column")
    require(bits >= 1, s"bits must be positive: $bits")
    require(bits * cols.size <= 63,
      s"bits ($bits) x dims (${cols.size}) must fit a long's 63 value bits")
    val d = cols.size
    val max = (1L << bits) - 1
    val terms = for {
      (c, j) <- cols.zipWithIndex
      clamped = least(greatest(c.cast("long"), lit(0L)), lit(max))
      i <- 0 until bits
    } yield shiftleft(shiftright(clamped, i).bitwiseAND(lit(1L)), i * d + j)
    // greatest/least SKIP nulls (a null coordinate would silently clamp to
    // the origin) — guard explicitly so unknown coordinates stay unknown
    val anyNull = cols.map(_.isNull).reduce(_ or _)
    when(anyNull, lit(null).cast("long")).otherwise(terms.reduce(_ bitwiseOR _))
  }

  /** Monotone rescale of a long column from `[lo, hi]` onto the full
    * `[0, 2^bits)` coordinate range: `floor((x - lo) · 2^bits / span)`,
    * clamped. Interleaving RAW columns with unequal domains wastes curve
    * resolution — a 15-bit column interleaved with a 10-bit one puts the
    * key's entire top in the wide column's bits, degenerating the coarse
    * layout to a single-column sort (measured: the raw-key layout pruned
    * WORSE than a linear sort on sf0.1 lineitem). Rescaling both to the
    * full width balances the curve, the Delta OPTIMIZE approach (it
    * range-ranks columns for the same reason). Exact integer arithmetic:
    * (x-lo)·2^bits stays far under 2^53, so the double division is exact
    * enough to floor deterministically. */
  def scaleTo(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    val span = math.max(1L, hi - lo + 1)
    val raw = floor((c.cast("long") - lit(lo)) * lit(1L << bits) / lit(span))
      .cast("long")
    least(greatest(raw, lit(0L)), lit((1L << bits) - 1))
  }

  /** Cluster `df` on the z-order curve of `cols`: each column is min/max
    * rescaled to the full `bits`-wide range ([[scaleTo]] — one cheap
    * bounds aggregation), keys interleave the scaled coordinates, and the
    * frame is range-partitioned on the key (`numFiles` output splits, each
    * a contiguous curve segment — the segments are DISJOINT, so per-file
    * min/max envelopes never overlap on the key) and sorted within
    * partitions so row groups inside large files stay clustered too. The
    * caller writes the result; the key column is dropped — it exists to
    * shape the layout, not the data. */
  def zorderLayout(df: DataFrame, bits: Int, numFiles: Int,
                   cols: Column*): DataFrame = {
    require(numFiles >= 1, s"numFiles must be positive: $numFiles")
    val bounds = df.select(cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(c.cast("long")).as(s"lo$i"), max(c.cast("long")).as(s"hi$i"))
    }: _*).head
    val scaled = cols.zipWithIndex.map { case (c, i) =>
      if (bounds.isNullAt(2 * i)) c.cast("long") // all-null column: no scale
      else scaleTo(c, bounds.getLong(2 * i), bounds.getLong(2 * i + 1), bits)
    }
    val keyed = df.withColumn("__zkey", zorderKey(bits, scaled: _*))
    keyed.repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
  }

  /** Small-file compaction — the bin-packing half of lakehouse table
    * maintenance (OPTIMIZE in Delta, `rewrite_data_files` in Iceberg;
    * [[zorderLayout]] is the clustering half). Streaming sinks, per-batch
    * appends, and over-parallel writers drift a table toward thousands of
    * KB-scale files; at 100 TB that is scan-task and namenode poison (every
    * file = at least one split, one open, one footer read). This rewrites
    * `inDir`'s parquet as ceil(totalBytes / targetFileBytes) files into
    * `outDir`.
    *
    * SHUFFLE-FREE: the rewrite is a `coalesce`, which assigns input splits
    * to output tasks without an exchange — compaction is an IO rewrite and
    * must not pay a cluster-wide repartition of table-sized data
    * (LayoutSpec asserts the plan carries no Exchange). The trade: coalesce
    * concatenates whole input files per output task, so per-file min/max
    * envelopes can widen when non-adjacent inputs merge — compaction
    * preserves CONTENT and file economics, not clustering; re-cluster with
    * [[zorderLayout]] when the sort matters more than the rewrite cost.
    *
    * Sizing uses the INPUT byte total as the estimate of output bytes
    * (same codec/schema ⇒ close enough; row-group consolidation usually
    * shrinks output slightly, never pathologically). Writes to a fresh
    * `outDir` — pair with the atomic versioned-publish pattern
    * (`graft.etl.Pipeline`) to swap it in; never compact in place.
    *
    * Returns the number of output files planned. */
  def compactTo(spark: org.apache.spark.sql.SparkSession, inDir: String,
                outDir: String, targetFileBytes: Long): Int = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive: $targetFileBytes")
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(path, true)
    var totalBytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) totalBytes += f.getLen
    }
    val nOut = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes)
      .min(Int.MaxValue).toInt
    spark.read.parquet(inDir).coalesce(nOut)
      .write.mode("overwrite").parquet(outDir)
    nOut
  }

  /** Manifest-level DATA SKIPPING — the file-pruning half of Delta/Iceberg
    * scan avoidance ([[zorderLayout]] clusters; this SKIPS). Parquet's own
    * row-group pruning still opens every file to read its footer; at 100 TB
    * and object-store latencies the scan-task COUNT is the cost, so real
    * table formats keep per-file column envelopes in a separate manifest
    * and plan the file list BEFORE any file is opened. `writeWithManifest`
    * writes `df` and a `_graft_manifest.json` of per-file [min,max]
    * envelopes for `statsCols` (computed in ONE distributed pass over the
    * written files via `input_file_name`, not a per-file driver loop);
    * [[readPruned]] consults the manifest and hands Spark only the files
    * whose envelope intersects the predicate.
    *
    * Envelope stats are stored as STRINGS with a type tag per column
    * (numeric envelopes compare as longs, everything else lexically) — the
    * manifest must round-trip through JSON without engine-float drift.
    * Cluster the layout on the stats columns ([[zorderLayout]] or a range
    * partition) for tight envelopes; an unclustered write still answers
    * correctly, it just prunes nothing. */
  def writeWithManifest(spark: org.apache.spark.sql.SparkSession,
                        df: DataFrame, outDir: String,
                        statsCols: Seq[String]): Unit = {
    require(statsCols.nonEmpty, "writeWithManifest: no stats columns")
    df.write.mode("overwrite").parquet(outDir)
    val entries = manifestEntries(spark.read.parquet(outDir), statsCols)
    writeManifestText(spark, outDir, entries.mkString("[", ",\n", "]"))
  }

  /** APPEND a batch to a manifest-tracked table: write `df` in append
    * mode, compute envelopes for ONLY the newly written files (one
    * distributed pass over just the batch — existing data is never
    * re-read, which keeps stats maintenance O(batch) under streaming
    * ingest), and splice their entries into the manifest. Same stats and
    * escaping rules as [[writeWithManifest]]. Concurrent appends to one
    * directory need external serialization, like every file-listing
    * commit protocol without a lock service. */
  def appendWithManifest(spark: org.apache.spark.sql.SparkSession,
                         df: DataFrame, dir: String,
                         statsCols: Seq[String]): Unit = {
    require(statsCols.nonEmpty, "appendWithManifest: no stats columns")
    val dPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mPath = new org.apache.hadoop.fs.Path(dir, "_graft_manifest.json")
    require(fs.exists(mPath),
      s"no _graft_manifest.json under $dir — writeWithManifest first")
    def listParquet(): Set[String] = {
      val it = fs.listFiles(dPath, false)
      val b = Set.newBuilder[String]
      while (it.hasNext) {
        val f = it.next().getPath
        if (f.getName.endsWith(".parquet")) b += f.toString
      }
      b.result()
    }
    val before = listParquet()
    df.write.mode("append").parquet(dir)
    val fresh = (listParquet() -- before).toSeq.sorted
    if (fresh.isEmpty) return // empty batch: nothing to splice
    val entries = manifestEntries(spark.read.parquet(fresh: _*), statsCols)
    // an empty batch can still materialize zero-row part files; they have
    // no stats rows and carry no data, so they are simply not listed (the
    // manifest IS the table's file listing, Delta-log style)
    if (entries.isEmpty) return
    val old = readManifestText(spark, dir).trim
    val merged =
      if (old == "[]") entries.mkString("[", ",\n", "]")
      else old.stripSuffix("]") + ",\n" + entries.mkString(",\n") + "]"
    writeManifestText(spark, dir, merged)
  }

  /** One manifest entry per file of `src`: per-column [min,max] envelopes
    * (numeric via try_cast — ANSI-safe on lexical columns — else string),
    * gathered in a single `input_file_name`-keyed pass; the collect is one
    * row per FILE, bounded by file count, never by data. */
  private def manifestEntries(src: DataFrame,
                              statsCols: Seq[String]): Seq[String] = {
    val aggs = statsCols.flatMap { c =>
      Seq(min(col(c).cast("string")).as(s"_mn_$c"),
        max(col(c).cast("string")).as(s"_mx_$c"),
        min(col(c).try_cast("long")).as(s"_ln_$c"),
        max(col(c).try_cast("long")).as(s"_lx_$c"))
    }
    val stats = src
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    stats.toSeq.map { r =>
      val file = r.getString(0)
      val cols = statsCols.map { c =>
        val isNum = !r.isNullAt(r.fieldIndex(s"_ln_$c"))
        val (mnI, mxI) =
          if (isNum) (r.fieldIndex(s"_ln_$c"), r.fieldIndex(s"_lx_$c"))
          else (r.fieldIndex(s"_mn_$c"), r.fieldIndex(s"_mx_$c"))
        val mn = if (r.isNullAt(mnI)) null else String.valueOf(r.get(mnI))
        val mx = if (r.isNullAt(mxI)) null else String.valueOf(r.get(mxI))
        s"""{"col":${jsonStr(c)},"numeric":$isNum,"min":${jsonStr(mn)},"max":${jsonStr(mx)}}"""
      }.mkString("[", ",", "]")
      s"""{"file":${jsonStr(file)},"cols":$cols}"""
    }
  }

  /** Full JSON string escaping: a lexical envelope from real text can carry
    * newlines/tabs/control chars, and one raw control byte makes the whole
    * manifest unparseable for every later read. */
  private def jsonStr(s: String): String =
    if (s == null) "null"
    else s.flatMap {
      case '\\' => "\\\\"
      case '"' => "\\\""
      case c if c < 0x20 => f"\\u${c.toInt}%04x"
      case c => c.toString
    }.mkString("\"", "", "\"")

  /** Sidecar-file IO shared by the manifest and the bloom index: one
    * place for the create/write/close and open/read-loop/close edges. */
  private def writeSidecarText(spark: org.apache.spark.sql.SparkSession,
                               dir: String, name: String, text: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(text.getBytes("UTF-8")) finally out.close()
  }

  private def readSidecarText(spark: org.apache.spark.sql.SparkSession,
                              dir: String, name: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val bs = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { bs.write(buf, 0, n); n = in.read(buf) }
      bs.toString("UTF-8")
    } finally in.close()
  }

  private def writeManifestText(spark: org.apache.spark.sql.SparkSession,
                                dir: String, text: String): Unit =
    writeSidecarText(spark, dir, "_graft_manifest.json", text)

  private def readManifestText(spark: org.apache.spark.sql.SparkSession,
                               dir: String): String =
    readSidecarText(spark, dir, "_graft_manifest.json")

  /** Per-file BLOOM INDEX — equality-lookup file skipping for
    * high-cardinality columns, where [[writeWithManifest]]'s min/max
    * envelopes prune nothing (an unclustered id column spans the full
    * range in every file). Real table formats (Delta bloom indexes,
    * parquet bloom filters) answer "which files might contain key = v?"
    * from a compact per-file filter; a point lookup over a 100 TB table
    * then opens the ~1 file that can match instead of all of them.
    *
    * [[writeBloomIndex]] scans `dir` once, building one sized Bloom
    * filter per file (per-split partials OR-merge on the driver — the
    * index is file-count-bounded, the same order as the manifest itself;
    * a table whose file COUNT outgrows one driver shards its manifest,
    * and this index with it), serialized base64 into
    * `_graft_bloom.json`. [[readPrunedPoint]] keeps only the files whose
    * filter might contain the key — false positives cost a wasted file
    * open, never a wrong row, because the equality predicate always runs
    * on the scan (skipping is an optimization, never the filter). Null
    * keys are not indexed: NULL never equals a point lookup. Keys follow
    * the integral-id contract (cast to long). */
  def writeBloomIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                      keyCol: String, expectedPerFile: Long = 1L << 20,
                      fpp: Double = 0.03): Unit = {
    require(expectedPerFile > 0 && fpp > 0 && fpp < 1,
      s"bad bloom sizing: items=$expectedPerFile fpp=$fpp")
    import spark.implicits._
    import org.apache.spark.util.sketch.BloomFilter
    val partials = spark.read.parquet(dir)
      .where(col(keyCol).isNotNull)
      .select(input_file_name().as("f"), col(keyCol).cast("long").as("k"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val m = new scala.collection.mutable.HashMap[String, BloomFilter]
        it.foreach { case (f, k) =>
          m.getOrElseUpdate(f,
            BloomFilter.create(expectedPerFile, fpp)).putLong(k)
        }
        m.iterator.map { case (f, b) =>
          val bs = new java.io.ByteArrayOutputStream()
          b.writeTo(bs)
          (f, bs.toByteArray)
        }
      }
      .collect() // one blob per (file, split) — file-count-bounded
    val perFile = partials.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (f, blobs) =>
        val merged = BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(blobs.head._2))
        blobs.tail.foreach { case (_, bytes) =>
          merged.mergeInPlace(BloomFilter.readFrom(
            new java.io.ByteArrayInputStream(bytes)))
        }
        val bs = new java.io.ByteArrayOutputStream()
        merged.writeTo(bs)
        val b64 = java.util.Base64.getEncoder.encodeToString(bs.toByteArray)
        s"""{"file":${jsonStr(f)},"b64":"$b64"}"""
    }
    val text = s"""{"col":${jsonStr(keyCol)},"files":[${perFile.mkString(",\n")}]}"""
    writeSidecarText(spark, dir, "_graft_bloom.json", text)
  }

  /** Point-lookup read via the Bloom index: plan only the files whose
    * filter might contain `value`, then apply the equality predicate on
    * the scan. The index IS the table's file listing (the
    * [[readPruned]]/Delta-log convention — re-run [[writeBloomIndex]]
    * after appends); `df.inputFiles` exposes the planned file count. */
  def readPrunedPoint(spark: org.apache.spark.sql.SparkSession, dir: String,
                      keyCol: String, value: Long): DataFrame = {
    import org.apache.spark.util.sketch.BloomFilter
    val bPath = new org.apache.hadoop.fs.Path(dir, "_graft_bloom.json")
    val fs = bPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(bPath), s"no _graft_bloom.json under $dir — writeBloomIndex first")
    val json = readSidecarText(spark, dir, "_graft_bloom.json")
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val parsed = JsonMethods.parse(json)
    val indexedCol = parsed \ "col" match {
      case JString(c) => c
      case _ => throw new IllegalArgumentException(
        s"malformed _graft_bloom.json under $dir")
    }
    require(indexedCol == keyCol,
      s"bloom index under $dir covers '$indexedCol', not '$keyCol'")
    val indexed = for {
      JObject(entry) <- (parsed \ "files")
      ("file", JString(f)) <- entry
      ("b64", JString(b64)) <- entry
    } yield f -> b64
    require(indexed.nonEmpty, s"bloom index under $dir lists no files")
    val kept = indexed.collect {
      case (f, b64) if BloomFilter.readFrom(new java.io.ByteArrayInputStream(
          java.util.Base64.getDecoder.decode(b64))).mightContainLong(value) => f
    }
    val out =
      if (kept.isEmpty) spark.read.parquet(indexed.head._1).where(lit(false))
      else spark.read.parquet(kept: _*)
    out.where(col(keyCol).cast("long") === value)
  }

  /** DELETION VECTORS — the soft-delete half of lakehouse mutation
    * (Delta's deletion vectors, Iceberg's equality deletes), expressed
    * Spark-first as EQUALITY deletes on a key column. Deleting from
    * immutable columnar files by rewriting them is O(table) per delete; at
    * 100 TB a GDPR erasure request cannot pay that. Instead the deleted
    * keys are APPENDED to a side store (`_graft_deletes/` — the leading
    * underscore makes it invisible to plain parquet reads of the data
    * dir, exactly how `_graft_manifest.json` hides), reads subtract them
    * with a broadcast anti-join ([[readWithDeletes]] — the delete set is
    * small relative to data by construction, so the apply is exchange-free
    * on the data side), and a periodic [[compactDeletes]] physically
    * rewrites the survivors, clearing the vector. Logical and physical
    * reads MUST agree — the catalog row `etl_delete_vectors` gates both
    * stages against one oracle filter.
    *
    * Null keys never match (SQL anti-join semantics): deletion keys are
    * primary keys and a null PK row is upstream breakage, not a deletable
    * identity. Appends to one dir need external serialization, like every
    * file-listing commit protocol without a lock service. */
  def markDeleted(spark: org.apache.spark.sql.SparkSession, dir: String,
                  keys: DataFrame): Unit = {
    require(keys.columns.length == 1,
      s"markDeleted wants exactly one key column, got ${keys.columns.mkString(",")}")
    // canonicalize the column name at WRITE time: batches marked under
    // different caller names would otherwise land as different parquet
    // schemas in one store, and a non-mergeSchema read nulls the minority
    // name — silently resurrecting deleted rows
    keys.toDF("__del_key").write.mode("append").parquet(s"$dir/_graft_deletes")
  }

  /** Read `dir` with its deletion vector applied: data rows whose `pkCol`
    * appears in `_graft_deletes/` are subtracted via a left-anti join (the
    * vector is deduplicated first — overlapping delete batches are the
    * normal case). No vector dir ⇒ a plain read.
    *
    * The anti-join is broadcast only while the vector's on-disk size stays
    * under `maxBroadcastBytes` (64 MB default — the usual case: deletes
    * are tiny relative to data, so the apply is exchange-free on the data
    * side). A vector that has grown past the bound — mass erasure backlog,
    * compaction overdue — falls back to a shuffled anti-join instead of
    * risking the driver on a forced broadcast; that state is also the
    * signal to run [[compactDeletes]]. The size probe reads file lengths
    * only, never data. */
  def readWithDeletes(spark: org.apache.spark.sql.SparkSession, dir: String,
                      pkCol: String,
                      maxBroadcastBytes: Long = 64L << 20): DataFrame = {
    val data = spark.read.parquet(dir)
    val dvPath = new org.apache.hadoop.fs.Path(dir, "_graft_deletes")
    val fs = dvPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dvPath)) return data
    val dvBytes = fs.getContentSummary(dvPath).getLength
    val dv = spark.read.parquet(dvPath.toString)
      .select(col("__del_key")).distinct()
    val build = if (dvBytes <= maxBroadcastBytes) broadcast(dv) else dv
    data.join(build, data(pkCol) === dv("__del_key"), "left_anti")
  }

  /** Physically apply the deletion vector: rewrite the survivors of `dir`
    * into a fresh `outDir` with NO vector (reads of `outDir` are plain
    * scans again). Pair with the atomic versioned-publish pattern to swap
    * it in — never compact in place. */
  def compactDeletes(spark: org.apache.spark.sql.SparkSession, dir: String,
                     outDir: String, pkCol: String): Unit =
    readWithDeletes(spark, dir, pkCol)
      .write.mode("overwrite").parquet(outDir)

  /** Read `dir` with manifest file skipping: keep only the files whose
    * [min,max] envelope for `statsCol` intersects `[lo, hi]` (null
    * envelopes — all-null or absent stats — are conservatively KEPT), and
    * apply the residual predicate on the scan (skipping is an optimization,
    * never the filter). Returns the pruned frame; `df.inputFiles` exposes
    * how many files survived — the number a 100 TB table plans scan tasks
    * from. */
  def readPruned(spark: org.apache.spark.sql.SparkSession, dir: String,
                 statsCol: String, lo: Long, hi: Long): DataFrame = {
    require(lo <= hi, s"empty range: [$lo, $hi]")
    val mPath = new org.apache.hadoop.fs.Path(dir, "_graft_manifest.json")
    val fs = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(mPath), s"no _graft_manifest.json under $dir")
    val json = readManifestText(spark, dir)
    // json4s ships with Spark — parse the manifest structurally instead of
    // regex-scraping the serialization
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val parsed = JsonMethods.parse(json)
    def str(v: JValue): Option[String] = v match {
      case JString(s) => Some(s)
      case _ => None
    }
    val kept = (for {
      JObject(entry) <- parsed
      ("file", JString(file)) <- entry
    } yield {
      val colsV = entry.collectFirst { case ("cols", JArray(cs)) => cs }
        .getOrElse(Nil)
      val keep = colsV.collectFirst {
        case JObject(cf) if cf.contains(("col", JString(statsCol))) =>
          val numeric = cf.collectFirst { case ("numeric", JBool(b)) => b }
            .getOrElse(false)
          val mn = cf.collectFirst { case ("min", v) => v }.flatMap(str)
          val mx = cf.collectFirst { case ("max", v) => v }.flatMap(str)
          (mn, mx) match {
            case (Some(a), Some(b)) if numeric =>
              b.toLong >= lo && a.toLong <= hi // envelope intersects range
            case (Some(_), Some(_)) => true // lexical stats: numeric range N/A
            case _ => true // null envelope (all-null column): keep
          }
      }.getOrElse(true) // column not in manifest: keep conservatively
      (file, keep)
    })
    require(kept.nonEmpty, s"manifest under $dir lists no files")
    val files = kept.collect { case (f, true) => f }
    if (files.isEmpty)
      return spark.read.parquet(kept.head._1).where(lit(false)) // schema, no rows
    val out = spark.read.parquet(files: _*)
    // a numeric range over a non-numeric column is caller misuse: fail
    // loudly here rather than crash at scan time (ANSI cast) or silently
    // return zero rows (try_cast) — either of which would masquerade as a
    // pruning result
    out.schema(statsCol).dataType match {
      case _: org.apache.spark.sql.types.NumericType => ()
      case other => throw new IllegalArgumentException(
        s"readPruned needs a numeric statsCol for a [lo, hi] range " +
          s"(got $statsCol: ${other.sql})")
    }
    out.where(col(statsCol).cast("long").between(lo, hi))
  }
}
