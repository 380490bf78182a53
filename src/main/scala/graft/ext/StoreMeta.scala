package graft.ext

import org.apache.spark.sql.SparkSession

/** Geometry manifest for SERVED stores — the contract that travels WITH
  * the state.
  *
  * Every materialized index in this library (the banded minhash store, the
  * perceptual-fingerprint store, pinned IVF centroids, the prebuilt HNSW
  * frame) bakes construction parameters into its ROWS but, without this,
  * persisted nothing that says WHICH parameters: probing a 16-hash banded
  * store with numHashes=8, or a dHash store with audio prints, just joins
  * on (band, v) and returns near-zero matches — missed duplicates, no
  * error. The sidecar (`_graft_store_meta.json`, the `_graft_manifest.json`
  * convention from [[Layout]]) records the store kind and its geometry
  * fields; `check` fails LOUDLY on any drift, listing every mismatched
  * field, so a wrong-geometry probe is an exception instead of a silent
  * wrong answer.
  *
  * Values are restricted to a conservative token alphabet at write time —
  * the sidecar is engine-portable JSON that round-trips through a
  * five-line parser, and geometry values (ints, family names, tokenizer
  * ids) never need more. */
object StoreMeta {

  /** Sidecar filename, next to the store's data files. */
  val FileName = "_graft_store_meta.json"

  private val TokenRe = "[A-Za-z0-9._:+-]*".r

  private def requireToken(s: String, what: String): Unit =
    require(TokenRe.matches(s),
      s"store-meta $what must match ${TokenRe.regex}: '$s'")

  /** Write the sidecar (overwrites — geometry is immutable for a store's
    * lifetime, so a rewrite only ever restates the same contract). */
  def write(spark: SparkSession, dir: String, kind: String,
            fields: Map[String, String]): Unit = {
    requireToken(kind, "kind")
    fields.foreach { case (k, v) =>
      requireToken(k, "field name"); requireToken(v, s"field '$k' value")
    }
    val json = fields.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":"$v"""" }
      .mkString(s"""{"kind":"$kind","fields":{""", ",", "}}")
    val p = new org.apache.hadoop.fs.Path(dir, FileName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  /** Read the sidecar: Some((kind, fields)) or None when absent (a legacy
    * store written before the convention). */
  def read(spark: SparkSession, dir: String)
      : Option[(String, Map[String, String])] = {
    val p = new org.apache.hadoop.fs.Path(dir, FileName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val json =
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    // token-alphabet values by construction: every "k":"v" pair is literal
    val pairs = "\"([A-Za-z0-9._:+-]*)\"\\s*:\\s*\"([A-Za-z0-9._:+-]*)\"".r
      .findAllMatchIn(json).map(m => m.group(1) -> m.group(2)).toSeq
    val kind = pairs.collectFirst { case ("kind", v) => v }
      .getOrElse(sys.error(s"malformed $FileName under $dir: $json"))
    Some((kind, pairs.filterNot(_._1 == "kind").toMap))
  }

  /** Verify a store's sidecar against the geometry a probe is about to
    * assume. Throws with the FULL field diff on any drift; a missing
    * sidecar is also loud (probing unknown geometry is the silent-miss
    * hole this exists to close — re-write the store with its `*Write`/
    * `*Save` API, or `write` the sidecar by hand for a legacy store). */
  def check(spark: SparkSession, dir: String, kind: String,
            expected: Map[String, String]): Unit = {
    val (gotKind, got) = read(spark, dir).getOrElse(sys.error(
      s"no $FileName under $dir — cannot verify probe geometry; " +
        s"expected kind=$kind ${fmt(expected)}. Write the store with its " +
        "meta-writing API (or StoreMeta.write a sidecar for legacy state)."))
    require(gotKind == kind,
      s"store kind mismatch under $dir: store is '$gotKind', probe " +
        s"expects '$kind'")
    val drifted = expected.toSeq.sortBy(_._1).flatMap { case (k, v) =>
      got.get(k) match {
        case Some(`v`) => None
        case Some(other) => Some(s"$k: store=$other probe=$v")
        case None => Some(s"$k: store=<absent> probe=$v")
      }
    }
    require(drifted.isEmpty,
      s"store geometry mismatch under $dir (kind=$kind) — probing with " +
        s"drifted parameters returns silently near-empty matches, refusing: " +
        drifted.mkString("; "))
  }

  private def fmt(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("{", ", ", "}")

  /** Compact a served store DIRECTORY in place: rewrite the parquet part
    * files of the current snapshot into `targetFiles` files. Rows are
    * preserved exactly (no re-capping, no dedup — a probe before and after
    * is identical by construction) and the geometry sidecar, a Dictionary
    * lexicon sidecar, and any other `_`-prefixed metadata are untouched,
    * so the store's contract survives verbatim.
    *
    * Why it exists: `*AppendAt` maintenance parquet-APPENDS each batch —
    * a year of hourly batches is ~10k file groups, and at 100 TB the probe
    * pays that in driver listing time and task-launch overhead long before
    * it pays it in bytes. Compaction is the standard counter-move
    * (Delta OPTIMIZE / Iceberg rewrite_data_files), done here at the
    * directory-store level.
    *
    * Concurrency: the swap replaces EXACTLY the files the snapshot read
    * (`inputFiles`), so a batch appended WHILE compaction runs is neither
    * read nor deleted — append-during-compact loses nothing. Compacted
    * files move IN before the snapshot is deleted, so a reader racing the
    * swap can transiently double-see rows, never lose them; run probes in
    * the same maintenance window discipline as any parquet-dir rewrite.
    * The rewrite staging dir is `_`-prefixed, invisible to parquet dir
    * readers.
    *
    * Returns the number of snapshot files rewritten (0 = already at or
    * under `targetFiles`, nothing touched). */
  def compact(spark: SparkSession, dir: String, targetFiles: Int = 1): Long = {
    require(targetFiles >= 1, s"targetFiles must be >= 1: $targetFiles")
    // the sidecar is the proof this is a served store, not an arbitrary
    // parquet dir a caller is about to rewrite by accident
    read(spark, dir).getOrElse(sys.error(
      s"no $FileName under $dir — compact() maintains SERVED stores; " +
        "write the store with its meta-writing API first"))
    val df = spark.read.parquet(dir)
    val snapshot = df.inputFiles
    if (snapshot.length <= targetFiles) return 0L
    swapRewrite(spark, dir, df.repartition(targetFiles), snapshot)
    snapshot.length.toLong
  }

  /** Delete rows from a served store DIRECTORY: every row whose `idCol`
    * appears in `ids` (a one-column frame) is removed, with the same
    * in-place snapshot swap as [[compact]] (sidecars untouched, files not
    * in the snapshot neither read nor deleted, move-in before delete).
    * This is the right-of-erasure / retract-bad-entity maintenance op the
    * append-only store family otherwise lacks.
    *
    * Semantics are ROW deletion, deliberately: for a capped banded store,
    * removing a bucket representative does NOT re-admit another entity
    * (non-representative signatures were never persisted — re-derive from
    * the corpus and rebuild if occupancy must be restored); recall for the
    * remaining entities is unchanged, and deleted entities simply stop
    * being matchable. The rewrite keeps the snapshot's file count (a
    * 100 TB store is not collapsed to one file by a deletion); follow with
    * [[compact]] if the delete was large.
    *
    * Returns the number of rows deleted. */
  def delete(spark: SparkSession, dir: String, ids: org.apache.spark.sql
             .DataFrame, idCol: String): Long = {
    read(spark, dir).getOrElse(sys.error(
      s"no $FileName under $dir — delete() maintains SERVED stores; " +
        "write the store with its meta-writing API first"))
    require(ids.columns.length == 1,
      s"ids must be a ONE-column frame of keys to delete, got " +
        s"${ids.columns.mkString("(", ", ", ")")}")
    val df = spark.read.parquet(dir)
    require(df.columns.contains(idCol),
      s"store under $dir has no column '$idCol' " +
        s"(columns: ${df.columns.mkString(", ")})")
    val snapshot = df.inputFiles
    val key = ids.columns.head
    val victims = ids.select(org.apache.spark.sql.functions
      .col(key).as(idCol)).distinct()
    // erasure requests routinely name already-gone ids: a semi-join count
    // decides whether anything matches BEFORE paying the full-store
    // rewrite (the count is one scan; the rewrite is scan + write + swap)
    val hit = df.join(victims, Seq(idCol), "left_semi").count()
    if (hit == 0) return 0L
    val kept = df.join(victims, Seq(idCol), "left_anti")
    swapRewrite(spark, dir, kept.repartition(snapshot.length), snapshot)
    hit
  }

  /** The in-place snapshot swap shared by [[compact]] and [[delete]]:
    * write `out` to a `_`-prefixed staging dir (invisible to parquet dir
    * readers), move its part files IN, then delete exactly the snapshot's
    * files — a concurrent append is neither read nor deleted, and a
    * racing reader can transiently double-see rows, never lose them. */
  private def swapRewrite(spark: SparkSession, dir: String,
                          out: org.apache.spark.sql.DataFrame,
                          snapshot: Array[String]): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(dir, "_graft_rewrite_tmp")
    out.write.mode("overwrite").parquet(tmp.toString)
    val moved = fs.listStatus(tmp)
      .filter(_.getPath.getName.startsWith("part-"))
    require(moved.nonEmpty, s"store rewrite wrote no part files under $tmp")
    moved.foreach { f =>
      val to = new org.apache.hadoop.fs.Path(dir, f.getPath.getName)
      require(fs.rename(f.getPath, to), s"store rewrite move failed: $to")
    }
    snapshot.foreach { uri =>
      fs.delete(new org.apache.hadoop.fs.Path(new java.net.URI(uri)),
        false): Unit
    }
    fs.delete(tmp, true): Unit
  }
}
