package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end batch star build with atomic, incremental publish
  * (SURVEY §2 rows 8-10, 38; §7.4 item 4).
  *
  * The reference gets atomicity from a single psycopg2 transaction over 21
  * statements with rollback-on-error
  * (`lambda_redshift/lambda_function_redishift.py:171-183`) and idempotency
  * from anti-join/MERGE on natural keys. We replicate both with a
  * manifest-versioned filesystem layout, shaped like a miniature table
  * format (what Delta/Iceberg do at full scale):
  *
  * {{{
  * <root>/facts/batch_<id>/*.parquet   append-only, immutable fact deltas
  * <root>/versions/v<N>/dim_*/…        full (tiny) dim snapshots
  * <root>/versions/v<N>/manifest.txt   maxFactId + fact batch list
  * <root>/CURRENT                      pointer to the live version
  * }}}
  *
  * Why this shape at 100 TB: a batch writes ONLY its fact delta (O(batch))
  * and rewrites the dims (tiny by construction) — the earlier design
  * rewrote the whole fact per batch, O(total), which caps out fast. Data
  * files are immutable and shared across versions; publish is one version-
  * dir rename + one CURRENT pointer swap, COMMITTED by an atomic
  * create-if-absent claim on the version name (versions/v<N>.claim) so two
  * concurrent writers serialize — the loser recomputes on the winner's
  * version instead of clobbering it (optimistic concurrency, the
  * Delta/Iceberg commit shape). A crash mid-batch leaves the live version
  * untouched (at worst an orphan `facts/batch_*` dir that the next run of
  * the same batch id overwrites); a crash between rename and pointer swap
  * leaves a complete version the next writer repairs forward to. Replaying
  * a batch id already in the manifest is a no-op — exactly-once on top of
  * the file-source's at-least-once redelivery (SURVEY §2 row 37).
  *
  * Delta/staging tables (`*_dlt`, `staging`,
  * `lambda_function_redishift.py:57-69,87-91` + the 5 TRUNCATEs at
  * `:164-168`) have no persistent equivalent — per-batch DataFrames are
  * ephemeral by construction, the Spark-native restatement of "truncate
  * after merge".
  */
/** @param autoCompactAfter compact automatically when a publish leaves more
  *                         than this many live fact-delta dirs (the union
  *                         plan and file listing grow linearly with them);
  *                         `Int.MaxValue` disables. Compaction preserves the
  *                         `applied` replay guard.
  * @param retainVersions   how many published versions stay readable for
  *                         time travel ([[readVersion]]). The default 1
  *                         keeps only the live version (the pre-time-travel
  *                         behavior); larger values retain history — cheap,
  *                         because a version dir is tiny dim snapshots plus
  *                         a manifest, and fact delta files are immutable
  *                         and SHARED across versions (only compaction ever
  *                         rewrites fact bytes). */
class StarStore(spark: SparkSession, root: String,
                autoCompactAfter: Int = StarStore.DefaultAutoCompactAfter,
                retainVersions: Int = 1) {
  import StarStore._
  require(retainVersions >= 1, s"retainVersions out of range: $retainVersions")

  private val fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ── version bookkeeping ──────────────────────────────────────────────────

  /** Live version, from CURRENT; falls back to the highest versions/v* dir
    * (covers a crash in the tiny delete→rename window of the pointer swap). */
  private def currentVersion: Option[String] = {
    val cur = new Path(s"$root/CURRENT")
    val fromPointer =
      if (fs.exists(cur)) {
        val in = fs.open(cur)
        try Some(new String(in.readAllBytes(), "UTF-8").trim).filter(_.nonEmpty)
        finally in.close()
      } else None
    fromPointer.orElse {
      val vdir = new Path(s"$root/versions")
      if (!fs.exists(vdir)) None
      else fs.listStatus(vdir).map(_.getPath.getName)
        .filter(_.matches("v\\d+"))
        // complete (manifest-bearing) dirs only — crash debris never wins
        .filter(v => fs.exists(new Path(s"${versionDir(v)}/manifest.txt")))
        .sorted.lastOption
    }
  }

  def exists: Boolean = currentVersion.isDefined

  private def versionDir(v: String) = s"$root/versions/$v"

  private def manifest(v: String): Manifest = {
    val in = fs.open(new Path(s"${versionDir(v)}/manifest.txt"))
    val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val kv = text.linesIterator.map(_.split("=", 2)).collect {
      case Array(k, v1) => k -> v1
    }.toMap
    val live = kv.getOrElse("batches", "").split(",").filter(_.nonEmpty).toSeq
    Manifest(kv("maxFactId").toLong, live,
      // `applied` tracks every batch id ever published (for the replay
      // guard), surviving compaction that rewrites the live list; absent in
      // pre-compaction manifests, where live == applied.
      kv.get("applied").map(_.split(",").filter(_.nonEmpty).toSeq).getOrElse(live),
      // `factSchema` is the version's fact column contract (DDL) — absent
      // in pre-evolution manifests, where every delta shares one schema
      kv.get("factSchema").filter(_.nonEmpty))
  }

  // ── read side ────────────────────────────────────────────────────────────

  private def readTable(name: String): DataFrame = {
    val v = currentVersion.getOrElse(sys.error(s"empty star store at $root"))
    spark.read.parquet(s"${versionDir(v)}/$name")
  }

  def dimDate: DataFrame = readTable("dim_date")
  def dimPlatform: DataFrame = readTable("dim_platform")
  def dimSite: DataFrame = readTable("dim_site")
  def dimTitle: DataFrame = readTable("dim_title")

  /** The fact = union of the immutable per-batch delta files listed in the
    * live manifest (never a rewritten monolith). Each batch dir is its own
    * day-partitioned parquet root, so they are read separately and unioned
    * (a shared read would mis-parse `batch_*` as partition dirs); partition
    * pruning on `day` still applies inside every branch. At high batch
    * counts, compact old deltas into one dir — the manifest makes that a
    * metadata-only swap. */
  def fact: DataFrame = {
    val v = currentVersion.getOrElse(sys.error(s"empty star store at $root"))
    factOf(v)
  }

  private def factOf(v: String): DataFrame = {
    val m = manifest(v)
    val deltas = m.batches.map(b => spark.read.parquet(s"$root/facts/batch_$b"))
    m.factSchema match {
      case None => deltas.reduce(_.unionByName(_)) // pre-evolution: one schema
      case Some(ddl) =>
        // SCHEMA RECONCILIATION (the Delta/Iceberg add-nullable-column
        // read): the manifest's DDL is the version's column contract; a
        // delta written before a column existed null-fills it at its
        // recorded type. Present columns keep their read-back type (the
        // partition column's inferred type must stay whatever the scan
        // gives, exactly as the pre-evolution union behaved).
        val target = org.apache.spark.sql.types.StructType.fromDDL(ddl)
        deltas.map { df =>
          val have = df.schema.fields.map(f => f.name -> f.dataType).toMap
          df.select(target.fields.toSeq.map { f =>
            have.get(f.name) match {
              case Some(f.dataType) => col(f.name)
              // a pre-widening delta carries the narrower published type:
              // up-cast to the recorded (lossless-widened) contract
              case Some(_) => col(f.name).cast(f.dataType).as(f.name)
              case None => lit(null).cast(f.dataType).as(f.name)
            }
          }: _*)
        }.reduce(_.unionByName(_))
    }
  }

  // ── time travel ──────────────────────────────────────────────────────────

  /** Versions still on disk, ascending — the readable time-travel range
    * (bounded by `retainVersions`; [[sweepVersions]] prunes older ones). */
  def versions: Seq[Long] = {
    val vdir = new Path(s"$root/versions")
    if (!fs.exists(vdir)) Seq.empty
    else fs.listStatus(vdir).map(_.getPath.getName)
      .filter(_.matches("v\\d+"))
      // COMPLETE (manifest-bearing) dirs only — the same debris filter
      // currentVersion/repairPointer apply. A manifest-less v-dir is a
      // crashed claimer's leftovers, not a version: counting it toward
      // the retention window would let sweepVersions delete the LIVE
      // version and then fail reading the debris manifest.
      .filter(v => fs.exists(new Path(s"${versionDir(v)}/manifest.txt")))
      .map(_.drop(1).toLong).sorted.toSeq
  }

  /** Read a table AS OF a published version — the snapshot-isolation read
    * the versioned layout was built to serve (what `table@v<N>` is in a
    * full table format). `name` is one of `dim_date`, `dim_platform`,
    * `dim_site`, `dim_title`, `fact`. The fact at version N is the union
    * of exactly the delta dirs its manifest listed — immutable files, so
    * the result is bit-stable no matter how many batches published since.
    * Fails with the retained range if the version has been swept. */
  def readVersion(name: String, version: Long): DataFrame = {
    val v = f"v$version%08d"
    require(fs.exists(new Path(versionDir(v))),
      s"version $version not retained at $root " +
        s"(retained: ${versions.mkString(",")})")
    if (name == "fact") factOf(v)
    else spark.read.parquet(s"${versionDir(v)}/$name")
  }

  /** Retention sweep: keep the newest `retainVersions` version dirs, delete
    * older ones, then reclaim fact delta dirs referenced by NO surviving
    * manifest (delta files are shared across versions, so a dir is only
    * reclaimable once every retained version stopped referencing it —
    * i.e. after a compaction ages out of the window). Runs automatically
    * after every publish; idempotent and safe to call any time. */
  def sweepVersions(): Unit = {
    // ONE listing, one manifest probe per dir, classifying committed vs
    // debris (on an object store every exists() is an RPC — re-deriving
    // `versions` here would double the LIST + HEAD cost per publish)
    val vdir = new Path(s"$root/versions")
    val entries =
      if (fs.exists(vdir))
        fs.listStatus(vdir).filter(_.getPath.getName.matches("v\\d+")).toSeq
      else Seq.empty
    val (committed, debris) = entries.partition(st =>
      fs.exists(new Path(s"${versionDir(st.getPath.getName)}/manifest.txt")))
    // retention window over COMMITTED versions only — a manifest-less dir
    // is a crashed claimer's leftovers, not a version; counting it would
    // let the sweep delete the LIVE version
    val vs = committed.map(_.getPath.getName.drop(1).toLong).sorted
    vs.dropRight(retainVersions).foreach { v =>
      fs.delete(new Path(versionDir(f"v$v%08d")), true)
      fs.delete(claimPath(f"v$v%08d"), false): Unit // retire its claim marker
    }
    // Reclaim crash DEBRIS, age-gated by the claim staleness window so a
    // live writer's in-flight (non-atomic) copy is never hit; clearing it
    // frees the name for publishVersion's own debris check.
    debris.foreach { st =>
      if (System.currentTimeMillis() - st.getModificationTime >
            StarStore.StaleClaimMs &&
          // re-probe AT DELETE TIME: the classification above is seconds
          // old on an object store, and a publisher may have reclaimed
          // the name and COMMITTED since — a manifest now present means
          // live data, not debris
          !fs.exists(new Path(
            s"${versionDir(st.getPath.getName)}/manifest.txt"))) {
        // the manifest probe narrows but does not close the window: a
        // publisher that reclaimed the name AFTER our listing can be
        // mid-rename (dir recreated, manifest not yet in place). Re-fetch
        // the dir's status and re-apply the age gate to the FRESH mtime —
        // a reclaimed dir is young and gets skipped until it either
        // commits (manifest probe protects it) or goes stale again.
        val fresh =
          try Some(fs.getFileStatus(st.getPath))
          catch { case _: java.io.FileNotFoundException => None }
        fresh.foreach { f =>
          if (System.currentTimeMillis() - f.getModificationTime >
              StarStore.StaleClaimMs)
            fs.delete(st.getPath, true): Unit
        }
      }
    }
    val retained = vs.takeRight(retainVersions).map(v => manifest(f"v$v%08d"))
    val referenced = retained.flatMap(_.batches).toSet
    // Reclaim rules, concurrency-safe: a delta dir is deletable when it is
    // UNREFERENCED by every retained manifest AND either (a) its batch id
    // is in the `applied` history — a published delta whose compaction
    // aged out of the retention window — or (b) it is older than the
    // staleness window — a crashed attempt's orphan. Rule (b) alone would
    // also hit a CONCURRENT writer's in-flight delta (written seconds ago,
    // referenced by no manifest yet): deleting it would let that writer
    // publish a manifest pointing at vanished data — the silent-corruption
    // case the claim protocol exists to prevent. Staged `_tmp_` dirs are
    // attempt-scoped and reclaimed by age alone.
    val applied = retained.flatMap(_.applied).toSet
    val now = System.currentTimeMillis()
    val fdir = new Path(s"$root/facts")
    if (fs.exists(fdir)) fs.listStatus(fdir).foreach { st =>
      val name = st.getPath.getName
      def stale = now - st.getModificationTime > StarStore.StaleClaimMs
      if (name.startsWith("batch_")) {
        val id = name.stripPrefix("batch_")
        if (!referenced.contains(id) && (applied.contains(id) || stale))
          fs.delete(st.getPath, true): Unit
      } else if (name.startsWith("_tmp_") && stale) {
        fs.delete(st.getPath, true): Unit
      }
    }
  }

  // ── write side ───────────────────────────────────────────────────────────

  private def writeManifest(dir: String, m: Manifest): Unit = {
    val out = fs.create(new Path(s"$dir/manifest.txt"), true)
    try out.write(m.serialized.getBytes("UTF-8")) finally out.close()
  }

  /** Rename a staged version dir into place — the COMMIT POINT of the
    * claim protocol. The destination cannot exist: [[claimVersion]] grants
    * the name exclusively, and a committed version dir is never deleted
    * (a crash after this rename but before the pointer swap leaves a
    * COMPLETE version that [[repairPointer]] advances to — the batch is
    * committed, not orphaned). An existing destination therefore means the
    * claim protocol was bypassed; failing loudly beats clobbering a
    * concurrent winner's commit. */
  private def publishVersion(tmp: String, nextV: String): Unit = {
    val dest = new Path(versionDir(nextV))
    if (fs.exists(dest)) {
      // a manifest marks a COMMITTED version — renaming over one would
      // clobber a concurrent winner, so that is a protocol violation.
      // A manifest-LESS dir is crash debris (a non-atomic object-store
      // "rename" that died mid-copy, or manual interference): no reader
      // can resolve it, and we own the claim — clear it and commit.
      require(!fs.exists(new Path(s"${versionDir(nextV)}/manifest.txt")),
        s"version $nextV already committed at $root — claim protocol violated")
      fs.delete(dest, true)
    }
    require(fs.rename(new Path(tmp), dest),
      s"version publish failed: $tmp -> $nextV")
  }

  // ── optimistic-concurrency commit (claim files) ───────────────────────────
  //
  // Two concurrent runBatch callers must SERIALIZE, not lose an update: the
  // loser recomputes on the winner's published version instead of clobbering
  // it. The primitive is an atomic create-if-absent CLAIM file
  // (versions/v<N>.claim): whoever creates it owns the right to rename its
  // staged dir to versions/v<N>. Claims are taken LATE (right before the
  // rename), so a claim's lifetime is milliseconds; a claim with no version
  // dir older than StaleClaimMs is a crashed claimer and is broken. Claim
  // content is a per-writer token re-checked immediately before the rename,
  // so a broken-and-reclaimed name aborts the original writer instead of
  // racing two renames onto one destination.

  /** Atomically claim `nextV`; Some(writer token) on success, None when the
    * name is already claimed (lost the race). On a `file:` store the create
    * uses O_EXCL via NIO (Hadoop's RawLocalFileSystem create-if-absent is
    * check-then-act, not atomic); elsewhere `FileSystem.create(overwrite =
    * false)` — atomic on HDFS and object stores with conditional puts. */
  private def claimVersion(nextV: String): Option[String] = {
    val claim = claimPath(nextV)
    fs.mkdirs(claim.getParent)
    val token = java.util.UUID.randomUUID().toString
    val created =
      if (fs.getScheme == "file")
        try {
          java.nio.file.Files.write(
            java.nio.file.Paths.get(claim.toUri.getPath),
            token.getBytes("UTF-8"),
            java.nio.file.StandardOpenOption.CREATE_NEW)
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case _: java.io.IOException =>
            // CREATE_NEW succeeded but the write died: the torn claim is
            // OURS — remove it, or it wedges the name for StaleClaimMs as
            // an orphan no writer owns (the caller sees a clean lost-race
            // and retries)
            try java.nio.file.Files.deleteIfExists(
              java.nio.file.Paths.get(claim.toUri.getPath)): Unit
            catch { case _: java.io.IOException => () }
            false
        }
      else {
        var out: org.apache.hadoop.fs.FSDataOutputStream = null
        try {
          out = fs.create(claim, false) // throws when already claimed
          out.write(token.getBytes("UTF-8"))
          out.close(); out = null
          true
        } catch {
          case _: java.io.IOException =>
            if (out != null) {
              // create-if-absent SUCCEEDED, so the failure was our own
              // write/close — the half-written claim is ours to delete
              // (same orphan-wedge hazard as the local branch above)
              try out.close() catch { case _: java.io.IOException => () }
              try fs.delete(claim, false): Unit
              catch { case _: java.io.IOException => () }
            }
            false
        }
      }
    if (created) Some(token) else None
  }

  private def claimPath(nextV: String) =
    new Path(s"$root/versions/$nextV.claim")

  /** The claim is still OURS (content equals our token): re-checked
    * immediately before the commit rename — if a stale-claim break
    * re-assigned the name while we were between claim and rename, abort
    * rather than rename onto a destination someone else now owns. Reads
    * retry a couple of times: a single transient IO hiccup must not make
    * a writer abandon a claim it actually holds (the orphaned claim would
    * wedge the name for StaleClaimMs). */
  private def claimStillOwned(nextV: String, token: String): Boolean = {
    var attempt = 0
    while (attempt < 3) {
      try {
        val in = fs.open(claimPath(nextV))
        val content =
          try new String(in.readAllBytes(), "UTF-8") finally in.close()
        return content == token
      } catch {
        case _: java.io.FileNotFoundException => return false // broken claim
        case _: java.io.IOException => attempt += 1; Thread.sleep(100L)
      }
    }
    false
  }

  /** The ONE commit sequence (shared by [[attemptBatch]] and [[compact]]):
    * claim the version name, re-verify ownership and that the name is not
    * already committed, run `beforeSwap` (delta finalization), rename the
    * staged dir, advance the pointer, retire the claim. false = lost the
    * race — the staged dir is deleted, a claim we own of an
    * already-committed name is retired, a crashed claimer's stale claim is
    * broken for the caller's retry. */
  private def commitStaged(tmp: String, nextV: String,
                           beforeSwap: () => Unit = () => ()): Boolean =
    claimVersion(nextV) match {
      case Some(token) =>
        val ours = claimStillOwned(nextV, token)
        if (ours &&
            !fs.exists(new Path(s"${versionDir(nextV)}/manifest.txt"))) {
          beforeSwap()
          publishVersion(tmp, nextV)
          swapPointer(nextV)
          // the claim's job is done once the commit is visible — retire it
          // so the versions/ listing stays exactly the committed dirs
          // (claims of already-committed names are caught by the manifest
          // pre-check above)
          fs.delete(claimPath(nextV), false): Unit
          true
        } else {
          // lost after all: the name was committed before its claim was
          // retired (retire OUR claim of it), or our claim was broken and
          // re-assigned mid-gap (then it is not ours to delete)
          fs.delete(new Path(tmp), true)
          if (ours) fs.delete(claimPath(nextV), false): Unit
          false
        }
      case None =>
        fs.delete(new Path(tmp), true)
        breakStaleClaim(nextV): Unit // un-wedge a crashed claimer for the retry
        false
    }

  /** Break a CRASHED claimer's claim: the claim file exists, its version
    * dir never appeared, and it is older than [[StarStore.StaleClaimMs]]
    * (claims live for milliseconds in a healthy writer — the gap between
    * claim and rename). Returns true if a stale claim was removed. */
  private def breakStaleClaim(nextV: String): Boolean = {
    val claim = claimPath(nextV)
    try {
      // "its version dir never appeared" means never COMMITTED (manifest
      // present): a manifest-less dir is a crashed mid-rename's debris —
      // treating it as a commit would make the claim unbreakable and wedge
      // every future publish on this name forever.
      if (!fs.exists(claim) ||
          fs.exists(new Path(s"${versionDir(nextV)}/manifest.txt"))) false
      else {
        val age = System.currentTimeMillis() - fs.getFileStatus(claim)
          .getModificationTime
        age > StarStore.StaleClaimMs && fs.delete(claim, false)
      }
    } catch { case _: java.io.IOException => false }
  }

  /** Advance CURRENT to the highest COMPLETE version dir if the pointer
    * fell behind (crash between the commit rename and the pointer swap):
    * the rename is atomic over a fully-staged dir, so any visible
    * versions/v<N> is a committed version — repairing forward loses
    * nothing and un-wedges the next writer. */
  private def repairPointer(): Unit = {
    val vdir = new Path(s"$root/versions")
    if (!fs.exists(vdir)) return
    // only COMPLETE dirs count (manifest present): a manifest-less dir is
    // crash debris, never a commit — advancing to it would wedge every read
    val highest = fs.listStatus(vdir).map(_.getPath.getName)
      .filter(_.matches("v\\d+"))
      .filter(v => fs.exists(new Path(s"${versionDir(v)}/manifest.txt")))
      .sorted.lastOption
    val ptr = currentVersion
    highest.foreach { h =>
      if (ptr.forall(_ < h)) swapPointer(h)
    }
  }

  /** LEGACY conflict DETECTION (pre-claim protocol): the store version must
    * still be the one this batch read its inputs from. [[runBatch]] now
    * prevents the conflict outright via [[claimVersion]]; this check
    * remains for external writers composing their own publish sequence. */
  private[etl] def publishGuard(priorV: Option[String]): Unit = {
    val nowV = currentVersion
    require(nowV == priorV,
      s"concurrent publish detected at $root: version moved from " +
        s"${priorV.getOrElse("<empty>")} to ${nowV.getOrElse("<empty>")} " +
        "since this batch read its inputs — re-run the batch on the new version")
  }

  /** FORWARD-ONLY pointer advance: a writer that stalled between its
    * commit rename and this swap must not move CURRENT backward past a
    * newer version another writer committed meanwhile (readers would serve
    * the stale snapshot until the next repair). The zero-padded version
    * names compare lexicographically = numerically. The read-check-swap
    * window is instruction-level, not stall-level — the residual race of
    * any lock-free filesystem pointer, self-healing via repairPointer. */
  private def swapPointer(nextV: String): Unit = {
    val cur0 = new Path(s"$root/CURRENT")
    // the POINTER FILE only, never the committed-dir fallback (which would
    // see our own just-renamed dir and skip ever creating CURRENT)
    val pointerNow =
      if (!fs.exists(cur0)) None
      else try {
        val in = fs.open(cur0)
        try Some(new String(in.readAllBytes(), "UTF-8").trim).filter(_.nonEmpty)
        finally in.close()
      } catch { case _: java.io.IOException => None }
    if (pointerNow.exists(_ >= nextV)) return // already at or past us
    val curTmp = new Path(s"$root/CURRENT._tmp")
    val cur = cur0
    val pOut = fs.create(curTmp, true)
    try pOut.write(nextV.getBytes("UTF-8")) finally pOut.close()
    fs.delete(cur, false)
    require(fs.rename(curTmp, cur), "CURRENT pointer swap failed")
  }

  /** Register the live star as SQL views (`dim_date`, `dim_platform`,
    * `dim_site`, `dim_title`, `fact_videostart`) so `spark.sql` works over
    * the store — the engine's stand-in for the reference's warehouse DDL
    * surface (SURVEY §2 row 8). */
  def registerViews(): Unit = {
    dimDate.createOrReplaceTempView("dim_date")
    dimPlatform.createOrReplaceTempView("dim_platform")
    dimSite.createOrReplaceTempView("dim_site")
    dimTitle.createOrReplaceTempView("dim_title")
    fact.createOrReplaceTempView("fact_videostart")
    viewsRegistered = true
  }

  // Views capture concrete version-dir paths; a publish retires that dir, so
  // any registered views must be re-pointed after every publish or the next
  // `spark.sql` over them fails on deleted files.
  private var viewsRegistered = false
  private def refreshViews(): Unit = if (viewsRegistered) registerViews()

  /** Process one raw batch end-to-end and atomically publish the updated
    * star. Returns the number of fact rows appended (0 for a replayed
    * batch id).
    *
    * CONCURRENT-WRITER SAFE: the publish commits by atomically claiming
    * the next version name ([[claimVersion]]) before the rename, so two
    * simultaneous callers serialize — the loser deletes its staged dir and
    * RECOMPUTES against the winner's published version (its SKEYs/fact ids
    * would otherwise duplicate the winner's), bounded at
    * [[StarStore.MaxPublishRetries]] attempts. No update is ever lost and
    * versions stay strictly monotone (spec-pinned by the concurrent-writer
    * test). */
  def runBatch(raw: DataFrame, batchId: String): Long =
    runBatch(raw, batchId, Nil)

  /** [[runBatch]] with ADD-ONLY, WIDEN-ONLY SCHEMA EVOLUTION: `extras`
    * names raw columns to carry into the fact beyond the reference's fixed
    * derived set. The published manifest records the fact schema; a batch
    * must carry every column the live schema already has (add-only — a
    * column, once published, never silently disappears mid-history) at its
    * published type or a lossless widening of it ([[StarStore.widens]]:
    * byte→short→int→long, float→double — the manifest then records the
    * wider type), and may add new ones, which become nullable for every
    * earlier delta: reads null-fill missing columns and up-cast narrower
    * pre-widening deltas at the recorded type, and old SNAPSHOTS stay
    * readable via time travel under their own (pre-evolution) schema. */
  def runBatch(raw: DataFrame, batchId: String, extras: Seq[String]): Long = {
    require(!batchId.contains("/"), s"batch id must be path-safe: $batchId")
    var attempt = 0
    while (attempt <= StarStore.MaxPublishRetries) {
      repairPointer()
      val result =
        try attemptBatch(raw, batchId, extras)
        catch {
          // a concurrent winner's retention sweep can retire the exact
          // version snapshot this attempt was reading (retainVersions=1
          // keeps only the live one) — that is a lost race wearing an IO
          // error, not a failure: recompute from the fresh snapshot. The
          // LAST attempt rethrows, so a genuine persistent IO fault still
          // surfaces as itself rather than as "pathological contention".
          case e @ (_: java.io.FileNotFoundException
                    | _: org.apache.spark.SparkException) =>
            if (attempt >= StarStore.MaxPublishRetries) throw e
            None
        }
      result match {
        case Some(appended) => return appended
        case None =>
          attempt += 1
          // the winner is mid-swap or just ahead; brief linear backoff and
          // recompute from its published snapshot
          Thread.sleep(50L * attempt)
      }
    }
    sys.error(s"runBatch($batchId) gave up after " +
      s"${StarStore.MaxPublishRetries} concurrent-publish retries at $root")
  }

  /** One optimistic attempt: compute against the current snapshot, stage,
    * claim, commit. None = lost the publish race (staged dir cleaned up,
    * caller recomputes). */
  private def attemptBatch(raw: DataFrame, batchId: String,
                           extras: Seq[String] = Nil): Option[Long] = {
    val prior = currentVersion.map(v => (v, manifest(v)))
    if (prior.exists(_._2.applied.contains(batchId))) return Some(0L) // replay

    val cleaned = Transform.clean(raw, extras)
      .withColumn("SITE", coalesce(col("SITE"), lit(Fact.NoneMember)))

    // Dim upserts: idempotent anti-join + deterministic SKEYs (rows 28/31).
    val (dDate, dPlat, dSite, dTitle) = prior match {
      case Some(_) =>
        (Dims.upsert(dimDate, cleaned, "DATETIME", "DATETIME_SKEY"),
         Dims.upsert(dimPlatform, cleaned, "PLATFORM", "PLATFORM_SKEY"),
         Dims.upsert(dimSite, cleaned, "SITE", "SITE_SKEY"),
         Dims.upsert(dimTitle, cleaned, "TITLE", "TITLE_SKEY"))
      case None =>
        (Dims.build(cleaned, "DATETIME", "DATETIME_SKEY"),
         Dims.build(cleaned, "PLATFORM", "PLATFORM_SKEY"),
         Dims.build(cleaned, "SITE", "SITE_SKEY"),
         Dims.build(cleaned, "TITLE", "TITLE_SKEY"))
    }
    // Dims are read multiple times (upsert + fact join) — cache the tiny frames.
    Seq(dDate, dPlat, dSite, dTitle).foreach(_.cache())

    val maxFactId = prior.map(_._2.maxFactId).getOrElse(0L) // manifest, no fact scan
    val resolved = Fact.resolveSkeys(cleaned, dDate, dPlat, dSite, dTitle,
      extras)
    val newFact = Fact.withFactIdsScalable(resolved, maxFactId)

    // SCHEMA EVOLUTION, add-only + widen-only: the live manifest's recorded
    // schema (if any) must be a SUBSET of this batch's — every published
    // column present at its published type OR a lossless widening of it
    // (byte→short→int→long, float→double — the Delta/Iceberg widening set;
    // a column can never silently vanish, narrow, or cross type families
    // mid-history). Columns beyond the recorded set are the evolution,
    // appended to the recorded order so the contract stays stable for
    // readers; a widened column upgrades the recorded type, and reads
    // up-cast the narrower pre-widening deltas. Legacy stores (no recorded
    // schema) adopt this batch's schema going forward.
    val priorSchema = prior.flatMap(_._2.factSchema)
      .map(org.apache.spark.sql.types.StructType.fromDDL)
    priorSchema.foreach(_.fields.foreach { f =>
      val got = newFact.schema.fields.find(_.name == f.name).getOrElse(
        sys.error(s"schema evolution is ADD-ONLY: batch $batchId lacks " +
          s"published fact column '${f.name}' (${f.dataType.sql}) — a " +
          "published column must ride every later batch"))
      require(got.dataType == f.dataType ||
          StarStore.widens(f.dataType, got.dataType),
        s"fact column '${f.name}' changed type: published ${f.dataType.sql}" +
          s", batch $batchId carries ${got.dataType.sql} — only lossless " +
          "widening (byte->short->int->long, float->double) evolves a " +
          "published type")
    })
    val mergedSchema = priorSchema match {
      case None => newFact.schema
      case Some(ps) =>
        org.apache.spark.sql.types.StructType(ps.fields.map { f =>
          // a widened column records the WIDER type from this version on
          val got = newFact.schema.fields.find(_.name == f.name).get
          if (got.dataType != f.dataType) f.copy(dataType = got.dataType)
          else f
        } ++
          newFact.schema.fields.filterNot(f => ps.fieldNames.contains(f.name))
            .map(_.copy(nullable = true))) // null-filled in pre-evolution deltas
    }

    // Per-ATTEMPT staging paths: redelivery can run the SAME batch id
    // concurrently (the at-least-once contract this class documents), and
    // id-keyed staging would let one writer's delete/overwrite corrupt the
    // other's half-staged files mid-commit. The delta moves to its
    // immutable id-keyed home only under a WON claim (below).
    val nonce = java.util.UUID.randomUUID().toString.take(8)

    // 1. fact delta → attempt-unique staging.
    val batchDir = s"$root/facts/batch_$batchId"
    val deltaTmp = s"$root/facts/_tmp_${batchId}_$nonce"
    newFact.write.mode("overwrite").partitionBy("day").parquet(deltaTmp)
    val appended = spark.read.parquet(deltaTmp).count() // metadata-only count

    // 2. stage the new version dir (dims + manifest), then one rename.
    val nextV = f"v${prior.map(_._1.drop(1).toLong).getOrElse(0L) + 1}%08d"
    val tmp = s"$root/versions/_tmp_${batchId}_$nonce"
    fs.delete(new Path(tmp), true)
    dDate.write.mode("overwrite").parquet(s"$tmp/dim_date")
    dPlat.write.mode("overwrite").parquet(s"$tmp/dim_platform")
    dSite.write.mode("overwrite").parquet(s"$tmp/dim_site")
    dTitle.write.mode("overwrite").parquet(s"$tmp/dim_title")
    val newManifest = Manifest(maxFactId + appended,
      prior.map(_._2.batches).getOrElse(Seq.empty) :+ batchId,
      prior.map(_._2.applied).getOrElse(Seq.empty) :+ batchId,
      Some(mergedSchema.toDDL))
    writeManifest(tmp, newManifest)

    // 3. claim + commit (shared sequence — see commitStaged); the delta is
    //    finalized into its manifest-referenced home only after the claim
    //    is WON, so a losing same-id twin can never clobber the winner's
    //    published data. A crashed leftover at the final name is cleared
    //    under the claim.
    val committed = commitStaged(tmp, nextV, beforeSwap = () => {
      if (fs.exists(new Path(batchDir))) fs.delete(new Path(batchDir), true)
      require(fs.rename(new Path(deltaTmp), new Path(batchDir)),
        s"fact delta finalize failed: $deltaTmp -> $batchDir")
    })
    if (!committed) fs.delete(new Path(deltaTmp), true): Unit
    Seq(dDate, dPlat, dSite, dTitle).foreach(_.unpersist())
    if (!committed) return None

    // 4. post-commit maintenance. The batch IS committed at this point, so
    //    a failure below must not escape into runBatch's lost-race retry —
    //    the retried attempt would hit the replay check and report 0
    //    appended for a batch that appended rows. Maintenance is
    //    idempotent and repeats on every publish, so skipping one round
    //    when a concurrent writer races our sweep/compact loses nothing.
    try {
      // retention sweep: retire version dirs beyond the time-travel window
      // (fact data files are shared and never copied, so with the default
      // retainVersions=1 this only removes tiny dim snapshots).
      sweepVersions()
      // Keep the live delta count bounded: the fact is a union over live
      // batch dirs, so an unbounded batch history degrades every read. The
      // `applied` list survives compaction — replays stay no-ops.
      if (newManifest.batches.length > autoCompactAfter) compact(): Unit
      else refreshViews()
    } catch {
      // NonFatal, not a type list: ANY maintenance failure after the
      // commit (a transient delete IOException, a compaction losing its
      // own claim race) must stay here — escaping would report 0 appended
      // for a committed batch via the retry's replay check. But stay
      // VISIBLE: a persistently failing sweep/compact (misconfigured
      // permissions on versions/) otherwise accumulates version dirs and
      // deltas unboundedly with no observable signal
      case scala.util.control.NonFatal(e) =>
        org.slf4j.LoggerFactory.getLogger(classOf[StarStore]).warn(
          s"post-commit maintenance failed (commit is intact; " +
            s"sweep/compact will retry next publish): $e")
    }
    Some(appended)
  }

  /** Compact the live fact deltas into one partitioned directory and publish
    * a version whose live list is just the compacted dir. Old delta dirs are
    * deleted AFTER the pointer swap; the `applied` history is preserved, so
    * replaying any pre-compaction batch id remains a no-op. Run when the
    * batch count makes the union plan / file listing noticeable. */
  def compact(): Long = {
    val (v, m) = currentVersion.map(v => (v, manifest(v)))
      .getOrElse(sys.error(s"empty star store at $root"))
    if (m.batches.length <= 1) return 0L
    val compactId = s"compact_${v.drop(1).toLong + 1}"
    val dest = s"$root/facts/batch_$compactId"
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    // attempt-unique staging for the rewritten fact, finalized only under
    // a WON claim — the same discipline as attemptBatch: a concurrent
    // publisher's sweep must never see (or race) a half-written final dir
    val destTmp = s"$root/facts/_tmp_${compactId}_$nonce"
    fact.write.mode("overwrite").partitionBy("day").parquet(destTmp)

    val nextV = f"v${v.drop(1).toLong + 1}%08d"
    val tmp = s"$root/versions/_tmp_${compactId}_$nonce"
    fs.delete(new Path(tmp), true)
    // dims are unchanged — copy the snapshots into the new version dir
    Seq("dim_date", "dim_platform", "dim_site", "dim_title").foreach { t =>
      org.apache.hadoop.fs.FileUtil.copy(fs, new Path(s"${versionDir(v)}/$t"),
        fs, new Path(s"$tmp/$t"), false, spark.sparkContext.hadoopConfiguration)
    }
    // compactId joins the `applied` history: the sweep reclaims aged-out
    // deltas by applied-membership, and a compacted dir must stay
    // reclaimable once a LATER compaction supersedes it
    // the compacted delta materializes the reconciled (null-filled) frame,
    // so the schema contract rides through compaction unchanged
    writeManifest(tmp, Manifest(m.maxFactId, Seq(compactId),
      m.applied :+ compactId, m.factSchema))
    val committed = commitStaged(tmp, nextV, beforeSwap = () => {
      if (fs.exists(new Path(dest))) fs.delete(new Path(dest), true)
      require(fs.rename(new Path(destTmp), new Path(dest)),
        s"compacted fact finalize failed: $destTmp -> $dest")
    })
    if (committed) {
      // pre-compaction delta dirs are reclaimed by the sweep only once no
      // RETAINED version still references them — time-travel reads into
      // the pre-compaction window keep working until it ages out
      sweepVersions()
      refreshViews()
      m.batches.length.toLong
    } else {
      // a concurrent publish superseded this compaction's snapshot — drop
      // the staged delta; the next over-threshold publish re-triggers
      fs.delete(new Path(destTmp), true)
      0L
    }
  }
}

object StarStore {
  /** Live-delta bound before auto-compaction kicks in: high enough that
    * steady-state ingest rarely pays a compaction, low enough that the
    * fact-union plan stays a handful of parquet roots. */
  val DefaultAutoCompactAfter: Int = 16

  /** The lossless type-widening lattice schema evolution accepts
    * (byte→short→int→long along the integral chain, float→double): every
    * value of `from` is exactly representable in `to`, so up-casting a
    * pre-widening delta at read time loses nothing. Anything else —
    * narrowing, integral↔floating, string↔anything — is a REtype, which
    * evolution refuses. */
  private[etl] def widens(from: org.apache.spark.sql.types.DataType,
                          to: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    val integral: Seq[DataType] =
      Seq(ByteType, ShortType, IntegerType, LongType)
    val i = integral.indexOf(from)
    (i >= 0 && integral.indexOf(to) > i) ||
      (from == FloatType && to == DoubleType)
  }

  /** Bound on concurrent-publish recomputes in [[StarStore.runBatch]] —
    * each retry means another writer committed first, so hitting the bound
    * means 5+ publishes landed during this batch's compute: a pathological
    * contention level worth failing loudly over. */
  val MaxPublishRetries: Int = 5

  /** Age past which a claim file with NO version dir is a crashed claimer
    * (a live claim spans only the claim→rename gap, milliseconds): broken
    * by the next writer. Generous so a stalled-but-alive writer is never
    * raced on any realistic filesystem hiccup; the claim-token re-check
    * before rename backstops even that. */
  val StaleClaimMs: Long = 5L * 60 * 1000

  final case class Manifest(maxFactId: Long, batches: Seq[String],
                            applied: Seq[String],
                            factSchema: Option[String] = None) {
    def serialized: String =
      s"maxFactId=$maxFactId\nbatches=${batches.mkString(",")}\n" +
        s"applied=${applied.mkString(",")}\n" +
        factSchema.map(s => s"factSchema=$s\n").getOrElse("")
  }

  def apply(spark: SparkSession, root: String): StarStore = new StarStore(spark, root)

  def apply(spark: SparkSession, root: String, autoCompactAfter: Int): StarStore =
    new StarStore(spark, root, autoCompactAfter)

  def apply(spark: SparkSession, root: String, autoCompactAfter: Int,
            retainVersions: Int): StarStore =
    new StarStore(spark, root, autoCompactAfter, retainVersions)
}
