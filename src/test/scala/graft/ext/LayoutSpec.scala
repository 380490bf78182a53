package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorderKey interleaves bits: hand-computed examples") {
    // x=5 (101) -> bits 0,4; y=3 (011) -> bits 1,3  =>  1+16 + 2+8 = 27
    // swapped: x=3 -> bits 0,2 (=5); y=5 -> bits 1,5 (=34)  =>  39
    val r = spark.range(1).select(
      Layout.zorderKey(3, lit(5L), lit(3L)).as("a"),
      Layout.zorderKey(3, lit(3L), lit(5L)).as("b"),
      Layout.zorderKey(3, lit(0L), lit(0L)).as("zero"),
      Layout.zorderKey(1, lit(1L), lit(1L), lit(1L)).as("three_d")).head
    assert(r.getLong(0) === 27L)
    assert(r.getLong(1) === 39L)
    assert(r.getLong(2) === 0L)
    assert(r.getLong(3) === 7L) // 3 dims, 1 bit each: 1|2|4
  }

  test("zorderKey clamps out-of-range coordinates and nulls the null row") {
    val r = spark.range(1).select(
      Layout.zorderKey(3, lit(-7L), lit(99L)).as("clamped"),
      Layout.zorderKey(3, lit(null).cast("long"), lit(3L)).as("n")).head
    // -7 -> 0 contributes nothing; 99 -> 7 (111) at odd bits = 2+8+32
    assert(r.getLong(0) === 42L)
    assert(r.isNullAt(1))
  }

  test("zorderKey is monotone in each coordinate with the other fixed") {
    val grid = spark.range(16).select(col("id").as("x"))
      .crossJoin(spark.range(16).select(col("id").as("y")))
      .select(col("x"), col("y"), Layout.zorderKey(4, col("x"), col("y")).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    for (f <- 0L until 16L; a <- 0L until 15L) {
      assert(grid((a, f)) < grid((a + 1, f)), s"x not monotone at ($a, $f)")
      assert(grid((f, a)) < grid((f, a + 1)), s"y not monotone at ($f, $a)")
    }
  }

  test("zorderLayout: per-file zkey envelopes are disjoint and data survives") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val out = tmpDir("zorder")
    Layout.zorderLayout(li, bits = 16, numFiles = 8,
        col("l_partkey"), col("l_suppkey"))
      .write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.count() === li.count())
    // recompute the (scaled) key on read-back: each file's [min,max]
    // interval must not overlap any other's (range partitioning = disjoint
    // curve spans)
    val b = li.selectExpr("min(l_partkey)::long", "max(l_partkey)::long",
      "min(l_suppkey)::long", "max(l_suppkey)::long").head
    val spans = back
      .select(input_file_name().as("f"),
        Layout.zorderKey(16,
          Layout.scaleTo(col("l_partkey"), b.getLong(0), b.getLong(1), 16),
          Layout.scaleTo(col("l_suppkey"), b.getLong(2), b.getLong(3), 16)).as("z"))
      .groupBy("f").agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(spans.length > 1, "expected multiple output files")
    spans.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping file envelopes: $hi1 > $lo2")
      case _ =>
    }
  }

  private def parquetFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles().toSeq
      .filter(_.getName.endsWith(".parquet"))

  test("compactTo collapses a fragmented table, content byte-identical") {
    val root = tmpDir("compact")
    val frag = s"$root/frag"
    val packed = s"$root/packed"
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.repartition(20).write.parquet(frag)
    val nFragFiles = parquetFiles(frag).size
    assert(nFragFiles === 20, "fragmentation setup")
    val totalBytes = parquetFiles(frag).map(_.length()).sum

    // target ≈ a third of the table: expect ceil(total/target) = 3 files
    val n = Layout.compactTo(spark, frag, packed, (totalBytes + 2) / 3)
    assert(n === 3)
    assert(parquetFiles(packed).size === 3)
    // content identical as a multiset
    val a = docs.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val b = spark.read.parquet(packed).collect().map(_.toSeq)
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(a === b, "compaction must preserve content exactly")

    // a target above the table size packs to a single file
    val one = s"$root/one"
    assert(Layout.compactTo(spark, frag, one, 1L << 40) === 1)
    assert(parquetFiles(one).size === 1)
  }

  test("compactTo is shuffle-free: the rewrite plan has no Exchange") {
    val root = tmpDir("compact_plan")
    val frag = s"$root/frag"
    spark.range(1000).toDF("id").repartition(8).write.parquet(frag)
    val plan = spark.read.parquet(frag).coalesce(2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Coalesce") && !plan.contains("Exchange"),
      s"compaction must coalesce, never exchange:\n$plan")
  }

  test("manifest data skipping: pruned read touches fewer files, same answer") {
    val root = tmpDir("manifest_skip")
    val dir = s"$root/t"
    // 8 files clustered on k (range partition → tight disjoint envelopes)
    val df = spark.range(8000).select(
      (col("id") % 80).as("k"), col("id").as("v"))
      .repartitionByRange(8, col("k"))
    Layout.writeWithManifest(spark, df, dir, Seq("k"))
    val total = parquetFiles(dir).size
    assert(total === 8, s"layout setup: $total files")

    val pruned = Layout.readPruned(spark, dir, "k", 20, 29)
    // pruning is real: the planned file list shrank
    assert(pruned.inputFiles.length < total,
      s"no files skipped: ${pruned.inputFiles.length} of $total")
    // and the answer is exactly the plain filtered read
    val want = spark.read.parquet(dir).where(col("k").between(20, 29))
      .agg(count(lit(1)), sum(col("v"))).head
    val got = pruned.agg(count(lit(1)), sum(col("v"))).head
    assert(got === want)

    // an empty range returns zero rows with the right schema
    assert(Layout.readPruned(spark, dir, "k", 500, 600).count() === 0)
  }

  test("appendWithManifest: batch-only stats pass, spliced manifest still prunes") {
    val root = tmpDir("manifest_append")
    val dir = s"$root/t"
    // initial build: keys 0..39 across 4 range-clustered files
    val base = spark.range(4000).select((col("id") % 40).as("k"), col("id").as("v"))
      .repartitionByRange(4, col("k"))
    Layout.writeWithManifest(spark, base, dir, Seq("k"))
    val baseFiles = parquetFiles(dir).size
    // append a later batch with DISJOINT keys 100..119 (2 files)
    val batch = spark.range(1000).select((col("id") % 20 + 100).as("k"),
      (col("id") + 10000).as("v")).repartitionByRange(2, col("k"))
    Layout.appendWithManifest(spark, batch, dir, Seq("k"))
    assert(parquetFiles(dir).size === baseFiles + 2, "append file count")

    // a query into the APPENDED key range reads only the new files
    val inNew = Layout.readPruned(spark, dir, "k", 100, 119)
    assert(inNew.inputFiles.length === 2,
      s"append range must touch only the batch files: ${inNew.inputFiles.length}")
    assert(inNew.count() === 1000)
    // a query into the BASE range skips the appended files
    val inBase = Layout.readPruned(spark, dir, "k", 0, 9)
    assert(inBase.inputFiles.length < baseFiles + 2,
      "base range must not read every file")
    val want = spark.read.parquet(dir).where(col("k").between(0, 9)).count()
    assert(inBase.count() === want)
    // an empty append is a no-op, manifest still parseable
    Layout.appendWithManifest(spark,
      base.where(lit(false)), dir, Seq("k"))
    assert(Layout.readPruned(spark, dir, "k", 100, 119).count() === 1000)
  }

  test("manifest skipping keeps files conservatively for lexical and all-null stats") {
    val root = tmpDir("manifest_cons")
    val dir = s"$root/t"
    import spark.implicits._
    // lexical values with control characters: the manifest must stay
    // parseable JSON (one raw newline would poison every later read)
    val df = Seq((Option("a\nb\t\"c\\"), Option.empty[Long], 1L),
      (Option("z"), Option.empty[Long], 2L)).toDF("s", "n", "v")
    Layout.writeWithManifest(spark, df, dir, Seq("s", "n"))
    // string stats: numeric range can't prune — every file kept, all rows
    assert(Layout.readPruned(spark, dir, "v", 1, 2).count() === 2)
    // all-null column: null envelope is kept, residual predicate drops rows
    assert(Layout.readPruned(spark, dir, "n", 0, 9).count() === 0)
    // a numeric range over the lexical column itself is caller misuse —
    // loud, not an ANSI scan crash or a silent zero-row result
    val e = intercept[IllegalArgumentException](
      Layout.readPruned(spark, dir, "s", 1, 2).count())
    assert(e.getMessage.contains("numeric statsCol"))
  }

  test("bloom index: point lookup opens a fraction of the files, same answer") {
    val dir = tmpDir("bloomidx")
    // unclustered ids: every file spans the full range, so min/max
    // envelopes could never prune — exactly the bloom index's case
    val df = (1L to 4000L).map(i => (i, i % 7)).toDF("id", "g")
      .repartition(8)
    df.write.mode("overwrite").parquet(dir)
    Layout.writeBloomIndex(spark, dir, "id", expectedPerFile = 1000L,
      fpp = 0.01)
    val total = spark.read.parquet(dir).inputFiles.length
    val hit = Layout.readPrunedPoint(spark, dir, "id", 2500L)
    assert(hit.inputFiles.length < total,
      s"bloom index pruned nothing: ${hit.inputFiles.length} of $total")
    assert(hit.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((2500L, 2500L % 7)))
    // an absent key: typically zero files, never a wrong row
    assert(Layout.readPrunedPoint(spark, dir, "id", 999999L).count() === 0)
    // index/column mismatch and missing index are loud
    val e = intercept[IllegalArgumentException](
      Layout.readPrunedPoint(spark, dir, "g", 1L))
    assert(e.getMessage.contains("covers"))
    val e2 = intercept[IllegalArgumentException](
      Layout.readPrunedPoint(spark, tmpDir("noidx"), "id", 1L))
    assert(e2.getMessage.contains("writeBloomIndex"))
  }

  test("dynamic partition pruning fires on a partitioned fact x filtered dim join") {
    // the runtime sibling of manifest skipping: when the selective
    // predicate lives on the DIM side, only a runtime filter can prune the
    // fact's partitions — at 100 TB this is the difference between
    // scanning 3 partitions and 20. Pin that Spark's DPP actually fires on
    // the layout this library produces (hive-partitioned fact, broadcast
    // dim), so a conf or layout regression that silently disables it
    // fails here, not on a cluster.
    val dir = tmpDir("dpp")
    val dimDir = tmpDir("dpp_dim")
    (1 to 1000).map(i => (i, i % 20)).toDF("v", "part")
      .write.partitionBy("part").mode("overwrite").parquet(dir)
    (0 to 19).map(i => (i, if (i < 3) "keep" else "drop"))
      .toDF("part", "tag").write.mode("overwrite").parquet(dimDir)
    val joined = spark.read.parquet(dir)
      .join(spark.read.parquet(dimDir).where(col("tag") === "keep"), "part")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamic partition pruning filter on the fact scan:\n$plan")
    assert(joined.count() === 150)
  }

  test("deletion vectors: mark/read/compact round-trip, overlap-safe") {
    val dir = tmpDir("dv")
    val data = (1L to 100L).map(i => (i, i % 10)).toDF("id", "g")
    data.write.mode("overwrite").parquet(dir)
    // no vector yet: plain read
    assert(Layout.readWithDeletes(spark, dir, "id").count() === 100)
    // two OVERLAPPING delete batches marked under DIFFERENT caller column
    // names (ids 1-10, 5-15 → 15 distinct): the store canonicalizes the
    // name at write time, so mixed-name batches must still all subtract —
    // a schema split here silently resurrected the minority batch
    Layout.markDeleted(spark, dir, (1L to 10L).toDF("id"))
    Layout.markDeleted(spark, dir, (5L to 15L).toDF("purge_key"))
    val live = Layout.readWithDeletes(spark, dir, "id")
    assert(live.count() === 85, "overlapping marks must subtract once")
    assert(live.agg(min("id")).head.getLong(0) === 16L)
    // the vector store is invisible to a plain parquet read of the dir
    assert(spark.read.parquet(dir).count() === 100)
    // physical compaction: same answer, and the rewrite carries no vector
    val out = tmpDir("dv_out")
    Layout.compactDeletes(spark, dir, out, "id")
    assert(spark.read.parquet(out).count() === 85)
    assert(!new java.io.File(out, "_graft_deletes").exists(),
      "compaction must clear the deletion vector")
    // deleting a key not present is a no-op, not an error
    Layout.markDeleted(spark, dir, Seq(999L).toDF("id"))
    assert(Layout.readWithDeletes(spark, dir, "id").count() === 85)
    // multi-column delete frame is caller misuse — loud
    val e = intercept[IllegalArgumentException](
      Layout.markDeleted(spark, dir, data))
    assert(e.getMessage.contains("one key column"))
  }
}
