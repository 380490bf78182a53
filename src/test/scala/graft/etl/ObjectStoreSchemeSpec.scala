package graft.etl

import graft.SparkSpec
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import org.apache.spark.sql.functions._

/** Hadoop `FileSystem` with a non-`file:` scheme, backed by local disk —
  * the cheapest honest stand-in for an object store (`s3a:` et al. are
  * also just `FileSystem` implementations resolved from `fs.<scheme>.impl`).
  * Every path that reaches it proves the pipeline resolved the filesystem
  * from the PATH's scheme rather than assuming `file:`/`java.io.File`. */
class AliasedLocalFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: java.net.URI = java.net.URI.create("graftfs:///")
}

/** The engine's object-store claim (SURVEY §2 rows 4–6: direct paths, no
  * local staging hop), exercised for real: the whole star pipeline —
  * CSV source scan, versioned publish, exactly-once replay, time travel,
  * compaction, retention sweep — runs against a registered non-local
  * scheme. Nothing in `Sources`/`StarStore` may touch `java.io.File`. */
class ObjectStoreSchemeSpec extends SparkSpec {
  import spark.implicits._

  private def raw(i: Int) = Seq(
    (f"2017-01-11T00:0$i%d:00.000Z", s"news| Video $i", "206")
  ).toDF("DateTime", "VideoTitle", "events")

  test("star pipeline end-to-end over a non-local FileSystem scheme") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.graftfs.impl", classOf[AliasedLocalFileSystem].getName)
    val local = tmpDir("graft-objstore")
    val root = s"graftfs://$local/store"
    val fs = new Path(root).getFileSystem(conf)
    assert(fs.isInstanceOf[AliasedLocalFileSystem],
      s"scheme did not resolve to the aliased FS: ${fs.getClass}")

    // CSV source read over the scheme (quote/escape reader, row 1)
    val csvDir = s"graftfs://$local/raw"
    raw(1).write.option("header", "true").csv(csvDir)
    assert(Sources.csv(spark, csvDir, RawSchemas.raw).count() === 1)

    // publish → replay guard → time travel → compaction, all over graftfs
    val store = StarStore(spark, root, autoCompactAfter = Int.MaxValue,
      retainVersions = 2)
    assert(store.runBatch(raw(1), "b1") === 1)
    assert(store.runBatch(raw(2), "b2") === 1)
    assert(store.runBatch(raw(2), "b2") === 0) // exactly-once replay guard
    assert(store.fact.count() === 2)
    assert(store.versions === Seq(1L, 2L))
    assert(store.readVersion("fact", 1).count() === 1)

    assert(store.compact() === 2)
    assert(store.fact.count() === 2)
    assert(store.versions === Seq(2L, 3L))
    assert(store.runBatch(raw(3), "b3") === 1)
    assert(store.fact.count() === 3)

    // retention sweep physically deleted aged version dirs THROUGH the FS
    assert(store.versions === Seq(3L, 4L))
    val vdirs = fs.listStatus(new Path(s"$root/versions"))
      .map(_.getPath.getName).toSet
    assert(vdirs === Set("v00000003", "v00000004"), s"retention: $vdirs")

    // SQL surface still works over the scheme
    store.registerViews()
    assert(spark.sql("SELECT count(*) FROM fact_videostart").as[Long].head() === 3L)

    // and every artifact really lives behind the scheme root on disk
    val onDisk = new java.io.File(s"$local/store")
    assert(onDisk.isDirectory && onDisk.list().nonEmpty)
  }
}
