package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.Multimodal.RawAsset

/** The USTAR walk and the WebDataset grouping: round-trip (incl. prefix
  * long names and non-block-multiple sizes), checksum verification,
  * corruption quarantine, non-file-member skip, sample grouping. */
class TarSpec extends SparkSpec {
  import spark.implicits._

  private val members = Seq(
    ("s1.txt", "hello webdataset".getBytes("US-ASCII")),
    ("s1.cls", "3".getBytes("US-ASCII")),
    // 600 bytes: data spans two 512-blocks with 424 bytes of padding
    ("s2.txt", Array.tabulate[Byte](600)(i => (32 + (i % 90)).toByte)),
    // long path: splits into the USTAR prefix field and back
    (("d" * 80) + "/" + ("n" * 60) + ".json", "{}".getBytes("US-ASCII")))

  private def shard(bytes: Array[Byte], id: Long = 7L) =
    Seq(RawAsset(id, "tar", bytes)).toDS()

  test("archive → entries round-trips names and bytes, padding included") {
    val bytes = Tar.archive(members)
    assert(bytes.length % 512 === 0)
    val got = Tar.entries(shard(bytes)).collect()
      .map(e => (e.name, e.bytes.toSeq)).sortBy(_._1)
    assert(got.toSeq === members.map(m => (m._1, m._2.toSeq)).sortBy(_._1))
  }

  test("corruption quarantines the whole shard: checksum flip, truncated " +
      "terminator, junk after terminator, bad octal") {
    val good = Tar.archive(members)
    def parses(b: Array[Byte]): Boolean =
      Tar.entries(shard(b)).count() > 0
    assert(parses(good))
    val flipped = good.clone(); flipped(0) = (flipped(0) ^ 0x01).toByte
    assert(!parses(flipped), "checksum mismatch must quarantine")
    assert(!parses(good.dropRight(1024)), "missing terminator")
    val junk = good.clone(); junk(good.length - 1) = 'x'.toByte
    assert(!parses(junk), "junk inside the zero tail")
    val badOctal = good.clone(); badOctal(124) = 'z'.toByte
    assert(!parses(badOctal), "non-octal size field")
    assert(!parses(Array.empty[Byte]) && !parses(new Array[Byte](100)))
  }

  test("gzip-compressed shards walk transparently; corrupt gzip quarantines") {
    val plain = Tar.archive(members)
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(plain); gz.close()
    val zipped = bos.toByteArray
    val got = Tar.entries(shard(zipped)).collect()
      .map(e => (e.name, e.bytes.toSeq)).sortBy(_._1)
    assert(got.toSeq === members.map(m => (m._1, m._2.toSeq)).sortBy(_._1))
    val corrupt = zipped.clone()
    corrupt(zipped.length / 2) = (corrupt(zipped.length / 2) ^ 0x7f).toByte
    assert(Tar.entries(shard(corrupt)).count() === 0)
  }

  test("non-file members (directories) are skipped, not emitted") {
    val good = Tar.archive(Seq(("f.txt", "x".getBytes("US-ASCII"))))
    // rewrite the member as a directory: typeflag '5', then re-checksum
    val dir = good.clone()
    dir(156) = '5'.toByte
    java.util.Arrays.fill(dir, 148, 156, ' '.toByte)
    var sum = 0L
    (0 until 512).foreach(i => sum += (dir(i) & 0xffL))
    val cs = java.lang.Long.toOctalString(sum)
    val cb = (("0" * (6 - cs.length)) + cs).getBytes("US-ASCII")
    System.arraycopy(cb, 0, dir, 148, 6)
    dir(154) = 0; dir(155) = ' '.toByte
    assert(Tar.entries(shard(dir)).count() === 0)
  }

  test("writeWebdataset: byte-identical across re-runs; overwrite clears " +
      "stale shards; census counts samples") {
    val docs = (0L until 20L).map(i =>
      (i, Map("txt" -> s"t$i".getBytes("US-ASCII"),
        "cls" -> s"${i % 3}".getBytes("US-ASCII"))))
      .toDF("doc_id", "parts")
    val dir = java.nio.file.Files.createTempDirectory("graft-wds").toString
    def shardBytes(): Map[String, Seq[Byte]] = {
      val d = new java.io.File(dir)
      d.listFiles().filter(_.getName.endsWith(".tar")).map(f =>
        f.getName -> java.nio.file.Files.readAllBytes(f.toPath).toSeq).toMap
    }
    val census1 = Tar.writeWebdataset(docs, "doc_id", "parts", dir, 4)
      .as[(Int, Long)].collect().toSeq
    assert(census1.map(_._2).sum === 20L)
    val first = shardBytes()
    assert(first.nonEmpty)
    // plant a stale shard from a "previous layout" — overwrite must clear it
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "shard-00099.tar"), Array[Byte](1))
    val census2 = Tar.writeWebdataset(docs, "doc_id", "parts", dir, 4)
      .as[(Int, Long)].collect().toSeq
    assert(census2 === census1)
    val second = shardBytes()
    assert(!second.contains("shard-00099.tar"), "stale shard survived")
    assert(second === first, "shards are not byte-stable across re-runs")
    // and the files round-trip through the reader
    val back = Tar.entries(shard(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
          dir, first.keys.min))))
      .count()
    assert(back > 0)
  }

  test("entriesStream: shard drops land incrementally, exactly-once, " +
      "streamed == batch, corruption quarantines in-stream") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("graft-tar-stream")
      .toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-tar-ckpt")
      .toString
    val seen = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    def dropShard(n: Int, members: Seq[(String, Array[Byte])],
                  truncate: Boolean = false): Unit = {
      val bytes = Tar.archive(members)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, f"shard-$n%05d.tar"),
        if (truncate) bytes.dropRight(1024) else bytes)
    }
    def runOnce(): Unit = {
      val q = Tar.entriesStream(spark, dir)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch {
          (ds: org.apache.spark.sql.Dataset[Tar.TarEntry], _: Long) =>
            ds.collect().foreach(e =>
              seen.merge(s"${e.asset_id}/${e.name}", 1L, _ + _))
        }.start()
      q.awaitTermination()
    }
    dropShard(1, Seq(("a.txt", "x".getBytes("US-ASCII"))))
    dropShard(2, Seq(("b.txt", "y".getBytes("US-ASCII"))), truncate = true)
    runOnce()
    assert(seen.keySet().size === 1, "corrupt shard must contribute no rows")
    dropShard(3, Seq(("c.txt", "z".getBytes("US-ASCII")),
      ("c.cls", "1".getBytes("US-ASCII"))))
    runOnce()
    assert(seen.keySet().size === 3)
    assert(seen.containsKey("1/a.txt") && seen.containsKey("3/c.txt") &&
      seen.containsKey("3/c.cls"))
    assert(seen.values().stream().allMatch(_ == 1L),
      "a shard was reprocessed despite the checkpoint")
  }

  test("webdatasetSamples groups by stem with extension-keyed parts; " +
      "duplicate extensions keep the first name") {
    val bytes = Tar.archive(Seq(
      ("k1.txt", "t1".getBytes("US-ASCII")),
      ("k1.json", "{\"a\":1}".getBytes("US-ASCII")),
      ("k2.txt", "t2".getBytes("US-ASCII")),
      // a second .txt for k2 under a LATER name: first name must win
      ("k2.txt.dup", "zzz".getBytes("US-ASCII")),
      // dotted DIRECTORY: the stem split happens on the basename, so the
      // directory's dot must not collapse these into one 'images' sample
      ("images.v2/0001.jpg", "j1".getBytes("US-ASCII")),
      ("images.v2/0001.txt", "c1".getBytes("US-ASCII")),
      ("images.v2/0002.jpg", "j2".getBytes("US-ASCII"))))
    val got = Tar.webdatasetSamples(Tar.entries(shard(bytes)))
      .select(col("stem"), col("n_parts"),
        element_at(col("parts"), "txt").cast("string").as("txt"))
      .orderBy("stem")
      .as[(String, Long, String)].collect().toSeq
    // k2.txt.dup has ext "txt.dup" (first dot of the basename splits),
    // so k2 has 2 parts; the dotted directory yields two distinct samples
    assert(got === Seq(
      ("images.v2/0001", 2L, "c1"), ("images.v2/0002", 1L, null),
      ("k1", 2L, "t1"), ("k2", 2L, "t2")))
  }

  test("writeArchive rejects non-ASCII member names loudly") {
    val e = intercept[IllegalArgumentException] {
      Tar.archive(Seq(("café.txt", "x".getBytes("UTF-8"))))
    }
    assert(e.getMessage.contains("ASCII"))
  }
}
