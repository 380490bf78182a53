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

  /** Rewrite the typeflag of the member whose header starts at `off`,
    * re-checksum — forges extension headers the writer never emits. */
  private def retype(b: Array[Byte], off: Int, typ: Char): Array[Byte] = {
    val m = b.clone()
    m(off + 156) = typ.toByte
    java.util.Arrays.fill(m, off + 148, off + 156, ' '.toByte)
    var sum = 0L
    (0 until 512).foreach(i => sum += (m(off + i) & 0xffL))
    val cs = java.lang.Long.toOctalString(sum)
    val cb = (("0" * (6 - cs.length)) + cs).getBytes("US-ASCII")
    System.arraycopy(cb, 0, m, off + 148, 6)
    m(off + 154) = 0; m(off + 155) = ' '.toByte
    m
  }

  test("non-file members (directories) are skipped, not emitted") {
    val good = Tar.archive(Seq(("f.txt", "x".getBytes("US-ASCII"))))
    assert(Tar.entries(shard(retype(good, 0, '5'))).count() === 0)
  }

  test("pax per-file header (typeflag x): path= overrides the next " +
      "member's name — externally produced long paths round-trip") {
    val longName = ("p" * 140) + "/" + ("q" * 90) + ".txt" // > 100+155 split
    def paxRecord(key: String, value: String): String = {
      // len counts the whole record INCLUDING its own digits: fixed point
      val base = s" $key=$value\n".getBytes("UTF-8").length
      var len = base + 1
      while (len.toString.length + base != len)
        len = len.toString.length + base
      s"$len $key=$value\n"
    }
    val pax = (paxRecord("mtime", "1700000000.0") +
      paxRecord("path", longName)).getBytes("UTF-8")
    val raw = Tar.archive(Seq(
      ("PaxHeaders.0/f.txt", pax),
      ("f-truncated.txt", "payload".getBytes("US-ASCII"))))
    val forged = retype(raw, 0, 'x')
    val got = Tar.entries(shard(forged)).collect()
    assert(got.length === 1)
    assert(got.head.name === longName,
      "pax path override must replace the truncated header name")
    assert(new String(got.head.bytes, "US-ASCII") === "payload")
  }

  test("GNU longname (typeflag L) overrides the next member's name") {
    val longName = ("d" * 120) + "/file.txt"
    val raw = Tar.archive(Seq(
      ("././@LongLink", (longName + "\u0000").getBytes("US-ASCII")),
      ("file-trunc.txt", "x".getBytes("US-ASCII"))))
    val got = Tar.entries(shard(retype(raw, 0, 'L'))).collect()
    assert(got.length === 1)
    assert(got.head.name === longName)
  }

  test("unsupported extension headers quarantine the shard instead of " +
      "mis-naming members: 'g', 'K', pax size=") {
    def twoMember(paxData: Array[Byte]) = Tar.archive(Seq(
      ("hdr", paxData), ("f.txt", "x".getBytes("US-ASCII"))))
    assert(Tar.entries(shard(
      retype(twoMember("ignored".getBytes("US-ASCII")), 0, 'g'))).count() === 0)
    assert(Tar.entries(shard(
      retype(twoMember("ignored".getBytes("US-ASCII")), 0, 'K'))).count() === 0)
    // a pax size= record contradicts the next header's size field — this
    // walk cannot honor it, so the shard must quarantine, not mis-slice
    val sizeRec = "11 size=99\n".getBytes("US-ASCII")
    assert(Tar.entries(shard(retype(twoMember(sizeRec), 0, 'x'))).count() === 0)
    // malformed pax framing quarantines too
    val malformed = "notanumber path=x\n".getBytes("US-ASCII")
    assert(Tar.entries(shard(
      retype(twoMember(malformed), 0, 'x'))).count() === 0)
  }

  test("writeWebdataset: byte-identical across re-runs; overwrite clears " +
      "stale shards; census counts samples and checksums shards") {
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
      .as[(Int, Long, String)].collect().toSeq
    assert(census1.map(_._2).sum === 20L)
    val first = shardBytes()
    assert(first.nonEmpty)
    // no writer-task temp debris may survive a successful export
    assert(new java.io.File(dir).listFiles()
      .forall(!_.getName.startsWith("_tmp_")), "temp shard debris left")
    // the census md5 is the digest of the exact delivered file bytes —
    // verified here by re-reading, so a delivery can skip the re-read
    census1.foreach { case (sid, _, md5) =>
      val bytes = first(f"shard-$sid%05d.tar").toArray
      val want = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map(b => f"$b%02x").mkString
      assert(md5 === want, s"census md5 drifts from shard $sid's bytes")
    }
    // plant a stale shard from a "previous layout" — overwrite must clear it
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "shard-00099.tar"), Array[Byte](1))
    val census2 = Tar.writeWebdataset(docs, "doc_id", "parts", dir, 4)
      .as[(Int, Long, String)].collect().toSeq
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

  test("writeWebdataset streams the OLD byte law: each shard equals the " +
      "in-memory archive of its name-sorted members") {
    // the writer was rebuilt from a whole-shard aggregation row to a
    // sorted-row stream — this pin proves the delivered bytes did not move:
    // shard file ≡ archive(members sorted by full member name)
    val docs = (0L until 30L).map(i =>
      (i, Map("txt" -> s"text $i".getBytes("US-ASCII"),
        "json" -> s"""{"i":$i}""".getBytes("US-ASCII"))))
      .toDF("doc_id", "parts")
    val dir = java.nio.file.Files.createTempDirectory("graft-wds-pin").toString
    Tar.writeWebdataset(docs, "doc_id", "parts", dir, 3): Unit
    // re-derive the expected layout from the same shard law
    val assign = graft.ext.Sampling.withShard(
        docs.select(col("doc_id")), "doc_id", 3)
      .as[(Long, Int)].collect().toMap
    (0 until 3).foreach { sid =>
      val expected = Tar.archive(
        (0L until 30L).filter(assign(_) == sid).flatMap(i => Seq(
          (s"$i.txt", s"text $i".getBytes("US-ASCII")),
          (s"$i.json", s"""{"i":$i}""".getBytes("US-ASCII"))))
          .sortBy(_._1))
      val got = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, f"shard-$sid%05d.tar"))
      assert(got.toSeq === expected.toSeq, s"shard $sid bytes moved")
    }
  }

  test("writeWebdataset fails loudly on duplicate sample keys") {
    val docs = Seq(
      (1L, Map("txt" -> "a".getBytes("US-ASCII"))),
      (1L, Map("txt" -> "b".getBytes("US-ASCII"))))
      .toDF("doc_id", "parts")
    val dir = java.nio.file.Files.createTempDirectory("graft-wds-dup").toString
    val e = intercept[org.apache.spark.SparkException] {
      Tar.writeWebdataset(docs, "doc_id", "parts", dir, 1)
    }
    assert(e.getMessage.contains("duplicate sample member") ||
      Option(e.getCause).exists(_.getMessage.contains("duplicate sample member")))
    // the failed attempt's in-flight temp must not survive: the task
    // completion listener fires on failure too, and batch mode (which
    // never clears the directory) would otherwise accumulate debris
    // across retries unboundedly
    def tmpDebris(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.startsWith("_tmp_shard-")).toSeq
    assert(tmpDebris(dir).isEmpty,
      s"failed write left temp debris: ${tmpDebris(dir)}")
    val bDir = java.nio.file.Files.createTempDirectory("graft-wds-dupb")
      .toString
    intercept[org.apache.spark.SparkException] {
      Tar.writeWebdatasetBatch(docs, "doc_id", "parts", bDir, 1, 7L): Unit
    }
    assert(tmpDebris(bDir).isEmpty,
      s"failed batch write left temp debris: ${tmpDebris(bDir)}")
  }

  test("writeWebdataset handles keys where one is a proper prefix of " +
      "another (member-name order ≠ key order) and keys with dots " +
      "(key blocks interleave under the name sort): bytes stay the " +
      "name-sorted archive, census counts the key SET") {
    // 'img1-extra.txt' < 'img1.txt' byte-wise ('-' < '.'): a (key, name)
    // sort would diverge from member-name order and the old writer threw
    // 'member order violation'; the name sort writes it fine
    val docs = Seq(
      ("img1", Map("txt" -> "a".getBytes("US-ASCII"))),
      ("img1-extra", Map("txt" -> "b".getBytes("US-ASCII"))),
      // dotted keys: key 'a' (exts b.a, c) interleaves with key 'a.b'
      // (ext c) under the name sort — a.b.a < a.b.c < a.c — so counting
      // samples by key CONTIGUITY would overcount; the key set does not
      ("a", Map("b.a" -> "x".getBytes("US-ASCII"),
        "c" -> "y".getBytes("US-ASCII"))),
      ("a.b", Map("c" -> "z".getBytes("US-ASCII"))))
      .toDF("doc_id", "parts")
    val dir = java.nio.file.Files.createTempDirectory("graft-wds-pfx").toString
    val census = Tar.writeWebdataset(docs, "doc_id", "parts", dir, 1)
      .as[(Int, Long, String)].collect().toSeq
    assert(census.map(_._2).sum === 4L, "census must count the key set")
    val expected = Tar.archive(Seq(
      ("a.b.a", "x".getBytes("US-ASCII")),
      ("a.b.c", "z".getBytes("US-ASCII")),
      ("a.c", "y".getBytes("US-ASCII")),
      ("img1-extra.txt", "b".getBytes("US-ASCII")),
      ("img1.txt", "a".getBytes("US-ASCII"))))
    val got = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "shard-00000.tar"))
    assert(got.toSeq === expected.toSeq,
      "shard bytes must equal the name-sorted archive")
  }

  test("writeWebdatasetBatch: streamed drops append batch-namespaced " +
      "shards — streamed bytes ≡ the batch writer's, re-delivery is " +
      "idempotent, and the appended dir walks whole") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def parts(i: Long) = Map("txt" -> s"drop $i".getBytes("US-ASCII"))
    val dir = java.nio.file.Files.createTempDirectory("graft-wds-str").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-wds-ck").toString
    val in = MemoryStream[Long]
    val q = in.toDF().toDF("doc_id")
      .select(col("doc_id"),
        map(lit("txt"), concat(lit("drop "), col("doc_id").cast("string"))
          .cast("binary")).as("parts"))
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
    def deliver(ids: Seq[Long]): Unit = {
      in.addData(ids: _*)
      val run = q.foreachBatch { (b: org.apache.spark.sql.DataFrame,
                                  id: Long) =>
        Tar.writeWebdatasetBatch(b, "doc_id", "parts", dir, 2, id): Unit
      }.start()
      run.awaitTermination()
    }
    deliver(0L until 10L)
    deliver(10L until 16L)
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.endsWith(".tar")).sorted
    assert(files.forall(_.matches("shard-b\\d{6}-\\d{5}\\.tar")),
      s"unexpected layout: ${files.mkString(",")}")
    assert(files.count(_.startsWith("shard-b000000-")) > 0)
    assert(files.count(_.startsWith("shard-b000001-")) > 0)
    // streamed bytes ≡ the batch writer run over the same drop
    val batchDir =
      java.nio.file.Files.createTempDirectory("graft-wds-strb").toString
    Tar.writeWebdataset((0L until 10L).map(i => (i, parts(i)))
      .toDF("doc_id", "parts"), "doc_id", "parts", batchDir, 2): Unit
    (0 until 2).foreach { sid =>
      val streamed = java.nio.file.Paths.get(dir,
        f"shard-b000000-$sid%05d.tar")
      val direct = java.nio.file.Paths.get(batchDir, f"shard-$sid%05d.tar")
      assert(java.nio.file.Files.exists(streamed) ===
        java.nio.file.Files.exists(direct))
      if (java.nio.file.Files.exists(direct))
        assert(java.nio.file.Files.readAllBytes(streamed).toSeq ===
          java.nio.file.Files.readAllBytes(direct).toSeq,
          s"streamed shard $sid bytes diverge from the batch writer")
    }
    // re-delivering a batch id is idempotent: same names, same bytes
    val before = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar"))
      .map(f => f.getName ->
        java.nio.file.Files.readAllBytes(f.toPath).toSeq).toMap
    Tar.writeWebdatasetBatch((0L until 10L).map(i => (i, parts(i)))
      .toDF("doc_id", "parts"), "doc_id", "parts", dir, 2, 0L): Unit
    val after = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tar"))
      .map(f => f.getName ->
        java.nio.file.Files.readAllBytes(f.toPath).toSeq).toMap
    assert(after === before, "re-delivery changed the delivered bytes")
    // and the whole appended directory walks as one corpus
    val walked = Tar.entriesStream(spark, dir)
    val seen = scala.collection.mutable.Set.empty[String]
    val wq = walked.writeStream
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-wds-wk").toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[Tar.TarEntry],
                       _: Long) =>
        seen.synchronized { ds.collect().foreach(e => seen += e.name): Unit }
      }.start()
    wq.awaitTermination()
    assert(seen.toSet === (0L until 16L).map(i => s"$i.txt").toSet)
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
