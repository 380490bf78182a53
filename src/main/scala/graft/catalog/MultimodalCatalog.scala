package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{AsofJoin, BloomJoin, Curation, Decontaminate, Dedup, Dsir, Funnel, Graph, Layout, Multimodal, RangeJoin, Resample, Sampling, Similarity, SkewJoin, Sketches, TextStats, Urls}
import graft.streaming.EventTimeOps

/** Multimodal family (E32): container decodes (PPM/WAV/PNG/JPEG/MP4), PNG + baseline-JPEG pixel decode, resize, frame sampling, payload stats.
  *
  * One catalog family of [[ExtQueries]] (split from the former monolith,
  * zero behavior change): `queries` are the Spark definitions, `oracle`
  * the DuckDB restatements the driver gates them against. Portability
  * rules are documented on [[ExtQueries]]; shared fixtures/helpers live
  * in [[CatalogShared]]. */
object MultimodalCatalog {

  /** Two recordings per document for the audio-fingerprint rows: asset
    * 2·id is the base melody (seed = doc_id), asset 2·id+1 the SAME
    * melody re-levelled at gain 3 when doc_id % 3 == 0 (the perceptual
    * twin — byte-different, fingerprint-identical) and unrelated material
    * (seed = doc_id + 500000) otherwise. */
  private def melodyAssets(docs: DataFrame)
      : org.apache.spark.sql.Dataset[Multimodal.RawAsset] = {
    val s = docs.sparkSession
    import s.implicits._
    // synthesis is CPU-bound and the doc-id scan is typically ONE file
    // split — spread it, or the whole corpus synthesizes in a single task
    docs.select(col("doc_id")).as[Long]
      .repartition(s.sparkContext.defaultParallelism)
      .flatMap { id =>
        Seq(
          Multimodal.RawAsset(2 * id, "audio",
            Multimodal.syntheticMelodyPayload(id)),
          Multimodal.RawAsset(2 * id + 1, "audio",
            if (id % 3 == 0) Multimodal.syntheticMelodyPayload(id, gain = 3)
            else Multimodal.syntheticMelodyPayload(id + 500000L)))
      }
  }

  /** Two photos per document for the perceptual-hash rows: asset 2·id is
    * the base scene (seed = doc_id), asset 2·id+1 is a noise-1 re-encode
    * of the SAME scene when doc_id % 3 == 0 (the perceptual twin) and an
    * unrelated scene (seed = doc_id + 500000) otherwise. */
  private def photoAssets(docs: DataFrame)
      : org.apache.spark.sql.Dataset[Multimodal.RawAsset] = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id")).as[Long]
      .repartition(s.sparkContext.defaultParallelism)
      .flatMap { id =>
        Seq(
          Multimodal.RawAsset(2 * id, "image",
            Multimodal.syntheticPhotoPayload(id)),
          Multimodal.RawAsset(2 * id + 1, "image",
            if (id % 3 == 0) Multimodal.syntheticPhotoPayload(id, noise = 1)
            else Multimodal.syntheticPhotoPayload(id + 500000L)))
      }
  }
  /** The photoAssets corpus with the SAME pixel content PNG-encoded —
    * container changes, pixels (and therefore dHash) must not. */
  private def photoPngAssets(docs: DataFrame)
      : org.apache.spark.sql.Dataset[Multimodal.RawAsset] = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id")).as[Long]
      .repartition(s.sparkContext.defaultParallelism)
      .flatMap { id =>
        val twinRgb =
          if (id % 3 == 0) Multimodal.syntheticPhotoRgb(id, noise = 1)
          else Multimodal.syntheticPhotoRgb(id + 500000L)
        Seq(
          Multimodal.RawAsset(2 * id, "image",
            Multimodal.pngEncodeRgb(32, 16, Multimodal.syntheticPhotoRgb(id),
              splitIdat = id % 2 == 0)),
          Multimodal.RawAsset(2 * id + 1, "image",
            Multimodal.pngEncodeRgb(32, 16, twinRgb,
              splitIdat = id % 2 == 1)))
      }
  }

  import CatalogShared._

  // the u=1 / u=2 rows of the fixed-point IDCT basis, interpolated into
  // the mm_decode_jpeg_pixels oracle so both engines share one table
  private val jBasis1 = Multimodal.JpegBasisA(1).mkString(", ")
  private val jBasis2 = Multimodal.JpegBasisA(2).mkString(", ")

  /** WebDataset twin of [[photoPngAssets]]: one shard per doc holding two
    * PNG samples (p0.png/p0.txt, p1.png/p1.txt) — p1 is the noise-1
    * re-encode of the SAME scene at doc_id % 3 == 0, an unrelated scene
    * otherwise. Same (seed, noise) law as photoAssets, so the SAME
    * pixel-formula oracle covers the shard walk AND the codec. */
  private def tarPhotoAssets(docs: DataFrame)
      : org.apache.spark.sql.Dataset[Multimodal.RawAsset] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(col("doc_id")).as[Long]
      .repartition(sp.sparkContext.defaultParallelism)
      .map { id =>
        def png(seed: Long, noise: Int) = Multimodal.pngEncodeRgb(32, 16,
          Multimodal.syntheticPhotoRgb(seed, noise))
        val twin = if (id % 3 == 0) png(id, 1) else png(id + 500000L, 0)
        Multimodal.RawAsset(id, "tar", graft.etl.Tar.archive(Seq(
          ("p0.png", png(id, 0)),
          ("p0.txt", s"caption $id".getBytes("US-ASCII")),
          ("p1.png", twin),
          ("p1.txt", s"caption twin $id".getBytes("US-ASCII")))))
      }
  }

  /** One WebDataset-style TAR shard per document: two samples (stems
    * a<id>, b<id>), two parts each (.txt, .cls), every byte an ASCII
    * formula of doc_id so the oracle restates members without touching
    * the tar layer — hash equality then PROVES the USTAR walk (headers,
    * checksums, 512-blocking, terminator) reproduced the construction.
    * Docs with doc_id % 10 == 9 ship a TRUNCATED shard (terminator cut):
    * the whole shard must quarantine to no rows. */
  private def tarAssets(docs: DataFrame)
      : org.apache.spark.sql.Dataset[Multimodal.RawAsset] = {
    val sp = docs.sparkSession
    import sp.implicits._
    docs.select(col("doc_id")).as[Long]
      .repartition(sp.sparkContext.defaultParallelism)
      .map { id =>
        val members = Seq(
          (s"a$id.txt", s"text a $id ${(id * 7) % 13}".getBytes("US-ASCII")),
          (s"a$id.cls", s"${id % 5}".getBytes("US-ASCII")),
          (s"b$id.txt", s"text b $id ${(id * 11) % 17}".getBytes("US-ASCII")),
          (s"b$id.cls", s"${id % 3}".getBytes("US-ASCII")))
        val bytes = graft.etl.Tar.archive(members)
        Multimodal.RawAsset(id, "tar",
          if (id % 10 == 9) bytes.dropRight(1024) else bytes)
      }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // WebDataset TAR shard walk: real USTAR parse (octal fields, header
    // checksum verified, 512-byte blocking, terminator) over in-memory
    // shards — one row per member file, truncated shards quarantine to
    // no rows (the id % 10 == 9 plants vanish from the census).
    "etl_tar_scan" -> ((s, d) => {
      val shards = tarAssets(t(s, d, "documents").where(col("doc_id") < 60))
      graft.etl.Tar.entries(shards).toDF()
        .select(col("asset_id"), col("name"),
          length(col("bytes")).as("n_bytes"),
          col("bytes").cast("string").as("content"))
        .orderBy("asset_id", "name")
    }),


    // The member walk grouped into SAMPLES (the WebDataset contract:
    // stem up to the first dot keys the sample, the rest is the part's
    // extension) — the (image, caption, label) row a multimodal trainer
    // consumes. Parts surface as a map; the row projects the text parts.
    "etl_webdataset_group" -> ((s, d) => {
      val shards = tarAssets(t(s, d, "documents").where(col("doc_id") < 60))
      graft.etl.Tar.webdatasetSamples(graft.etl.Tar.entries(shards))
        .select(col("asset_id"), col("stem"), col("n_parts"),
          element_at(col("parts"), "txt").cast("string").as("txt"),
          element_at(col("parts"), "cls").cast("string").as("cls"))
        .orderBy("asset_id", "stem")
    }),


    // The EXPORT half round-tripped (the etl_csv_roundtrip pattern):
    // documents → writeWebdataset (hash-sharded, byte-stable tar files)
    // → binaryFile read-back → USTAR walk → member census. The oracle
    // restates the census from the content formulas alone — a dropped
    // sample, a mis-built header, or a stale shard surviving the
    // overwrite all change the census.
    "etl_webdataset_roundtrip" -> ((s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents").where(col("doc_id") < 60)
        .select(col("doc_id"),
          map(
            lit("txt"), encode(
              concat(lit("text "), col("doc_id").cast("string")), "UTF-8"),
            lit("cls"), encode(
              (col("doc_id") % 5).cast("string"), "UTF-8")).as("parts"))
      val dir = scratchDir("graft_wds_rt", d)
      graft.etl.Tar.writeWebdataset(docs, "doc_id", "parts", dir,
        nShards = 7): Unit
      val shards = s.read.format("binaryFile").load(s"$dir/*.tar")
        .select(regexp_extract(col("path"), "shard-(\\d+)\\.tar", 1)
          .cast("long").as("sid"), col("content"))
        .as[(Long, Array[Byte])]
        .map { case (sid, bytes) => Multimodal.RawAsset(sid, "tar", bytes) }
      graft.etl.Tar.entries(shards).toDF()
        .select(col("name"), col("bytes").cast("string").as("content"))
        .orderBy("name")
    }),


    // The export CENSUS verified against the delivered bytes: the writer
    // streams an md5 per shard while writing; the row re-reads each shard
    // file and compares — `md5_ok` proves a delivery can trust the census
    // checksum WITHOUT this re-read. The oracle restates the shard
    // assignment (the unit-hash law) and the per-shard sample counts; a
    // drifted checksum, a dropped sample, or a mis-assigned shard all
    // break the hash.
    "etl_webdataset_census" -> ((s, d) => {
      val docs = t(s, d, "documents").where(col("doc_id") < 60)
        .select(col("doc_id"),
          map(
            lit("txt"), encode(
              concat(lit("text "), col("doc_id").cast("string")), "UTF-8"),
            lit("cls"), encode(
              (col("doc_id") % 5).cast("string"), "UTF-8")).as("parts"))
      val dir = scratchDir("graft_wds_census", d)
      val census =
        graft.etl.Tar.writeWebdataset(docs, "doc_id", "parts", dir, 7)
      val readBack = s.read.format("binaryFile").load(s"$dir/*.tar")
        .select(regexp_extract(col("path"), "shard-(\\d+)\\.tar", 1)
          .cast("int").as("shard_id"),
          md5(col("content")).as("file_md5"))
      census.join(readBack, Seq("shard_id"))
        .select(col("shard_id"), col("n_samples"),
          (col("md5") === col("file_md5")).as("md5_ok"))
        .orderBy("shard_id")
    }),


    // The COMPOSED multimodal ingest: WebDataset shard → USTAR walk →
    // real PNG decode (CRC-verified inflate + unfilter) → perceptual
    // dHash, one row per image member. The oracle is the SAME
    // pixel-formula chain as mm_image_dhash — both the tar container and
    // the PNG codec must be invisible to the hash.
    "mm_webdataset_dhash" -> ((s, d) => {
      import s.implicits._
      val shards =
        tarPhotoAssets(t(s, d, "documents").where(col("doc_id") < 40))
      val pngs = graft.etl.Tar.entries(shards)
        .filter(e => e.name.endsWith(".png"))
        .map(e => Multimodal.RawAsset(
          2 * e.asset_id + (if (e.name.startsWith("p1")) 1L else 0L),
          "image", e.bytes))
      Multimodal.imageDHashDecoded(pngs).toDF().orderBy("asset_id")
    }),


    // The FULL LAION loop in ONE gated row: WebDataset drop (one shard per
    // 30%-split doc, two PNG samples: p0 a novel scene; p1 a noise-1
    // re-encode of a SERVED-store scene at doc_id%3==0 — the cross-drop
    // duplicate the probe must catch — of p0's own scene at %3==1 — the
    // intra-drop duplicate survivor resolution must collapse — else novel)
    // → tar walk → real PNG decode → dHash → probe of the sidecar-checked
    // served fingerprint store → survivors → writeWebdataset of the
    // deduped corpus → read-back walk + RE-DECODE. The output is derived
    // entirely from the delivered shard bytes (stem, shard file, decoded
    // pixels, caption member); the oracle restates pixels, probe,
    // reachability, survivor census, shard assignment, and captions — a
    // wrong answer in ANY stage (codec, tar, probe geometry, CC, export)
    // breaks the hash.
    "mm_webdataset_dedup_e2e" -> ((s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents").where(col("doc_id") < 60)
      // the served store: built once per process, family sidecar written
      val storeDir = scratchDir("graft_fp_store_e2e", d)
      if (!new java.io.File(storeDir).exists()) {
        val storeFp = Multimodal.imageDHash(
          docs.where(col("doc_id") % 10 < 7).select(col("doc_id")).as[Long]
            .repartition(s.sparkContext.defaultParallelism)
            .map(id => Multimodal.RawAsset(id, "image",
              Multimodal.syntheticPhotoPayload(id)))).toDF()
        Dedup.fingerprintStoreWrite(storeFp, "asset_id", "dhash", storeDir,
          "image-dhash-9x8")
      }
      val shards = docs.where(col("doc_id") % 10 >= 7)
        .select(col("doc_id")).as[Long]
        .repartition(s.sparkContext.defaultParallelism)
        .map { id =>
          def png(seed: Long, noise: Int) = Multimodal.pngEncodeRgb(32, 16,
            Multimodal.syntheticPhotoRgb(seed, noise))
          val a0 = 2 * id; val a1 = 2 * id + 1
          val p1 =
            if (id % 3 == 0) png(id % 5, 1)            // cross-drop dup
            else if (id % 3 == 1) png(id + 900000L, 1) // intra-drop dup
            else png(id + 800000L, 0)                  // novel
          Multimodal.RawAsset(id, "tar", graft.etl.Tar.archive(Seq(
            (s"$a0.png", png(id + 900000L, 0)),
            (s"$a0.txt", s"caption $a0".getBytes("US-ASCII")),
            (s"$a1.png", p1),
            (s"$a1.txt", s"caption $a1".getBytes("US-ASCII")))))
        }
      val outDir = scratchDir("graft_wds_dedup_out", d)
      Multimodal.webdatasetDedupExport(shards, storeDir, outDir,
        nShards = 4): Unit
      // verification surface: EVERYTHING below re-derives from the
      // delivered bytes alone
      val back = s.read.format("binaryFile").load(s"$outDir/*.tar")
        .select(regexp_extract(col("path"), "shard-(\\d+)\\.tar", 1)
          .cast("long").as("sid"), col("content"))
        .as[(Long, Array[Byte])]
        .map { case (sid, b) => Multimodal.RawAsset(sid, "tar", b) }
      val samplesBack =
        graft.etl.Tar.webdatasetSamples(graft.etl.Tar.entries(back))
          .select(col("asset_id").cast("int").as("shard_id"),
            col("stem").cast("long").as("aid"),
            element_at(col("parts"), "png").as("png"),
            element_at(col("parts"), "txt").cast("string").as("caption"))
      val rehash = Multimodal.imageDHashDecoded(
          samplesBack.select(col("aid"), col("png"))
            .as[(Long, Array[Byte])]
            .map { case (id, b) => Multimodal.RawAsset(id, "image", b) })
        .toDF().select(col("asset_id").as("aid"), col("dhash"))
      samplesBack.join(rehash, Seq("aid"))
        .select(col("aid").as("asset_id"), col("shard_id"), col("dhash"),
          col("caption"))
        .orderBy("asset_id")
    }),


    // Binary payload + typed metadata stats (decode itself is the stubbed
    // per-partition step — see graft.ext.Multimodal and its spec).
    "mm_payload_stats" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Multimodal.assetsFromDocuments(docs)
        .join(docs.select(col("doc_id").as("asset_id"), col("text")), "asset_id")
        .select(col("asset_id"), col("modality"),
          col("meta.bytes").as("payload_bytes"),
          headerSum(col("text")).as("header_sum"))
        .orderBy("asset_id")
    }),


    // Frame-sampling plumbing over video assets: every 2nd 16-byte frame,
    // counted per asset (the decode itself is the stubbed mapPartitions
    // step; this checks the explode/sampling arithmetic end-to-end).
    "mm_frame_sample" -> ((s, d) => {
      val assets = Multimodal.assetsFromDocuments(t(s, d, "documents"))
      Multimodal.frameSample(assets, frameBytes = 16, everyN = 2)
        .groupBy(col("asset_id"))
        .agg(count(lit(1)).as("n_sampled"), max(col("frame_no")).as("max_frame"))
        .orderBy("asset_id")
    }),


    // End-to-end container decode gate: synthesize a spec-valid payload per
    // doc (PPM/WAV/PNG/JPEG round-robin, dimensions derived from doc_id),
    // run the REAL ByteCodec parse in the distributed typed-decode path,
    // emit the parsed geometry. The oracle restates the construction
    // arithmetic — any header-parse bug (endianness, offsets, marker/chunk
    // walk) makes parse ≠ construction and breaks the hash.
    "mm_decode_containers" -> ((s, d) => {
      import s.implicits._
      val ids = t(s, d, "documents").select(col("doc_id")).as[Long]
      val assets = ids.map { id =>
        val (fmt, bytes) = Multimodal.syntheticContainerPayload(id)
        Multimodal.RawAsset(id, fmt, bytes)
      }
      Multimodal.decode(assets).toDF()
        .select(col("asset_id"), col("modality").as("fmt"),
          col("width"), col("height"), col("n_frames"))
        .orderBy("asset_id")
    }),


    // Frame-level AUDIO FEATURE EXTRACTION (E32h) over real WAV bytes:
    // every doc synthesizes a mono 16-bit PCM square wave (half-period,
    // amplitude, and length all id-derived integers), the REAL chunk walk
    // recovers the samples, and the kernel emits per-16-sample-frame
    // energy / zero-crossing count / peak — the classic VAD triple, all
    // exact integers. The oracle regenerates every sample from the
    // construction arithmetic and recomputes the features, so an
    // endianness, framing, sign, or offset bug hash-fails.
    "mm_audio_features" -> ((s, d) => {
      import s.implicits._
      val ids = t(s, d, "documents").select(col("doc_id")).as[Long]
      val assets = ids.map(id =>
        Multimodal.RawAsset(id, "wav", Multimodal.syntheticAudioPayload(id)))
      Multimodal.audioFrameFeatures(assets, frameSize = 16).toDF()
        .orderBy("asset_id", "frame_no")
    }),


    // SCENE-CHANGE signal (E32i): every doc synthesizes a multi-frame
    // netpbm P6 stream (each frame a spec-valid image, pixel bytes pure
    // id/frame/offset arithmetic); the real header-walk recovers the
    // frames and the kernel emits the L1 delta per consecutive pair — the
    // number every practical shot detector thresholds. The oracle
    // regenerates every byte from the construction and recomputes the
    // deltas, so a header-walk, offset, or pairing bug hash-fails.
    "mm_frame_diff" -> ((s, d) => {
      import s.implicits._
      val ids = t(s, d, "documents").select(col("doc_id")).as[Long]
      val assets = ids.map(id =>
        Multimodal.RawAsset(id, "video", Multimodal.syntheticVideoPayload(id)))
      Multimodal.videoFrameDiff(assets).toDF()
        .orderBy("asset_id", "frame_no")
    }),


    // TRIM + LEVEL invariant audio matching — the Shazam-shaped law: the
    // twin drops the source's first 5 frames AND plays at gain 3; sliding
    // 65-frame window prints (stride 1) make its windows IDENTICAL to the
    // source's shifted by 5 (gain cancels in every energy comparison), so
    // offset voting recovers the pair at offset −5 with zero-Hamming
    // matches. Same generic voting operator as the video row (posCol /
    // fpCol seams); the oracle restates windows, votes, and tie-break
    // from the amplitude contour alone.
    "mm_audio_neardup_shifted" -> ((s, d) => {
      import s.implicits._
      val assets = t(s, d, "documents").select(col("doc_id")).as[Long]
        .repartition(s.sparkContext.defaultParallelism)
        .flatMap { id =>
          Seq(
            Multimodal.RawAsset(2 * id, "audio",
              Multimodal.syntheticMelodyPayload(id, 1, frames = 80)),
            Multimodal.RawAsset(2 * id + 1, "audio",
              if (id % 3 == 0)
                Multimodal.syntheticMelodyPayload(id, 3, frames = 75,
                  startFrame = 5)
              else
                Multimodal.syntheticMelodyPayload(id + 500000L, 1,
                  frames = 75)))
        }
      Multimodal.videoNearDupShifted(
          Multimodal.audioWindowPrints(assets).toDF(),
          maxHamming = 2, minMatched = 8,
          posCol = "window_no", fpCol = "aprint")
        .orderBy("a_id", "b_id")
    }),


    // Per-channel COLOR HISTOGRAM (E32j): exact integer bucket counts
    // (value div 32, 8 buckets x RGB) over the first frame of the same
    // P6 stream — image statistics as a feature (exposure profiling,
    // near-dup prefilters). The oracle regenerates the pixels and
    // re-buckets them.
    // PERCEPTUAL image fingerprint (dHash): grayscale → 9×8 exact-integer
    // box means → 64 adjacent-cell comparisons — the fingerprint every
    // image-dedup pipeline (LAION-class) runs before pixel-exact compare.
    // Fixture: two photos per doc — a base scene, and either a noise-1
    // checkerboard RE-ENCODE of the same scene (doc_id % 3 == 0: the
    // perceptual twin, byte-different) or an unrelated scene. The oracle
    // regenerates every pixel and recomputes cells and bits verbatim.
    "mm_image_dhash" -> ((s, d) => {
      import s.implicits._
      Multimodal.imageDHash(photoAssets(t(s, d, "documents"))).toDF()
        .orderBy("asset_id")
    }),


    // dHash BEHIND THE REAL PNG DECODER (imageDHashDecoded): the same
    // photo corpus, PNG-encoded (real row filters, zlib, CRC-32, split
    // IDAT on even ids) and decoded back through the CRC-verified
    // inflate + unfilter path before hashing. The oracle is the SAME
    // pixel-formula restatement as mm_image_dhash — hash equality proves
    // the encoder/decoder pair is pixel-exact AND that the perceptual
    // hash is container-independent (a LAION-shaped corpus ships
    // PNG/JPEG, not PPM).
    "mm_image_dhash_png" -> ((s, d) => {
      import s.implicits._
      Multimodal.imageDHashDecoded(photoPngAssets(t(s, d, "documents"))).toDF()
        .orderBy("asset_id")
    }),


    // Image NEAR-DUP pairs over the dHash: 8×8-bit banded Hamming join
    // (exact ≤ 7 by pigeonhole; never all-pairs) at τ = 6 — the twins sit
    // at hamming ≤ 8 (avg ~2), unrelated scenes at ≥ 19, so the join
    // recovers re-encoded copies and nothing random. The oracle restates
    // the dHash construction for BOTH assets and the all-pairs filter
    // (equivalent to the banded join at this τ by pigeonhole).
    "mm_image_neardup" -> ((s, d) => {
      import s.implicits._
      val fp = Multimodal.imageDHash(photoAssets(t(s, d, "documents"))).toDF()
      Dedup.hammingPairs64(fp, "asset_id", "dhash", maxHamming = 6)
        .orderBy("a_id", "b_id")
    }),


    // INCREMENTAL perceptual image dedup — "is this image already in the
    // corpus": a batch drop probes the SERVED dHash store (8 bytes of
    // state per ingested image) without re-decoding anything in it. Store
    // = one photo per 70%-split doc; batch = per 30%-split doc either a
    // noise-1 re-encode of store photo (doc_id % 5) — the planted
    // cross-drop duplicate — or a novel scene. 8×8-bit bands, τ=6 exact by
    // pigeonhole; batch bands broadcast so the store streams. The oracle
    // regenerates every pixel of BOTH sides and restates the probe as the
    // all-pairs batch×store Hamming filter.
    "mm_image_dhash_store" -> ((s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents")
      val store = Multimodal.imageDHash(
        docs.where(col("doc_id") % 10 < 7).select(col("doc_id")).as[Long]
          .repartition(s.sparkContext.defaultParallelism)
          .map(id => Multimodal.RawAsset(id, "image",
            Multimodal.syntheticPhotoPayload(id)))).toDF()
      val batch = Multimodal.imageDHash(
        docs.where(col("doc_id") % 10 >= 7).select(col("doc_id")).as[Long]
          .repartition(s.sparkContext.defaultParallelism)
          .map(id => Multimodal.RawAsset(1000000L + id, "image",
            if (id % 2 == 0) Multimodal.syntheticPhotoPayload(id % 5, noise = 1)
            else Multimodal.syntheticPhotoPayload(id + 900000L)))).toDF()
      Dedup.hammingAgainstStore64(store, batch, "asset_id", "dhash",
          maxHamming = 6)
        .orderBy("batch_id", "store_id")
    }),


    // STREAMING perceptual dedup, batch-driven: the stateful 64-bit
    // Hamming LSH operator over the photo corpus's decoded dHashes —
    // re-encoded twins flagged at ingest time. With unbounded buckets the
    // emitted pair set equals the batch banded join exactly (pigeonhole at
    // τ=6 < 8 bands; the fingerprint IS the state, so distances are true
    // popcounts, not estimates) — the oracle restates the all-pairs
    // Hamming filter over the regenerated pixels; the statefulness itself
    // is MemoryStream-pinned (streamed == batch) in EventTimeSpec.
    "mm_image_neardup_stream" -> ((s, d) => {
      val fp = Multimodal.imageDHash(photoAssets(t(s, d, "documents"))).toDF()
      EventTimeOps.streamingHammingDedup(fp, "asset_id", "dhash",
          maxHamming = 6,
          maxPerBucket = Int.MaxValue, maxBatchPerBucket = Int.MaxValue)
        .dropDuplicates("a_id", "b_id")
        .orderBy("a_id", "b_id")
        .toDF()
    }),


    // Per-frame PERCEPTUAL video hash: the frame-hash sequence clip-level
    // dedup matches on — same integer dHash law as the image rows, one
    // row per decoded frame of a photo-sized multi-frame P6 stream. The
    // oracle regenerates every frame's pixels (frame f = the photo scene
    // seeded doc_id + 31·f) through the shared pixel→dHash chain.
    "mm_video_framehash" -> ((s, d) => {
      import s.implicits._
      val assets = t(s, d, "documents").select(col("doc_id")).as[Long]
        .repartition(s.sparkContext.defaultParallelism)
        .map(id => Multimodal.RawAsset(id, "video",
          Multimodal.syntheticPhotoVideoPayload(id, (2 + id % 3).toInt)))
      Multimodal.videoDHashFrames(assets).toDF()
        .orderBy("asset_id", "frame_no")
    }),


    // CLIP-level near-dup: two clips per doc — the original and either its
    // frame-for-frame noise-1 re-encode (doc_id % 3 == 0: the planted
    // duplicate clip) or unrelated material. Banded Hamming join WITHIN
    // each frame position (exact at τ=6 by pigeonhole), then clips pair
    // when ≥ half the shorter clip's frames match — the aligned-sequence
    // video-dedup law, restated end to end by the oracle.
    "mm_video_neardup" -> ((s, d) => {
      import s.implicits._
      val assets = t(s, d, "documents").select(col("doc_id")).as[Long]
        .repartition(s.sparkContext.defaultParallelism)
        .flatMap { id =>
          Seq(
            Multimodal.RawAsset(2 * id, "video",
              Multimodal.syntheticPhotoVideoPayload(id, 3)),
            Multimodal.RawAsset(2 * id + 1, "video",
              if (id % 3 == 0)
                Multimodal.syntheticPhotoVideoPayload(id, 3, noise = 1)
              else Multimodal.syntheticPhotoVideoPayload(id + 700000L, 3)))
        }
      Multimodal.videoNearDupPairs(
          Multimodal.videoDHashFrames(assets).toDF(),
          maxHamming = 6, minFrac = 0.5)
        .orderBy("a_id", "b_id")
    }),


    // SHIFT-INVARIANT clip near-dup (the trimmed-copy case the aligned
    // law misses): the planted twin drops the source's first frame AND
    // noise-re-encodes the rest — frame f of the twin is source frame
    // f+1's scene (seed id+31+31f), so matches vote for offset −1.
    // Unaligned banded join + offset voting with modal-offset/smallest
    // tie-break; the oracle restates the whole vote.
    "mm_video_neardup_shifted" -> ((s, d) => {
      import s.implicits._
      val assets = t(s, d, "documents").select(col("doc_id")).as[Long]
        .repartition(s.sparkContext.defaultParallelism)
        .flatMap { id =>
          Seq(
            Multimodal.RawAsset(2 * id, "video",
              Multimodal.syntheticPhotoVideoPayload(id, 4)),
            Multimodal.RawAsset(2 * id + 1, "video",
              if (id % 3 == 0)
                Multimodal.syntheticPhotoVideoPayload(id + 31L, 3, noise = 1)
              else Multimodal.syntheticPhotoVideoPayload(id + 700000L, 3)))
        }
      Multimodal.videoNearDupShifted(
          Multimodal.videoDHashFrames(assets).toDF(),
          maxHamming = 6, minMatched = 2)
        .orderBy("a_id", "b_id")
    }),


    // The COMPOSED image-dedup recipe (the LAION-shaped pipeline end to
    // end): decode → perceptual hash → banded Hamming pairs → connected
    // components → survivor census (cluster rep = min id; singletons
    // survive as themselves). A≈B, B≈C collapse to ONE survivor — the
    // step pairwise dedup forgets. The oracle regenerates the pixels and
    // restates pairs + recursive reachability + the census.
    "mm_image_dedup_pipeline" -> ((s, d) => {
      Multimodal.imageDedupSurvivors(photoAssets(t(s, d, "documents")),
          maxHamming = 6)
        .orderBy("asset_id")
    }),


    // PERCEPTUAL audio fingerprint (energy-delta sign chain — the
    // Shazam/Chromaprint trick's portable skeleton): per-frame Σx² off
    // REAL decoded WAV bytes, bit f = E(f+1) > E(f). Fixture: two
    // recordings per doc — a melody, and either the SAME melody at
    // gain 3 (doc_id % 3 == 0: the re-levelled twin) or unrelated
    // material. The oracle restates the bits from the amplitude contour
    // ALONE (energies are 16·gain²·A(f)², so gain cancels in every
    // comparison) — hash equality therefore PROVES the level-invariance
    // law on top of the decode.
    "mm_audio_print" -> ((s, d) => {
      Multimodal.audioFingerprint(melodyAssets(t(s, d, "documents"))).toDF()
        .orderBy("asset_id")
    }),


    // Audio NEAR-DUP pairs over the fingerprint: the same banded 64-bit
    // Hamming join as the image path (exact ≤ 7 by pigeonhole), τ = 2 —
    // re-levelled twins land at hamming 0 exactly.
    "mm_audio_neardup" -> ((s, d) => {
      val fp = Multimodal.audioFingerprint(
        melodyAssets(t(s, d, "documents"))).toDF()
      Dedup.hammingPairs64(fp, "asset_id", "aprint", maxHamming = 2)
        .orderBy("a_id", "b_id")
    }),


    "mm_color_histogram" -> ((s, d) => {
      import s.implicits._
      val ids = t(s, d, "documents").select(col("doc_id")).as[Long]
      val assets = ids.map(id =>
        Multimodal.RawAsset(id, "image", Multimodal.syntheticVideoPayload(id)))
      Multimodal.colorHistogram(assets).toDF()
        .orderBy("asset_id", "channel", "bucket")
    }),


    // FULL baseline-JPEG pixel decode (E32m): real marker walk, DQT/DHT
    // parsing, canonical-Huffman entropy decode of the DC-difference chain
    // and run-length ACs, dequantize + de-zigzag, and the exact-integer
    // direct IDCT (13-bit half-cosine basis at scale 2^26) with level
    // shift, clamp, and MCU edge cropping. The synthetic corpus encodes
    // each block's DC and one AC through REAL Annex-K Huffman tables with
    // byte stuffing; the oracle restates the decode arithmetically from
    // the coefficient construction — a Huffman, zigzag, predictor, or
    // cropping bug hash-fails. Every 29th asset ships with truncated
    // entropy data and must be quarantined (the oracle excludes those ids).
    "mm_decode_jpeg_pixels" -> ((s, d) => {
      import s.implicits._
      val ids = t(s, d, "documents").select(col("doc_id")).as[Long]
      val assets = ids.map { id =>
        Multimodal.RawAsset(id, "jpeg",
          Multimodal.syntheticJpegPixelPayload(id, corrupt = id % 29 == 0))
      }
      assets.mapPartitions(_.flatMap(Multimodal.decodeJpegPixels)).toDF()
        .orderBy("asset_id")
    }),


    // FULL PNG pixel decode (E32f): CRC-verified chunk walk, multi-IDAT
    // zlib concatenation, Inflater, and real unfiltering of all five PNG
    // filter types (every synthetic image cycles None/Sub/Up/Average/Paeth
    // per row). The oracle restates the pixel-construction arithmetic
    // ((id + i) % 256): exact channel sums plus the position-weighted sum
    // that pins byte ORDER, so any filter/stride/offset bug hash-fails.
    // Every 29th asset carries a corrupted IDAT (flipped byte AFTER the
    // CRC was computed) and must be quarantined — the oracle excludes
    // exactly those ids, so skipping CRC verification also hash-fails.
    "mm_decode_png_pixels" -> ((s, d) => {
      import s.implicits._
      val ids = t(s, d, "documents").select(col("doc_id")).as[Long]
      val assets = ids.map { id =>
        Multimodal.RawAsset(id, "png",
          Multimodal.syntheticPngPixelPayload(id, corrupt = id % 29 == 0))
      }
      assets.mapPartitions(_.flatMap(Multimodal.decodePngPixels)).toDF()
        .orderBy("asset_id")
    }),


    // Image RESIZE stage (E32e): nearest-neighbor 2× downsample of the
    // synthesized P6 PPMs with the REAL byte walk (header parse + strided
    // pixel reads); exact per-channel integer sums. The oracle restates
    // the pixel-construction arithmetic ((id + offset) % 256 at the
    // sampled offsets), so parse ≠ construction — a stride/offset/header
    // bug — hash-fails. Non-PPM assets (3 of every 4) emit no row.
    "mm_resize" -> ((s, d) => {
      import s.implicits._
      val ids = t(s, d, "documents").select(col("doc_id")).as[Long]
      val assets = ids.map { id =>
        val (fmt, bytes) = Multimodal.syntheticContainerPayload(id)
        Multimodal.RawAsset(id, fmt, bytes)
      }
      Multimodal.resizePpm(assets, factor = 2).toDF().orderBy("asset_id")
    }),


    // Per-hour quantile sketch (E19f): the E19c histogram grouped by hour
    // — the windowed-percentile dashboard (p50/p95 latency-style) from the
    // same mergeable counters; one (hr,bucket)-keyed count, windows only
    // on the aggregated frame.
    "q_quantile_windowed" -> ((s, d) => {
      val ev = t(s, d, "events").select(
        date_format(date_trunc("hour", col("ts")), "yyyyMMddHH").as("hr"),
        col("value"))
      Sketches.histogramQuantiles(ev, "hr", "value", width = 25.0,
          nBuckets = 20, phis = Seq(("p50", 1, 2), ("p95", 19, 20)))
        .withColumnRenamed("g", "hr")
        .orderBy("hr")
    }),


    // Corpus snapshot DIFF (E28d): the dataset-versioning audit — old vs a
    // deterministically perturbed new snapshot (drop %17, rewrite %13, add
    // %19 under shifted ids), compared by doc_id + text fingerprint via
    // ONE full-outer join; the added/removed/changed/unchanged census is
    // what a release note and a reproducibility check both need.
    "curation_snapshot_diff" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val old = docs.select(col("doc_id"), md5(col("text")).as("fp_old"))
      val neu = docs.where(col("doc_id") % 17 =!= 0)
        .select(col("doc_id"), md5(when(col("doc_id") % 13 === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text"))).as("fp_new"))
        .unionByName(docs.where(col("doc_id") % 19 === 0)
          .select((col("doc_id") + 100000L).as("doc_id"),
            md5(col("text")).as("fp_new")))
      old.join(neu, Seq("doc_id"), "full_outer")
        .agg(
          sum(when(col("fp_old").isNull, 1L).otherwise(0L)).as("n_added"),
          sum(when(col("fp_new").isNull, 1L).otherwise(0L)).as("n_removed"),
          sum(when(col("fp_old").isNotNull && col("fp_new").isNotNull &&
            col("fp_old") =!= col("fp_new"), 1L).otherwise(0L)).as("n_changed"),
          sum(when(col("fp_old") === col("fp_new"), 1L).otherwise(0L))
            .as("n_unchanged"))
    }),


    // Word2vec-style negative-sampling table (E23k): unigram^(3/4)
    // weights (Mikolov et al. 2013) with NO float power — c^(3/4) =
    // floor(sqrt(c·floor(sqrt(c)))): sqrt is IEEE-correctly-rounded on
    // exact-integer inputs < 2^53, so both engines floor the same value
    // and the table restates exactly. Top-15 tokens + fixed-point shares;
    // one token aggregation, then tiny frames only.
    "sample_negatives" -> ((s, d) => {
      val toks = t(s, d, "documents")
        .select(explode(filter(TextStats.tokens(col("text")),
          x => length(x) > 0)).as("tok"))
      val top = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok")).limit(15)
        .withColumn("w34",
          expr("CAST(floor(sqrt(CAST(cnt * CAST(floor(sqrt(CAST(cnt AS DOUBLE))) AS BIGINT) AS DOUBLE))) AS BIGINT)"))
      top.crossJoin(top.agg(sum(col("w34")).as("w_total")))
        .select(col("tok"), col("cnt"), col("w34"),
          expr("(w34 * 1000000) div w_total").as("share_fp"))
        .orderBy(col("cnt").desc, col("tok"))
    }),


    // Source-concentration diagnostics (E28c): HHI (Σ share², the
    // antitrust/data-mixing concentration index) and top-source share in
    // exact integer fixed-point (×10⁶, integral division) — the balance
    // check a mixture designer runs before weighting sources. One count
    // aggregation + a 1-row reduction.
    "curation_source_mix" -> ((s, d) => {
      t(s, d, "documents")
        .groupBy(col("source")).agg(count(lit(1)).as("cnt"))
        .agg(count(lit(1)).as("n_sources"), sum(col("cnt")).as("n_total"),
          sum(col("cnt") * col("cnt")).as("sum_sq"), max(col("cnt")).as("max_cnt"))
        .select(col("n_sources"),
          expr("(sum_sq * 1000000) div (n_total * n_total)").as("hhi_fp"),
          expr("(max_cnt * 1000000) div n_total").as("top_share_fp"))
    }),


    // EXACT distributed selection (E19k): the exact median and p90 of
    // value-cents via 256-ary histogram refinement — ≤5 full passes for
    // any 40-bit domain, NO sort anywhere, 256 longs of driver state.
    // Completes the quantile ladder: q_sketch_quantiles estimates,
    // q_exact_median pays a per-group window SORT (verification-class by
    // design), this is the exact answer in the shape that survives 100 TB.
    // k-th-of-sorted-multiset semantics, restated by the oracle as a rank
    // lookup.
    "q_exact_quantiles" -> ((s, d) => {
      import s.implicits._
      val cents = t(s, d, "events")
        .select((col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
      val n = cents.where(col("c").isNotNull).count()
      val med = Sketches.exactKth(cents, "c", (n + 1) / 2)
      val p90 = Sketches.exactKth(cents, "c", math.max(1L, (n * 9 + 9) / 10))
      Seq((n, med, p90)).toDF("n", "median_cents", "p90_cents")
    }),


    // Robust outlier census (E19k3): median + MAD per event_type, both
    // EXACT via two grouped-refinement selections (no sort, no mean/
    // stddev — a heavy tail corrupts moment-based z-scores, which is why
    // production monitors use MAD), then the count of rows with
    // |x − med| · 10 > 3 · 14826 · MAD / 1000 — the 1.4826 consistency
    // constant carried in exact fixed point. Everything is integer
    // arithmetic over value-cents, restated by rank lookups.
    "q_outliers_mad" -> ((s, d) => {
      import s.implicits._
      val cents = t(s, d, "events").select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      val med = Sketches.exactKthBy(cents, "event_type", "cents",
        n => (n + 1) / 2)
      val medMap = med.collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap
      val medLit = typedLit(medMap)
      val dev = cents.select(col("event_type"),
        abs(col("cents") - element_at(medLit, col("event_type"))).as("dev"))
      val mad = Sketches.exactKthBy(dev, "event_type", "dev",
        n => (n + 1) / 2)
      val madMap = mad.collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap
      val madLit = typedLit(madMap)
      val outliers = dev
        .where(col("dev") * 10000L >
          lit(3L) * lit(14826L) * element_at(madLit, col("event_type")))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n_outliers"))
      med.select(col("event_type"), col("n"),
          col("value").as("median_cents"))
        .join(mad.select(col("event_type"), col("value").as("mad_cents")),
          "event_type")
        .join(outliers, Seq("event_type"), "left")
        .select(col("event_type"), col("n"), col("median_cents"),
          col("mad_cents"),
          coalesce(col("n_outliers"), lit(0L)).as("n_outliers"))
        .orderBy("event_type")
    }),


    // Grouped exact selection (E19k2): the per-group lower median of
    // value-cents with NO per-group sort — every event_type's range
    // refines simultaneously through one (group, bucket)-keyed
    // aggregation per round, O(groups·256) driver state. Same semantics
    // as the window-sort q_exact_median row, scale-shaped; the oracle is
    // the rank-lookup restatement per group.
    "q_exact_median_grouped" -> ((s, d) => {
      val cents = t(s, d, "events").select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      Sketches.exactKthBy(cents, "event_type", "cents", n => (n + 1) / 2)
        .withColumnRenamed("value", "median_cents")
        .orderBy("event_type")
    }),


    // Histogram DRIFT monitor (E19j): the per-feature distribution-shift
    // check a training pipeline runs between ingests — old = days 1-15,
    // new = days 16+ with a planted +37.0 value shift (exact in binary
    // FP), 20 equi-width buckets of 25; the two-sample chi-square
    // distance in exact fixed point (×10^6), per-bucket terms AND the
    // summed statistic on the hash. Chi-square, not PSI: PSI needs ln
    // (not engine-portable), chi-square is rational in the counts.
    "q_histogram_drift" -> ((s, d) => {
      val ev = t(s, d, "events").withColumn("day", dayofmonth(col("ts")))
      val o = ev.where(col("day") <= 15).select(col("value"))
      val n = ev.where(col("day") > 15)
        .select((col("value") + 37.0).as("value"))
      val terms = Sketches.histogramDrift(o, n, "value",
        width = 25.0, nBuckets = 20)
      terms.crossJoin(terms.agg(sum(col("term_fp")).as("chisq_fp")))
        .orderBy("bucket")
    }),


    // A/B chi-square (E2e): users hash-split into two arms, outcome =
    // any event with value > 222 (the per-user-max median, so the split
    // is balanced; every user has every event TYPE, so type-based
    // outcomes degenerate); the 2×2 contingency table plus the χ² statistic
    // in exact integer fixed-point (×1000) — χ² is RATIONAL
    // (n·(ad−bc)²/row·col products), so no float ever appears; wide
    // decimals carry the squared cross-term at any scale.
    "q_ab_chisq" -> ((s, d) => {
      val conv = t(s, d, "events")
        .groupBy(col("user_id"))
        .agg(max(when(col("value") > 222.0, 1).otherwise(0)).as("conv"))
        .select(col("user_id") % 2 === 0 as "arm_a", col("conv") === 1 as "c")
      conv.agg(
          sum(when(col("arm_a") && col("c"), 1L).otherwise(0L)).as("a"),
          sum(when(col("arm_a") && !col("c"), 1L).otherwise(0L)).as("b"),
          sum(when(!col("arm_a") && col("c"), 1L).otherwise(0L)).as("c"),
          sum(when(!col("arm_a") && !col("c"), 1L).otherwise(0L)).as("d"))
        .select(col("a"), col("b"), col("c"), col("d"),
          // a zero margin (degenerate table under a future data regen)
          // yields the sentinel -1 instead of an ANSI divide-by-zero
          // cross-term and margin products widen to DECIMAL(38,0) BEFORE
          // multiplying: with arm counts ~3e9 the 64-bit products would
          // wrap silently in non-ANSI Spark (and error in DuckDB)
          expr("CASE WHEN CAST(a + b AS DECIMAL(38,0)) * (c + d) * (a + c) * (b + d) = 0 THEN -1 " +
            "ELSE ((CAST(a AS DECIMAL(38,0)) + b + c + d) * " +
            "(CAST(a AS DECIMAL(38,0))*d - CAST(b AS DECIMAL(38,0))*c) * " +
            "(CAST(a AS DECIMAL(38,0))*d - CAST(b AS DECIMAL(38,0))*c) * 1000) div " +
            "(CAST(a + b AS DECIMAL(38,0)) * (c + d) * (a + c) * (b + d)) END").as("chi2_fp"))
    }),


    // Integer 3σ anomaly detection (E2f): per event_type, flag values
    // with |x−μ| > 3σ using the ALL-INTEGER inequality
    // (n·x − S)² > 9·(n·Q − S²) over cents (S=Σx, Q=Σx²) — variance is
    // rational, so the z-test needs no sqrt and restates exactly; wide
    // decimals carry the squares. Outliers are PLANTED (value×10 on
    // event_id % 499 == 0) since the uniform base has none; the tiny
    // per-type stats frame broadcasts back to the scan.
    "q_anomaly_events" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("event_id"), col("event_type"),
        (when(col("event_id") % 499 === 0, col("value") * 10)
          .otherwise(col("value")).cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
      val stats = ev.groupBy("event_type").agg(count(lit(1)).as("n"),
        sum(col("cents")).as("s"),
        sum(col("cents").cast("decimal(38,0)") * col("cents")).as("q"))
      ev.join(broadcast(stats), "event_type")
        .where(expr("(CAST(n AS DECIMAL(38,0))*cents - s) * (CAST(n AS DECIMAL(38,0))*cents - s) > " +
          "9 * (CAST(n AS DECIMAL(38,0))*q - CAST(s AS DECIMAL(38,0))*s)"))
        .select(col("event_id"), col("event_type"), col("cents"))
        .orderBy("event_id")
    }),


    // Winsorization (E5c2): clip each event's value at its type's PORTABLE
    // p99 (the E19c histogram bound — no engine percentile involved), then
    // the per-type census of survivors/clipped/sum — the outlier-robust
    // cleaning stage, with the bound frame broadcast back to the scan.
    "etl_winsorize" -> ((s, d) => {
      val ev = t(s, d, "events")
      val bounds = Sketches.histogramQuantiles(ev, "event_type", "value",
          width = 5.0, nBuckets = 100, phis = Seq(("p99", 99, 100)))
        .select(col("g").as("event_type"), col("p99_hi"))
      ev.join(broadcast(bounds), "event_type")
        .select(col("event_type"),
          (least(col("value"), col("p99_hi")).cast("decimal(18,2)") * 100)
            .cast("long").as("cents"),
          (col("value") > col("p99_hi")).cast("long").as("clipped"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("clipped").as("n_clipped"),
          sum("cents").as("sum_cents_clipped"))
        .orderBy("event_type")
    }),


    // Hourly rank movers (E2g): rank event types by hourly volume, then
    // each type's rank delta vs the previous hour (lag) — the "what moved"
    // dashboard. Both windows run on the 720×5 aggregated frame only.
    "q_rank_movers" -> ((s, d) => {
      val hourly = t(s, d, "events")
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyyMMddHH").as("hr"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
      val ranked = hourly.withColumn("rnk",
        rank().over(Window.partitionBy("hr")
          .orderBy(col("n").desc, col("event_type"))))
      ranked.withColumn("prev_rnk",
          lag(col("rnk"), 1).over(Window.partitionBy("event_type").orderBy("hr")))
        .select(col("hr"), col("event_type"), col("n"), col("rnk"),
          coalesce(col("prev_rnk"), lit(-1)).as("prev_rnk"),
          (col("rnk") - coalesce(col("prev_rnk"), col("rnk"))).as("delta"))
        .orderBy("hr", "event_type")
    }),


    // Data-quality EXPECTATIONS suite (E5b): five rules (null key,
    // nonpositive user, unknown enum, nonpositive measure, timestamp
    // window) over a deterministically CORRUPTED twin of events — each
    // rule's violation count is nonzero and prime-keyed to a distinct
    // corruption, so a rule that silently stops firing (or fires on the
    // wrong column) hash-fails. One pass: five conditional sums collapsed
    // map-side, then a 5-row unpivot.
    "etl_expectations" -> ((s, d) => {
      val ev = t(s, d, "events")
      val corrupted = ev.select(
        when(col("event_id") % 997 === 0, lit(null).cast("bigint"))
          .otherwise(col("event_id")).as("event_id"),
        col("ts"),
        when(col("event_id") % 991 === 0, -col("user_id"))
          .otherwise(col("user_id")).as("user_id"),
        when(col("event_id") % 983 === 0, lit("bogus"))
          .otherwise(col("event_type")).as("event_type"),
        when(col("event_id") % 977 === 0, -col("value"))
          .otherwise(col("value")).as("value"))
      corrupted.agg(
          sum(when(col("event_id").isNull, 1L).otherwise(0L)).as("r1"),
          sum(when(col("user_id") <= 0, 1L).otherwise(0L)).as("r2"),
          sum(when(!col("event_type").isin(
            "click", "error", "purchase", "signup", "view"), 1L)
            .otherwise(0L)).as("r3"),
          sum(when(col("value") <= 0, 1L).otherwise(0L)).as("r4"),
          sum(when(col("ts") < lit("2024-01-01 00:00:00")
            .cast("timestamp_ntz"), 1L).otherwise(0L)).as("r5"))
        .select(expr("stack(5, 'null_event_id', r1, 'nonpositive_user', r2, " +
          "'unknown_event_type', r3, 'nonpositive_value', r4, " +
          "'ts_before_window', r5) AS (rule, n_violations)"))
        .withColumn("pass", (col("n_violations") === 0).cast("int"))
        .orderBy("rule")
    }),


    // Cohort retention (E2d): cohort = a user's first active hour;
    // retention = distinct users active at hour offsets 0..5 from their
    // cohort — the canonical product-analytics matrix. Two user-keyed
    // aggregations + one user-keyed join, nothing row-quadratic.
    "q_cohort_retention" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
      val first = ev.groupBy("user_id").agg(min(col("hr")).as("cohort"))
      ev.join(first, "user_id")
        .select(col("user_id"), col("cohort"),
          expr("timestampdiff(HOUR, cohort, hr)").as("offset_hr"))
        .where(col("offset_hr") <= 5)
        .groupBy(date_format(col("cohort"), "yyyyMMddHH").as("cohort_hr"),
          col("offset_hr"))
        .agg(count_distinct(col("user_id")).as("n_users"))
        .orderBy("cohort_hr", "offset_hr")
    }),


    // MP4/ISO-BMFF container walk (E32f): spec-valid synthesized boxes
    // (real big-endian sizes, nested moov{mvhd+trak*}), parsed by the REAL
    // walker in the typed mapPartitions path; the oracle restates the
    // construction arithmetic, so an endianness/offset/nesting bug makes
    // parse ≠ construction and hash-fails — video-container coverage next
    // to the PNG/JPEG/PPM/WAV codecs.
    "mm_decode_mp4" -> ((s, d) => {
      import s.implicits._
      val ids = t(s, d, "documents").select(col("doc_id")).as[Long]
      ids.map(id => Multimodal.RawAsset(id, "mp4",
          Multimodal.syntheticMp4Payload(id)))
        .mapPartitions(_.flatMap(Multimodal.decodeMp4))
        .toDF().orderBy("asset_id")
    }),

    // Tumbling event-time window (batch semantics of the streaming agg).
  )

  val oracle: Map[String, String] = Map(

    // restates every member of every WELL-FORMED shard from the doc_id
    // formulas alone (the tar layer is what hash equality proves);
    // truncated shards (id % 10 == 9) contribute nothing
    "etl_tar_scan" ->
      """WITH ids AS (SELECT doc_id AS id FROM documents
        |  WHERE doc_id < 60 AND doc_id % 10 <> 9),
        |m AS (
        |  SELECT id, 'a' || id || '.cls' AS name,
        |    (id % 5)::VARCHAR AS content FROM ids
        |  UNION ALL SELECT id, 'a' || id || '.txt',
        |    'text a ' || id || ' ' || ((id * 7) % 13) FROM ids
        |  UNION ALL SELECT id, 'b' || id || '.cls',
        |    (id % 3)::VARCHAR FROM ids
        |  UNION ALL SELECT id, 'b' || id || '.txt',
        |    'text b ' || id || ' ' || ((id * 11) % 17) FROM ids)
        |SELECT id AS asset_id, name, length(content)::INT AS n_bytes,
        |  content FROM m ORDER BY asset_id, name""".stripMargin,

    // the write→read census from the member formulas alone: every doc
    // contributes exactly <id>.txt and <id>.cls with formula contents
    "etl_webdataset_roundtrip" ->
      """WITH ids AS (SELECT doc_id AS id FROM documents WHERE doc_id < 60),
        |m AS (
        |  SELECT id || '.cls' AS name, (id % 5)::VARCHAR AS content FROM ids
        |  UNION ALL
        |  SELECT id || '.txt', 'text ' || id FROM ids)
        |SELECT name, content FROM m ORDER BY name""".stripMargin,

    // the shard-assignment law (unit hash of the key) and per-shard sample
    // counts; md5_ok TRUE is the contract the Spark row proves by
    // re-reading the delivered bytes
    "etl_webdataset_census" ->
      s"""SELECT floor(${Sql.unitHash("doc_id::VARCHAR")} * 7)::INT AS shard_id,
         |  count(*)::BIGINT AS n_samples, TRUE AS md5_ok
         |FROM documents WHERE doc_id < 60
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    // the same pixel-formula chain as mm_image_dhash over the shard
    // fixture's (seed, noise) law — the oracle models neither tar nor
    // PNG, so hash equality proves both layers reproduced the pixels
    "mm_webdataset_dhash" ->
      s"""WITH ${Sql.photoDhashChain(
        """assets AS (
          |  SELECT 2*doc_id AS asset_id, doc_id AS seed, 0 AS noise
          |  FROM documents WHERE doc_id < 40
          |  UNION ALL
          |  SELECT 2*doc_id + 1 AS asset_id,
          |    CASE WHEN doc_id % 3 = 0 THEN doc_id
          |      ELSE doc_id + 500000 END AS seed,
          |    CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS noise
          |  FROM documents WHERE doc_id < 40)""".stripMargin)}
         |SELECT asset_id, 32 AS width, 16 AS height, dhash
         |FROM dh ORDER BY asset_id""".stripMargin,

    // the sample view of the same restatement: two parts per stem
    "etl_webdataset_group" ->
      """WITH ids AS (SELECT doc_id AS id FROM documents
        |  WHERE doc_id < 60 AND doc_id % 10 <> 9),
        |sam AS (
        |  SELECT id, 'a' || id AS stem,
        |    'text a ' || id || ' ' || ((id * 7) % 13) AS txt,
        |    (id % 5)::VARCHAR AS cls FROM ids
        |  UNION ALL SELECT id, 'b' || id,
        |    'text b ' || id || ' ' || ((id * 11) % 17), (id % 3)::VARCHAR
        |  FROM ids)
        |SELECT id AS asset_id, stem, 2::BIGINT AS n_parts, txt, cls
        |FROM sam ORDER BY asset_id, stem""".stripMargin,

    // regenerates the two-photos-per-doc corpus pixel by pixel, recomputes
    // the 9×8 exact-integer box means, and reassembles all 64 comparison
    // bits (bit 63 as the MinValue constant — DuckDB's << overflows at 63)
    "mm_image_dhash" ->
      s"""WITH ${Sql.photoDhashCtes}
         |SELECT asset_id, 32 AS width, 16 AS height, dhash
         |FROM dh ORDER BY asset_id""".stripMargin,

    // identical restatement: the PNG container must be invisible to the
    // hash — the oracle never models the encoding, only the pixels
    "mm_image_dhash_png" ->
      s"""WITH ${Sql.photoDhashCtes}
         |SELECT asset_id, 32 AS width, 16 AS height, dhash
         |FROM dh ORDER BY asset_id""".stripMargin,

    // the banded join at τ = 6 under 8×8-bit bands is EXACT by pigeonhole,
    // so the pair set restates as the all-pairs Hamming filter over the
    // same regenerated fingerprints
    "mm_image_neardup" ->
      s"""WITH ${Sql.photoDhashCtes}
         |SELECT a.asset_id AS a_id, b.asset_id AS b_id,
         |  bit_count(xor(a.dhash, b.dhash))::INT AS hamming
         |FROM dh a JOIN dh b ON a.asset_id < b.asset_id
         |WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
         |ORDER BY a_id, b_id""".stripMargin,

    // uncapped streaming state ≡ the batch banded join (pigeonhole): the
    // same all-pairs Hamming filter as mm_image_neardup, with the true
    // popcount carried per pair
    "mm_image_neardup_stream" ->
      s"""WITH ${Sql.photoDhashCtes}
         |SELECT a.asset_id AS a_id, b.asset_id AS b_id,
         |  bit_count(xor(a.dhash, b.dhash))::INT AS hamming
         |FROM dh a JOIN dh b ON a.asset_id < b.asset_id
         |WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
         |ORDER BY a_id, b_id""".stripMargin,

    // pixels → pairs → recursive reachability → survivor census
    "mm_image_dedup_pipeline" ->
      s"""WITH RECURSIVE ${Sql.photoDhashCtes},
         |prs AS (SELECT a.asset_id AS a_id, b.asset_id AS b_id
         |  FROM dh a JOIN dh b ON a.asset_id < b.asset_id
         |  WHERE bit_count(xor(a.dhash, b.dhash)) <= 6),
         |edges AS (SELECT a_id AS s, b_id AS t FROM prs
         |  UNION SELECT b_id, a_id FROM prs),
         |reach(s, t) AS (SELECT s, t FROM edges
         |  UNION SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s),
         |cc AS (SELECT s AS asset_id, least(s, min(t))::BIGINT AS rep
         |  FROM reach GROUP BY s)
         |SELECT dh.asset_id, coalesce(cc.rep, dh.asset_id)::BIGINT AS rep,
         |  (CASE WHEN coalesce(cc.rep, dh.asset_id) = dh.asset_id
         |        THEN 1 ELSE 0 END)::INT AS survivor
         |FROM dh LEFT JOIN cc USING (asset_id)
         |ORDER BY asset_id""".stripMargin,

    // the shared pixel→dHash chain with frames encoded as composite ids
    // (fid = doc_id·100 + frame_no, seed = doc_id + 31·frame_no), decoded
    // back to (asset_id, frame_no) at the end
    "mm_video_framehash" ->
      s"""WITH ${Sql.photoDhashChain(
        """assets AS (
          |  SELECT doc_id * 100 + f AS asset_id, doc_id + 31 * f AS seed,
          |    0 AS noise
          |  FROM documents, (SELECT unnest(range(0, 5)) AS f)
          |  WHERE f < 2 + doc_id % 3)""".stripMargin)}
         |SELECT (asset_id // 100)::BIGINT AS asset_id,
         |  (asset_id % 100)::INT AS frame_no, 32 AS width, 16 AS height,
         |  dhash
         |FROM dh ORDER BY asset_id, frame_no""".stripMargin,

    // the frame chain over both clips (clip 2·doc_id = seeds doc_id+31f;
    // clip 2·doc_id+1 = the same seeds noise-re-encoded at doc_id % 3 = 0,
    // else seeds doc_id+700000+31f), then the aligned-position Hamming
    // filter and the ≥-half-matched aggregation
    "mm_video_neardup" ->
      s"""WITH ${Sql.photoDhashChain(
        """assets AS (
          |  SELECT (2 * doc_id) * 100 + f AS asset_id,
          |    doc_id + 31 * f AS seed, 0 AS noise
          |  FROM documents, (SELECT unnest(range(0, 3)) AS f)
          |  UNION ALL
          |  SELECT (2 * doc_id + 1) * 100 + f AS asset_id,
          |    CASE WHEN doc_id % 3 = 0 THEN doc_id + 31 * f
          |         ELSE doc_id + 700000 + 31 * f END AS seed,
          |    CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS noise
          |  FROM documents, (SELECT unnest(range(0, 3)) AS f))""".stripMargin)},
         |fh AS (SELECT (asset_id // 100)::BIGINT AS clip,
         |    (asset_id % 100)::INT AS frame_no, dhash FROM dh),
         |fm AS (SELECT a.clip AS a_id, b.clip AS b_id, a.frame_no
         |  FROM fh a JOIN fh b
         |    ON a.frame_no = b.frame_no AND a.clip < b.clip
         |  WHERE bit_count(xor(a.dhash, b.dhash)) <= 6),
         |nm AS (SELECT a_id, b_id, count(*)::BIGINT AS n_matched
         |  FROM fm GROUP BY 1, 2)
         |SELECT a_id, b_id, n_matched,
         |  (n_matched / 3.0)::DOUBLE AS matched_frac
         |FROM nm WHERE n_matched / 3.0 >= 0.5
         |ORDER BY a_id, b_id""".stripMargin,

    // the frame chain over source (4 frames, seeds id+31f) and twin
    // (3 frames; trimmed+re-encoded seeds id+31+31f at doc_id % 3 = 0,
    // else unrelated), then the UNALIGNED Hamming join, per-offset votes,
    // and the modal-offset/smallest tie-break
    "mm_video_neardup_shifted" ->
      s"""WITH ${Sql.photoDhashChain(
        """assets AS (
          |  SELECT (2 * doc_id) * 100 + f AS asset_id,
          |    doc_id + 31 * f AS seed, 0 AS noise
          |  FROM documents, (SELECT unnest(range(0, 4)) AS f)
          |  UNION ALL
          |  SELECT (2 * doc_id + 1) * 100 + f AS asset_id,
          |    CASE WHEN doc_id % 3 = 0 THEN doc_id + 31 + 31 * f
          |         ELSE doc_id + 700000 + 31 * f END AS seed,
          |    CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS noise
          |  FROM documents, (SELECT unnest(range(0, 3)) AS f))""".stripMargin)},
         |fh AS (SELECT (asset_id // 100)::BIGINT AS clip,
         |    (asset_id % 100)::INT AS frame_no, dhash FROM dh),
         |votes AS (SELECT a.clip AS a_id, b.clip AS b_id,
         |    (b.frame_no - a.frame_no) AS off, count(*)::BIGINT AS n_matched
         |  FROM fh a JOIN fh b ON a.clip < b.clip
         |  WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
         |  GROUP BY 1, 2, 3),
         |best AS (SELECT a_id, b_id, off, n_matched,
         |    row_number() OVER (PARTITION BY a_id, b_id
         |      ORDER BY n_matched DESC, off ASC) AS rk
         |  FROM votes)
         |SELECT a_id, b_id, off::INT AS "offset", n_matched
         |FROM best WHERE rk = 1 AND n_matched >= 2
         |ORDER BY a_id, b_id""".stripMargin,

    // the WHOLE loop restated: pixels for store + drop (store ids offset
    // to 1000000+ to keep one dh table), probe = all-pairs drop×store
    // Hamming ≤ 6, survivors = recursive reachability over the fresh
    // pairs with min-id reps, then the export law (unit-hash shard
    // assignment over 4 shards) and the caption formula — the Spark side
    // derives the same columns from the DELIVERED shard bytes alone
    "mm_webdataset_dedup_e2e" ->
      s"""WITH RECURSIVE ${Sql.photoDhashChain(
        """assets AS (
          |  SELECT 1000000 + doc_id AS asset_id, doc_id AS seed, 0 AS noise
          |  FROM documents WHERE doc_id < 60 AND doc_id % 10 < 7
          |  UNION ALL
          |  SELECT 2 * doc_id AS asset_id, doc_id + 900000 AS seed,
          |    0 AS noise
          |  FROM documents WHERE doc_id < 60 AND doc_id % 10 >= 7
          |  UNION ALL
          |  SELECT 2 * doc_id + 1 AS asset_id,
          |    CASE WHEN doc_id % 3 = 0 THEN doc_id % 5
          |         WHEN doc_id % 3 = 1 THEN doc_id + 900000
          |         ELSE doc_id + 800000 END AS seed,
          |    CASE WHEN doc_id % 3 = 2 THEN 0 ELSE 1 END AS noise
          |  FROM documents WHERE doc_id < 60 AND doc_id % 10 >= 7)""".stripMargin)},
         |hits AS (SELECT DISTINCT b.asset_id FROM dh b JOIN dh s2
         |  ON b.asset_id < 1000000 AND s2.asset_id >= 1000000
         |  AND bit_count(xor(b.dhash, s2.dhash)) <= 6),
         |fresh AS (SELECT * FROM dh WHERE asset_id < 1000000
         |  AND asset_id NOT IN (SELECT asset_id FROM hits)),
         |prs AS (SELECT a.asset_id AS a_id, b.asset_id AS b_id
         |  FROM fresh a JOIN fresh b ON a.asset_id < b.asset_id
         |  WHERE bit_count(xor(a.dhash, b.dhash)) <= 6),
         |edges AS (SELECT a_id AS s, b_id AS t FROM prs
         |  UNION SELECT b_id, a_id FROM prs),
         |reach(s, t) AS (SELECT s, t FROM edges
         |  UNION SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s),
         |cc AS (SELECT s AS asset_id, least(s, min(t))::BIGINT AS rep
         |  FROM reach GROUP BY s),
         |surv AS (SELECT f.asset_id, f.dhash
         |  FROM fresh f LEFT JOIN cc USING (asset_id)
         |  WHERE coalesce(cc.rep, f.asset_id) = f.asset_id)
         |SELECT asset_id,
         |  floor(${Sql.unitHash("asset_id::VARCHAR")} * 4)::INT AS shard_id,
         |  dhash, 'caption ' || asset_id AS caption
         |FROM surv ORDER BY asset_id""".stripMargin,

    // the same pixel→dHash chain over the split corpus (store photos
    // seeded by doc_id; batch = noise-1 re-encode of store seed doc_id % 5
    // at even ids, novel seed doc_id + 900000 at odd), probe = all-pairs
    // batch×store Hamming ≤ 6 — τ < 8 bands keeps the banded join exact
    "mm_image_dhash_store" ->
      s"""WITH ${Sql.photoDhashChain(
        """assets AS (
          |  SELECT doc_id AS asset_id, doc_id AS seed, 0 AS noise
          |  FROM documents WHERE doc_id % 10 < 7
          |  UNION ALL
          |  SELECT 1000000 + doc_id AS asset_id,
          |    CASE WHEN doc_id % 2 = 0 THEN doc_id % 5
          |         ELSE doc_id + 900000 END AS seed,
          |    CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS noise
          |  FROM documents WHERE doc_id % 10 >= 7)""".stripMargin)}
         |SELECT b.asset_id AS batch_id, a.asset_id AS store_id,
         |  bit_count(xor(b.dhash, a.dhash))::INT AS hamming
         |FROM dh a, dh b
         |WHERE a.asset_id < 1000000 AND b.asset_id >= 1000000
         |  AND bit_count(xor(b.dhash, a.dhash)) <= 6
         |ORDER BY batch_id, store_id""".stripMargin,

    // window prints restated from the amplitude contour (gain cancels in
    // every comparison), then the unaligned vote and the modal-offset
    // tie-break — the trimmed twin reads frames 5.. of the SAME contour
    "mm_audio_neardup_shifted" ->
      """WITH au AS (
        |  SELECT 2*doc_id AS asset_id, doc_id AS seed, 0 AS fstart,
        |    80 AS nframes FROM documents
        |  UNION ALL
        |  SELECT 2*doc_id + 1 AS asset_id,
        |    CASE WHEN doc_id % 3 = 0 THEN doc_id ELSE doc_id + 500000 END,
        |    CASE WHEN doc_id % 3 = 0 THEN 5 ELSE 0 END,
        |    75
        |  FROM documents),
        |amp AS (SELECT asset_id, f,
        |    200 + (('0x' || substr(md5(seed::VARCHAR || ':' ||
        |      (f + fstart)::VARCHAR), 1, 8))::BIGINT % 900) AS a
        |  FROM au, (SELECT unnest(range(0, 80)) AS f) WHERE f < nframes),
        |win AS (SELECT asset_id, w FROM au,
        |    (SELECT unnest(range(0, 16)) AS w)
        |  WHERE w <= nframes - 65),
        |pr AS (SELECT win.asset_id, win.w,
        |    coalesce(sum(CASE WHEN y.a > x.a THEN
        |      CASE WHEN b = 63 THEN -9223372036854775807 - 1
        |           ELSE (1::BIGINT << b::INT) END
        |      ELSE 0 END), 0)::BIGINT AS aprint
        |  FROM win CROSS JOIN (SELECT unnest(range(0, 64)) AS b) bits
        |    JOIN amp x ON x.asset_id = win.asset_id AND x.f = win.w + b
        |    JOIN amp y ON y.asset_id = win.asset_id AND y.f = win.w + b + 1
        |  GROUP BY 1, 2),
        |votes AS (SELECT a.asset_id AS a_id, b.asset_id AS b_id,
        |    (b.w - a.w) AS off, count(*)::BIGINT AS n_matched
        |  FROM pr a JOIN pr b ON a.asset_id < b.asset_id
        |  WHERE bit_count(xor(a.aprint, b.aprint)) <= 2
        |  GROUP BY 1, 2, 3),
        |best AS (SELECT a_id, b_id, off, n_matched,
        |    row_number() OVER (PARTITION BY a_id, b_id
        |      ORDER BY n_matched DESC, off ASC) AS rk
        |  FROM votes)
        |SELECT a_id, b_id, off::INT AS "offset", n_matched
        |FROM best WHERE rk = 1 AND n_matched >= 8
        |ORDER BY a_id, b_id""".stripMargin,

    // the energy-delta bits restated from the amplitude contour alone:
    // E(f) = 16·gain²·A(f)², so E(f+1) > E(f) ⟺ A(f+1) > A(f) and the
    // gain knob cancels — equality here PROVES the level-invariance law
    "mm_audio_print" ->
      s"""WITH ${Sql.audioPrintCtes}
         |SELECT asset_id, 65 AS n_frames, aprint FROM pr
         |ORDER BY asset_id""".stripMargin,

    // τ = 2 under 8×8-bit bands is exact by pigeonhole: the pair set is
    // the all-pairs Hamming filter over the same restated fingerprints
    "mm_audio_neardup" ->
      s"""WITH ${Sql.audioPrintCtes}
         |SELECT a.asset_id AS a_id, b.asset_id AS b_id,
         |  bit_count(xor(a.aprint, b.aprint))::INT AS hamming
         |FROM pr a JOIN pr b ON a.asset_id < b.asset_id
         |WHERE bit_count(xor(a.aprint, b.aprint)) <= 2
         |ORDER BY a_id, b_id""".stripMargin,

    // mirrors q_quantile_windowed: the E19c histogram law per hour
    "q_quantile_windowed" ->
      """WITH c AS (SELECT strftime(date_trunc('hour', ts), '%Y%m%d%H') AS g,
        |    least(floor(value / 25.0), 19)::INT AS bucket,
        |    count(*)::BIGINT AS c FROM events GROUP BY 1, 2),
        |cum AS (SELECT g, bucket, c,
        |    sum(c) OVER (PARTITION BY g ORDER BY bucket)::BIGINT AS cum,
        |    sum(c) OVER (PARTITION BY g)::BIGINT AS n FROM c),
        |p50 AS (SELECT g, min(bucket)::INT AS p50_bucket FROM cum
        |  WHERE cum >= (n * 1 + 1) // 2 GROUP BY g),
        |p95 AS (SELECT g, min(bucket)::INT AS p95_bucket FROM cum
        |  WHERE cum >= (n * 19 + 19) // 20 GROUP BY g),
        |base AS (SELECT g, max(n)::BIGINT AS n FROM cum GROUP BY g)
        |SELECT base.g AS hr, n,
        |  p50_bucket, ((p50_bucket + 1) * 25.0)::DOUBLE AS p50_hi,
        |  p95_bucket, ((p95_bucket + 1) * 25.0)::DOUBLE AS p95_hi
        |FROM base JOIN p50 USING (g) JOIN p95 USING (g)
        |ORDER BY hr""".stripMargin,


    // mirrors curation_snapshot_diff's perturbation + full-outer census
    "curation_snapshot_diff" ->
      """WITH old AS (SELECT doc_id, md5(text) AS fp_old FROM documents),
        |neu AS (SELECT doc_id,
        |    md5(CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END) AS fp_new
        |  FROM documents WHERE doc_id % 17 <> 0
        |  UNION ALL SELECT doc_id + 100000, md5(text) FROM documents
        |  WHERE doc_id % 19 = 0)
        |SELECT
        |  sum(CASE WHEN fp_old IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_added,
        |  sum(CASE WHEN fp_new IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_removed,
        |  sum(CASE WHEN fp_old IS NOT NULL AND fp_new IS NOT NULL
        |      AND fp_old <> fp_new THEN 1 ELSE 0 END)::BIGINT AS n_changed,
        |  sum(CASE WHEN fp_old = fp_new THEN 1 ELSE 0 END)::BIGINT AS n_unchanged
        |FROM old FULL OUTER JOIN neu USING (doc_id)""".stripMargin,


    // mirrors sample_negatives' sqrt-composed 3/4-power arithmetic
    "sample_negatives" ->
      """WITH tk AS (SELECT unnest(list_filter(string_split(lower(text), ' '),
        |    x -> x <> '')) AS tok FROM documents),
        |top AS (SELECT tok, count(*)::BIGINT AS cnt FROM tk GROUP BY tok
        |  ORDER BY cnt DESC, tok LIMIT 15),
        |w AS (SELECT tok, cnt,
        |  floor(sqrt(cnt * floor(sqrt(cnt))::BIGINT))::BIGINT AS w34 FROM top),
        |t AS (SELECT sum(w34)::BIGINT AS w_total FROM w)
        |SELECT tok, cnt, w34, ((w34 * 1000000) // w_total)::BIGINT AS share_fp
        |FROM w, t ORDER BY cnt DESC, tok""".stripMargin,


    // mirrors curation_source_mix's fixed-point concentration arithmetic
    "curation_source_mix" ->
      """WITH c AS (SELECT source, count(*)::BIGINT AS cnt FROM documents GROUP BY source),
        |a AS (SELECT count(*)::BIGINT AS n_sources, sum(cnt)::BIGINT AS n_total,
        |  sum(cnt * cnt)::BIGINT AS sum_sq, max(cnt)::BIGINT AS max_cnt FROM c)
        |SELECT n_sources, ((sum_sq * 1000000) // (n_total * n_total))::BIGINT AS hhi_fp,
        |  ((max_cnt * 1000000) // n_total)::BIGINT AS top_share_fp FROM a""".stripMargin,


    // median and MAD restated as rank lookups; same fixed-point 1.4826
    // threshold, cross-multiplied
    "q_outliers_mad" ->
      """WITH c AS (SELECT event_type,
        |    (value::DECIMAL(18,2) * 100)::BIGINT AS cents
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |m AS (SELECT event_type, cents AS med, n FROM (
        |  SELECT event_type, cents,
        |    row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rk,
        |    count(*) OVER (PARTITION BY event_type) AS n FROM c)
        |  WHERE rk = (n + 1) // 2),
        |dv AS (SELECT c.event_type, abs(c.cents - m.med) AS dev
        |  FROM c JOIN m USING (event_type)),
        |md AS (SELECT event_type, dev AS mad FROM (
        |  SELECT event_type, dev,
        |    row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rk,
        |    count(*) OVER (PARTITION BY event_type) AS n FROM dv)
        |  WHERE rk = (n + 1) // 2),
        |o AS (SELECT dv.event_type, count(*)::BIGINT AS n_outliers
        |  FROM dv JOIN md USING (event_type)
        |  WHERE dev * 10000 > 3 * 14826 * mad GROUP BY 1)
        |SELECT m.event_type, m.n::BIGINT AS n, m.med AS median_cents,
        |  md.mad AS mad_cents, coalesce(o.n_outliers, 0)::BIGINT AS n_outliers
        |FROM m JOIN md USING (event_type) LEFT JOIN o USING (event_type)
        |ORDER BY m.event_type""".stripMargin,


    // per-group rank lookup: the value at a rank within each partition is
    // tie-order-independent
    "q_exact_median_grouped" ->
      """WITH c AS (SELECT event_type,
        |    (value::DECIMAL(18,2) * 100)::BIGINT AS cents
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |r AS (SELECT event_type, cents,
        |    row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rk,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM c)
        |SELECT event_type, n::BIGINT AS n, cents AS median_cents
        |FROM r WHERE rk = (n + 1) // 2 ORDER BY event_type""".stripMargin,


    // rank lookup over the sorted multiset: the value at rank k is
    // well-defined under ties regardless of row_number's tie order
    "q_exact_quantiles" ->
      """WITH c AS (SELECT (value::DECIMAL(18,2) * 100)::BIGINT AS c
        |  FROM events WHERE value IS NOT NULL),
        |n AS (SELECT count(*)::BIGINT AS n FROM c),
        |r AS (SELECT c, row_number() OVER (ORDER BY c) AS rk FROM c)
        |SELECT n.n,
        |  (SELECT c FROM r, n WHERE rk = (n + 1) // 2) AS median_cents,
        |  (SELECT c FROM r, n WHERE rk = greatest((n * 9 + 9) // 10, 1)) AS p90_cents
        |FROM n""".stripMargin,


    // mirrors q_histogram_drift: same clamped equi-width buckets, HUGEINT
    // cross-term, truncating // — term-by-term identical fixed point
    "q_histogram_drift" ->
      """WITH o AS (SELECT least(greatest(floor(value / 25.0), 0), 19)::INT AS bucket
        |  FROM events WHERE day(ts) <= 15 AND value IS NOT NULL),
        |n AS (SELECT least(greatest(floor((value + 37.0) / 25.0), 0), 19)::INT AS bucket
        |  FROM events WHERE day(ts) > 15 AND value IS NOT NULL),
        |spine AS (SELECT unnest(range(0, 20))::INT AS bucket),
        |co AS (SELECT bucket, count(*)::BIGINT AS n_old FROM o GROUP BY 1),
        |cn AS (SELECT bucket, count(*)::BIGINT AS n_new FROM n GROUP BY 1),
        |j AS (SELECT spine.bucket, coalesce(n_old, 0)::BIGINT AS n_old,
        |    coalesce(n_new, 0)::BIGINT AS n_new
        |  FROM spine LEFT JOIN co USING (bucket) LEFT JOIN cn USING (bucket)),
        |t AS (SELECT sum(n_old)::BIGINT AS ta, sum(n_new)::BIGINT AS tb FROM j),
        |terms AS (SELECT bucket, n_old, n_new,
        |  (CASE WHEN n_old + n_new > 0 AND ta > 0 AND tb > 0 THEN
        |    ((n_old::HUGEINT * tb - n_new::HUGEINT * ta) *
        |     (n_old::HUGEINT * tb - n_new::HUGEINT * ta) * 1000000)
        |    // (ta::HUGEINT * tb * (n_old + n_new))
        |  ELSE 0 END)::BIGINT AS term_fp FROM j, t),
        |s AS (SELECT sum(term_fp)::BIGINT AS chisq_fp FROM terms)
        |SELECT bucket, n_old, n_new, term_fp, chisq_fp
        |FROM terms, s ORDER BY bucket""".stripMargin,


    // mirrors q_ab_chisq: hash-parity arms, purchase conversion, rational χ²
    "q_ab_chisq" ->
      """WITH u AS (SELECT user_id, user_id % 2 = 0 AS arm_a,
        |  max(CASE WHEN value > 222.0 THEN 1 ELSE 0 END) = 1 AS c
        |  FROM events GROUP BY user_id),
        |t AS (SELECT
        |  sum(CASE WHEN arm_a AND c THEN 1 ELSE 0 END)::BIGINT AS a,
        |  sum(CASE WHEN arm_a AND NOT c THEN 1 ELSE 0 END)::BIGINT AS b,
        |  sum(CASE WHEN NOT arm_a AND c THEN 1 ELSE 0 END)::BIGINT AS c,
        |  sum(CASE WHEN NOT arm_a AND NOT c THEN 1 ELSE 0 END)::BIGINT AS d
        |  FROM u)
        |SELECT a, b, c, d,
        |  (CASE WHEN (a::HUGEINT + b) * (c + d) * (a + c) * (b + d) = 0 THEN -1
        |   ELSE ((a::HUGEINT + b + c + d) * (a::HUGEINT*d - b::HUGEINT*c) *
        |         (a::HUGEINT*d - b::HUGEINT*c) * 1000) //
        |        ((a::HUGEINT + b) * (c + d) * (a + c) * (b + d)) END)::BIGINT AS chi2_fp
        |FROM t""".stripMargin,


    // mirrors q_anomaly_events: planted ×10 outliers, the integer z² test
    "q_anomaly_events" ->
      """WITH e AS (SELECT event_id, event_type,
        |  ((CASE WHEN event_id % 499 = 0 THEN value * 10 ELSE value END)
        |    ::DECIMAL(18,2) * 100)::BIGINT AS cents FROM events),
        |st AS (SELECT event_type, count(*)::BIGINT AS n, sum(cents)::BIGINT AS s,
        |  sum(cents::HUGEINT * cents)::HUGEINT AS q FROM e GROUP BY event_type)
        |SELECT event_id, e.event_type, cents
        |FROM e JOIN st ON e.event_type = st.event_type
        |WHERE (n::HUGEINT*cents - s) * (n::HUGEINT*cents - s) >
        |      9 * (n::HUGEINT*q - s::HUGEINT*s)
        |ORDER BY event_id""".stripMargin,


    // mirrors etl_winsorize: the E19c p99 bound per type, then the clip
    "etl_winsorize" ->
      """WITH c AS (SELECT event_type AS g,
        |    least(floor(value / 5.0), 99)::INT AS bucket,
        |    count(*)::BIGINT AS c FROM events GROUP BY 1, 2),
        |cum AS (SELECT g, bucket, c,
        |    sum(c) OVER (PARTITION BY g ORDER BY bucket)::BIGINT AS cum,
        |    sum(c) OVER (PARTITION BY g)::BIGINT AS n FROM c),
        |p99 AS (SELECT g, min(bucket)::INT AS p99_bucket FROM cum
        |  WHERE cum >= (n * 99 + 99) // 100 GROUP BY g),
        |b AS (SELECT g AS event_type, ((p99_bucket + 1) * 5.0)::DOUBLE AS p99_hi
        |  FROM p99)
        |SELECT e.event_type, count(*)::BIGINT AS n,
        |  sum(CASE WHEN e.value > b.p99_hi THEN 1 ELSE 0 END)::BIGINT AS n_clipped,
        |  sum((least(e.value, b.p99_hi)::DECIMAL(18,2) * 100)::BIGINT)::BIGINT
        |    AS sum_cents_clipped
        |FROM events e JOIN b USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,


    // mirrors q_rank_movers: hourly volume rank + previous-hour lag
    "q_rank_movers" ->
      """WITH h AS (SELECT strftime(date_trunc('hour', ts), '%Y%m%d%H') AS hr,
        |    event_type, count(*)::BIGINT AS n FROM events GROUP BY 1, 2),
        |r AS (SELECT hr, event_type, n,
        |  rank() OVER (PARTITION BY hr ORDER BY n DESC, event_type)::INT AS rnk
        |  FROM h),
        |m AS (SELECT hr, event_type, n, rnk,
        |  lag(rnk) OVER (PARTITION BY event_type ORDER BY hr) AS prev
        |  FROM r)
        |SELECT hr, event_type, n, rnk,
        |  coalesce(prev, -1)::INT AS prev_rnk,
        |  (rnk - coalesce(prev, rnk))::INT AS delta
        |FROM m ORDER BY hr, event_type""".stripMargin,


    // mirrors etl_expectations' corrupted twin + five conditional sums
    "etl_expectations" ->
      """WITH c AS (SELECT
        |  CASE WHEN event_id % 997 = 0 THEN NULL ELSE event_id END AS eid,
        |  ts,
        |  CASE WHEN event_id % 991 = 0 THEN -user_id ELSE user_id END AS uid,
        |  CASE WHEN event_id % 983 = 0 THEN 'bogus' ELSE event_type END AS et,
        |  CASE WHEN event_id % 977 = 0 THEN -value ELSE value END AS v
        |  FROM events),
        |a AS (SELECT
        |  sum(CASE WHEN eid IS NULL THEN 1 ELSE 0 END)::BIGINT AS r1,
        |  sum(CASE WHEN uid <= 0 THEN 1 ELSE 0 END)::BIGINT AS r2,
        |  sum(CASE WHEN et NOT IN ('click','error','purchase','signup','view')
        |      THEN 1 ELSE 0 END)::BIGINT AS r3,
        |  sum(CASE WHEN v <= 0 THEN 1 ELSE 0 END)::BIGINT AS r4,
        |  sum(CASE WHEN ts < TIMESTAMP '2024-01-01 00:00:00'
        |      THEN 1 ELSE 0 END)::BIGINT AS r5
        |  FROM c),
        |u AS (SELECT 'null_event_id' AS rule, r1 AS n_violations FROM a
        |  UNION ALL SELECT 'nonpositive_user', r2 FROM a
        |  UNION ALL SELECT 'unknown_event_type', r3 FROM a
        |  UNION ALL SELECT 'nonpositive_value', r4 FROM a
        |  UNION ALL SELECT 'ts_before_window', r5 FROM a)
        |SELECT rule, n_violations,
        |  (CASE WHEN n_violations = 0 THEN 1 ELSE 0 END)::INT AS pass
        |FROM u ORDER BY rule""".stripMargin,


    // mirrors q_cohort_retention: first-hour cohort join, hour offsets
    "q_cohort_retention" ->
      """WITH e AS (SELECT user_id, date_trunc('hour', ts) AS hr FROM events),
        |f AS (SELECT user_id, min(hr) AS cohort FROM e GROUP BY user_id),
        |j AS (SELECT e.user_id, f.cohort,
        |  date_diff('hour', f.cohort, e.hr) AS offset_hr
        |  FROM e JOIN f USING (user_id))
        |SELECT strftime(cohort, '%Y%m%d%H') AS cohort_hr, offset_hr,
        |  count(DISTINCT user_id)::BIGINT AS n_users
        |FROM j WHERE offset_hr <= 5 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    // mirrors syntheticMp4Payload: 3 top boxes, 1+id%3 traks, timescale
    // 1000+id%9000, duration (id·37)%100000
    "mm_decode_mp4" ->
      """SELECT doc_id AS asset_id, 3 AS n_top_boxes,
        |  (1 + doc_id % 3)::INT AS n_traks,
        |  (1000 + doc_id % 9000)::BIGINT AS timescale,
        |  ((doc_id * 37) % 100000)::BIGINT AS duration
        |FROM documents ORDER BY asset_id""".stripMargin,


    // mirrors Multimodal.decodeJpegPixels: block b of asset id carries DC
    // ((id·5+b·11)%201)−100 and one AC ((id+3b)%31)−15 at zigzag 1+b%3;
    // pixel = clamp(128 + (dc·Q0·2896² + ac·Qz·2896·A(z)) >> 26) with the
    // shared fixed-point basis rows interpolated from Multimodal.JpegBasisA
    // (single source of truth). The floor-shift is restated as nonnegative
    // truncating division via a 2^52 bias. Truncated ids (%29) are absent.
    "mm_decode_jpeg_pixels" ->
      s"""WITH d AS (SELECT doc_id, (8 + doc_id % 23)::INT AS w,
         |    (8 + doc_id % 13)::INT AS h
         |  FROM documents WHERE doc_id % 29 <> 0),
         |gx AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
         |g AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM gx),
         |c AS (SELECT doc_id, w, h, x, y,
         |    (y // 8) * ((w + 7) // 8) + (x // 8) AS b
         |  FROM g),
         |v AS (SELECT doc_id, w, h, x, y,
         |    (((doc_id*5 + b*11) % 201) - 100) * (1 + doc_id % 7) * 8386816
         |    + (((doc_id + 3*b) % 31) - 15)
         |      * (1 + (doc_id + 1 + b % 3) % 7) * 2896
         |      * (CASE 1 + b % 3
         |           WHEN 1 THEN ([${jBasis1}])[x % 8 + 1]
         |           WHEN 2 THEN ([${jBasis1}])[y % 8 + 1]
         |           ELSE ([${jBasis2}])[y % 8 + 1] END) AS acc
         |  FROM c),
         |o AS (SELECT doc_id, w, h, x, y,
         |    greatest(0, least(255,
         |      128 + (acc + 33554432 + 4503599627370496) // 67108864
         |          - 67108864)) AS px
         |  FROM v)
         |SELECT doc_id AS asset_id, w AS width, h AS height,
         |  (((w + 7) // 8) * ((h + 7) // 8))::INT AS n_blocks,
         |  sum(px)::BIGINT AS px_sum,
         |  sum((y * w + x + 1) * px)::BIGINT AS wsum
         |FROM o GROUP BY doc_id, w, h ORDER BY asset_id""".stripMargin,


    // mirrors Multimodal.decodePngPixels: byte i of asset id decodes to
    // (id + i) % 256 (i row-major interleaved over 3·w·h bytes); corrupted
    // ids (doc_id % 29 = 0) are quarantined and must be absent
    "mm_decode_png_pixels" ->
      """WITH px AS (SELECT doc_id, (1 + doc_id % 13)::INT AS w,
        |    (1 + doc_id % 7)::INT AS h
        |  FROM documents WHERE doc_id % 29 <> 0),
        |e AS (SELECT doc_id, w, h, unnest(range(0, 3 * w * h)) AS i FROM px)
        |SELECT doc_id AS asset_id, w AS width, h AS height,
        |  sum(CASE WHEN i % 3 = 0 THEN (doc_id + i) % 256 END)::BIGINT AS r_sum,
        |  sum(CASE WHEN i % 3 = 1 THEN (doc_id + i) % 256 END)::BIGINT AS g_sum,
        |  sum(CASE WHEN i % 3 = 2 THEN (doc_id + i) % 256 END)::BIGINT AS b_sum,
        |  sum((i + 1) * ((doc_id + i) % 256))::BIGINT AS wsum
        |FROM e GROUP BY doc_id, w, h ORDER BY asset_id""".stripMargin,


    // mirrors Multimodal.resizePpm(factor=2): PPM assets are doc_id%4==0
    // with w=1+id%13, h=1+id%7, pixel byte (id + offset) % 256 at offset
    // 3·(y·w+x)+c — restated at exactly the strided sample positions
    "mm_resize" ->
      """WITH p AS (SELECT doc_id AS asset_id, (1 + doc_id % 13)::INT AS w,
        |    (1 + doc_id % 7)::INT AS h
        |  FROM documents WHERE doc_id % 4 = 0),
        |sx AS (SELECT asset_id, w, h, unnest(range(0, w, 2)) AS x FROM p),
        |s AS (SELECT asset_id, w, h, x, unnest(range(0, h, 2)) AS y FROM sx),
        |sums AS (SELECT asset_id,
        |  max((w + 1) // 2)::INT AS w_out, max((h + 1) // 2)::INT AS h_out,
        |  count(*)::BIGINT AS n_sampled,
        |  sum((asset_id + 3*(y*w + x)) % 256)::BIGINT AS r_sum,
        |  sum((asset_id + 3*(y*w + x) + 1) % 256)::BIGINT AS g_sum,
        |  sum((asset_id + 3*(y*w + x) + 2) % 256)::BIGINT AS b_sum
        |  FROM s GROUP BY asset_id)
        |SELECT asset_id, w_out, h_out, n_sampled, r_sum, g_sum, b_sum
        |FROM sums ORDER BY asset_id""".stripMargin,

    // mirrors Graph.triangleStats over the stride-1,2,3 circulant: same
    // canonical undirected edges, same (degree, id) orientation, same
    // wedge + closure joins

    "mm_payload_stats" ->
      """SELECT doc_id AS asset_id,
        |  ['image','audio','video'][(doc_id % 3 + 1)::INT] AS modality,
        |  octet_length(encode(text))::BIGINT AS payload_bytes,
        |  list_sum(list_transform(range(1, least(length(text), 16) + 1),
        |    i -> ord(substr(text, i, 1))))::BIGINT AS header_sum
        |FROM documents ORDER BY asset_id""".stripMargin,


    // video assets are doc_id % 3 == 2; frames 0..ceil(bytes/16)-1, sampled
    // where frame_no % 2 = 0 → n_sampled = ceil(nframes/2), max sampled
    // frame = 2*(ceil(nframes/2)-1). Zero-frame (empty-payload) assets emit
    // NO row — matching the Spark side, where posexplode of an empty frame
    // array yields nothing (a groupBy after it cannot see the asset).
    "mm_frame_sample" ->
      """SELECT doc_id AS asset_id,
        |  ((ceil(octet_length(encode(text)) / 16.0)::BIGINT + 1) // 2)::BIGINT
        |    AS n_sampled,
        |  (2 * (((ceil(octet_length(encode(text)) / 16.0)::BIGINT + 1) // 2) - 1))::INT
        |    AS max_frame
        |FROM documents WHERE doc_id % 3 = 2 AND octet_length(encode(text)) > 0
        |ORDER BY asset_id""".stripMargin,


    // regenerates every square-wave sample from syntheticAudioPayload's
    // construction arithmetic and recomputes the frame features — the
    // Spark side must recover the SAME integers by parsing the WAV bytes
    "mm_audio_features" ->
      """WITH p AS (SELECT doc_id, 2 + doc_id % 5 AS hp,
        |    1000 + (doc_id % 100) * 10 AS a, 64 + doc_id % 32 AS n
        |  FROM documents),
        |s AS (SELECT doc_id, unnest(range(0, n)) AS i, hp, a FROM p),
        |v AS (SELECT doc_id, i,
        |    CASE WHEN ((i // hp) % 2) = 0 THEN a ELSE -a END AS x
        |  FROM s),
        |f AS (SELECT doc_id, (i // 16)::INT AS frame_no, i, x,
        |    lag(x) OVER (PARTITION BY doc_id ORDER BY i) AS px
        |  FROM v)
        |SELECT doc_id AS asset_id, frame_no,
        |  count(*)::INT AS n_samples,
        |  sum(x::BIGINT * x)::BIGINT AS energy,
        |  sum(CASE WHEN i % 16 <> 0 AND px * x < 0 THEN 1 ELSE 0 END)::INT
        |    AS zcr,
        |  max(abs(x))::INT AS peak
        |FROM f GROUP BY 1, 2 ORDER BY asset_id, frame_no""".stripMargin,


    // regenerates every frame byte from syntheticVideoPayload's
    // construction and recomputes the consecutive-pair L1 deltas
    "mm_frame_diff" ->
      """WITH p AS (SELECT doc_id, 2 + doc_id % 4 AS w, 1 + doc_id % 3 AS h,
        |    2 + doc_id % 3 AS nf FROM documents),
        |fr AS (SELECT doc_id, 3 * w * h AS npx,
        |    unnest(range(1, nf)) AS f FROM p),
        |px AS (SELECT doc_id, f, npx, unnest(range(0, npx)) AS i FROM fr)
        |SELECT doc_id AS asset_id, f::INT AS frame_no, npx::INT AS n_px,
        |  sum(abs(((doc_id + f * 7 + i) % 256)
        |        - ((doc_id + (f - 1) * 7 + i) % 256)))::BIGINT AS abs_diff
        |FROM px GROUP BY 1, 2, 3 ORDER BY asset_id, frame_no""".stripMargin,


    // regenerates frame 0's pixels and re-buckets them (value div 32)
    "mm_color_histogram" ->
      """WITH p AS (SELECT doc_id, 2 + doc_id % 4 AS w, 1 + doc_id % 3 AS h
        |  FROM documents),
        |px AS (SELECT doc_id, unnest(range(0, 3 * w * h)) AS i FROM p)
        |SELECT doc_id AS asset_id, (i % 3)::INT AS channel,
        |  (((doc_id + i) % 256) // 32)::INT AS bucket,
        |  count(*)::BIGINT AS n
        |FROM px GROUP BY 1, 2, 3
        |ORDER BY asset_id, channel, bucket""".stripMargin,


    // restates syntheticContainerPayload's dimension arithmetic: the Spark
    // side must recover exactly these values by PARSING the bytes it built
    "mm_decode_containers" ->
      """SELECT doc_id AS asset_id,
        |  CASE (doc_id % 4) WHEN 0 THEN 'ppm' WHEN 1 THEN 'wav'
        |    WHEN 2 THEN 'png' ELSE 'jpeg' END AS fmt,
        |  (CASE (doc_id % 4) WHEN 1 THEN 8000 ELSE 1 + doc_id % 13 END)::INT
        |    AS width,
        |  (CASE (doc_id % 4) WHEN 1 THEN 1 + doc_id % 2
        |    ELSE 1 + doc_id % 7 END)::INT AS height,
        |  (CASE (doc_id % 4) WHEN 1 THEN 1 + doc_id % 5 ELSE 1 END)::INT
        |    AS n_frames
        |FROM documents ORDER BY asset_id""".stripMargin,
  )
}
