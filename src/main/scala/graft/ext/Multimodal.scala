package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns for a training-data pipeline
  * (SURVEY §2.8): payloads are opaque `binary` columns with typed metadata;
  * decode / feature-extract / frame-sample are per-partition transforms.
  *
  * The media codecs themselves are NOT in this container, so the decode step
  * is a clearly-marked deterministic fake ([[FakeCodec]]) — but the Spark
  * plumbing is real and is the part that matters at 100 TB: an explicit
  * asset schema, `mapPartitions` over a typed `Dataset` (one codec init per
  * partition, streaming iterator — never a collect), frame explosion via
  * `posexplode`, and feature columns sized for downstream ANN
  * ([[Similarity]]). Swap `FakeCodec` for JNI/FFmpeg bindings and nothing
  * else changes.
  */
object Multimodal {

  /** Canonical asset schema: id + modality + opaque payload + metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("bytes", LongType, nullable = false),
      StructField("origin", StringType, nullable = true))), nullable = false)))

  final case class RawAsset(asset_id: Long, modality: String, payload: Array[Byte])
  final case class DecodedAsset(asset_id: Long, modality: String,
                                width: Int, height: Int, n_frames: Int,
                                feature: Array[Float])
  final case class Frame(asset_id: Long, frame_no: Int, frame: Array[Byte])

  /** Deterministic stand-in for the real image/audio/video decoder: derives
    * "decoded" properties from the payload header bytes. Replace with real
    * codec bindings in production — the signature (bytes in, struct out) and
    * the per-partition batch shape are the contract. */
  object FakeCodec {
    def decode(a: RawAsset): DecodedAsset = {
      val b = a.payload
      def u(i: Int): Int = if (b != null && b.length > i) b(i) & 0xff else 0
      DecodedAsset(a.asset_id, a.modality,
        width = 16 + u(0) % 240,
        height = 16 + u(1) % 240,
        n_frames = if (a.modality == "video") 1 + u(2) % 30 else 1,
        feature = Array.tabulate(8)(i => u(i).toFloat / 255f))
    }
  }

  /** Build an asset table from the documents table (payload = UTF-8 bytes of
    * the text) — the driver testdata has no binary table, so this supplies a
    * deterministic one with the right schema. */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      col("text").cast("binary").as("payload"),
      struct(
        octet_length(col("text").cast("binary")).cast("long").as("bytes"),
        col("source").as("origin")).as("meta"))

  /** Decode assets per partition: codec state (here: none) is initialized
    * once per partition, rows stream through the iterator — constant memory,
    * no driver involvement. */
  def decode(assets: Dataset[RawAsset]): Dataset[DecodedAsset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // real impl: open codec / model session here, once per partition
      it.map(FakeCodec.decode)
    }
  }

  /** Convenience: DataFrame-in, DataFrame-out decode. */
  def decodeDF(assets: DataFrame): DataFrame = {
    import assets.sparkSession.implicits._
    decode(assets.select("asset_id", "modality", "payload").as[RawAsset]).toDF()
  }

  /** Sample every `everyN`-th fixed-size "frame" from video payloads — the
    * frame-extraction plumbing (split + posexplode); the byte-slicing stands
    * in for real frame decoding. One output row per sampled frame. */
  def frameSample(assets: DataFrame, frameBytes: Int = 16, everyN: Int = 2): DataFrame = {
    val nFrames = ceil(octet_length(col("payload")).cast("double") / frameBytes).cast("int")
    // empty/null payload ⇒ 0 frames ⇒ no rows — the naive
    // sequence(0, nFrames-1) would hit Spark's descending sequence(0,-1)
    // and fabricate a phantom frame
    val frames = when(nFrames >= 1, transform(
      sequence(lit(0), nFrames - 1),
      i => substring(col("payload"), (i * frameBytes + 1).cast("int"), lit(frameBytes))))
      .otherwise(array().cast("array<binary>"))
    assets
      .where(col("modality") === "video")
      .select(col("asset_id"), posexplode(frames))
      .toDF("asset_id", "frame_no", "frame")
      .where(col("frame_no") % everyN === 0)
  }

  /** Per-asset feature table via the typed decode path. */
  def featuresOf(assets: DataFrame): DataFrame =
    decodeDF(assets).select(col("asset_id"), col("feature"))
}
