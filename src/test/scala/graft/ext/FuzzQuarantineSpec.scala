package graft.ext

import scala.util.Random

import graft.SparkSpec

/** The decode battery's shared contract — malformed bytes QUARANTINE, never
  * throw — fuzzed: every parser gets seeded-random corruptions (byte flips,
  * truncations, prefix garbage) of its own valid payloads plus pure noise.
  * A thrown exception here is a job-killer at 100 TB (one bad record in a
  * billion fails the stage); None / partial output is the contract. */
class FuzzQuarantineSpec extends SparkSpec {

  private val Rounds = 300

  private def corruptions(valid: Array[Byte], rnd: Random): Iterator[Array[Byte]] =
    Iterator(
      valid.take(rnd.nextInt(valid.length + 1)), // truncation
      { val b = valid.clone() // 1-4 byte flips
        (0 until 1 + rnd.nextInt(4)).foreach { _ =>
          val i = rnd.nextInt(b.length); b(i) = (b(i) ^ (1 + rnd.nextInt(255))).toByte
        }; b },
      Array.fill(rnd.nextInt(64))(rnd.nextInt(256).toByte), // pure noise
      Array.fill(8)(0xff.toByte) ++ valid.drop(rnd.nextInt(valid.length)))

  test("JPEG pixel decode never throws on corrupted input") {
    val rnd = new Random(42)
    (0 until Rounds).foreach { i =>
      val valid = Multimodal.syntheticJpegPixelPayload(i % 40)
      corruptions(valid, rnd).foreach { b =>
        Multimodal.decodeJpegPixels(Multimodal.RawAsset(i, "jpeg", b)): Unit
      }
    }
  }

  test("PNG pixel decode never throws on corrupted input") {
    val rnd = new Random(43)
    (0 until Rounds).foreach { i =>
      val valid = Multimodal.syntheticPngPixelPayload(i % 40)
      corruptions(valid, rnd).foreach { b =>
        Multimodal.decodePngPixels(Multimodal.RawAsset(i, "png", b)): Unit
      }
    }
  }

  test("WARC segment walk never throws on corrupted input") {
    val rnd = new Random(44)
    (0 until Rounds).foreach { i =>
      for (gz <- Seq(false, true)) {
        val valid = graft.etl.Warc.syntheticSegment(
          Iterator(i.toLong -> s"page $i body", (i + 100L) -> "x"), gz)
        corruptions(valid, rnd).foreach { b =>
          // gzip corruption may legally throw inside the JDK inflater —
          // the walk must convert that to a partial/empty parse, not leak
          graft.etl.Warc.parseSegment(b).size: Unit
        }
      }
    }
  }

  test("container header decodes never throw on corrupted input") {
    val rnd = new Random(45)
    (0 until Rounds).foreach { i =>
      val (fmt, valid) = Multimodal.syntheticContainerPayload(i % 40)
      corruptions(valid, rnd).foreach { b =>
        Multimodal.ByteCodec.decode(Multimodal.RawAsset(i, fmt, b)): Unit
      }
    }
  }

  test("MP4 box walk and the Dataset kernels never throw on corrupted input") {
    import spark.implicits._
    val rnd = new Random(46)
    val assets = (0 until 100).flatMap { i =>
      corruptions(Multimodal.syntheticMp4Payload(i % 40), rnd)
        .map(b => Multimodal.RawAsset(i, "video", b)).toSeq ++
        corruptions(Multimodal.syntheticAudioPayload(i % 40), rnd)
          .map(b => Multimodal.RawAsset(i + 1000, "audio", b)).toSeq ++
        corruptions(Multimodal.syntheticVideoPayload(i % 40), rnd)
          .map(b => Multimodal.RawAsset(i + 2000, "video", b)).toSeq
    }
    assets.foreach(a => Multimodal.decodeMp4(a): Unit)
    // one distributed pass per kernel over every corruption at once —
    // a single poisoned record failing the stage is exactly the bug class
    val ds = spark.createDataset(assets)
    Multimodal.audioFrameFeatures(ds, frameSize = 16).count(): Unit
    Multimodal.videoFrameDiff(ds).count(): Unit
    Multimodal.colorHistogram(ds).count(): Unit
    Multimodal.resizePpm(ds, factor = 2).count(): Unit
  }
}
