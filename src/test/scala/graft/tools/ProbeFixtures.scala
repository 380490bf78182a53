package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Dedup
import graft.streaming.EventTimeOps

/** Scratch fixture probe for round-6 spec design (not part of the library). */
object ProbeFixtures {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // ── 1. anchored span dedup: where do the anchors fall? ──
    val passage = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor incididunt ut labore et dolore magna aliqua"
    val toks = passage.split(" ")
    val hashes = toks.toSeq.toDF("t")
      .select(col("t"), Dedup.tokenHash(col("t")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    println("ANCHORS mod 4: " + hashes.zipWithIndex.collect {
      case ((t, h), i) if h % 4 == 0 => s"$i:$t" }.mkString(", "))
    println("ANCHORS mod 8: " + hashes.zipWithIndex.collect {
      case ((t, h), i) if h % 8 == 0 => s"$i:$t" }.mkString(", "))

    val corpus = Seq(
      (1L, passage),
      (2L, "zz ww " + passage + " qq")).toDF("doc_id", "text")
    for (mod <- Seq(4, 8)) {
      val anch = Dedup.dedupSpansAnchored(corpus, "doc_id", "text", mod)
        .orderBy("doc_id").as[(Long, String, Long)].collect()
      println(s"ANCHORED mod=$mod:")
      anch.foreach { case (id, t, n) => println(s"  doc$id n=$n text='$t'") }
      val fixed = Dedup.dedupSpans(corpus, "doc_id", "text", 4)
        .orderBy("doc_id").as[(Long, String, Long)].collect()
      if (mod == 4) fixed.foreach { case (id, t, n) =>
        println(s"  FIXED doc$id n=$n text='$t'") }
    }

    // ── 2. streaming near-dup: find a deterministic false positive ──
    // pairs (2i, 2i+1) with controlled shingle overlap just UNDER 0.5 —
    // per-pair token vocabulary disjoint so no cross-pair candidates.
    def doc(pair: Int, variant: Int, shared: Int, distinct: Int): String = {
      val s = (1 to shared).map(j => s"p${pair}s$j")
      val d = (1 to distinct).map(j => s"p${pair}v${variant}d$j")
      (s ++ d).mkString(" ")
    }
    // shared run of tokens gives shared shingles; jaccard tuned by lengths
    val docs = (1 to 12).flatMap { p =>
      // odd pairs: jaccard ~0.44 (below threshold — FP bait);
      // even pairs: ~0.71 (true pairs that must survive verification)
      val (sh2, di) = if (p % 2 == 1) (13, 7) else (17, 3)
      Seq((2L * p, doc(p, 0, sh2, di)), (2L * p + 1, doc(p, 1, sh2, di)))
    }.toDF("doc_id", "text")
    val cand = EventTimeOps.streamingNearDedup(docs, "doc_id", "text",
      threshold = 0.5).select("a_id", "b_id", "est_jaccard").distinct()
    val sh = docs.select(col("doc_id"),
      Dedup.hashedWordShingles(col("text"), 3).as("sh"))
    val withExact = cand
      .join(sh.select(col("doc_id").as("a_id"), col("sh").as("sa")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("sh").as("sb")), "b_id")
      .select(col("a_id"), col("b_id"), col("est_jaccard"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb")))).as("exact"))
      .orderBy("a_id").collect()
    println("FLAGGED pairs (est vs exact):")
    withExact.foreach(r => println(
      f"  ${r.getLong(0)}%3d ${r.getLong(1)}%3d est=${r.getDouble(2)}%.3f exact=${r.getDouble(3)}%.3f ${if (r.getDouble(3) < 0.5) "FALSE-POSITIVE" else ""}"))
    spark.stop()
  }
}
