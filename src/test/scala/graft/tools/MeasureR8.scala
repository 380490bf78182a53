package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch timing for the round-8 cf-vocabulary broadcast in
  * corpusFrequencyScore: sf0.1 documents replicated 10× (distinct doc ids,
  * same zipfian token skew), broadcast join-back (default threshold) vs the
  * forced shuffle join (threshold 0) — the numbers SURVEY's timing notes
  * cite. Test scope only. */
object MeasureR8 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val docs = (0 until 10)
      .map(i => base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        col("text")))
      .reduce(_ unionByName _)
    for ((label, threshold) <- Seq(
        ("broadcast_cf", 1L << 20), ("shuffle_cf", 0L))) {
      graft.ext.TextStats.corpusFrequencyScore(
        docs, "doc_id", "text", maxBroadcastVocab = threshold).count() // warm
      spark.catalog.clearCache()
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        graft.ext.TextStats.corpusFrequencyScore(
          docs, "doc_id", "text", maxBroadcastVocab = threshold).count()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"MEASURE lm_score_$label%-16s min=${ts.head}%.2f med=${ts(2)}%.2f max=${ts(4)}%.2f")
    }
    spark.stop()
  }
}
