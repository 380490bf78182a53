package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ext.Dedup

/** Throughput of the suffix-rank substring dedup at bench SF (~1.5M chars,
  * 10× the correctness gate): end-to-end wall time for minLen 20 and 50 and
  * the found-span count — evidence the prefix-doubling shape holds as the
  * corpus grows (rounds are log2 minLen, CONSTANT in corpus size; the
  * per-round cost is the range-sort order index over corpus-char rows).
  * Run: SPARK_GRAFT_SF_DIR=... runMain graft.tools.MeasureSubstring */
object MeasureSubstring {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val chars = docs.selectExpr("sum(length(text))").head().getLong(0)
    println(s"corpus: ${docs.count()} docs, $chars chars")
    for (minLen <- Seq(20, 50); pass <- 1 to 2) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = Dedup.substringDupSpans(docs, "doc_id", "text", minLen).count()
      println(f"minLen=$minLen pass $pass: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n spans")
    }
    spark.stop()
  }
}
