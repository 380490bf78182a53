package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch timing for non-headline catalog rows changed in round 6
  * (dedup_editdist re-block, dedup_spans restructure, anchored variant) at
  * sf0.1 — the numbers SURVEY's timing notes cite. Test scope only. */
object MeasureR6 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val qs = graft.SparkEntry.queries
    for (name <- Seq("dedup_spans", "dedup_spans_anchored", "dedup_editdist",
        "curation_funnel", "q_streaming_neardup")) {
      qs(name)(spark, sfDir).count() // warm
      spark.catalog.clearCache()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        qs(name)(spark, sfDir).count()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"MEASURE $name%-24s min=${ts.head}%.2f med=${ts(1)}%.2f max=${ts(2)}%.2f")
    }
    spark.stop()
  }
}
