package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch timing for the round-7 span-dedup catalog rows at sf0.1 — the
  * numbers SURVEY's timing notes cite (anchored fast-hash path vs the md5
  * default, hash-keyed ownership vs text-keyed). Test scope only. */
object MeasureR7 {
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
    val names = if (args.nonEmpty) args.toSeq
      else Seq("dedup_spans", "dedup_spans_hashed",
        "dedup_spans_anchored", "dedup_spans_anchored_fast")
    for (name <- names) {
      qs(name)(spark, sfDir).count() // warm
      spark.catalog.clearCache()
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        qs(name)(spark, sfDir).count()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"MEASURE $name%-26s min=${ts.head}%.2f med=${ts(2)}%.2f max=${ts(4)}%.2f")
    }
    spark.stop()
  }
}
