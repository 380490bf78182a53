package graft.tools

import org.apache.spark.sql.SparkSession

/** r9 measurement: warm per-query timings for the text-LM rows before/after
  * the row-local tf collapse ([[graft.ext.TextStats.localRunCounts]]).
  * Usage: Test/runMain graft.tools.MeasureR9 [sfDir] [query ...]
  */
object MeasureR9 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("text_lm_score", "text_lm_bigram")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val q = graft.SparkEntry.queries(name)
      q(spark, sfDir).count() // warm codegen + parquet footer caches
      spark.catalog.clearCache()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        q(spark, sfDir).count()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[measure] $name warm min=${times.min}%.3f med=${times.sorted.apply(1)}%.3f")
    }
    spark.stop()
  }
}
