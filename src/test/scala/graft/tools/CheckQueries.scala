package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc local oracle pre-check: run the NAMED catalog rows only (all of
  * Verify's contract, none of its 90-query runtime) and dump each result +
  * its oracle SQL for a local DuckDB compare before the driver's gate runs.
  * Usage: Test/runMain graft.tools.CheckQueries <sfDir> <outDir> <name>...
  */
object CheckQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2).toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(f"[check] $name dumped in ${(System.nanoTime() - t0) / 1e9}%.2f s" +
        s" (oracle: ${graft.SparkEntry.oracleSql.contains(name)})")
      graft.SparkEntry.oracleSql.get(name).foreach { sql =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/$name.sql"), sql)
      }
    }
    spark.stop()
  }
}
