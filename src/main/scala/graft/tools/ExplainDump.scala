package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for named catalog queries to files —
  * the optimization-round evidence trail (plans/r<N>/<query>_{before,after}
  * .txt). Plans only; nothing is executed, so dumps are cheap and safe to
  * run next to a bench.
  *
  * Usage: runMain graft.tools.ExplainDump <sfDir> <outDir> <suffix> [q1,q2,…]
  * (no query list = every headline query). Writes <outDir>/<name>_<suffix>
  * .txt.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        "usage: runMain graft.tools.ExplainDump <sfDir> <outDir> <suffix> [q1,q2,…]")
      sys.exit(2)
    }
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val qs = graft.SparkEntry.queries
    val names = if (args.length > 3) args(3).split(",").toSeq.filter(qs.contains)
                else graft.Queries.headline.filter(qs.contains)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = qs(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"), plan)
        System.err.println(s"[explain] $name ok")
      } catch { case e: Throwable =>
        System.err.println(s"[explain] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
