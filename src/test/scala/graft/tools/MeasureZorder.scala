package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Scratch measurement for the round-8 Layout.zorderLayout: sf0.1 lineitem
  * written (a) sorted on l_partkey only and (b) z-ordered on
  * (l_partkey, l_suppkey), small parquet row groups so footer min/max
  * pruning has granularity; then a 2-D box predicate is scanned on both
  * layouts and the scan's numOutputRows (rows surviving row-group pruning)
  * plus wall time are compared. SURVEY's layout row cites these numbers.
  * AQE is off so the executed plan's scan metrics are directly readable.
  * Test scope only. */
object MeasureZorder {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val (pMax, sMax) = {
      val r = li.selectExpr("max(l_partkey)::long", "max(l_suppkey)::long").head
      (r.getLong(0), r.getLong(1))
    }
    val root = java.nio.file.Files.createTempDirectory("zorder-measure").toString

    // ~256 KB row groups => ~100+ row groups per layout: granularity stands in
    // for the millions of row groups a 100 TB table has
    val linear = s"$root/linear"
    li.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.option("parquet.block.size", 256 * 1024).parquet(linear)
    val zordered = s"$root/zorder"
    graft.ext.Layout.zorderLayout(li, bits = 16, numFiles = 16,
        col("l_partkey"), col("l_suppkey"))
      .write.option("parquet.block.size", 256 * 1024).parquet(zordered)

    // 5% box on each dimension, mid-range
    def box(df: DataFrame): DataFrame = df.where(
      col("l_partkey").between(pMax * 40 / 100, pMax * 45 / 100) &&
        col("l_suppkey").between(sMax * 40 / 100, sMax * 45 / 100))

    def measure(label: String, path: String): Unit = {
      val total = spark.read.parquet(path).count()
      // warm + result
      val expected = box(spark.read.parquet(path)).count()
      val ts = (1 to 5).map { _ =>
        val agg = box(spark.read.parquet(path)).groupBy().count()
        val t0 = System.nanoTime()
        // collect(), not head(): head wraps the plan in a fresh limit whose
        // metrics are separate from agg.queryExecution's
        assert(agg.collect()(0).getLong(0) == expected)
        val sec = (System.nanoTime() - t0) / 1e9
        val scanned = agg.queryExecution.executedPlan.collect {
          case s: FileSourceScanExec => s.metrics("numOutputRows").value
        }.sum
        (sec, scanned)
      }
      val best = ts.map(_._1).sorted
      println(f"MEASURE zorder_$label%-8s rows_scanned=${ts.head._2}%d of $total%d " +
        f"(match=$expected%d) min=${best.head}%.3f med=${best(2)}%.3f")
    }
    measure("linear", linear)
    measure("curve", zordered)
    spark.stop()
  }
}
