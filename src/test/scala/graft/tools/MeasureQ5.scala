package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch measurement harness for the q5_region_revenue pre-agg vs flat
  * join decision (round-6 verdict task #1). Not part of the shipped
  * library — lives in test scope, runs via `sbt "Test/runMain graft.tools.MeasureQ5"`. */
object MeasureQ5 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def t(name: String): DataFrame = spark.read.parquet(s"$sfDir/$name.parquet")
    def money(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
    val one = lit(java.math.BigDecimal.ONE).cast("decimal(8,4)")

    def flat(lineitem: DataFrame, orders: DataFrame): DataFrame =
      lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(t("customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t("nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t("region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(sum(money(col("l_extendedprice")) *
          (one - col("l_discount").cast("decimal(8,4)")))
          .cast("double").as("revenue"))
        .orderBy("r_name")

    def preagg(lineitem: DataFrame, orders: DataFrame): DataFrame = {
      val ordRev = lineitem
        .groupBy(col("l_orderkey"))
        .agg(sum(money(col("l_extendedprice")) *
          (one - col("l_discount").cast("decimal(8,4)"))).as("ord_rev"))
      ordRev
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(t("customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t("nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t("region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(sum(col("ord_rev")).cast("double").as("revenue"))
        .orderBy("r_name")
    }

    def bench(label: String, mk: () => DataFrame): Unit = {
      mk().count() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk().count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"MEASURE $label%-28s min=${ts.head}%.3f med=${ts(1)}%.3f max=${ts(2)}%.3f")
    }

    // ── sf0.1 as-is ──
    bench("sf0.1 flat", () => flat(t("lineitem"), t("orders")))
    bench("sf0.1 preagg", () => preagg(t("lineitem"), t("orders")))

    // ── synthetic ~10× scale-up: replicate lineitem+orders with offset
    //    orderkeys (custkeys unchanged, so the customer join still hits) ──
    val k = 10
    val maxOk = 10000000L
    def rep(df: DataFrame, keyCol: String): DataFrame =
      df.crossJoin(spark.range(k).select(col("id").as("_rep")))
        .withColumn(keyCol, col(keyCol) + col("_rep") * maxOk)
        .drop("_rep")
    val li10 = rep(t("lineitem"), "l_orderkey")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val or10 = rep(t("orders"), "o_orderkey")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    li10.count(); or10.count()
    bench("sf~1 (10x) flat", () => flat(li10, or10))
    bench("sf~1 (10x) preagg", () => preagg(li10, or10))

    spark.stop()
  }
}
