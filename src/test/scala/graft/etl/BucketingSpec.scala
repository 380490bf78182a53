package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed co-located join: same bucketing on both sides ⇒ the equi-join
  * plans with NO shuffle exchange — the "minimize shuffles" contract for
  * repeated big-to-big joins (bucket once, join many times for free). */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketed tables equi-join without any exchange") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")

    Sources.writeBucketed(li, "b_lineitem", "l_orderkey", 8)
    Sources.writeBucketed(ord, "b_orders", "l_orderkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join so the exchange question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected exchange-free plan:\n$plan")
      // and it is still correct
      val expected = li.join(ord, "l_orderkey").count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
