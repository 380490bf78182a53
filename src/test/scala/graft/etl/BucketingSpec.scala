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

  test("served banded store as a bucketed table: the probe join never " +
      "shuffles the store, and matches the broadcast-probe result") {
    import graft.ext.Dedup
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val store = docs.where(col("doc_id") % 10 < 7)
    val batch = docs.where(col("doc_id") % 10 >= 7)
    Dedup.minhashStoreBandedSave(store, "doc_id", "text", "b_banded_store",
      numBuckets = 8)
    // the save wrote the geometry sidecar into the table location: the
    // checked open succeeds on the matching geometry and throws on drift
    assert(Dedup.minhashStoreBandedOpenTable(spark, "b_banded_store")
      .columns.contains("band"))
    val drift = intercept[IllegalArgumentException] {
      Dedup.minhashStoreBandedOpenTable(spark, "b_banded_store",
        numHashes = 8)
    }
    assert(drift.getMessage.contains("numHashes: store=16 probe=8"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the non-broadcast path so the store-shuffle question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probe = Dedup.nearDupAgainstBandedStore(
        spark.table("b_banded_store"), batch, "doc_id", "text",
        broadcastBatch = false)
      val viaBroadcast = Dedup.nearDupAgainstBandedStore(
          spark.table("b_banded_store"), batch, "doc_id", "text")
        .as[(Long, Long, Int, Double)].collect().toSet
      assert(probe.as[(Long, Long, Int, Double)].collect().toSet
        === viaBroadcast)
      // no ShuffleExchange anywhere above the bucketed store scan: only
      // the batch side (hashed into the store's buckets) and the final
      // distinct exchange — the store streams in bucket layout. Collected
      // from the pre-AQE physical plan: AdaptiveSparkPlanExec does not
      // expose its inner tree to collect() before execution.
      val exchanges = probe.queryExecution.sparkPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.nonEmpty) // the batch side DOES exchange
      exchanges.foreach { e =>
        assert(!e.toString.contains("b_banded_store"),
          s"the served store was shuffled:\n$e")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_banded_store")
    }
  }

  test("served banded table with a QUALIFIED name: db.tbl parses as a " +
      "two-part identifier, the sidecar lands in the table location, and " +
      "the checked open round-trips (a raw TableIdentifier would look up " +
      "an unqualified table literally named 'db.tbl' and fail AFTER the " +
      "save, stranding a sidecar-less table)") {
    import graft.ext.Dedup
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50)
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_qdb")
    try {
      Dedup.minhashStoreBandedSave(docs, "doc_id", "text",
        "graft_qdb.b_q_store", numBuckets = 4)
      assert(Dedup.minhashStoreBandedOpenTable(spark, "graft_qdb.b_q_store")
        .columns.contains("band"))
      val drift = intercept[IllegalArgumentException] {
        Dedup.minhashStoreBandedOpenTable(spark, "graft_qdb.b_q_store",
          numHashes = 8)
      }
      assert(drift.getMessage.contains("numHashes: store=16 probe=8"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_qdb.b_q_store")
      spark.sql("DROP DATABASE IF EXISTS graft_qdb")
    }
  }
}
