package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Component timings for the HNSW descent — finds where sim_topk_hnsw's
  * bench seconds actually go (graph builds per layer vs beam hops vs final
  * ranking). Run: SPARK_GRAFT_SF_DIR=... runMain graft.tools.MeasureHnsw */
object MeasureHnsw {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    println(s"${emb.count()} vectors")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(): Unit
        }
      })
    def timed(name: String)(body: => Long): Unit = {
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val n = body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  " +
        f"rows=$n  jobs=${jobs.get() - j0}")
    }
    for (pass <- 1 to 2) {
      println(s"— pass $pass —")
      timed("knnGraph level0 (all)") {
        Similarity.knnGraph(emb, "vec_id", "embedding", 5, 6).count()
      }
      timed("knnGraph lvl0 adaptive") {
        Similarity.knnGraph(emb, "vec_id", "embedding", 5,
          Similarity.AdaptiveBits).count()
      }
      timed("knnGraph level>=1") {
        Similarity.knnGraph(emb.where(
          Similarity.hnswLevel(col("vec_id"), 8, 2) >= 1),
          "vec_id", "embedding", 5, 6).count()
      }
      timed("hnswTopK full") {
        Similarity.hnswTopK(emb, "vec_id", "embedding",
          emb.where(col("vec_id") < 5), "vec_id", "embedding",
          k = 10, beamWidth = 16, knnK = 5, bits = 6).count()
      }
      timed("hnswTopK adaptive") {
        Similarity.hnswTopK(emb, "vec_id", "embedding",
          emb.where(col("vec_id") < 5), "vec_id", "embedding",
          k = 10, beamWidth = 16, knnK = 5,
          bits = Similarity.AdaptiveBits).count()
      }
      timed("hnswTopK adaptive noAQE") {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try Similarity.hnswTopK(emb, "vec_id", "embedding",
          emb.where(col("vec_id") < 5), "vec_id", "embedding",
          k = 10, beamWidth = 16, knnK = 5,
          bits = Similarity.AdaptiveBits).count()
        finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
      val g0 = Similarity.knnGraph(emb, "vec_id", "embedding", 5, 6)
        .select(col("id"), col("nbr_id"))
        .persist()
      g0.count()
      timed("hnswTopK w/ cached base") {
        Similarity.hnswTopK(emb, "vec_id", "embedding",
          emb.where(col("vec_id") < 5), "vec_id", "embedding",
          k = 10, beamWidth = 16, knnK = 5, bits = 6, baseGraph = g0).count()
      }
      g0.unpersist()
    }
    spark.stop()
  }
}
