package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Where does sim_kmeans' bench time go? Times the three phases separately
  * (quantize+seed, Lloyd rounds, final labeling) and a whole-row pass, at
  * the bench SF. Run: SPARK_GRAFT_SF_DIR=... runMain graft.tools.MeasureKmeans */
object MeasureKmeans {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb.count()
    // warm
    Similarity.kmeansAssignPortable(emb, "vec_id", "embedding", 8, 2).count()
    for (i <- 1 to 3) {
      spark.catalog.clearCache()
      time(s"whole row pass $i") {
        Similarity.kmeansAssignPortable(emb, "vec_id", "embedding", 8, 2)
          .count()
      }
    }
    // phase split: quantize scan alone vs one assignment aggregation
    spark.catalog.clearCache()
    val codes = emb.select(col("vec_id"),
      Similarity.quantizeInt8(Similarity.asDouble(col("embedding"))).as("q"))
      .withColumn("qd", col("q").cast("array<double>"))
      .persist()
    time("quantize+persist scan")(codes.count())
    val cents = codes.select(col("vec_id").as("cent_id"), col("qd").as("cv"))
      .orderBy("cent_id").limit(8).collect()
      .toSeq.map(r => (r.get(0), r.getSeq[Double](1)))
    // the Generate-recompute pathology vs the fix: an expensive non-
    // generator expression written NEXT TO posexplode lands in the
    // projection ABOVE Generate and re-evaluates per EXPLODED row (dim-fold
    // amplification); projecting it in a child select evaluates it once
    time("assignment PATHOLOGICAL (cell beside posexplode)") {
      codes.select(Similarity.nearestCell(col("qd"),
          Similarity.centroidLiteral(cents)).as("cell"),
          posexplode(col("q")))
        .toDF("cell", "pos", "x")
        .groupBy("cell", "pos")
        .agg(sum(col("x")), count(lit(1))).collect()
    }
    time("assignment FIXED (cell below the Generate)") {
      codes.select(Similarity.nearestCell(col("qd"),
          Similarity.centroidLiteral(cents)).as("cell"), col("q"))
        .select(col("cell"), posexplode(col("q")))
        .toDF("cell", "pos", "x")
        .groupBy("cell", "pos")
        .agg(sum(col("x")), count(lit(1))).collect()
    }
    time("final labeling (cell + score)") {
      codes.select(col("vec_id"),
        Similarity.nearestCell(col("qd"), Similarity.centroidLiteral(cents)).as("cell"),
        Similarity.nearestCellScore(col("qd"), Similarity.centroidLiteral(cents)).as("score"))
        .count()
    }
    spark.stop()
  }
}
