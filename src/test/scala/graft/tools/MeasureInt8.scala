package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Similarity

/** Scratch timing for the round-8 native [[graft.ext.expressions.IntDotExpr]]:
  * the full-corpus scoring scan of `int8TopK` (the stage that dominates
  * brute-force ANN) timed three ways on sf0.1 embeddings replicated 10× —
  * float native dot (graft_dot), int8 native dot (graft_int_dot), and the
  * int8 zip_with/aggregate HOF fold the native expr replaced. Test scope
  * only; SURVEY's timing notes cite these numbers. */
object MeasureInt8 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    val corpus = (0 until 10)
      .map(i => base.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
        col("v")))
      .reduce(_ unionByName _)

    val floatC = corpus.select(col("vec_id"), col("v"))
    val intC = corpus.select(col("vec_id"),
      Similarity.quantizeInt8(col("v")).as("c"))

    // One query vector broadcast as a literal: the scan itself is the thing
    // being timed, not the join shape.
    val q = base.where(col("vec_id") === 0).select(col("v")).head
      .getSeq[Double](0)
    val qLit = array(q.map(lit): _*)
    val maxabs = q.map(math.abs).max
    val qCodes =
      if (maxabs == 0.0) q.map(_ => 0L)
      else q.map(x => math.floor(x * 127.0 / maxabs + 0.5).toLong)
    val qInt = array(qCodes.map(lit): _*)

    def time(label: String)(mk: => Long): Unit = {
      mk // warm (also materializes the cached input)
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); mk; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"MEASURE int8scan_$label%-12s min=${ts.head}%.2f med=${ts(2)}%.2f max=${ts(4)}%.2f")
    }

    floatC.persist(); floatC.count()
    intC.persist(); intC.count()
    time("float_native") {
      floatC.select(Similarity.dot(col("v"), qLit).as("s"))
        .agg(sum("s")).head.getDouble(0).toLong
    }
    time("int_native") {
      intC.select(Similarity.intDot(col("c"), qInt).as("s"))
        .agg(sum("s")).head.getLong(0)
    }
    time("int_hof") {
      intC.select(Similarity.intDotHof(col("c"), qInt).as("s"))
        .agg(sum("s")).head.getLong(0)
    }

    // The real operator shapes: 5-query brute-force top-k, float vs int8
    // (quantization included — the per-run cost a stored int8 corpus would
    // amortize away).
    val raw10 = (0 until 10)
      .map(i => spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
          col("embedding")))
      .reduce(_ unionByName _)
    raw10.persist(); raw10.count()
    val qs = raw10.where(col("vec_id") < 5)
    time("topk_float") {
      Similarity.bruteForceTopK(raw10, qs, "vec_id", "embedding", k = 10)
        .count()
    }
    time("topk_int8") {
      Similarity.int8TopK(raw10, qs, "vec_id", "embedding", k = 10).count()
    }
    spark.stop()
  }
}
