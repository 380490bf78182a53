package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an embedding column
  * (`array<float>`), SURVEY §2.8.
  *
  * Vector math is expressed with higher-order built-ins (`zip_with` +
  * `aggregate`) rather than UDFs, and as a *strict left fold in index order*:
  * floating-point addition is not associative, so a fixed evaluation order is
  * what makes scores reproducible across engines and across partitionings —
  * the property the driver's oracle (and any re-run at 1000 executors)
  * depends on.
  *
  * Scale shape: brute-force top-k is one broadcast of the (small) query set
  * against a corpus scan — linear, no shuffle until the per-query k-row
  * aggregation. The bucketed variant prunes the corpus ~2^bits-fold with a
  * sign-quantization LSH (random-hyperplane family with axis-aligned planes),
  * turning the cross product into an equi-join on the bucket key.
  */
object Similarity {

  /** float[] → double[] (exact: every float is representable). All arithmetic
    * then happens in double on both sides of any engine comparison. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product as a strict left fold in index order — native codegen'd
    * expression ([[graft.ext.expressions.DotProductExpr]]); bit-identical to
    * [[dotHof]] (same op order), minus the lambda-interpreter cost. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.GraftColumnBridge
    GraftColumnBridge.column(graft.ext.expressions.DotProductExpr(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** Higher-order-function twin of [[dot]] (kept as the portable reference
    * implementation; NativeExprSpec asserts bitwise equality). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; evaluation order fixed as dot / (||a|| * ||b||).
    * try_divide, not `/`: under ANSI mode (Spark 4 default) a zero-norm
    * vector would otherwise abort the whole query with DIVIDE_BY_ZERO;
    * NULL flows to the rankers, which drop it. Identical doubles for every
    * nonzero divisor. */
  def cosine(a: Column, b: Column): Column =
    try_divide(dot(a, b), norm(a) * norm(b))

  /** Rank scored candidates to top-k per query via the bounded-heap
    * aggregator ([[TopK]]): map-side partial aggregation caps the shuffle at
    * k rows per (partition, query) — unlike a rank window, which must move
    * and sort EVERY candidate row of a query into one partition. Bit- and
    * tie-identical to `row_number().over(orderBy(score desc, id))`
    * (asserted in ExtSpec). */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    TopK.topKPerKey(scored, "query_id", "score", "id", k)

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself). `queries` should be small — it is broadcast;
    * the corpus is scanned once. Returns (query_id, rank, id, score). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"),
        cosine(col("qv"), col("v")).as("score"))
    rankTopK(scored, k)
  }

  /** Sign-quantization LSH bucket: bit i of the key is sign(v[i+1] > 0) for
    * the first `bits` dimensions. Deterministic, engine-portable (no random
    * hyperplanes to ship), and a genuine member of the random-hyperplane LSH
    * family for embeddings whose coordinates are already decorrelated. */
  def signBucket(v: Column, bits: Int): Column =
    (0 until bits).map { i =>
      when(element_at(v, i + 1) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Bucketed ANN top-k: like [[bruteForceTopK]] but candidates are only
    * corpus vectors in the query's sign bucket — the equi-join on the bucket
    * key replaces the cross product (~2^bits candidate reduction; recall
    * trades off with `bits`). */
  def bucketedTopK(corpus: DataFrame, queries: DataFrame,
                   idCol: String, vecCol: String, k: Int, bits: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"),
      signBucket(col(vecCol), bits).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"),
      signBucket(col(vecCol), bits).as("bucket"))
    val scored = c.join(broadcast(q), "bucket")
      .where(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"), cosine(col("qv"), col("v")).as("score"))
    rankTopK(scored, k)
  }

  /** IVF (inverted-file) ANN top-k — the other classic scale path next to
    * [[bucketedTopK]]: partition the corpus into `nCells` Voronoi cells
    * around centroids, search only the query's `nProbe` nearest cells.
    *
    * Centroids here are the `nCells` lowest-id corpus vectors — deterministic
    * and dependency-free; swap in k-means centroids (Spark ML KMeans) for
    * better cell balance, nothing else changes. Cell assignment is one
    * broadcast of the (tiny) centroid set + an argmax window; the probe join
    * is an equi-join on cell id, so the shuffle key is the cell — the same
    * "bucket IS the partition key" shape that survives scale-up. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nCells: Int, nProbe: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    val cents = c.orderBy("id").limit(nCells)
      .select(col("id").as("cent_id"), col("v").as("cv"))
    def nearestCells(df: DataFrame, vcol: String, n: Int, out: String): DataFrame = {
      val w = Window.partitionBy(col(idCol))
        .orderBy(cosine(col(vcol), col("cv")).desc, col("cent_id").asc)
      df.crossJoin(broadcast(cents))
        .select(col("*"), row_number().over(w).as("cell_rank"))
        .where(col("cell_rank") <= n)
        .select(df.columns.map(col) :+ col("cent_id").as(out): _*)
    }
    val assigned = nearestCells(
      c.select(col("id").as(idCol), col("v")), "v", 1, "cell")
      .select(col(idCol).as("id"), col("v"), col("cell"))
    val q = queries.select(col(idCol), asDouble(col(vecCol)).as("qv"))
    val probes = nearestCells(q, "qv", nProbe, "cell")
      .select(col(idCol).as("query_id"), col("qv"), col("cell"))
    val scored = assigned.join(broadcast(probes), "cell")
      .where(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id"), cosine(col("qv"), col("v")).as("score"))
    rankTopK(scored, k)
  }

  /** Embedding-cosine near-duplicate pairs: all (a < b) pairs with cosine >=
    * threshold. Unblocked all-pairs is quadratic — correct at verification
    * scale; at 100 TB block first ([[signBucket]] equi-join, same contract as
    * `Dedup.blockedNgramPairs`). */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
    v.select(col("id").as("a_id"), col("v").as("va"))
      .crossJoin(v.select(col("id").as("b_id"), col("v").as("vb")))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), cosine(col("va"), col("vb")).as("score"))
      .where(col("score") >= threshold)
  }

  /** Bucketed variant of [[cosineNearDupPairs]] — candidates limited to
    * pairs sharing a sign bucket, turning the all-pairs cross product into a
    * self-equi-join on the bucket key (the shuffle key IS the bucket).
    * Recall < 1: highly-similar vectors agree on most sign bits, but a
    * near-dup pair straddling a coordinate sign flip in the first `bits`
    * dims is missed — the standard LSH trade; raise recall with multiple
    * rotated bucketings at proportional cost. */
  def cosineNearDupPairsBucketed(df: DataFrame, idCol: String, vecCol: String,
                                 threshold: Double, bits: Int): DataFrame = {
    val v = df.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"),
      signBucket(col(vecCol), bits).as("bucket"))
    v.select(col("bucket"), col("id").as("a_id"), col("v").as("va"))
      .join(v.select(col("bucket"), col("id").as("b_id"), col("v").as("vb")),
        Seq("bucket"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), cosine(col("va"), col("vb")).as("score"))
      .where(col("score") >= threshold)
  }
}
