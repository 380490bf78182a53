package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full-text relevance retrieval over a document corpus — the search-engine
  * modality next to the dense ([[Similarity]]) and sparse-cosine
  * ([[Similarity.lexicalCosinePairs]]) suites: score documents against
  * small term queries with BM25 and return the top k per query.
  *
  * Engine-portable scoring discipline (the repo's integer-evidence rule):
  * every BM25 ingredient is an exact integer (tf, df, dl, N, Σdl) and the
  * per-term contribution is computed in a FIXED order of correctly-rounded
  * IEEE ops, then floored to 2^20 fixed point — so the per-(query, doc)
  * score is an exact integer SUM of exact integers, order-independent
  * across partitions and bit-identical in any engine that parses the same
  * literals. The classical formula's `ln` is NOT correctly rounded across
  * engines/libms, so the catalog-checked score uses the RATIONAL idf
  * `(N - df + ½)/(df + ½)` (the argument of the classical `ln`); pass
  * `logIdf = true` for the textbook damped variant where cross-engine
  * bit-reproducibility is not required (per-term idf is a monotone map of
  * the rational form, but the cross-term SUM can rank differently — the
  * rational default weighs rare terms more heavily).
  *
  * Scale shape: the broadcast query-token set semi-joins the exploded
  * token rows MAP-SIDE, before the (doc, token, tf) collapse — so the one
  * corpus-derived exchange carries only query-term postings (≤ df(token)
  * rows per query term), never the corpus vocabulary; each posting CARRIES
  * its doc length through the collapse (constant per doc, max() exact), so
  * no corpus-sized length table is ever joined; doc-frequency (exact
  * corpus df for those terms — every posting of a term survives the
  * filter) aggregates from the collapsed postings and broadcasts; N and
  * Σdl come from one map-side-partial scalar aggregation;
  * the final ranking is the bounded-heap
  * [[TopK]] (shuffle = k rows per partition per query, never the candidate
  * set). Stopword-class terms make candidate generation corpus-sized —
  * `maxDf` drops tokens above a document-frequency ceiling (the
  * [[Similarity.lexicalCosinePairs]] Bayardo discipline; BM25 already
  * scores them near zero, so dropping them changes little and caps the
  * join fan-out).
  *
  * Precision bound (same class as `Sampling.capPerGroupSkewSafe`): the
  * fixed-point score rides through the heap as a Double, exact below 2^53
  * — with the 2^20 scale that is Σ contributions < 2^33, far beyond any
  * real query's term count times the idf ceiling 2N. */
object Retrieval {

  /** BM25 top-k: `queryTerms` is a (query id, token) frame — small, it is
    * broadcast; `k1`/`b` are the standard saturation/length-normalization
    * dials. Returns (query_id, doc_id, rank, score_fp): rank 1..k by
    * (score desc, doc id asc), score_fp the 2^20 fixed-point integer
    * score. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: DataFrame, k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               maxDf: Option[Long] = None,
               logIdf: Boolean = false,
               tok: Tokenizer = Tokenizer.Whitespace): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val q = queryTerms.toDF("query_id", "token")

    val toks = docs.select(col(idCol).as("doc_id"),
      TextStats.tokens(col(textCol), tok).as("ts"))
    val dl = toks.select(col("doc_id"), size(col("ts")).cast("long").as("dl"))
    // only query-term postings are ever scored, and df(token) over the
    // whole corpus is exactly computable from just those postings — so the
    // broadcast query-token semi-join lands BEFORE the (doc, token)
    // exchange, map-side on the exploded rows. The collapse then shuffles
    // df(query terms) rows instead of the corpus's entire vocabulary
    // (at 100 TB: a few million postings vs trillions of token pairs).
    val qTok = broadcast(q.select("token").distinct())
    // the doc length RIDES the postings through the collapse (constant per
    // doc, so max() is exact) — joining the corpus-sized dl frame against
    // the postings would be the one remaining corpus-sized exchange
    val tf = toks.select(col("doc_id"), size(col("ts")).cast("long").as("dl"),
        explode(col("ts")).as("token"))
      .join(qTok, "token")
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dfreq0 = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val dfreq = maxDf.fold(dfreq0)(cap => dfreq0.where(col("df") <= cap))

    // two exact integers; their division is the one correctly-rounded op —
    // identical in any engine
    val stats = dl.agg(count(lit(1)).cast("long").as("n"),
      sum("dl").cast("long").as("sdl")).head
    val n = stats.getLong(0)
    val sumDl = stats.getLong(1)
    val avgdl = sumDl.toDouble / n.toDouble

    val idfRational = (lit(n.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val idf = if (logIdf) log(idfRational) else idfRational
    val tfNorm = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / lit(avgdl))))
    val contrib = floor(idf * tfNorm * lit(1048576.0)).cast("long")

    val scored = tf
      .join(broadcast(q), "token")
      // ≤ one row per query token — bounded by the broadcast qTok set
      .join(broadcast(dfreq), "token")
      .groupBy("query_id", "doc_id")
      .agg(sum(contrib).as("score_fp"))

    TopK.topKPerKey(
        scored.select(col("query_id"), col("doc_id").as("id"),
          col("score_fp").cast("double").as("score")),
        "query_id", "score", "id", k)
      .select(col("query_id"), col("id").as("doc_id"), col("rank"),
        col("score").cast("long").as("score_fp"))
  }

  /** Reciprocal-rank fusion — the standard combiner for hybrid retrieval
    * (BM25 text ranks ⊕ dense ANN ranks, or any mix of retrievers): each
    * input ranking contributes `scale div (k0 + rank)` to a candidate's
    * fused score, summed across lists, final top-k per query. `k0 = 60` is
    * the constant from the original RRF paper (Cormack/Clarke/Buettcher,
    * SIGIR 2009); `scale = 2^20` lifts the reciprocal onto the repo's
    * fixed-point integer grid. The contribution is PURE INTEGER division
    * (Spark `div` ≡ DuckDB `//` on positives — no floating point anywhere),
    * so fused scores are bit-identical in any engine; ties break on id asc.
    *
    * Each ranking frame must carry (query_id, id, rank) — rank 1-based as
    * produced by [[bm25TopK]] / [[TopK.topKPerKey]]. A candidate absent
    * from a list simply contributes nothing for it (no outer-join NULL
    * handling: the union never manufactures rows).
    *
    * Scale shape: the inputs are already top-k lists (|queries| × depth
    * rows — vanishingly small next to the corpora that produced them), so
    * fusion is a union + map-side-partial hash aggregate + bounded-heap
    * [[TopK]]; no join at all, nothing corpus-sized crosses an exchange.
    *
    * Precision bound: each contribution ≤ scale/(k0+1) < 2^14 at the
    * defaults; a fused sum stays exact in the heap's Double far beyond any
    * real list count (overflow needs ≈ 2^39 lists). */
  def rrfFuse(rankings: Seq[DataFrame], k: Int,
              k0: Int = 60, scale: Long = 1L << 20): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k >= 1, s"k must be positive: $k")
    require(k0 >= 0, s"k0 must be non-negative: $k0")
    require(scale >= 1, s"scale must be positive: $scale")
    val contribs = rankings.map(_.select(col("query_id"), col("id"),
      expr(s"${scale}L div (${k0}L + cast(rank as bigint))").as("contrib")))
    val fused = contribs.reduce(_ unionAll _)
      .groupBy("query_id", "id")
      .agg(sum("contrib").as("score_fp"))
    TopK.topKPerKey(
        fused.select(col("query_id"), col("id"),
          col("score_fp").cast("double").as("score")),
        "query_id", "score", "id", k)
      .select(col("query_id"), col("id"), col("rank"),
        col("score").cast("long").as("score_fp"))
  }
}
