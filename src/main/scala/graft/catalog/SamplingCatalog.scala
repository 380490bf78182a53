package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{AsofJoin, BloomJoin, Curation, Decontaminate, Dedup, Dsir, Funnel, Graph, Layout, Multimodal, RangeJoin, Resample, Sampling, Similarity, SkewJoin, Sketches, TextStats, Urls}
import graft.streaming.EventTimeOps

/** Sampling / splits / decontamination family (E5/E22): hash splits, caps, token budgets, packing, epochs, manifests, leakage-safe splits.
  *
  * One catalog family of [[ExtQueries]] (split from the former monolith,
  * zero behavior change): `queries` are the Spark definitions, `oracle`
  * the DuckDB restatements the driver gates them against. Portability
  * rules are documented on [[ExtQueries]]; shared fixtures/helpers live
  * in [[CatalogShared]]. */
object SamplingCatalog {
  import CatalogShared._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Deterministic hash sample: membership is a pure function of the key,
    // so the oracle re-derives the exact row set (no rand() anywhere).
    "sample_hash" -> ((s, d) => {
      Sampling.sampleByHash(t(s, d, "documents"), "doc_id", 0.2)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy("lang")
    }),


    // Weighted priority sampling (Sequential Poisson / priority sampling,
    // E22c): 60 docs kept with probability ∝ token count — priority =
    // unit-hash/weight, bottom-k via a bounded TakeOrdered heap (never a
    // full sort). The hash is exact in a double and the one division is
    // correctly rounded, so kept set, order, AND the priority doubles
    // restate bit-identically in the oracle.
    "sample_weighted" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), TextStats.nTokens(col("text")).as("w"))
      Sampling.weightedPrioritySample(docs, "doc_id", "w", k = 60)
        .orderBy("rank")
    }),


    // Per-SOURCE weighted quota (mixture construction): 8 docs per source
    // with inclusion ∝ token weight — the bounded-heap TopK keyed on the
    // source (shuffle ≤ k per partition-group), negated-priority ordering
    // ≡ (priority asc, id asc). Kept ids, ranks, AND the priority doubles
    // on the hash.
    "sample_weighted_by_source" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("source"), col("doc_id"),
          TextStats.nTokens(col("text")).as("w"))
      Sampling.weightedPrioritySampleByGroup(docs, "source", "doc_id", "w",
          k = 8)
        .orderBy("source", "rank")
    }),


    // Deterministic global corpus shuffle: pseudo-random order as a pure
    // function of (key, salt) — the retry-stable, engine-reproducible
    // replacement for orderBy(rand()) before sequence packing. The oracle
    // re-derives the exact permutation (shuffle_key is portable md5).
    "sample_shuffle" -> ((s, d) => {
      Sampling.deterministicShuffle(t(s, d, "documents"), "doc_id", salt = "ep1")
        .select(col("doc_id"), col("shuffle_key"))
    }),


    // Leakage-free K-FOLD assignment (5 folds): the cross-validation
    // split — fold membership a pure function of the key, so folds never
    // migrate when the corpus regenerates; per-(fold, lang) counts plus
    // id extrema on the hash, the oracle re-deriving every assignment.
    "sample_folds" -> ((s, d) => {
      Sampling.withFolds(t(s, d, "documents"), "doc_id", k = 5, salt = "cv1")
        .groupBy(col("fold"), col("lang"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy("fold", "lang")
    }),


    // Leakage-free train/test split on the doc key.
    "sample_split" -> ((s, d) => {
      Sampling.withSplit(t(s, d, "documents"), "doc_id", 0.25, salt = "v1")
        .groupBy(col("split"), col("lang")).agg(count(lit(1)).as("n"))
        .orderBy("split", "lang")
    }),


    // Cap-per-domain (data mixing): at most 10 docs per source, chosen by
    // hash rank — the kept ids themselves are compared, not just counts.
    // Runs the skew-safe bounded-heap path; the oracle is the window
    // restatement, so their equivalence is oracle-checked too.
    "sample_cap_source" -> ((s, d) => {
      Sampling.capPerGroupSkewSafe(t(s, d, "documents"), "source", "doc_id", 10)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")
    }),


    // Class-balanced downsampling (E23l): every lang capped at the
    // MINORITY class size (the classifier-training prep that stops a
    // 90/10 label skew from training a majority-voter) — the cap is a
    // 1-row contract-bounded collect, the cut runs the skew-safe
    // bounded-heap path by deterministic hash order.
    "sample_balanced_classes" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val minN = docs.groupBy("lang").agg(count(lit(1)).as("n"))
        .agg(min(col("n"))).collect()(0).getLong(0).toInt
      Sampling.capPerGroupSkewSafe(docs, "lang", "doc_id", minN)
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }),


    // Exact proportional stratified sample: ceil(10%) of EVERY source by
    // deterministic hash order — per-stratum counts exact, not binomial;
    // runs the skew-safe bounded-heap path, oracle restates the rank window.
    "sample_stratified" -> ((s, d) => {
      Sampling.stratifiedSample(t(s, d, "documents"), "source", "doc_id",
          frac = 0.1, salt = "strat")
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")
    }),


    // Per-source quality gate: keep each source's top 20% by a per-doc
    // score (n_chars as the stand-in — any quality column plugs in); the
    // relative-threshold filter CCNet applies per language bucket.
    "sample_top_quality" -> ((s, d) => {
      Sampling.topFractionPerGroupSkewSafe(t(s, d, "documents"),
          "source", "doc_id", col("n_chars"), frac = 0.2)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    }),


    // CCNet head/middle/tail: source-relative quality terciles by word
    // count (score desc, doc_id asc ties) — the bucketing run before
    // keep-head+middle sampling. Every doc labeled, oracle restates the
    // rank-window twin.
    "sample_quality_buckets" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Sampling.qualityBuckets(docs, "source", "doc_id",
          TextStats.nWords(col("text")).cast("long"))
        .select(col("doc_id"), col("source"),
          TextStats.nWords(col("text")).cast("long").as("score"),
          col("bucket"))
        .orderBy("doc_id")
    }),


    // Leakage-SAFE split: the split key is the near-duplicate cluster
    // representative (reachability over the same minhash pair graph as
    // dedup_clusters), so near-twins can never straddle train/test — the
    // eval-contamination hole a per-doc split leaves open. Docs in no
    // cluster are their own singleton rep; the full (doc_id, rep, split)
    // assignment is compared, and the oracle re-derives reachability with
    // the recursive CTE + the md5 threshold on the rep.
    "sample_split_leakage_safe" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val pairs = Dedup.nearDuplicates(docs, "doc_id", "text")
      Sampling.splitByCluster(docs, "doc_id",
          Dedup.duplicateClusters(pairs), 0.25, salt = "lkg")
        .select(col("doc_id"), col("rep"), col("split"))
        .orderBy("doc_id")
    }),


    // Fractional-epoch materialization (data-recipe upsampling): src0 rides
    // 2.5 epochs (every doc 2×, the hash-chosen half 3×), src1 exactly 2,
    // src2 thins to 0.75, everything else 1× — expected multiplicity
    // exactly the weight, the multiset a pure (key, salt) hash function.
    // Zero shuffle: a scan-level explode(sequence()). The full repeated
    // multiset (doc_id, source, copy_no) is compared row-for-row.
    "sample_epochs" -> ((s, d) => {
      Sampling.epochMaterialize(t(s, d, "documents"), "source", "doc_id",
          Map("src0" -> 2.5, "src1" -> 2.0, "src2" -> 0.75),
          defaultEpochs = 1.0, salt = "ep")
        .select(col("doc_id"), col("source"), col("copy_no"))
        .orderBy("doc_id", "copy_no")
    }),


    // Deterministic shard manifest: shard = floor(hash·16) as a pure key
    // function, then one shard-keyed aggregation to the trainer-facing
    // manifest — doc count, token volume, and an order-independent md5-sum
    // checksum per shard (one missing/duplicated/swapped doc changes it;
    // partition order and retries never do).
    "sample_shards" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .withColumn("n_tok", size(split(col("text"), " ")))
      Sampling.shardManifest(docs, "doc_id", "n_tok", nShards = 16,
          salt = "sh")
        .orderBy("shard_id")
    }),


    // Mixture weighting: per-source Bernoulli fractions (web-style
    // downsampling), a pure scan-level filter — the kept row set itself is
    // compared, not just counts. Unlisted sources keep the default 0.1.
    "sample_mixture" -> ((s, d) => {
      Sampling.sampleByGroupHash(t(s, d, "documents"), "source", "doc_id",
          Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25),
          defaultFraction = 0.1)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")
    }),


    // Temperature-flattened mixture (T5/mT5 rebalancing at α = ½): the
    // skewed lang distribution (en ≈ 3× fr) downsamples to √-flattened
    // shares — f_g = √(n_min/n_g), the dominant language cut hardest, the
    // smallest kept whole. Fractions derive from exact group counts via
    // correctly-rounded √ and one division, so the kept SET (not just
    // counts) is on the hash; the sample itself is a zero-shuffle scan
    // filter with the fractions as a CASE literal.
    "sample_temperature" -> ((s, d) => {
      Sampling.sampleByTemperature(t(s, d, "documents"), "lang", "doc_id")
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    }),


    // Token-budget cap per source: rows taken in hash-rank order while the
    // running token total stays within budget (the first crossing row is
    // kept, so no domain starves). The kept rows themselves are compared.
    "sample_token_budget" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .withColumn("n_tok", TextStats.nTokens(col("text")))
      Sampling.capPerGroupTokens(docs, "source", "doc_id", "n_tok", budget = 700)
        .select(col("doc_id"), col("source"), col("n_tok"))
        .orderBy("doc_id")
    }),


    // DSIR importance-weight table (target = src0, raw = all documents):
    // hashed-bigram bucket probabilities in fixed point, Laplace-smoothed
    // over the full 64-bucket support — every value an exact BIGINT, the
    // truncating `div` identical to DuckDB's `//`.
    "sample_dsir_weights" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dsir.importanceWeightsFixed(docs.where(col("source") === "src0"), docs,
          "text", nBuckets = 64)
        .orderBy("bucket")
    }),


    // Per-document DSIR importance scores against the src0 target: explode
    // bigrams → broadcast-join the 64-row weight table → one doc-keyed sum.
    // Docs with no bigrams surface with score 0 (left join, not dropped).
    "sample_dsir_scores" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val wt = Dsir.importanceWeightsFixed(
        docs.where(col("source") === "src0"), docs, "text", nBuckets = 64)
      Dsir.scoreDocuments(docs, "doc_id", "text", wt, nBuckets = 64)
        .orderBy("doc_id")
    }),


    // End-to-end DSIR selection: exact top 20% by (score desc, doc_id) —
    // the deterministic resampling draw, ranked by range-partitioned sort +
    // zipWithIndex (no single-partition window).
    "sample_dsir_resample" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dsir.resampleTopFraction(docs, "doc_id", "text",
          docs.where(col("source") === "src0"), frac = 0.2, nBuckets = 64)
        .select(col("doc_id"), col("source"))
        .orderBy("doc_id")
    }),


    // Benchmark decontamination: corpus docs sharing any word 4-gram with
    // the probe slice (doc_id % 20 == 0), with the shared-gram count.
    "decontaminate" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Decontaminate.contaminatedDocs(
          docs.where(col("doc_id") % 20 =!= 0), "doc_id", "text",
          docs.where(col("doc_id") % 20 === 0), "text", n = 4)
        .orderBy("doc_id")
    }),


    // Shuffle-join twin for beyond-broadcast probe sets — same contract,
    // same oracle restatement, gram-keyed exchange instead of a broadcast.
    "decontaminate_join" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Decontaminate.contaminatedDocsJoin(
          docs.where(col("doc_id") % 20 =!= 0), "doc_id", "text",
          docs.where(col("doc_id") % 20 === 0), "text", n = 4)
        .orderBy("doc_id")
    }),

    // SEMANTIC decontamination: corpus embeddings within cosine >= 0.35 of
    // any probe-slice embedding (vec_id % 20 == 0) — the paraphrase-robust
    // sibling of the verbatim n-gram test (a reworded benchmark question
    // shares no 4-gram but sits on top of it in embedding space). Probe
    // side broadcasts; the corpus is scanned once. Hit counts AND the
    // strongest probe cosine are on the hash.
    "decontaminate_semantic" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Decontaminate.contaminatedByEmbedding(
          e.where(col("vec_id") % 20 =!= 0), "vec_id", "embedding",
          e.where(col("vec_id") % 20 === 0), "embedding", threshold = 0.35)
        .orderBy("vec_id")
    }),


    // LENGTH-BUCKETED BATCHING (Sampling.lengthBucketBatches): docs
    // grouped into 16-token-wide length buckets, 8 sequences per batch in
    // deterministic id order, emitting the padding LEDGER per batch —
    // n/max/sum tokens and waste_ppm, the number that justifies dynamic
    // batching (in-batch spread ≤ bucketWidth caps waste). The oracle
    // recomputes buckets, batch ranks, and the waste arithmetic.
    "sample_length_batches" -> ((s, d) => {
      Sampling.lengthBucketBatches(
          t(s, d, "documents").select(col("doc_id"),
            size(split(col("text"), " ")).as("tok")),
          "doc_id", "tok", bucketWidth = 16, batchSize = 8)
        .orderBy("bucket", "batch_no")
    }),


    // PERCENTILE SCORE NORMALIZATION (Sampling.percentileNormalize):
    // per-source scores mapped to within-source percentile ranks the
    // histogram-CDF way — the corpus collapses to a ≤ sources·buckets CDF
    // frame that broadcasts back onto the scan (no per-row rank sort, the
    // shape that survives 100 TB). pct_ppm is an exact integer; the
    // oracle recomputes the CDF with window sums over the same buckets.
    "sample_score_normalize" -> ((s, d) => {
      Sampling.percentileNormalize(
          t(s, d, "documents").select(col("doc_id"), col("source"),
            col("n_chars")),
          "source", "n_chars", width = 50.0, nBuckets = 20)
        .select(col("doc_id"), col("source"), col("bucket"), col("pct_ppm"))
        .orderBy("doc_id")
    }),


    // LEARNED data-mixing weights (Sampling.mixtureWeightsMW): linearized
    // multiplicative-weights reweighting of the three sources by excess
    // mean document length — the DoReMi loop shape with every update an
    // exact integer, so three unrolled rounds restate verbatim in the
    // oracle. The heavy pass is ONE corpus aggregation; the rounds
    // iterate a |domains|-sized state (driver math at the k-means-
    // centroids altitude). A wrong average, a mis-signed excess, or a
    // divergent division all hash-fail.
    "sample_mixture_mw" -> ((s, d) => {
      Sampling.mixtureWeightsMW(t(s, d, "documents"), "source",
          col("n_chars"), rounds = 3, etaDen = 4L)
        .orderBy("source")
    }),


    // In-context-pretraining ordering (Shi et al. ICLR'24): per hash
    // shard, a greedy nearest-neighbor chain over the embeddings — the
    // similarity-aware layout that makes packed context windows coherent.
    // Start = smallest id; hop = highest cosine to the CURRENT doc, ties
    // to the smaller id. The oracle replays every hop as an unrolled step
    // CTE (the generated-CTE convention of the beam-search rows): a wrong
    // start, a drifted tie-break, or a single mis-ranked hop reorders the
    // chain and hash-fails.
    "sample_icp_order" -> ((s, d) => {
      val e = t(s, d, "embeddings").where(col("vec_id") < 200)
        .withColumn("shard", col("vec_id") % 8)
      Sampling.icpOrder(e, "vec_id", "embedding", "shard")
        .orderBy("shard", "seq_pos")
    }),


    // The mask-building companion of the packed windows: per-document
    // boundary offsets inside each 512-token window of the
    // similarity-ordered layout — loss masks and cross-document attention
    // barriers are built from exactly these. A doc spilling past the
    // window boundary honestly reports end_tok > 512.
    "sample_icp_pack_offsets" -> ((s, d) => {
      val e = t(s, d, "embeddings").where(col("vec_id") < 200)
        .withColumn("shard", col("vec_id") % 8)
      val ordered = Sampling.icpOrder(e, "vec_id", "embedding", "shard")
      val docs = t(s, d, "documents").select(col("doc_id").as("vec_id"),
        TextStats.nTokens(col("text")).as("tok"))
      Sampling.packOffsetsOrdered(ordered.join(docs, "vec_id"),
          "shard", "vec_id", "seq_pos", "tok", seqTokens = 512)
        .orderBy("shard", "seq_no", "pos_in_seq")
    }),


    // The COMPOSED recipe: similarity-ordered packing — the chain's
    // seq_pos drives the pack order, so every 512-token training window
    // holds a contiguous run of related documents (hash-order packing
    // would re-scatter exactly the adjacency the chain built). One oracle
    // restates the whole program: every greedy hop, the doc join, the
    // running-total window assignment, and the materialized window text.
    "sample_icp_pack" -> ((s, d) => {
      val e = t(s, d, "embeddings").where(col("vec_id") < 200)
        .withColumn("shard", col("vec_id") % 8)
      val ordered = Sampling.icpOrder(e, "vec_id", "embedding", "shard")
      val docs = t(s, d, "documents").select(col("doc_id").as("vec_id"),
        TextStats.nTokens(col("text")).as("n_tok"), col("text"))
      Sampling.packSequencesOrderedText(ordered.join(docs, "vec_id"),
          "shard", "vec_id", "seq_pos", "n_tok", "text", seqTokens = 512)
        .orderBy("shard", "seq_no")
    }),
  )

  // One greedy hop of the sample_icp_order chain: among the current
  // shard-frontier's unvisited neighbors, take the highest-cosine (ties →
  // smaller id). A shard whose ids are exhausted simply emits no row and
  // leaves the chain. 24 unrolled steps cover the gate's 25-per-shard
  // maximum (vec_id < 200, 8 shards); smaller SFs drain earlier.
  private def icpChainCtes(steps: Int): String = {
    val hops = (1 to steps).map { i =>
      s"""c$i AS (SELECT shard, $i::INT AS pos, b_id AS cur,
         |  list_append(visited, b_id) AS visited FROM (
         |  SELECT c.shard, c.visited, s.b_id, row_number() OVER (
         |    PARTITION BY c.shard ORDER BY s.sim DESC, s.b_id) AS rn
         |  FROM c${i - 1} c JOIN sim s ON s.shard = c.shard
         |    AND s.a_id = c.cur AND NOT list_contains(c.visited, s.b_id))
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val union = (0 to steps).map(i => s"SELECT shard, pos, cur FROM c$i")
      .mkString(" UNION ALL ")
    s"$hops,\nchain AS ($union)"
  }

  // shared prefix of the two icp oracles: the shard split, the pairwise
  // cosine table, the chain start, and all 24 generated greedy hops
  private def icpProgram: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
       |  FROM embeddings WHERE vec_id < 200),
       |n AS (SELECT vec_id % 8 AS shard, vec_id, v,
       |  sqrt(${Sql.dot("v", "v")}) AS nm FROM e),
       |sim AS (SELECT a.shard, a.vec_id AS a_id, b.vec_id AS b_id,
       |  CASE WHEN a.nm * b.nm = 0 THEN -2.0
       |    ELSE ${Sql.dot("a.v", "b.v")} / (a.nm * b.nm) END AS sim
       |  FROM n a JOIN n b ON a.shard = b.shard AND a.vec_id <> b.vec_id),
       |c0 AS (SELECT shard, 0::INT AS pos, min(vec_id) AS cur,
       |  [min(vec_id)] AS visited FROM n GROUP BY shard),
       |${icpChainCtes(24)}""".stripMargin

  val oracle: Map[String, String] = Map(

    "sample_icp_order" ->
      s"""$icpProgram
         |SELECT shard, pos AS seq_pos, cur AS vec_id FROM chain
         |ORDER BY shard, seq_pos""".stripMargin,

    // mirrors Sampling.packOffsetsOrdered over the chain: the same
    // running-total window assignment, offsets relative to the window
    // start, rank within the window — all exact integers
    "sample_icp_pack_offsets" ->
      s"""$icpProgram,
         |j AS (SELECT ch.shard, ch.pos, ch.cur AS vec_id,
         |    len(string_split(doc.text, ' '))::BIGINT AS n_tok
         |  FROM chain ch JOIN documents doc ON doc.doc_id = ch.cur),
         |x AS (SELECT shard, pos, vec_id, n_tok,
         |    sum(n_tok) OVER (PARTITION BY shard
         |      ORDER BY pos ASC, vec_id ASC
         |      ROWS UNBOUNDED PRECEDING) AS cum FROM j),
         |p AS (SELECT shard, ((cum - n_tok) // 512)::BIGINT AS seq_no,
         |    pos, vec_id, n_tok, cum FROM x)
         |SELECT shard, seq_no,
         |  row_number() OVER (PARTITION BY shard, seq_no
         |    ORDER BY pos ASC, vec_id ASC)::INT AS pos_in_seq,
         |  vec_id, n_tok,
         |  (cum - n_tok - seq_no * 512)::BIGINT AS start_tok,
         |  (cum - seq_no * 512)::BIGINT AS end_tok
         |FROM p ORDER BY shard, seq_no, pos_in_seq""".stripMargin,

    // mirrors Sampling.packSequencesOrderedText over the chain: running
    // token total in (pos, id) order, window = (cum − n_tok) // 512,
    // window text aggregated in the same order
    "sample_icp_pack" ->
      s"""$icpProgram,
         |j AS (SELECT ch.shard, ch.pos, ch.cur AS vec_id, doc.text,
         |    len(string_split(doc.text, ' '))::INT AS n_tok
         |  FROM chain ch JOIN documents doc ON doc.doc_id = ch.cur),
         |x AS (SELECT shard, pos, vec_id, text, n_tok,
         |    sum(n_tok) OVER (PARTITION BY shard
         |      ORDER BY pos ASC, vec_id ASC
         |      ROWS UNBOUNDED PRECEDING) AS cum FROM j),
         |p AS (SELECT shard, ((cum - n_tok) // 512)::BIGINT AS seq_no,
         |    pos, vec_id, text, n_tok FROM x)
         |SELECT shard, seq_no,
         |  string_agg(text, ' ' ORDER BY pos ASC, vec_id ASC) AS seq_text,
         |  count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS n_tokens
         |FROM p GROUP BY shard, seq_no ORDER BY shard, seq_no""".stripMargin,

    // same hash/priority as sample_weighted, ranked per source
    "sample_weighted_by_source" ->
      """WITH w AS (SELECT source, doc_id,
        |    len(string_split(text, ' '))::INT AS w FROM documents),
        |p AS (SELECT source, doc_id, w,
        |    ((('0x' || substr(md5(doc_id::VARCHAR || 'wps'), 1, 8))::BIGINT)::DOUBLE
        |      / 4294967296.0) / w AS priority
        |  FROM w WHERE w >= 1)
        |SELECT source, rank, doc_id, priority FROM (
        |  SELECT source, doc_id, priority,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY priority, doc_id)::INT AS rank FROM p)
        |WHERE rank <= 8 ORDER BY source, rank""".stripMargin,


    // mirrors weightedPrioritySample: 32-bit md5 unit hash (exact in a
    // double), ONE correctly-rounded division by the token weight, bottom
    // 60 by (priority, doc_id) — priorities compared on the hash
    "sample_weighted" ->
      """WITH w AS (SELECT doc_id,
        |    len(string_split(text, ' '))::INT AS w FROM documents),
        |h AS (SELECT doc_id, w,
        |    ('0x' || substr(md5(doc_id::VARCHAR || 'wps'), 1, 8))::BIGINT AS hv
        |  FROM w WHERE w >= 1),
        |p AS (SELECT doc_id, w,
        |    (hv::DOUBLE / 4294967296.0) / w AS priority FROM h)
        |SELECT doc_id, w, priority, rank FROM (
        |  SELECT doc_id, w, priority,
        |    row_number() OVER (ORDER BY priority, doc_id)::INT AS rank FROM p)
        |WHERE rank <= 60 ORDER BY rank""".stripMargin,


    // mirrors Decontaminate.contaminatedByEmbedding: all probe×corpus
    // cosines (the dedup_semantic-proven float restatement), >= 0.35 hits
    // counted per corpus vector with the max cosine
    "decontaminate_semantic" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |c AS (SELECT vec_id, v FROM e WHERE vec_id % 20 <> 0),
         |p AS (SELECT v AS pv FROM e WHERE vec_id % 20 = 0),
         |sc AS (SELECT c.vec_id,
         |    ${Sql.dot("c.v", "p.pv")} /
         |      (sqrt(${Sql.dot("c.v", "c.v")}) * sqrt(${Sql.dot("p.pv", "p.pv")})) AS cos
         |  FROM c CROSS JOIN p)
         |SELECT vec_id, count(*)::BIGINT AS n_hits, max(cos) AS max_cos
         |FROM sc WHERE cos >= 0.35
         |GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "sample_hash" ->
      s"""SELECT lang, count(*)::BIGINT AS n, min(doc_id)::BIGINT AS min_id,
         |  max(doc_id)::BIGINT AS max_id
         |FROM documents
         |WHERE ${Sql.unitHash("doc_id::VARCHAR")} < 0.2
         |GROUP BY lang ORDER BY lang""".stripMargin,

    "sample_split" ->
      s"""SELECT CASE WHEN ${Sql.unitHash("doc_id::VARCHAR", "v1")} < 0.25
         |    THEN 'test' ELSE 'train' END AS split,
         |  lang, count(*)::BIGINT AS n
         |FROM documents GROUP BY 1, 2 ORDER BY split, lang""".stripMargin,

    // fold = floor(unit-hash * k): one correctly-rounded multiply on an
    // exact double, so every assignment restates
    "sample_folds" ->
      s"""SELECT floor(${Sql.unitHash("doc_id::VARCHAR", "cv1")} * 5)::INT AS fold,
         |  lang, count(*)::BIGINT AS n,
         |  min(doc_id)::BIGINT AS min_id, max(doc_id)::BIGINT AS max_id
         |FROM documents GROUP BY 1, 2 ORDER BY fold, lang""".stripMargin,


    // same reachability CTE as dedup_clusters (identical pair graph), then
    // the split decision restated on the md5 of the effective cluster rep —
    // docs in no cluster fall back to their own id via the LEFT JOIN
    "sample_split_leakage_safe" ->
      s"""WITH RECURSIVE
         |w AS (SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents),
         |sh AS (SELECT doc_id, ${Sql.wordShingles3} AS s FROM w),
         |sh2 AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
         |sig AS (SELECT doc_id, ${Sql.minhashSigs} AS sigs FROM sh2),
         |bands AS (SELECT doc_id, unnest(range(1, 5)) AS band,
         |  unnest(${Sql.minhashBands}) AS v FROM sig),
         |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.v = b.v
         |  AND a.doc_id < b.doc_id),
         |pairs AS (SELECT a_id, b_id FROM (
         |  SELECT a_id, b_id,
         |    len(list_intersect(x.s, y.s))::DOUBLE / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
         |  FROM cand JOIN sh2 x ON x.doc_id = cand.a_id JOIN sh2 y ON y.doc_id = cand.b_id)
         |  WHERE jaccard >= 0.5),
         |edges AS (SELECT a_id AS s, b_id AS t FROM pairs
         |  UNION SELECT b_id, a_id FROM pairs),
         |reach(s, t) AS (SELECT s, t FROM edges
         |  UNION SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s),
         |cc AS (SELECT s AS doc_id, least(s, min(t))::BIGINT AS rep
         |  FROM reach GROUP BY s)
         |SELECT d.doc_id, coalesce(cc.rep, d.doc_id)::BIGINT AS rep,
         |  CASE WHEN ${Sql.unitHash("coalesce(cc.rep, d.doc_id)::VARCHAR", "lkg")} < 0.25
         |    THEN 'test' ELSE 'train' END AS split
         |FROM documents d LEFT JOIN cc ON cc.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,


    // floor(e) guaranteed copies + one hash-fraction extra; the WHERE drops
    // hash-missed rows of sub-1.0 groups (generate_series(1,0) is empty
    // anyway — the guard documents the thinning path)
    "sample_epochs" ->
      s"""WITH e AS (SELECT doc_id, source,
         |    CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 2.0
         |         WHEN 'src2' THEN 0.75 ELSE 1.0 END AS ep
         |  FROM documents),
         |n AS (SELECT doc_id, source,
         |    (floor(ep) + CASE WHEN ${Sql.unitHash("doc_id::VARCHAR", "ep")} < ep - floor(ep)
         |       THEN 1 ELSE 0 END)::INT AS nc
         |  FROM e)
         |SELECT doc_id, source, unnest(generate_series(1, nc))::INT AS copy_no
         |FROM n WHERE nc >= 1 ORDER BY doc_id, copy_no""".stripMargin,


    // floor(hash·16) shard + the commutative md5-prefix-sum checksum
    "sample_shards" ->
      s"""SELECT floor(${Sql.unitHash("doc_id::VARCHAR", "sh")} * 16)::INT AS shard_id,
         |  count(*)::BIGINT AS n_docs,
         |  sum(len(string_split(text, ' ')))::BIGINT AS n_tokens,
         |  sum(('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT)::BIGINT AS checksum
         |FROM documents GROUP BY 1 ORDER BY shard_id""".stripMargin,

    "sample_cap_source" ->
      s"""SELECT doc_id, source FROM documents
         |QUALIFY row_number() OVER (PARTITION BY source
         |  ORDER BY ${Sql.unitHash("doc_id::VARCHAR")} ASC, doc_id ASC) <= 10
         |ORDER BY doc_id""".stripMargin,


    // mirrors sample_balanced_classes: the same hash-order rank window,
    // cap = the scalar minority-class size
    "sample_balanced_classes" ->
      s"""WITH m AS (SELECT min(n) AS min_n FROM (
         |  SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY lang))
         |SELECT doc_id, lang FROM documents, m
         |QUALIFY row_number() OVER (PARTITION BY lang
         |  ORDER BY ${Sql.unitHash("doc_id::VARCHAR")} ASC, doc_id ASC) <= m.min_n
         |ORDER BY doc_id""".stripMargin,

    "sample_shuffle" ->
      """SELECT doc_id, md5(doc_id::VARCHAR || ':shuffle:ep1') AS shuffle_key
        |FROM documents ORDER BY shuffle_key, doc_id""".stripMargin,

    "sample_stratified" ->
      s"""SELECT doc_id, source FROM documents
         |QUALIFY row_number() OVER (PARTITION BY source
         |    ORDER BY ${Sql.unitHash("doc_id::VARCHAR", "strat")} ASC, doc_id ASC)
         |  <= ceil(count(*) OVER (PARTITION BY source) * 0.1)
         |ORDER BY doc_id""".stripMargin,

    "sample_top_quality" ->
      """SELECT doc_id, source, n_chars FROM documents
        |QUALIFY row_number() OVER (PARTITION BY source
        |    ORDER BY n_chars DESC, doc_id ASC)
        |  <= ceil(count(*) OVER (PARTITION BY source) * 0.2)
        |ORDER BY doc_id""".stripMargin,


    // fraction literals written n * (1.0/3.0) to match Spark's
    // ceil(count * lit(1.0/3)) bit-for-bit (n / 3.0 is a DIFFERENT double)
    "sample_quality_buckets" ->
      """WITH scored AS (SELECT doc_id, source,
        |    len(regexp_extract_all(lower(text), '[a-z]+'))::BIGINT AS score
        |  FROM documents),
        |r AS (SELECT doc_id, source, score,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY score DESC, doc_id) AS rk,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM scored)
        |SELECT doc_id, source, score,
        |  CASE WHEN rk <= ceil(n * (1.0/3.0)) THEN 'head'
        |       WHEN rk <= ceil(n * (2.0/3.0)) THEN 'middle'
        |       ELSE 'tail' END AS bucket
        |FROM r ORDER BY doc_id""".stripMargin,

    "sample_mixture" ->
      s"""SELECT doc_id, source FROM documents
         |WHERE ${Sql.unitHash("doc_id::VARCHAR")} <
         |  (CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
         |        WHEN 'src2' THEN 0.25 ELSE 0.1 END)
         |ORDER BY doc_id""".stripMargin,


    // per-group √-flattened Bernoulli fractions from exact counts — the
    // same two correctly-rounded sqrts + one division as the Scala side
    "sample_temperature" ->
      s"""WITH c AS (SELECT lang, count(*)::BIGINT AS n
         |  FROM documents GROUP BY 1),
         |mn AS (SELECT min(n)::BIGINT AS n_min FROM c)
         |SELECT d.doc_id, d.lang FROM documents d
         |JOIN c ON c.lang = d.lang CROSS JOIN mn
         |WHERE ${Sql.unitHash("d.doc_id::VARCHAR")} <
         |  sqrt(mn.n_min::DOUBLE) / sqrt(c.n::DOUBLE)
         |ORDER BY doc_id""".stripMargin,


    // running token total in hash-rank order; ROWS frame explicit so the
    // cumulative matches Spark's rowsBetween even on (impossible) ties
    "sample_token_budget" ->
      s"""WITH d AS (SELECT doc_id, source,
         |    len(string_split(text, ' '))::INT AS n_tok FROM documents)
         |SELECT doc_id, source, n_tok FROM (
         |  SELECT doc_id, source, n_tok,
         |    sum(n_tok) OVER (PARTITION BY source
         |      ORDER BY ${Sql.unitHash("doc_id::VARCHAR")} ASC, doc_id ASC
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM d)
         |WHERE cum - n_tok < 700
         |ORDER BY doc_id""".stripMargin,

    "sample_dsir_weights" ->
      s"""WITH ${Sql.dsirWeights(64)}
         |SELECT bucket, pf, qf, (pf - qf)::BIGINT AS w
         |FROM wt ORDER BY bucket""".stripMargin,

    "sample_dsir_scores" ->
      s"""WITH ${Sql.dsirScores(64)}
         |SELECT doc_id, score_fixed, n_grams
         |FROM dsir_scores ORDER BY doc_id""".stripMargin,


    // exact top-20% draw: rank over (score desc, doc_id asc), keep
    // rk <= ceil(0.2 · n) — the window restatement of the sort+zipWithIndex
    // selection
    "sample_dsir_resample" ->
      s"""WITH ${Sql.dsirScores(64)},
         |sel AS (SELECT doc_id FROM (
         |    SELECT doc_id,
         |      row_number() OVER (ORDER BY score_fixed DESC, doc_id) AS rk,
         |      count(*) OVER () AS nn
         |    FROM dsir_scores)
         |  WHERE rk <= ceil(0.2 * nn))
         |SELECT d.doc_id, d.source FROM documents d
         |JOIN sel USING (doc_id) ORDER BY doc_id""".stripMargin,

    "decontaminate" ->
      s"""WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS words
         |  FROM documents),
         |sh AS (SELECT doc_id, ${Sql.wordShinglesN(4)} AS s FROM w),
         |pg AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 20 = 0),
         |dg AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 20 <> 0)
         |SELECT doc_id, count(*)::BIGINT AS n_shared
         |FROM dg JOIN pg USING (g)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,


    // identical restatement — the Spark twins differ only in join strategy
    "decontaminate_join" ->
      s"""WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS words
         |  FROM documents),
         |sh AS (SELECT doc_id, ${Sql.wordShinglesN(4)} AS s FROM w),
         |pg AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 20 = 0),
         |dg AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 20 <> 0)
         |SELECT doc_id, count(*)::BIGINT AS n_shared
         |FROM dg JOIN pg USING (g)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,


    // buckets, in-bucket batch ranks, and the waste ledger restated
    "sample_length_batches" ->
      """WITH t AS (SELECT doc_id,
        |    len(string_split(text, ' '))::BIGINT AS tok FROM documents),
        |b AS (SELECT doc_id, tok, tok // 16 AS bucket FROM t),
        |r AS (SELECT bucket, tok,
        |    ((row_number() OVER (PARTITION BY bucket ORDER BY doc_id) - 1)
        |      // 8)::INT AS batch_no
        |  FROM b)
        |SELECT bucket, batch_no, count(*)::BIGINT AS n_seqs,
        |  max(tok)::BIGINT AS max_tokens, sum(tok)::BIGINT AS sum_tokens,
        |  (((count(*) * max(tok) - sum(tok)) * 1000000)
        |    // (count(*) * max(tok)))::BIGINT AS waste_ppm
        |FROM r GROUP BY 1, 2 ORDER BY bucket, batch_no""".stripMargin,


    // within-source histogram CDF; ::BIGINT because DuckDB's window sum
    // is HUGEINT (the decimal-hash rule)
    "sample_score_normalize" ->
      """WITH b AS (SELECT doc_id, source,
        |    least(floor(n_chars / 50.0), 19)::INT AS bucket
        |  FROM documents),
        |c AS (SELECT source, bucket, count(*) AS c FROM b GROUP BY 1, 2),
        |cum AS (SELECT source, bucket,
        |    sum(c) OVER (PARTITION BY source ORDER BY bucket) AS cum_le,
        |    sum(c) OVER (PARTITION BY source) AS n
        |  FROM c)
        |SELECT b.doc_id, b.source, b.bucket,
        |  ((cum.cum_le * 1000000) // cum.n)::BIGINT AS pct_ppm
        |FROM b JOIN cum USING (source, bucket)
        |ORDER BY doc_id""".stripMargin,


    // three unrolled MW rounds; all-positive integers ⇒ truncating and
    // floor division agree on both engines. Every derived column is cast
    // ::BIGINT because sum(BIGINT) is HUGEINT in DuckDB and the type leaks
    // through // into w/A/share_ppm while Spark emits int64 (the
    // dtype-sensitive driver hash caught exactly this in round 11).
    "sample_mixture_mw" ->
      """WITH b AS (SELECT source,
        |    (sum(n_chars)::BIGINT * 1048576) // count(*) AS lq
        |  FROM documents GROUP BY 1),
        |r0 AS (SELECT source, lq, 1048576::BIGINT AS w FROM b),
        |r1 AS (SELECT source, lq,
        |    greatest(1, (w * (4*A + (lq - A))) // (4*A))::BIGINT AS w
        |  FROM (SELECT source, lq, w,
        |    ((SELECT sum(w*lq) FROM r0) // (SELECT sum(w) FROM r0))::BIGINT AS A
        |    FROM r0)),
        |r2 AS (SELECT source, lq,
        |    greatest(1, (w * (4*A + (lq - A))) // (4*A))::BIGINT AS w
        |  FROM (SELECT source, lq, w,
        |    ((SELECT sum(w*lq) FROM r1) // (SELECT sum(w) FROM r1))::BIGINT AS A
        |    FROM r1)),
        |r3 AS (SELECT source, lq,
        |    greatest(1, (w * (4*A + (lq - A))) // (4*A))::BIGINT AS w
        |  FROM (SELECT source, lq, w,
        |    ((SELECT sum(w*lq) FROM r2) // (SELECT sum(w) FROM r2))::BIGINT AS A
        |    FROM r2))
        |SELECT source, lq, w,
        |  ((w * 1000000) // (SELECT sum(w) FROM r3))::BIGINT AS share_ppm
        |FROM r3 ORDER BY source""".stripMargin,
  )
}
