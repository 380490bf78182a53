package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination (SURVEY §2.8): flag corpus documents that share
  * at least one word n-gram with a probe set (an eval benchmark's
  * questions/answers) so they can be held out of training data. The
  * standard n-gram-overlap contract (as used for public LLM training sets):
  * a document is contaminated iff any length-`n` word window also occurs
  * anywhere in the probe set.
  *
  * Scale shape: probes are a benchmark suite — thousands of rows against a
  * 100 TB corpus — so the distinct probe n-grams are BROADCAST and the
  * probe join costs no shuffle at all; the only exchange is the per-doc
  * aggregation of hits, keyed on the doc id. Shingles are compared by
  * exact string (no hashing), so a hit is never a collision.
  */
object Decontaminate {

  /** Contaminated docs only: (idCol, n_shared) where n_shared counts the
    * DISTINCT probe n-grams the document contains (>= 1 by construction).
    * Inner-join-then-aggregate, so clean documents never leave the scan. */
  def contaminatedDocs(docs: DataFrame, idCol: String, textCol: String,
                       probes: DataFrame, probeTextCol: String,
                       n: Int = 8,
                       tok: Tokenizer = Tokenizer.Whitespace): DataFrame = {
    val probeGrams = probes
      .select(explode(Dedup.wordShingles(col(probeTextCol), n, tok)).as("g"))
      .distinct()
    docs
      .select(col(idCol),
        explode(Dedup.wordShingles(col(textCol), n, tok)).as("g"))
      .join(broadcast(probeGrams), "g")
      // wordShingles already de-dups within a document ⇒ plain count is the
      // distinct-gram count, no countDistinct shuffle amplification
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_shared"))
  }

  /** Shuffle-join twin of [[contaminatedDocs]] for probe sets too large to
    * broadcast (a full eval-suite collection, or decontaminating one corpus
    * against another): same result, but the gram join is a hash-partitioned
    * sort-merge/shuffled-hash join keyed on the gram — the corpus pays one
    * corpus-n-grams-sized exchange, which is the honest price of a
    * beyond-broadcast probe side. Prefer [[contaminatedDocs]] whenever the
    * distinct probe grams fit an executor (the common case). */
  def contaminatedDocsJoin(docs: DataFrame, idCol: String, textCol: String,
                           probes: DataFrame, probeTextCol: String,
                           n: Int = 8,
                           tok: Tokenizer = Tokenizer.Whitespace): DataFrame = {
    val probeGrams = probes
      .select(explode(Dedup.wordShingles(col(probeTextCol), n, tok)).as("g"))
      .distinct()
    docs
      .select(col(idCol),
        explode(Dedup.wordShingles(col(textCol), n, tok)).as("g"))
      // hash-build the (per-partition) probe grams, never a broadcast —
      // that is the other twin
      .join(probeGrams.hint("shuffle_hash"), "g")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_shared"))
  }

  /** SEMANTIC decontamination — the embedding-space sibling of the n-gram
    * overlap test: flag corpus items whose embedding is within cosine ≥
    * `threshold` of ANY probe (eval-set) embedding. Catches the paraphrased
    * contamination the verbatim n-gram test cannot (a reworded benchmark
    * question shares no 8-gram but sits on top of it in embedding space);
    * run BOTH — they fail independently.
    *
    * Returns (idCol, n_hits, max_cos) per flagged item: the hit count and
    * the strongest probe cosine (bit-portable per the repo's float rule:
    * exact float→double casts, strict left-fold dot, correctly-rounded
    * sqrt/÷ — the dedup_semantic-proven restatement).
    *
    * Scale shape: probes are an eval suite — thousands against a corpus of
    * billions — so they BROADCAST and the scan-wide nested-loop product is
    * the design (the brute-force-ANN class: one corpus pass, no shuffle);
    * the per-id aggregation is the only exchange. For probe sets beyond
    * broadcast, pre-bucket both sides with the LSH family instead. */
  def contaminatedByEmbedding(corpus: DataFrame, idCol: String,
                              vecCol: String, probes: DataFrame,
                              probeVecCol: String,
                              threshold: Double): DataFrame = {
    val c = corpus.select(col(idCol),
      Similarity.asDouble(col(vecCol)).as("_v"))
    val p = probes.select(Similarity.asDouble(col(probeVecCol)).as("_pv"))
    c.crossJoin(broadcast(p))
      .select(col(idCol), Similarity.cosine(col("_v"), col("_pv")).as("_cos"))
      .where(col("_cos") >= threshold)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"), max(col("_cos")).as("max_cos"))
  }

  /** The corpus with contaminated docs removed — the op a pipeline actually
    * runs before training. Left-anti on the flagged ids. */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
                    probes: DataFrame, probeTextCol: String,
                    n: Int = 8,
                    tok: Tokenizer = Tokenizer.Whitespace): DataFrame =
    docs.join(contaminatedDocs(docs, idCol, textCol, probes, probeTextCol, n,
      tok).select(col(idCol)), Seq(idCol), "left_anti")

  /** SPAN-level decontamination: mask every probe-n-gram occurrence inside
    * the text instead of dropping the document — the curation move when
    * documents are valuable but contaminated passages must not be trained
    * on verbatim. Replacements fold in a DETERMINISTIC, engine-portable
    * order (ascending md5 of the gram — code-point/collation orderings
    * differ between engines on non-ASCII text, hex digests never do), each
    * gram replacing ALL its literal occurrences in turn; overlapping grams
    * therefore mask in md5 order, a fixed documented contract rather than
    * an engine accident.
    *
    * Scale shape: the gram list is driver-collected and shipped as the
    * DATA of one native [[graft.ext.expressions.ScrubGramsExpr]] (a folded
    * replace chain would nest one plan node per gram — at thousands of
    * grams that single deep tree breaks codegen method limits and the
    * optimizer's recursive transforms; here plan size and generated code
    * are constant at any gram count). Probes are benchmark-sized by this
    * family's contract (the same broadcast-small bound as
    * [[contaminatedDocs]]), and `maxGrams` guards the driver collect (a
    * documented failure beats a silent driver OOM). The scrub itself is a
    * pure per-row projection: zero shuffle, the corpus scan IS the cost at
    * any scale.
    *
    * Shingling lower-cases ([[Dedup.words]]), so pass a lower-cased
    * `textCol` for the masks to land (the catalog row does). */
  def scrubSpans(docs: DataFrame, textCol: String,
                 probes: DataFrame, probeTextCol: String,
                 n: Int = 8, mask: String = "[_]",
                 maxGrams: Int = 10000): DataFrame = {
    // the collect is LIMITed to maxGrams + 1 BEFORE it reaches the driver:
    // guarding after an unbounded collect would let a huge probe set OOM
    // the driver before the require ever fires
    val grams = probes
      .select(explode(Dedup.wordShingles(col(probeTextCol), n)).as("g"))
      .distinct()
      .select(col("g"), md5(col("g")).as("h"))
      .limit(maxGrams + 1)
      .collect()
      .sortBy(_.getString(1))
      .map(_.getString(0))
    require(grams.length <= maxGrams,
      s"scrubSpans: probe grams exceed maxGrams=$maxGrams — " +
        "thin the probe set or raise the bound deliberately")
    import org.apache.spark.sql.graftbridge.GraftColumnBridge
    val scrubbed = GraftColumnBridge.column(
      graft.ext.expressions.ScrubGramsExpr(
        GraftColumnBridge.expression(col(textCol)),
        grams.toIndexedSeq, mask))
    docs.withColumn(textCol, scrubbed)
  }
}
