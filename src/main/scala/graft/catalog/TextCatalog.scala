package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{AsofJoin, BloomJoin, Curation, Decontaminate, Dedup, Dsir, Extract, Funnel, Graph, Layout, Multimodal, RangeJoin, Resample, Sampling, Similarity, SkewJoin, Sketches, TextStats, Tokenizer, Urls}
import graft.streaming.EventTimeOps

/** Text-analysis family (E9): quality, tokens, BPE train/encode, LM scoring ladder, classifiers, lang-id, scrubbing, BM25/RAG.
  *
  * One catalog family of [[ExtQueries]] (split from the former monolith,
  * zero behavior change): `queries` are the Spark definitions, `oracle`
  * the DuckDB restatements the driver gates them against. Portability
  * rules are documented on [[ExtQueries]]; shared fixtures/helpers live
  * in [[CatalogShared]]. */
object TextCatalog {
  import CatalogShared._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Vocabulary-profile language/domain ID.
    "text_langid" -> ((s, d) => {
      val toks = TextStats.tokens(col("text"))
      t(s, d, "documents").select(
        col("doc_id"),
        TextStats.markerHits(toks, langClasses(0)._2).as("s_tabular"),
        TextStats.markerHits(toks, langClasses(1)._2).as("s_streaming"),
        TextStats.markerHits(toks, langClasses(2)._2).as("s_relational"),
        TextStats.classify(toks, langClasses).as("pred"))
        .orderBy("doc_id")
    }),


    // TRAINED multi-class language ID — the flagship lang-id path: a
    // one-vs-all AVERAGED perceptron (3 classes) over E9g's hashed
    // unigram+bigram feature space, fit on EVEN doc_ids, argmax inference
    // on the held-out ODD half. The corpus carries a planted noisy
    // 3-class signal (class marker token, flipped to the NEXT class on a
    // keyed-hashed 15% of docs), so held-out accuracy ≈ the planted
    // ceiling — a real multi-class learning demonstration, replacing the
    // fixed marker-vocabulary argmax (text_langid) as flagship. The
    // oracle unrolls all three per-class epoch chains plus the averaged
    // snapshots and the first-wins argmax; per-doc scores for every
    // class, the prediction, and the correctness flag are all on the hash.
    "text_langid_trained" -> ((s, d) => {
      val cls = col("doc_id") % 3
      val flip = (col("doc_id") * 1103515245L + 12345L) % 100L < 15L
      val mcls = when(flip, (cls + 1) % 3).otherwise(cls)
      val marker = element_at(
        array(lit("lza"), lit("lzb"), lit("lzc")), mcls.cast("int") + 1)
      val all = t(s, d, "documents").select(col("doc_id"),
        concat(col("text"), repeat(concat(lit(" "), marker), 8)).as("text"),
        cls.as("c"))
      val ws = TextStats.perceptronTrainOvA(all.where(col("doc_id") % 2 === 0),
        "text", "c", nClasses = 3, dim = 128, epochs = 4, averaged = true)
      all.where(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("c"),
          TextStats.trainedScoreCol(col("text"), ws(0)).as("s0"),
          TextStats.trainedScoreCol(col("text"), ws(1)).as("s1"),
          TextStats.trainedScoreCol(col("text"), ws(2)).as("s2"))
        .withColumn("pred",
          TextStats.argmaxFirst(Seq(col("s0"), col("s1"), col("s2"))))
        .select(col("doc_id"), col("s0"), col("s1"), col("s2"), col("pred"),
          (col("pred") === col("c")).cast("int").as("correct"))
        .orderBy("doc_id")
    }),


    // Quality scoring: token counts, mean token length, stopword ratio.
    // fastText-shaped quality-classifier inference: hashed unigram+bigram
    // features, a deterministic keyed-hash linear weight per bucket (the
    // seam a trained weight vector drops into), exact integer score — one
    // zero-shuffle native one-pass kernel per doc (HashedLinearScoreExpr;
    // bit-equal Column-chain twin spec-pinned). The oracle restates the
    // feature hashing, the weight formula, and the sum verbatim.
    "text_quality_classifier" -> ((s, d) => {
      TextStats.hashedLinearScore(t(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),


    // CALIBRATION curve of the hashed-linear classifier against the
    // rule-based quality gate (the curation predicate): per clamped score
    // bucket, what fraction of documents pass the gate? The reliability
    // diagram a model-based gate needs before its threshold is trusted —
    // eval breadth next to the held-out-accuracy row. floor(x/2000.0) on
    // BOTH engines (same IEEE op ⇒ same bits; integer `div` would
    // truncate-vs-floor-diverge on negative scores).
    "text_classifier_calibration" -> ((s, d) => {
      val scored = TextStats.hashedLinearScore(t(s, d, "documents"),
        "doc_id", "text")
      val gated = t(s, d, "documents").select(col("doc_id"),
        (TextStats.nTokens(col("text")) >= 30 &&
          TextStats.stopwordRatio(col("text"), stopwords) <= 0.25)
          .as("passes"))
      scored.join(gated, "doc_id")
        .groupBy(least(greatest(floor(col("score_fp") / 2000.0), lit(-10.0)),
          lit(10.0)).cast("int").as("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("passes"), 1L).otherwise(0L)).as("n_pass"))
        .withColumn("pass_ppm", expr("(n_pass * 1000000) div n_docs"))
        .orderBy("bucket")
    }),

    // Per-doc unigram diversity (RedPajama-v2 signal family): exact-integer
    // token/vocab/collision/top-token counts + 2^20 fixed-point ratios
    // (truncating integer division — engine-exact). Zero shuffle: the token
    // array sorts and folds inside its own row.
    "text_unigram_diversity" -> ((s, d) => {
      val sig = TextStats.unigramDiversity(col("text"))
      t(s, d, "documents").select(col("doc_id"),
          sig("n_tok").as("n_tok"), sig("n_distinct").as("n_distinct"),
          sig("sum_c2").as("sum_c2"), sig("max_c").as("max_c"),
          sig("uniq_frac_fp").as("uniq_frac_fp"),
          sig("coll_fp").as("coll_fp"),
          sig("top_frac_fp").as("top_frac_fp"))
        .orderBy("doc_id")
    }),

    "text_quality" -> ((s, d) => {
      val base = t(s, d, "documents").select(
        col("doc_id"),
        TextStats.nTokens(col("text")).as("n_tok"),
        TextStats.nWords(col("text")).as("n_words"),
        TextStats.avgTokenLen(col("text")).as("avg_tok_len"),
        TextStats.stopwordRatio(col("text"), stopwords).as("stop_ratio"))
      base.select(col("*"),
        when(col("n_tok") >= 60 && col("stop_ratio") <= 0.2, "good")
          .when(col("n_tok") >= 30, "ok").otherwise("short").as("quality"))
        .orderBy("doc_id")
    }),


    // Unicode NFC normalization (UAX #15 canonical composition — run
    // before any hash/dedup/tokenize on multilingual text): the corpus is
    // ASCII, so each doc gets a planted DECOMPOSED suffix (combining acute
    // U+0301 + diaeresis U+0308 + a doc-keyed digit); NFC must compose
    // them — the code-point length shrinks by exactly the two combining
    // marks and the md5 runs over the composed bytes. The JDK Normalizer
    // and the oracle's nfc_normalize implement the same published Unicode
    // algorithm, which is what puts a normalization kernel under the hash.
    "text_normalize_nfc" -> ((s, d) => {
      val withSuffix = concat(col("text"),
        lit(" cafe\u0301 no\u0308el "), (col("doc_id") % 7).cast("string"))
      val norm = TextStats.normalizeNfc(withSuffix)
      t(s, d, "documents").select(col("doc_id"),
          length(withSuffix).as("n_before"),
          length(norm).as("n_after"),
          md5(norm).as("fp"))
        .orderBy("doc_id")
    }),


    // Diacritic stripping (NFD + drop Unicode marks, the utf8proc-style
    // contract): the canonical "search across Latin-script languages"
    // normalization next to NFC — the planted suffix carries combining
    // acute/diaeresis/tilde on e/o/n/U plus a COMPOSED \u00e9, and every
    // one must strip to its base letter; the doc-keyed digit varies the
    // tail. Both the JDK kernel and the oracle's strip_accents implement
    // NFD-then-drop-marks, which is what puts the kernel on the hash.
    "text_strip_accents" -> ((s, d) => {
      val withSuffix = concat(col("text"),
        lit(" cafe\u0301 no\u0308el n\u0303 U\u0308 caf\u00e9 "),
        (col("doc_id") % 7).cast("string"))
      val stripped = TextStats.stripAccents(withSuffix)
      t(s, d, "documents").select(col("doc_id"),
          length(withSuffix).as("n_before"),
          length(stripped).as("n_after"),
          md5(stripped).as("fp"))
        .orderBy("doc_id")
    }),


    // Token counting per language: whitespace, regex-word, BPE-ish subword.
    "text_tokens" -> ((s, d) => {
      t(s, d, "documents")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(TextStats.nTokens(col("text")).cast("long")).as("sum_ws_tokens"),
          sum(TextStats.nWords(col("text")).cast("long")).as("sum_words"),
          sum(TextStats.nSubwords(col("text")).cast("long")).as("sum_subwords"))
        .orderBy("lang")
    }),


    // SCRIPT-AWARE tokenization (Tokenizer.ScriptAware) over a planted
    // mixed-script fixture: latin words glued DIRECTLY onto Han/Katakana/
    // Thai runs — the document shape whitespace splitting reads as ONE
    // token, which silently breaks minhash, BM25, and word-count gates on
    // a multilingual corpus. The law (lowercase → space-pad every CJK/Thai
    // codepoint → split on space runs, drop empties) is stated over
    // explicit BMP ranges so both engines restate it verbatim; the row
    // pins the exact token stream (joined), the count gate, and a
    // stopword-ratio gate under the script-aware tokenizer.
    "text_tokens_cjk" -> ((s, d) => {
      val fx = t(s, d, "documents").select(col("doc_id"))
        .where(col("doc_id") < 30)
        .select(col("doc_id"),
          CjkFixture.text(col("doc_id"), "epsilon").as("text"))
      fx.select(col("doc_id"),
          TextStats.nTokens(col("text"), Tokenizer.ScriptAware).as("n_tokens"),
          array_join(TextStats.tokens(col("text"), Tokenizer.ScriptAware), "|")
            .as("toks_s"),
          TextStats.stopwordRatio(col("text"), Seq("alpha", "delta"),
            Tokenizer.ScriptAware).as("stop_ratio"))
        .orderBy("doc_id")
    }),


    // DICTIONARY longest-match segmentation over Thai (the unsegmented
    // script the per-codepoint fallback under-serves): fixture text glues
    // three lexicon words (picked by doc_id formulas) plus a 2-codepoint
    // out-of-lexicon run, no spaces — the real shape of Thai prose. The
    // row emits the dictionary segmentation NEXT TO the per-codepoint
    // count, so the gate proves they measurably diverge AND that maximal
    // munch prefers compounds (ประเทศไทย over ประเทศ+ไทย) where picked.
    // The oracle re-derives the lexicon via chr() arithmetic and carries
    // both tokenizers' three-step laws.
    "text_tokens_thai" -> ((s, d) => {
      val dict = Tokenizer.Dictionary(ThaiLexicon.words)
      def pick(mul: Int, add: Int) = element_at(
        array(ThaiLexicon.words.map(lit): _*),
        ((col("doc_id") * mul + add) % 16).cast("int") + 1)
      val thaiRun = concat((0 until 2).map(j =>
        lit(CjkFixture.Thai).substr(
          ((col("doc_id") * 3 + j * 7) % 32).cast("int") + 1, lit(1))): _*)
      val fx = t(s, d, "documents").select(col("doc_id"))
        .where(col("doc_id") < 40)
        .select(col("doc_id"),
          concat(lit("thai sample "), pick(3, 0), pick(5, 1), pick(7, 2),
            thaiRun, lit(" end")).as("text"))
      fx.select(col("doc_id"),
          size(dict.tokens(col("text"))).as("n_dict"),
          size(Tokenizer.ScriptAware.tokens(col("text"))).as("n_char"),
          array_join(dict.tokens(col("text")), "|").as("toks"))
        .orderBy("doc_id")
    }),


    // Real BPE ENCODE under the pinned merge table (E9i): per doc, the
    // exact subword stream after 8 merge rounds — posexplode so every token
    // AND its position is hash-compared (a wrong merge order, a missed
    // occurrence, or a rank-precedence bug all reorder the stream).
    // ASCII-printable docs only: the kernel iterates UTF-16 units, the
    // oracle regex codepoints — identical on ASCII, divergent on surrogate
    // pairs. Pure scan-level projection; the explode is the only growth.
    "text_bpe_encode" -> ((s, d) => {
      t(s, d, "documents")
        .where(col("doc_id") < 120 && col("text").rlike("^[ -~]*\\z"))
        .select(col("doc_id"),
          posexplode(TextStats.bpeEncode(col("text"), bpeMerges, bpeRounds))
            .as(Seq("pos", "token")))
        .orderBy("doc_id", "pos")
    }),


    // Classifier TRAINING under the oracle gate (E9k): integer batch
    // perceptron over E9g's exact feature space (same md5 bucket, same
    // `_`-bigrams, dim=64 here so the oracle's weight CTEs stay 64-row),
    // 3 epochs, label = lang=='en' as ±1 (a MECHANISM pin — the synthetic
    // lang labels are not learnable from text; the e2e row below
    // demonstrates actual learning). The oracle unrolls every epoch —
    // per-doc dots, the sign-vs-label misclassification set, the bucket-
    // keyed gradient, the weight update — so a drift in hashing, sign
    // convention, or update arithmetic hash-fails. Output: the learned
    // 64-long integer weight vector, the artifact E9g's seam consumes.
    "text_classifier_train" -> ((s, d) => {
      import s.implicits._
      val docs = t(s, d, "documents").select(col("text"),
        when(col("lang") === "en", 1).otherwise(-1).as("y"))
      TextStats.perceptronTrain(docs, "text", "y", dim = 64, epochs = 3)
        .zipWithIndex.map { case (wt, b) => (b, wt) }
        .toDF("bucket", "w")
        .orderBy("bucket")
    }),


    // Train→infer E2E (E9k2): fit on EVEN doc_ids, score the held-out ODD
    // docs with the learned vector via the closed E9g seam — per held-out
    // doc the exact integer score, sign prediction, and correctness flag,
    // so GENERALIZATION (not just the fit) is part of the compared surface.
    // The corpus carries a planted noisy class signal (marker token agrees
    // with the label on 85% of docs, flips keyed-hashed on doc_id), so the
    // learned accuracy ≈ signal strength — a real learning demonstration on
    // synthetic text whose raw lang labels are unlearnable. Inference is a
    // pure scan projection; the weights ride as a literal. dim=128,
    // 6 epochs, AVERAGED snapshots (Freund-Schapire integer form) — the
    // full-batch update oscillates class-wide on its own; the snapshot sum
    // damps it (held-out: 200/250 = 0.80 vs the 0.85 planted ceiling).
    "text_classifier_e2e" -> ((s, d) => {
      val y = when(col("doc_id") % 4 < 2, 1L).otherwise(-1L)
      val flip = (col("doc_id") * 1103515245L + 12345L) % 100L < 15L
      val marker = when((col("doc_id") % 4 < 2) =!= flip, "qpos").otherwise("qneg")
      val all = t(s, d, "documents").select(col("doc_id"),
        concat(col("text"), repeat(concat(lit(" "), marker), 8)).as("text"),
        y.as("y"))
      val w = TextStats.perceptronTrain(all.where(col("doc_id") % 2 === 0),
        "text", "y", dim = 128, epochs = 6, averaged = true)
      all.where(col("doc_id") % 2 === 1)
        .select(col("doc_id"),
          TextStats.trainedScoreCol(col("text"), w).as("score_fp"), col("y"))
        .withColumn("pred", when(col("score_fp") >= 0, 1).otherwise(-1))
        .select(col("doc_id"), col("score_fp"), col("pred"),
          (col("pred") === col("y")).cast("int").as("correct"))
        .orderBy("doc_id")
    }),


    // BPE merge-table TRAINING under the oracle gate (E9j): the tokenizer
    // FIT itself — 8 learned merges with their weighted pair counts. One
    // corpus pass to the word-frequency table, then every round is
    // vocab-sized; the oracle unrolls all 8 rounds (pair counts, argmax
    // with the (count DESC, a, b) tie-break, scan-skip merge application),
    // so a counting, selection, or state-update drift anywhere hash-fails.
    "text_bpe_train" -> ((s, d) => {
      import s.implicits._
      val corpus = t(s, d, "documents").where(col("text").rlike(bpeCorpusRe))
      TextStats.bpeTrainMerges(corpus, "text", nMerges = 8)
        .zipWithIndex.map { case ((a, b, c), i) => (i + 1, a, b, c) }
        .toDF("rank", "a", "b", "pair_count")
        .orderBy("rank")
    }),


    // BPE compression ratio as a quality signal (E9j3): chars-per-token
    // under the LEARNED table (natural text compresses; gibberish stays
    // near one char per token — the CCNet-adjacent "languageness" signal),
    // in exact integer fixed-point ×1000. Composes the E9j fit with a
    // scan-level kernel projection; per-doc ints, zero shuffle.
    "text_bpe_ratio" -> ((s, d) => {
      val corpus = t(s, d, "documents").where(col("text").rlike(bpeCorpusRe))
      val learned = TextStats.bpeTrainMerges(corpus, "text", nMerges = 8)
        .map(m => (m._1, m._2))
      corpus.where(col("doc_id") < 200)
        .select(col("doc_id"),
          length(regexp_replace(lower(col("text")), " ", "")).as("n_chars"),
          size(TextStats.bpeEncode(col("text"), learned, rounds = 12))
            .as("n_tokens"))
        .select(col("doc_id"), col("n_chars"), col("n_tokens"),
          expr("CASE WHEN n_tokens = 0 THEN 0 " +
            "ELSE (n_chars * 1000) div n_tokens END").as("ratio_fp"))
        .orderBy("doc_id")
    }),


    // Tokenizer loop CLOSED (E9j2): train the 8-merge table, then ENCODE
    // held-down docs with the LEARNED merges — fit and apply composed in
    // one restatable row (the oracle's encode CASEs cross-join the learned
    // single-row b CTEs, so the patterns are dynamic). 12 encode rounds is
    // ≥ fixpoint for ANY table on this corpus (max word length 8).
    "text_bpe_e2e" -> ((s, d) => {
      val corpus = t(s, d, "documents").where(col("text").rlike(bpeCorpusRe))
      val learned = TextStats.bpeTrainMerges(corpus, "text", nMerges = 8)
        .map(m => (m._1, m._2))
      corpus.where(col("doc_id") < 40)
        .select(col("doc_id"),
          posexplode(TextStats.bpeEncode(col("text"), learned, rounds = 12))
            .as(Seq("pos", "token")))
        .orderBy("doc_id", "pos")
    }),


    // PII redaction over a frame with PLANTED pii (an email + a 7-digit ref
    // derived from doc_id) — the scrubbed strings themselves are compared,
    // so any masking difference (greediness, missed span, global-vs-first
    // replacement) hash-fails.
    "text_scrub" -> ((s, d) => {
      val dirty = concat(substring(col("text"), 1, 40),
        lit(" contact user"), col("doc_id"), lit("@mail.example.com ref "),
        (col("doc_id") * 7919 + 1000000).cast("string"))
      t(s, d, "documents")
        .select(col("doc_id"), TextStats.scrubPii(dirty).as("clean_text"))
        .orderBy("doc_id")
    }),


    // Consecutive-duplicate-token collapse ("batch batch batch" → "batch"):
    // stutter normalization, the token-level sibling of duplicate-line
    // removal — the synthetic corpus plants real runs. The collapsed string
    // itself is compared plus integer before/after counts. Zero shuffle.
    "text_collapse_runs" -> ((s, d) => {
      val w = split(col("text"), " ")
      t(s, d, "documents")
        .select(col("doc_id"),
          TextStats.collapseRepeatedTokens(col("text")).as("collapsed"),
          size(w).as("n_before"),
          size(filter(w, (t, i) => i === lit(0) || t =!= element_at(w, i)))
            .as("n_after"))
        .orderBy("doc_id")
    }),


    // Span-level decontamination: probe 4-grams are MASKED in place (docs
    // survive, passages don't) in the deterministic md5-of-gram fold order
    // — the scrubbed strings themselves are compared, so replacement order,
    // overlap handling, and global-vs-first replacement are all pinned. A
    // known benchmark sentence is PLANTED into every target (the text_scrub
    // pattern — the synthetic corpus has no guaranteed natural cross-doc
    // 4-grams), so every output row exercises a real masking, including the
    // overlapping-gram fold where the first-masked gram destroys the
    // others' matches.
    "text_scrub_spans" -> ((s, d) => {
      val docs = t(s, d, "documents").where(col("doc_id") % 17 === 0)
        .select(col("doc_id"), concat(lower(col("text")),
          lit(" the quick brown fox jumps over the lazy dog end")).as("text"))
      val probes = s.range(1)
        .select(lit("quick brown fox jumps over the lazy").as("text"))
      Decontaminate.scrubSpans(docs, "text", probes, "text",
          n = 4, mask = "[_]")
        .select(col("doc_id"), col("text").as("scrubbed"))
        .orderBy("doc_id")
    }),


    // Markup stripping on planted markup (same planted-content pattern as
    // text_scrub): tags out, the five predefined entities decoded exactly
    // once (&amp; decoded last — planted "&amp;lt;" must surface as the
    // literal "&lt;", not "<"), whitespace collapsed. Zero shuffle.
    "text_strip_html" -> ((s, d) => {
      val marked = concat(
        lit("<html><body><h1>Doc "), col("doc_id"),
        lit("</h1> <p class=\"lead\">"), substring(col("text"), 1, 60),
        lit("</p> <br/> &quot;q&quot; &#39;s&#39; 1 &lt; 2 &amp; 3 &gt; 2" +
          " &amp;lt;escaped&amp;gt;</body></html>"))
      t(s, d, "documents")
        .select(col("doc_id"), TextStats.stripMarkup(marked).as("clean_text"))
        .orderBy("doc_id")
    }),


    // Gopher/C4-style quality gate battery: integer-exact per-doc stats +
    // one boolean per gate + the AND — the cheap-filter pass every
    // web-scale curation run applies before model scoring. One projection,
    // zero shuffle.
    "text_quality_gates" -> ((s, d) => {
      TextStats.qualityGates(t(s, d, "documents"), "doc_id", "text",
          stopwords, minWords = 40)
        .orderBy("doc_id")
    }),


    // MAIN-CONTENT extraction feeding the quality-gate pipeline — the
    // boilerplate-removal hop between the WARC fetch and text_quality_gates
    // that tag stripping alone cannot provide. Planted-chrome fixture: each
    // doc's page carries a pure-link nav bar (density 1), a 2-word
    // heading, the real text in a <p>, a 2-word "Read more" stub, and a
    // link-heavy copyright footer (7 words, 30 of 46 chars inside anchors
    // — alive past the word gate, killed by 3·30 > 46 exactly). Only the
    // body paragraph survives Extract.extractMain's integer-exact rule
    // (≥ 5 words AND 3·link_chars ≤ chars), and the survivors run the
    // SAME gate battery as text_quality_gates. The oracle restates the
    // construction, the full block pipeline, and the gates.
    "curation_extract_main" -> ((s, d) => {
      val html = concat(
        lit("<html><body><div class=\"nav\"><a href=\"/\">Home</a> " +
          "<a href=\"/a\">About us</a> <a href=\"/c\">Contact</a></div>" +
          "<h1>Doc "), col("doc_id"),
        lit("</h1><p>"), col("text"),
        lit("</p><p>Read more</p><div>Copyright 2017 " +
          "<a href=\"/t\">Terms of service</a> " +
          "<a href=\"/p\">Privacy policy</a></div></body></html>"))
      val extracted = Extract.extractMain(
        t(s, d, "documents").select(col("doc_id"), html.as("html")),
        "doc_id", "html", minWords = 5)
      TextStats.qualityGates(extracted, "doc_id", "main_text", stopwords,
          minWords = 40)
        .join(extracted.select(col("doc_id"), col("main_text"),
          col("n_blocks_kept"), col("n_blocks_total")), Seq("doc_id"))
        .orderBy("doc_id")
    }),


    // SITE-TEMPLATE removal — the CROSS-PAGE half of boilerplate
    // extraction (RefinedWeb/CCNet repeated-paragraph pruning, keyed by
    // site): a host-wide "welcome portal" block passes the per-page
    // word/density rule on EVERY page (10 words, zero links — exactly the
    // chrome extractMain cannot catch) and dies only to the ≥ 3-distinct-
    // pages frequency rule; a "bulletin" block planted on exactly 1–2
    // pages per host (pair step 350 = 7·50 keeps the pair on ONE host)
    // sits under the threshold and survives — the boundary in both
    // directions. Exact distinct-page counts, integer thresholds.
    "curation_drop_templates" -> ((s, d) => {
      val host = concat(lit("h"), col("doc_id") % 7)
      val html = concat(
        lit("<div>Welcome to the "), host,
        lit(" portal with news weather sports and finance</div><p>"),
        col("text"),
        lit("</p><p>this bulletin number "), col("doc_id") % 350,
        lit(" repeats on at most two pages</p>"))
      Extract.dropTemplates(
        t(s, d, "documents").select(col("doc_id"), host.as("host"),
          html.as("html")),
        "doc_id", "host", "html", minWords = 5, templatePages = 3)
        .orderBy("doc_id")
    }),


    // Per-language vocabulary profile: distinct terms, hapax count/share,
    // max document frequency — corpus-health numbers (a ballooning hapax
    // share flags OCR junk / encoding damage).
    "text_vocab_stats" -> ((s, d) => {
      TextStats.vocabularyStats(t(s, d, "documents"), "text", "lang")
        .orderBy("lang")
    }),


    // Inverted index: term → document frequency + sorted posting list
    // (comma-joined; engine-portable where array serialization is not).
    // One exchange keyed on the term; per-doc distinct before the explode.
    "text_inverted_index" -> ((s, d) => {
      TextStats.invertedIndex(t(s, d, "documents"), "doc_id", "text",
          minDf = 5)
        .orderBy("term")
    }),


    // Fixed-window chunking with overlap (context-window prep): 32-token
    // chunks every 24 tokens, short tail chunk kept.
    "text_chunk" -> ((s, d) => {
      TextStats.chunkWords(t(s, d, "documents"), "doc_id", "text",
          window = 32, stride = 24)
        .orderBy("doc_id", "chunk_no")
    }),


    // Paragraph-boundary chunking with a greedy 25-token budget (the RAG
    // chunk shape: respect semantic boundaries, cap the window) — the
    // fixture's ' a ' occurrences stand in for blank lines as the
    // paragraph separator; oversized paragraphs ride alone, never split.
    // Pure generator projection (the greedy fold runs inside each row).
    "text_chunk_paragraphs" -> ((s, d) => {
      TextStats.chunkParagraphs(t(s, d, "documents"), "doc_id", "text",
          maxTokens = 25, sep = " a ")
        .orderBy("doc_id", "chunk_no")
    }),


    // Integer-exact tf-idf-proxy keyword extraction: top 3 terms per
    // document by (tf DESC, corpus doc-frequency ASC, term ASC).
    "text_keywords" -> ((s, d) => {
      TextStats.topKeywords(t(s, d, "documents"), "doc_id", "text", k = 3)
        .orderBy("doc_id", "rk")
    }),


    // Repetition profile (Gopher/C4-style quality filter): share of a
    // document's bigram occurrences taken by its most frequent bigram.
    "text_repetition" -> ((s, d) => {
      TextStats.repetitionStats(t(s, d, "documents"), "doc_id", "text", n = 2)
        .orderBy("doc_id")
    }),


    // Repetition profile under the SCRIPT-AWARE tokenizer over the
    // mixed-script fixture, each doc doubled ("text text") so every bigram
    // genuinely repeats: under whitespace tokenization a CJK run is ONE
    // token and the profile collapses to the latin scaffold; per-codepoint
    // tokens restore the gram granularity the Gopher-style gate needs. The
    // oracle restates the fixture, the token law, and the full
    // count-max-share chain.
    "text_repetition_cjk" -> ((s, d) => {
      val fx = t(s, d, "documents").select(col("doc_id"))
        .where(col("doc_id") < 30)
        .select(col("doc_id"),
          CjkFixture.text(col("doc_id"), "epsilon").as("t0"))
        .select(col("doc_id"),
          concat(col("t0"), lit(" "), col("t0")).as("text"))
      TextStats.repetitionStats(fx, "doc_id", "text", n = 2,
          tok = Tokenizer.ScriptAware)
        .orderBy("doc_id")
    }),


    // Bigram Stupid-Backoff LM under the SCRIPT-AWARE tokenizer: reference
    // = the first 20 fixture docs, scored = all 30, so docs 20-29 exercise
    // the backoff/OOV branches on script-run bigrams. Under whitespace
    // tokenization every CJK run is one OOV mega-token and the scorer is
    // blind; per-codepoint tokens give the LM real n-gram statistics. The
    // oracle restates fixture + token law + the exact 2^20 fixed-point
    // score tree.
    "text_lm_cjk" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"))
        .where(col("doc_id") < 30)
        .select(col("doc_id"),
          CjkFixture.text(col("doc_id"), "epsilon").as("text"))
      TextStats.bigramBackoffScore(docs, "doc_id", "text",
          reference = docs.where(col("doc_id") < 20),
          maxBroadcast = Long.MaxValue, // bounded fixture vocab, skip sizing
          tok = Tokenizer.ScriptAware)
        .orderBy("doc_id")
    }),


    // Sequence packing: per-source greedy concat-and-chunk into 512-token
    // context windows; each doc tagged with the sequence its start falls in.
    "sample_pack_sequences" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .withColumn("n_tok", TextStats.nTokens(col("text")))
      Sampling.packIntoSequences(docs, "source", "doc_id", "n_tok",
          seqTokens = 512)
        .select(col("doc_id"), col("source"), col("n_tok"), col("seq_no"))
        .orderBy("doc_id")
    }),


    // Materialized packing: the actual 512-token training sequences the
    // assignment above describes, docs concatenated in hash-rank order.
    "sample_pack_text" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .withColumn("n_tok", TextStats.nTokens(col("text")))
      Sampling.packSequencesText(docs, "source", "doc_id", "n_tok", "text",
          seqTokens = 512)
        .orderBy("source", "seq_no")
    }),


    // DISTINCTIVE terms per source (E9o): over-representation lift
    // P(term|source)/P(term) in exact fixed point (pure rational in the
    // counts — no log-odds, logs aren't engine-portable), min corpus
    // count 5, top-5 per source — the spam-source / data-card signal
    // next to the raw-frequency text_top_tokens. Oracle restates counts,
    // the HUGEINT-widened lift, and the rank.
    "text_distinctive_terms" -> ((s, d) => {
      TextStats.distinctiveTerms(t(s, d, "documents"), "text", "source",
          k = 5, minCount = 5)
        .orderBy("source", "rk")
    }),


    // Vocabulary analysis: top-10 tokens per language by document frequency
    // (the stopword-discovery / corpus-stats primitive).
    "text_top_tokens" -> ((s, d) => {
      TextStats.topTokens(t(s, d, "documents"), "text", "lang", k = 10)
        .select(col("lang"), col("token"), col("n_docs"), col("rk"))
        .orderBy("lang", "rk")
    }),


    // Vocabulary drift between two snapshots (old = src0/src1, new = the
    // rest): new/dropped/common term counts + per-side occurrence mass —
    // the crawl-health check per ingest, integer-exact.
    "text_vocab_drift" -> ((s, d) => {
      val docs = t(s, d, "documents")
      TextStats.vocabularyDrift(
          docs.where(col("source").isin("src0", "src1")),
          docs.where(!col("source").isin("src0", "src1")), "text")
        .orderBy("status")
    }),


    // Corpus-frequency LM scoring: per-doc mean corpus-frequency of its
    // tokens — the deterministic stand-in for the CCNet KenLM-perplexity
    // quality filter (integer-exact evidence + one double division).
    "text_lm_score" -> ((s, d) => {
      // Long.MaxValue asserts the vocab is broadcast-safe (this corpus'
      // token universe is bounded), skipping the sizing job — callers with
      // unbounded vocabularies keep the counted default
      TextStats.corpusFrequencyScore(t(s, d, "documents"), "doc_id", "text",
          maxBroadcastVocab = Long.MaxValue)
        .orderBy("doc_id")
    }),


    // Bigram Stupid-Backoff LM scoring against a held-out reference slice
    // (src0/src1 docs): seen-bigram ratio scores, unigram backoff at α=½,
    // OOV→0, all floored to 2^20 fixed point — the CCNet-shaped upgrade
    // over the unigram corpus-frequency row. The src2+ docs genuinely
    // exercise the backoff and OOV branches.
    "text_lm_bigram" -> ((s, d) => {
      val docs = t(s, d, "documents")
      TextStats.bigramBackoffScore(docs, "doc_id", "text",
          reference = docs.where(col("source").isin("src0", "src1")),
          maxBroadcast = Long.MaxValue) // bounded synthetic vocab, skip sizing
        .orderBy("doc_id")
    }),


    // Trigram Stupid-Backoff LM against the same held-out slice: hit =
    // c3/c2(w1,w2), tail-bigram backoff at ½, unigram backoff at ¼, OOV→0
    // — the order-3 (KenLM-context-shaped) upgrade of the bigram row; the
    // src2+ docs exercise all three backoff levels.
    "text_lm_trigram" -> ((s, d) => {
      val docs = t(s, d, "documents")
      TextStats.trigramBackoffScore(docs, "doc_id", "text",
          reference = docs.where(col("source").isin("src0", "src1")),
          maxBroadcast = Long.MaxValue) // bounded synthetic vocab, skip sizing
        .orderBy("doc_id")
    }),


    // Interpolated Kneser-Ney trigram (KenLM-grade): continuation counts
    // at the lower orders, every order interpolating with the one below,
    // d = 3/4 exactly representable. Same broadcast-count-frame shape as
    // the Stupid-Backoff rows — the continuation frames aggregate the
    // ALREADY-aggregated c3/c2, never a second corpus pass. The oracle
    // restates the whole fixed IEEE tree.
    "text_lm_kn" -> ((s, d) => {
      val docs = t(s, d, "documents")
      TextStats.knTrigramScore(docs, "doc_id", "text",
          reference = docs.where(col("source").isin("src0", "src1")),
          maxBroadcast = Long.MaxValue) // bounded synthetic vocab, skip sizing
        .orderBy("doc_id")
    }),


    // Full column profile: nulls / exact distincts / min-max lengths, one
    // aggregation job, one output row per column (the reference's audit
    // stops at max length — SURVEY §2 rows 26-27 extended).
    "etl_profile" -> ((s, d) => {
      graft.etl.Audit.profileColumns(t(s, d, "documents"),
          Seq("text", "lang", "source"))
        .orderBy("col_name")
    }),


    // Document fingerprinting: canonical bag-of-words md5 + rolling hash.
    "text_fingerprint" -> ((s, d) => {
      t(s, d, "documents").select(
        col("doc_id"),
        TextStats.canonicalFingerprint(col("text")).as("canon_fp"),
        TextStats.rollingHash(col("text")).as("roll_hash"))
        .orderBy("doc_id")
    }),

    // Binary payload + typed metadata stats (decode itself is the stubbed
    // per-partition step — see graft.ext.Multimodal and its spec).
  )

  val oracle: Map[String, String] = Map(

    "text_langid" ->
      s"""SELECT doc_id,
         |  ${Sql.markerCount(langClasses(0)._2)}::INT AS s_tabular,
         |  ${Sql.markerCount(langClasses(1)._2)}::INT AS s_streaming,
         |  ${Sql.markerCount(langClasses(2)._2)}::INT AS s_relational,
         |  CASE
         |    WHEN ${Sql.markerCount(langClasses(0)._2)} >= ${Sql.markerCount(langClasses(1)._2)}
         |     AND ${Sql.markerCount(langClasses(0)._2)} >= ${Sql.markerCount(langClasses(2)._2)}
         |      THEN 'tabular'
         |    WHEN ${Sql.markerCount(langClasses(1)._2)} >= ${Sql.markerCount(langClasses(2)._2)}
         |      THEN 'streaming'
         |    ELSE 'relational' END AS pred
         |FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents)
         |ORDER BY doc_id""".stripMargin,


    // feature hashing + keyed-hash linear weights restated verbatim:
    // unigrams ++ adjacent bigram conjunctions, bucket = md5-derived 32-bit
    // mod 4096, weight = (b·1103515245 + 12345) mod 2001 − 1000, exact sum
    // the classifier-score CTEs of text_quality_classifier + the curation
    // quality predicate, bucketed; n_pass > 0 only where scores and gates
    // agree — the curve itself is on the hash
    "text_classifier_calibration" ->
      s"""WITH w AS (SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
        |  FROM documents),
        |f AS (SELECT doc_id, list_concat(toks,
        |    CASE WHEN len(toks) >= 2
        |      THEN list_transform(range(1, len(toks)), i -> toks[i] || '_' || toks[i + 1])
        |      ELSE []::VARCHAR[] END) AS feats
        |  FROM w),
        |s AS (SELECT doc_id,
        |    coalesce(list_sum(list_transform(feats, t ->
        |      ((('0x' || substr(md5(t || 'qc'), 1, 8))::BIGINT % 4096)
        |        * 1103515245 + 12345) % 2001 - 1000)), 0)::BIGINT AS score_fp
        |  FROM f),
        |g AS (SELECT doc_id,
        |    (${Sql.curationQualityPred}) AS passes
        |  FROM documents)
        |SELECT least(greatest(floor(score_fp / 2000.0), -10), 10)::INT AS bucket,
        |  count(*)::BIGINT AS n_docs,
        |  sum(CASE WHEN passes THEN 1 ELSE 0 END)::BIGINT AS n_pass,
        |  ((sum(CASE WHEN passes THEN 1 ELSE 0 END) * 1000000) // count(*))::BIGINT
        |    AS pass_ppm
        |FROM s JOIN g USING (doc_id)
        |GROUP BY 1 ORDER BY bucket""".stripMargin,


    "text_quality_classifier" ->
      """WITH w AS (SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
        |  FROM documents),
        |f AS (SELECT doc_id, list_concat(toks,
        |    CASE WHEN len(toks) >= 2
        |      THEN list_transform(range(1, len(toks)), i -> toks[i] || '_' || toks[i + 1])
        |      ELSE []::VARCHAR[] END) AS feats
        |  FROM w),
        |s AS (SELECT doc_id, len(feats)::INT AS n_feats,
        |    coalesce(list_sum(list_transform(feats, t ->
        |      ((('0x' || substr(md5(t || 'qc'), 1, 8))::BIGINT % 4096)
        |        * 1103515245 + 12345) % 2001 - 1000)), 0)::BIGINT AS score_fp
        |  FROM f)
        |SELECT doc_id, n_feats, score_fp,
        |  (CASE WHEN score_fp > 0 THEN 1 ELSE 0 END)::INT AS label
        |FROM s ORDER BY doc_id""".stripMargin,

    // the relational restatement of the row-local fold: unnest → per-token
    // counts → per-doc aggregates; `//` is DuckDB's truncating BIGINT
    // division, the exact twin of Spark's IntegralDivide
    "text_unigram_diversity" ->
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), t -> t <> '') AS tk
        |  FROM documents),
        |c AS (SELECT doc_id, t, count(*)::BIGINT AS c
        |  FROM (SELECT doc_id, unnest(tk) AS t FROM toks) GROUP BY doc_id, t),
        |a AS (SELECT doc_id, sum(c)::BIGINT AS n_tok,
        |    count(*)::BIGINT AS n_distinct, sum(c*c)::BIGINT AS sum_c2,
        |    max(c)::BIGINT AS max_c
        |  FROM c GROUP BY doc_id)
        |SELECT k.doc_id,
        |  coalesce(a.n_tok, 0)::BIGINT AS n_tok,
        |  coalesce(a.n_distinct, 0)::BIGINT AS n_distinct,
        |  coalesce(a.sum_c2, 0)::BIGINT AS sum_c2,
        |  coalesce(a.max_c, 0)::BIGINT AS max_c,
        |  CASE WHEN a.n_tok > 0 THEN (a.n_distinct * 1048576) // a.n_tok
        |    END::BIGINT AS uniq_frac_fp,
        |  CASE WHEN a.n_tok > 0
        |    THEN (a.sum_c2::HUGEINT * 1048576) // (a.n_tok * a.n_tok)
        |    END::BIGINT AS coll_fp,
        |  CASE WHEN a.n_tok > 0 THEN (a.max_c * 1048576) // a.n_tok
        |    END::BIGINT AS top_frac_fp
        |FROM toks k LEFT JOIN a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "text_quality" ->
      s"""SELECT doc_id, n_tok, n_words, avg_tok_len, stop_ratio,
         |  CASE WHEN n_tok >= 60 AND stop_ratio <= 0.2 THEN 'good'
         |       WHEN n_tok >= 30 THEN 'ok' ELSE 'short' END AS quality
         |FROM (SELECT doc_id,
         |  len(string_split(text, ' '))::INT AS n_tok,
         |  len(regexp_extract_all(lower(text), '[a-z]+'))::INT AS n_words,
         |  length(replace(text, ' ', ''))::DOUBLE / len(string_split(text, ' ')) AS avg_tok_len,
         |  ${Sql.markerCount(stopwords)}::DOUBLE / len(string_split(text, ' ')) AS stop_ratio
         |  FROM (SELECT doc_id, text, string_split(lower(text), ' ') AS toks FROM documents))
         |ORDER BY doc_id""".stripMargin,

    "text_tokens" ->
      """SELECT lang, count(*)::BIGINT AS n_docs,
        |  sum(len(string_split(text, ' ')))::BIGINT AS sum_ws_tokens,
        |  sum(len(regexp_extract_all(lower(text), '[a-z]+')))::BIGINT AS sum_words,
        |  sum(len(regexp_extract_all(lower(text), '[a-z]{1,4}|[0-9]|[^a-z0-9 ]')))::BIGINT AS sum_subwords
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    // the script-aware law restated verbatim (pad-class over explicit BMP
    // ranges) over the same integer-formula fixture
    "text_tokens_cjk" ->
      s"""WITH ${CjkFixture.alphabetsCte},
         |fx AS (SELECT doc_id, ${CjkFixture.textSql("doc_id", "epsilon")}
         |    AS text
         |  FROM documents, a WHERE doc_id < 30),
         |w AS (SELECT doc_id,
         |    ${Tokenizer.ScriptAware.duckdbTokensSql("text")} AS words
         |  FROM fx)
         |SELECT doc_id, len(words)::INT AS n_tokens,
         |  array_to_string(words, '|') AS toks_s,
         |  len(list_filter(words, t -> t IN ('alpha', 'delta')))::DOUBLE
         |    / len(words) AS stop_ratio
         |FROM w ORDER BY doc_id""".stripMargin,

    // the lexicon rebuilt via chr() arithmetic (ASCII-safe SQL), the same
    // word-pick formulas, and BOTH tokenizer laws carried verbatim — the
    // dictionary alternation (longest-first, \x{} escapes) and the
    // per-codepoint class
    "text_tokens_thai" ->
      s"""WITH ${CjkFixture.alphabetsCte},
         |lex AS (SELECT ${ThaiLexicon.listSql} AS ws),
         |fx AS (SELECT doc_id,
         |    'thai sample ' || ws[((doc_id * 3) % 16)::INT + 1]
         |      || ws[((doc_id * 5 + 1) % 16)::INT + 1]
         |      || ws[((doc_id * 7 + 2) % 16)::INT + 1]
         |      || array_to_string(list_transform(range(0, 2),
         |           j -> substr(a.thai, ((doc_id * 3 + j * 7) % 32)::INT + 1, 1)), '')
         |      || ' end' AS text
         |  FROM documents, lex, a WHERE doc_id < 40),
         |w AS (SELECT doc_id,
         |    ${Tokenizer.Dictionary(ThaiLexicon.words).duckdbTokensSql("text")}
         |      AS dict_words,
         |    ${Tokenizer.ScriptAware.duckdbTokensSql("text")} AS char_words
         |  FROM fx)
         |SELECT doc_id, len(dict_words)::INT AS n_dict,
         |  len(char_words)::INT AS n_char,
         |  array_to_string(dict_words, '|') AS toks
         |FROM w ORDER BY doc_id""".stripMargin,


    // mirrors TextStats.bpeEncode under the pinned table: each word is
    // wrapped "(c)(c)…", each of the 8 rounds is one unrolled
    // lowest-rank-present CASE + a scan-skip `replace` (see bpeRoundSql),
    // then tokens are recovered by stripping the outer parens and splitting
    // on the ")(" symbol boundary — exact because multi-char symbols are
    // letter-only, so neither "(x)(y)" patterns nor ")(" separators can
    // occur inside a symbol
    "text_bpe_encode" -> {
      val rounds = (1 to bpeRounds).map { r =>
        val (prev, from) =
          if (r == 1) ("s0", "wrapped") else ("s", s"r${r - 1}")
        s"r$r AS (SELECT doc_id, word_ord, ${bpeRoundSql(prev)} AS s FROM $from)"
      }.mkString(",\n")
      s"""WITH docs AS (SELECT doc_id,
         |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS wl
         |  FROM documents WHERE doc_id < 120 AND regexp_matches(text, '^[ -~]*\\z')),
         |words AS (SELECT doc_id, unnest(range(1, len(wl)+1)) AS word_ord,
         |  unnest(wl) AS w FROM docs),
         |wrapped AS (SELECT doc_id, word_ord,
         |  regexp_replace(w, '(.)', '(\\1)', 'g') AS s0 FROM words),
         |$rounds,
         |toks AS (SELECT doc_id, word_ord,
         |  string_split(substr(s, 2, length(s) - 2), ')(') AS tl FROM r$bpeRounds),
         |ex AS (SELECT doc_id, word_ord, unnest(range(1, len(tl)+1)) AS tok_ord,
         |  unnest(tl) AS token FROM toks)
         |SELECT doc_id, (row_number() OVER (PARTITION BY doc_id
         |    ORDER BY word_ord, tok_ord) - 1)::INT AS pos, token
         |FROM ex ORDER BY doc_id, pos""".stripMargin
    },


    // see bpeTrainOracle: all 8 training rounds unrolled, each consuming
    // the previous round's applied state
    "text_bpe_train" -> bpeTrainOracle(8),


    // see bpeE2eOracle: the train chain + a 12-round dynamic-pair encode
    "text_bpe_e2e" -> bpeE2eOracle(8, 12),


    // see bpeRatioOracle: the same chains, reduced to chars-per-token
    "text_bpe_ratio" -> bpeRatioOracle(8, 12),


    // mirrors TextStats.perceptronTrain(dim=64, epochs=3): per epoch e,
    // d_e = per-doc dots against w_{e-1} (weights as 64 rows, joined on
    // bucket), m_e = docs whose sign-prediction misses the ±1 label,
    // g_e = bucket-keyed Σy over m_e's feature occurrences,
    // w_e = w_{e-1} + g_e. Zero-feature docs never enter fx, so they are
    // absent from m_e — harmless, their gradient contribution is zero.
    "text_classifier_train" -> perceptronTrainOracle(3),


    // see perceptronE2eOracle: the full train-on-even / score-odd pipeline
    "text_classifier_e2e" -> perceptronE2eOracle(6),

    "text_langid_trained" -> langidTrainedOracle(epochs = 4, dim = 128),

    // mirrors q_hll_sliding: hourly registers → 3-window explode →
    // max-merge → the spine-free estimate; exact twin via the same explode

    // DuckDB regexp_replace defaults to first-match-only — the 'g' flag
    // makes it global like Spark's
    "text_scrub" ->
      s"""SELECT doc_id,
         |  regexp_replace(regexp_replace(
         |    substr(text, 1, 40) || ' contact user' || doc_id ||
         |      '@mail.example.com ref ' || (doc_id * 7919 + 1000000),
         |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         |    '[0-9]{7,}', '<NUM>', 'g') AS clean_text
         |FROM documents ORDER BY doc_id""".stripMargin,

    "text_collapse_runs" ->
      """SELECT doc_id,
        |  array_to_string(list_filter(string_split(text, ' '),
        |    (x, i) -> i = 1 OR x <> string_split(text, ' ')[i-1]), ' ') AS collapsed,
        |  len(string_split(text, ' '))::INT AS n_before,
        |  len(list_filter(string_split(text, ' '),
        |    (x, i) -> i = 1 OR x <> string_split(text, ' ')[i-1]))::INT AS n_after
        |FROM documents ORDER BY doc_id""".stripMargin,


    // the fold is restated as a recursive CTE stepping through the grams in
    // the same md5 order Spark folds them — replacement order, overlaps,
    // and global replacement are all part of the compared strings
    "text_scrub_spans" ->
      s"""WITH RECURSIVE pw AS (
         |  SELECT string_split('quick brown fox jumps over the lazy', ' ') AS words),
         |pg AS (SELECT DISTINCT unnest(${Sql.wordShinglesN(4)}) AS g FROM pw),
         |grams AS (SELECT row_number() OVER (ORDER BY md5(g)) AS i, g FROM pg),
         |tgt AS (SELECT doc_id, lower(text) ||
         |          ' the quick brown fox jumps over the lazy dog end' AS text
         |        FROM documents WHERE doc_id % 17 = 0),
         |step AS (
         |  SELECT doc_id, text, 0::BIGINT AS i FROM tgt
         |  UNION ALL
         |  SELECT s.doc_id, replace(s.text, g.g, '[_]'), s.i + 1
         |  FROM step s JOIN grams g ON g.i = s.i + 1)
         |SELECT doc_id, text AS scrubbed FROM step
         |WHERE i = (SELECT count(*) FROM grams)
         |ORDER BY doc_id""".stripMargin,


    // entity decode order matters and is pinned on both sides: &lt;/&gt;/
    // &quot;/&#39; first, &amp; LAST (planted &amp;lt; → literal "&lt;")
    "text_strip_html" ->
      """SELECT doc_id, trim(regexp_replace(
        |  replace(replace(replace(replace(replace(
        |    regexp_replace(
        |      '<html><body><h1>Doc ' || doc_id || '</h1> <p class="lead">' ||
        |        substr(text, 1, 60) ||
        |        '</p> <br/> &quot;q&quot; &#39;s&#39; 1 &lt; 2 &amp; 3 &gt; 2 &amp;lt;escaped&amp;gt;</body></html>',
        |      '<[^>]*>', ' ', 'g'),
        |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
        |  '\s+', ' ', 'g')) AS clean_text
        |FROM documents ORDER BY doc_id""".stripMargin,

    "text_quality_gates" ->
      s"""SELECT doc_id, n_words, mean_word_len, symbol_ratio, stop_hits,
         |  has_lorem, has_brace,
         |  (n_words BETWEEN 40 AND 100000) AS gate_len,
         |  coalesce(mean_word_len BETWEEN 3.0 AND 10.0, false) AS gate_word_len,
         |  coalesce(symbol_ratio <= 0.1, false) AS gate_symbol,
         |  (stop_hits >= 2) AS gate_stop,
         |  ((n_words BETWEEN 40 AND 100000)
         |    AND coalesce(mean_word_len BETWEEN 3.0 AND 10.0, false)
         |    AND coalesce(symbol_ratio <= 0.1, false)
         |    AND stop_hits >= 2 AND NOT has_lorem AND NOT has_brace) AS pass
         |FROM (SELECT doc_id,
         |  len(regexp_extract_all(lower(text), '[a-z]+'))::INT AS n_words,
         |  CASE WHEN len(regexp_extract_all(lower(text), '[a-z]+')) = 0 THEN NULL
         |    ELSE length(regexp_replace(lower(text), '[^a-z]', '', 'g'))::DOUBLE
         |      / len(regexp_extract_all(lower(text), '[a-z]+')) END AS mean_word_len,
         |  CASE WHEN length(text) = 0 THEN NULL
         |    ELSE length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))::DOUBLE
         |      / length(text) END AS symbol_ratio,
         |  ${Sql.markerCountOver(stopwords, "string_split(lower(text), ' ')")}::INT AS stop_hits,
         |  contains(lower(text), 'lorem ipsum') AS has_lorem,
         |  contains(text, '{') AS has_brace
         |  FROM documents) ORDER BY doc_id""".stripMargin,

    // restates the fixture construction, Extract.extractMain's full block
    // pipeline (block-tag split, visible-text collapse, integer-exact
    // word/link-density rule), and the text_quality_gates battery over the
    // surviving text
    "curation_extract_main" -> {
      // visible text of fragment `x`: tags → space, whitespace collapsed
      def plain(x: String) =
        s"trim(regexp_replace(regexp_replace($x, '(?i)<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g'))"
      def nw(x: String) =
        s"(CASE WHEN ${plain(x)} = '' THEN 0 ELSE len(string_split(${plain(x)}, ' ')) END)"
      val linkChars = "coalesce(list_sum(list_transform(" +
        "regexp_extract_all(x, '(?is)<a(?:\\s[^>]*)?>(.*?)</a>', 1), " +
        s"t -> length(${plain("t")}))), 0)"
      val blockTag = "(?i)</?(?:p|div|h[1-6]|li|ul|ol|br|table|tr|td|th|" +
        "section|article|header|footer|nav|aside|blockquote|html|body|" +
        "head|title)(?:\\s[^>]*)?/?>"
      s"""WITH h AS (SELECT doc_id,
         |    '<html><body><div class="nav"><a href="/">Home</a> ' ||
         |    '<a href="/a">About us</a> <a href="/c">Contact</a></div>' ||
         |    '<h1>Doc ' || doc_id::VARCHAR || '</h1><p>' || text ||
         |    '</p><p>Read more</p><div>Copyright 2017 ' ||
         |    '<a href="/t">Terms of service</a> ' ||
         |    '<a href="/p">Privacy policy</a></div></body></html>' AS html
         |  FROM documents),
         |b AS (SELECT doc_id,
         |    string_split_regex(html, '$blockTag') AS blocks FROM h),
         |k AS (SELECT doc_id,
         |    list_filter(blocks, x -> ${nw("x")} >= 5
         |      AND 3 * $linkChars <= length(${plain("x")})) AS kept,
         |    len(blocks)::INT AS n_blocks_total FROM b),
         |m AS (SELECT doc_id,
         |    array_to_string(list_transform(kept, x -> ${plain("x")}),
         |      chr(10)) AS main_text,
         |    len(kept)::INT AS n_blocks_kept, n_blocks_total FROM k)
         |SELECT doc_id, n_words, mean_word_len, symbol_ratio, stop_hits,
         |  has_lorem, has_brace,
         |  (n_words BETWEEN 40 AND 100000) AS gate_len,
         |  coalesce(mean_word_len BETWEEN 3.0 AND 10.0, false) AS gate_word_len,
         |  coalesce(symbol_ratio <= 0.1, false) AS gate_symbol,
         |  (stop_hits >= 2) AS gate_stop,
         |  ((n_words BETWEEN 40 AND 100000)
         |    AND coalesce(mean_word_len BETWEEN 3.0 AND 10.0, false)
         |    AND coalesce(symbol_ratio <= 0.1, false)
         |    AND stop_hits >= 2 AND NOT has_lorem AND NOT has_brace) AS pass,
         |  main_text, n_blocks_kept, n_blocks_total
         |FROM (SELECT doc_id, main_text, n_blocks_kept, n_blocks_total,
         |  len(regexp_extract_all(lower(main_text), '[a-z]+'))::INT AS n_words,
         |  CASE WHEN len(regexp_extract_all(lower(main_text), '[a-z]+')) = 0 THEN NULL
         |    ELSE length(regexp_replace(lower(main_text), '[^a-z]', '', 'g'))::DOUBLE
         |      / len(regexp_extract_all(lower(main_text), '[a-z]+')) END AS mean_word_len,
         |  CASE WHEN length(main_text) = 0 THEN NULL
         |    ELSE length(regexp_replace(main_text, '[A-Za-z0-9 ]', '', 'g'))::DOUBLE
         |      / length(main_text) END AS symbol_ratio,
         |  ${Sql.markerCountOver(stopwords, "string_split(lower(main_text), ' ')")}::INT AS stop_hits,
         |  contains(lower(main_text), 'lorem ipsum') AS has_lorem,
         |  contains(main_text, '{') AS has_brace
         |  FROM m) ORDER BY doc_id""".stripMargin
    },

    // restates the host/template construction, the per-page rule, the
    // exact distinct-page frequency count, and the positional reassembly
    "curation_drop_templates" -> {
      def plain(x: String) =
        s"trim(regexp_replace(regexp_replace($x, '(?i)<[^>]*>', ' ', 'g'), '\\s+', ' ', 'g'))"
      def nw(x: String) =
        s"(CASE WHEN ${plain(x)} = '' THEN 0 ELSE len(string_split(${plain(x)}, ' ')) END)"
      val linkChars = "coalesce(list_sum(list_transform(" +
        "regexp_extract_all(raw, '(?is)<a(?:\\s[^>]*)?>(.*?)</a>', 1), " +
        s"t -> length(${plain("t")}))), 0)"
      val blockTag = "(?i)</?(?:p|div|h[1-6]|li|ul|ol|br|table|tr|td|th|" +
        "section|article|header|footer|nav|aside|blockquote|html|body|" +
        "head|title)(?:\\s[^>]*)?/?>"
      s"""WITH h AS (SELECT doc_id, 'h' || (doc_id % 7)::VARCHAR AS host,
         |    '<div>Welcome to the h' || (doc_id % 7)::VARCHAR ||
         |    ' portal with news weather sports and finance</div><p>' ||
         |    text || '</p><p>this bulletin number ' ||
         |    (doc_id % 350)::VARCHAR ||
         |    ' repeats on at most two pages</p>' AS html
         |  FROM documents),
         |b0 AS (SELECT doc_id, host,
         |    string_split_regex(html, '$blockTag') AS blocks FROM h),
         |bl AS (SELECT doc_id, host,
         |    unnest(list_transform(range(1, len(blocks) + 1),
         |      i -> {'bno': i, 'raw': blocks[i]}), recursive := true)
         |  FROM b0),
         |keepb AS (SELECT doc_id, host, bno, ${plain("raw")} AS btext
         |  FROM bl
         |  WHERE ${nw("raw")} >= 5
         |    AND 3 * $linkChars <= length(${plain("raw")})),
         |pc AS (SELECT host, btext, count(*)::BIGINT AS pages FROM (
         |    SELECT DISTINCT host, btext, doc_id FROM keepb) GROUP BY 1, 2),
         |fl AS (SELECT k.doc_id, k.bno, k.btext, (pc.pages >= 3) AS tpl
         |  FROM keepb k JOIN pc ON pc.host = k.host AND pc.btext = k.btext)
         |SELECT doc_id,
         |  coalesce(string_agg(CASE WHEN NOT tpl THEN btext END,
         |    chr(10) ORDER BY bno), '') AS main_text,
         |  count(CASE WHEN NOT tpl THEN 1 END)::INT AS n_blocks_kept,
         |  count(CASE WHEN tpl THEN 1 END)::INT AS n_blocks_dropped_template
         |FROM fl GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },

    "text_vocab_stats" ->
      """SELECT lang, count(*)::BIGINT AS vocab_size,
        |  sum(CASE WHEN n_docs = 1 THEN 1 ELSE 0 END)::BIGINT AS hapax_terms,
        |  max(n_docs)::BIGINT AS max_df,
        |  sum(CASE WHEN n_docs = 1 THEN 1 ELSE 0 END)::DOUBLE / count(*) AS hapax_share
        |FROM (SELECT lang, token, count(*) AS n_docs
        |  FROM (SELECT lang,
        |    unnest(list_distinct(string_split(lower(text), ' '))) AS token
        |    FROM documents)
        |  GROUP BY lang, token)
        |GROUP BY lang ORDER BY lang""".stripMargin,

    "text_inverted_index" ->
      """SELECT term, count(*)::BIGINT AS n_docs,
        |  string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
        |FROM (SELECT doc_id,
        |  unnest(list_distinct(string_split(lower(text), ' '))) AS term
        |  FROM documents)
        |GROUP BY term HAVING count(*) >= 5 ORDER BY term""".stripMargin,


    // a start whose previous chunk already reached the end (s + 32-24 >=
    // len) would be a contained sub-span — dropped on both sides
    // the greedy fold restated as a per-doc recursive walk: paragraph k
    // opens a new chunk exactly when the running token count would pass
    // the budget; chunks re-join their paragraphs with the separator
    "text_chunk_paragraphs" ->
      """WITH RECURSIVE
        |pl AS (SELECT doc_id, string_split(text, ' a ') AS l FROM documents),
        |p0 AS (SELECT doc_id, unnest(range(1, len(l) + 1)) AS i,
        |  unnest(l) AS p FROM pl),
        |p1 AS (SELECT doc_id, i, p,
        |    len(list_filter(string_split(p, ' '), t -> t <> ''))::BIGINT AS n
        |  FROM p0
        |  WHERE len(list_filter(string_split(p, ' '), t -> t <> '')) > 0),
        |seq AS (SELECT doc_id, i, p, n,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY i) AS k FROM p1),
        |walk(doc_id, k, chunk_no, cur) AS (
        |  SELECT doc_id, k, 0::BIGINT, n FROM seq WHERE k = 1
        |  UNION ALL
        |  SELECT s.doc_id, s.k,
        |    CASE WHEN w.cur + s.n > 25 THEN w.chunk_no + 1 ELSE w.chunk_no END,
        |    CASE WHEN w.cur + s.n > 25 THEN s.n ELSE w.cur + s.n END
        |  FROM walk w JOIN seq s ON s.doc_id = w.doc_id AND s.k = w.k + 1)
        |SELECT w.doc_id AS doc_id, chunk_no::INT AS chunk_no,
        |  string_agg(s.p, ' a ' ORDER BY s.k) AS chunk_text,
        |  sum(s.n)::BIGINT AS n_tokens
        |FROM walk w JOIN seq s ON s.doc_id = w.doc_id AND s.k = w.k
        |GROUP BY w.doc_id, chunk_no
        |ORDER BY doc_id, chunk_no""".stripMargin,

    "text_chunk" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |st AS (SELECT doc_id, words,
        |  unnest(generate_series(0, len(words) - 1, 24)) AS s FROM w)
        |SELECT doc_id, (s // 24)::INT AS chunk_no,
        |  array_to_string(words[s + 1 : s + 32], ' ') AS chunk_text,
        |  least(32, len(words) - s)::INT AS n_tokens
        |FROM st WHERE s = 0 OR s + 8 < len(words)
        |ORDER BY doc_id, chunk_no""".stripMargin,

    "text_keywords" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df
        |  FROM tok GROUP BY 1)
        |SELECT doc_id, rk, term, tf, df FROM (
        |  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
        |    CAST(row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf DESC, dfreq.df ASC, tf.term ASC) AS INT) AS rk
        |  FROM tf JOIN dfreq USING (term))
        |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    "text_repetition" ->
      s"""WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS words
         |  FROM documents),
         |g AS (SELECT doc_id, unnest(list_transform(range(1, len(words)),
         |    i -> array_to_string(words[i:i+1], ' '))) AS gram
         |  FROM w WHERE len(words) >= 2),
         |c AS (SELECT doc_id, gram, count(*)::BIGINT AS n FROM g GROUP BY 1, 2)
         |SELECT doc_id, max(n)::BIGINT AS top_gram_n, sum(n)::BIGINT AS n_grams,
         |  max(n)::DOUBLE / sum(n) AS top_share
         |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "text_repetition_cjk" ->
      s"""WITH ${CjkFixture.alphabetsCte},
         |fx AS (SELECT doc_id, ${CjkFixture.textSql("doc_id", "epsilon")}
         |    AS t0
         |  FROM documents, a WHERE doc_id < 30),
         |fx2 AS (SELECT doc_id, t0 || ' ' || t0 AS text FROM fx),
         |w AS (SELECT doc_id,
         |    ${Tokenizer.ScriptAware.duckdbTokensSql("text")} AS words
         |  FROM fx2),
         |g AS (SELECT doc_id, unnest(list_transform(range(1, len(words)),
         |    i -> array_to_string(words[i:i+1], ' '))) AS gram
         |  FROM w WHERE len(words) >= 2),
         |c AS (SELECT doc_id, gram, count(*)::BIGINT AS n FROM g GROUP BY 1, 2)
         |SELECT doc_id, max(n)::BIGINT AS top_gram_n, sum(n)::BIGINT AS n_grams,
         |  max(n)::DOUBLE / sum(n) AS top_share
         |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // the text_lm_bigram law verbatim with the words CTE swapped to the
    // script-aware token rule and the reference slice keyed on doc_id < 20
    "text_lm_cjk" ->
      s"""WITH ${CjkFixture.alphabetsCte},
         |fx AS (SELECT doc_id, ${CjkFixture.textSql("doc_id", "epsilon")}
         |    AS text
         |  FROM documents, a WHERE doc_id < 30),
         |tw AS (SELECT doc_id,
         |    ${Tokenizer.ScriptAware.duckdbTokensSql("text")} AS w
         |  FROM fx),
         |dp AS (SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
         |  FROM tw, unnest(range(1, len(w))) AS t(i)),
         |pf AS (SELECT doc_id, w1, w2, count(*)::BIGINT AS pf
         |  FROM dp GROUP BY 1, 2, 3),
         |rp AS (SELECT w1, w2, count(*)::BIGINT AS c2 FROM dp
         |  WHERE doc_id < 20 GROUP BY 1, 2),
         |uc AS (SELECT u AS token, count(*)::BIGINT AS c1 FROM
         |    (SELECT unnest(w) AS u FROM tw WHERE doc_id < 20)
         |  GROUP BY 1),
         |nt AS (SELECT sum(c1)::BIGINT AS n_total FROM uc),
         |sc AS (SELECT pf.doc_id, pf.pf, rp.c2, u1.c1 AS c1w1, u2.c1 AS c1w2,
         |    nt.n_total
         |  FROM pf LEFT JOIN rp USING (w1, w2)
         |    LEFT JOIN uc u1 ON u1.token = pf.w1
         |    LEFT JOIN uc u2 ON u2.token = pf.w2
         |    CROSS JOIN nt),
         |agg AS (SELECT doc_id, sum(pf)::BIGINT AS n_bigrams,
         |    sum(CASE WHEN c2 IS NOT NULL THEN pf ELSE 0 END)::BIGINT
         |      AS hit_bigrams,
         |    sum(pf * (CASE
         |      WHEN c2 IS NOT NULL THEN floor(1048576.0 * c2 / c1w1)
         |      WHEN c1w2 IS NOT NULL
         |        THEN floor(1048576.0 * c1w2 / (2.0 * n_total))
         |      ELSE 0 END))::BIGINT AS score_fp
         |  FROM sc GROUP BY doc_id)
         |SELECT doc_id, n_bigrams, hit_bigrams, score_fp,
         |  (score_fp / (n_bigrams * 1048576.0)) AS mean_score
         |FROM agg ORDER BY doc_id""".stripMargin,

    "sample_pack_sequences" ->
      s"""WITH d AS (SELECT doc_id, source,
         |    len(string_split(text, ' '))::INT AS n_tok FROM documents),
         |x AS (SELECT doc_id, source, n_tok,
         |    sum(n_tok) OVER (PARTITION BY source
         |      ORDER BY ${Sql.unitHash("doc_id::VARCHAR")} ASC, doc_id ASC
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM d)
         |SELECT doc_id, source, n_tok, ((cum - n_tok) // 512)::BIGINT AS seq_no
         |FROM x ORDER BY doc_id""".stripMargin,

    "sample_pack_text" ->
      s"""WITH d AS (SELECT doc_id, source, text,
         |    len(string_split(text, ' '))::INT AS n_tok FROM documents),
         |x AS (SELECT doc_id, source, text, n_tok,
         |    sum(n_tok) OVER (PARTITION BY source
         |      ORDER BY ${Sql.unitHash("doc_id::VARCHAR")} ASC, doc_id ASC
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM d),
         |p AS (SELECT source, ((cum - n_tok) // 512)::BIGINT AS seq_no,
         |    doc_id, text, n_tok FROM x)
         |SELECT source, seq_no,
         |  string_agg(text, ' ' ORDER BY ${Sql.unitHash("doc_id::VARCHAR")} ASC,
         |    doc_id ASC) AS seq_text,
         |  count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS n_tokens
         |FROM p GROUP BY source, seq_no ORDER BY source, seq_no""".stripMargin,

    // mirrors TextStats.distinctiveTerms: occurrence counts (not doc
    // frequencies), min corpus count 5, HUGEINT-widened fixed-point lift,
    // rank by (lift desc, term)
    "text_distinctive_terms" ->
      """WITH tok AS (SELECT source,
        |    unnest(string_split(lower(text), ' ')) AS term
        |  FROM documents),
        |bg AS (SELECT source, term, count(*)::BIGINT AS c_gt FROM tok
        |  WHERE length(term) > 0 GROUP BY 1, 2),
        |bt AS (SELECT term, sum(c_gt)::BIGINT AS c_t FROM bg GROUP BY 1
        |  HAVING sum(c_gt) >= 5),
        |tg AS (SELECT source, sum(c_gt)::BIGINT AS t_g FROM bg GROUP BY 1),
        |ta AS (SELECT sum(t_g)::BIGINT AS t_all FROM tg),
        |sc AS (SELECT bg.source, bg.term, bg.c_gt, bt.c_t,
        |    ((bg.c_gt::HUGEINT * ta.t_all * 1000000) //
        |     (bt.c_t::HUGEINT * tg.t_g))::BIGINT AS lift_fp
        |  FROM bg JOIN bt USING (term) JOIN tg USING (source), ta)
        |SELECT source, rk, term, lift_fp, c_gt, c_t FROM (
        |  SELECT source, term, c_gt, c_t, lift_fp, row_number() OVER (
        |    PARTITION BY source ORDER BY lift_fp DESC, term)::INT AS rk
        |  FROM sc)
        |WHERE rk <= 5 ORDER BY source, rk""".stripMargin,

    "text_top_tokens" ->
      """WITH tok AS (SELECT lang,
        |    unnest(list_distinct(string_split(lower(text), ' '))) AS token
        |  FROM documents),
        |dfreq AS (SELECT lang, token, count(*)::BIGINT AS n_docs
        |  FROM tok GROUP BY 1, 2)
        |SELECT lang, token, n_docs, rk FROM (
        |  SELECT lang, token, n_docs, row_number() OVER (
        |    PARTITION BY lang ORDER BY n_docs DESC, token)::INT AS rk
        |  FROM dfreq)
        |WHERE rk <= 10 ORDER BY lang, rk""".stripMargin,

    "etl_profile" ->
      """SELECT 'lang' AS col_name,
        |  sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
        |  count(DISTINCT lang)::BIGINT AS n_distinct,
        |  min(length(lang))::INT AS min_len, max(length(lang))::INT AS max_len
        |FROM documents
        |UNION ALL
        |SELECT 'source',
        |  sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |  count(DISTINCT source)::BIGINT,
        |  min(length(source))::INT, max(length(source))::INT
        |FROM documents
        |UNION ALL
        |SELECT 'text',
        |  sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)::BIGINT,
        |  count(DISTINCT text)::BIGINT,
        |  min(length(text))::INT, max(length(text))::INT
        |FROM documents
        |ORDER BY col_name""".stripMargin,

    "text_fingerprint" ->
      s"""SELECT doc_id,
         |  md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS canon_fp,
         |  (CASE WHEN length(text) = 0 THEN 0 ELSE ${Sql.rollHash} END)::BIGINT AS roll_hash
         |FROM documents ORDER BY doc_id""".stripMargin,

    // chr(769)/chr(776)/chr(771) = combining acute/diaeresis/tilde; chr(233)
    // = the composed e-acute the strip must also flatten
    "text_strip_accents" ->
      """WITH x AS (SELECT doc_id,
        |    text || ' cafe' || chr(769) || ' no' || chr(776) || 'el n' ||
        |      chr(771) || ' U' || chr(776) || ' caf' || chr(233) || ' ' ||
        |      (doc_id % 7)::VARCHAR AS raw
        |  FROM documents)
        |SELECT doc_id, length(raw)::INT AS n_before,
        |  length(strip_accents(raw))::INT AS n_after,
        |  md5(strip_accents(raw)) AS fp
        |FROM x ORDER BY doc_id""".stripMargin,

    // chr(769)/chr(776) = the combining acute/diaeresis the Spark side
    // plants as Scala \u escapes; both engines then run Unicode NFC
    "text_normalize_nfc" ->
      """WITH x AS (SELECT doc_id,
        |    text || ' cafe' || chr(769) || ' no' || chr(776) || 'el ' ||
        |      (doc_id % 7)::VARCHAR AS raw
        |  FROM documents)
        |SELECT doc_id, length(raw)::INT AS n_before,
        |  length(nfc_normalize(raw))::INT AS n_after,
        |  md5(nfc_normalize(raw)) AS fp
        |FROM x ORDER BY doc_id""".stripMargin,

    "text_vocab_drift" ->
      """WITH ta AS (SELECT unnest(string_split(lower(text), ' ')) AS term
        |  FROM documents WHERE source IN ('src0', 'src1')),
        |tb AS (SELECT unnest(string_split(lower(text), ' ')) AS term
        |  FROM documents WHERE source NOT IN ('src0', 'src1')),
        |ca AS (SELECT term, count(*)::BIGINT AS occ_a FROM ta
        |  WHERE length(term) > 0 GROUP BY 1),
        |cb AS (SELECT term, count(*)::BIGINT AS occ_b FROM tb
        |  WHERE length(term) > 0 GROUP BY 1)
        |SELECT CASE WHEN ca.term IS NULL THEN 'new'
        |            WHEN cb.term IS NULL THEN 'dropped'
        |            ELSE 'common' END AS status,
        |  count(*)::BIGINT AS n_terms,
        |  sum(coalesce(occ_a, 0))::BIGINT AS occurrences_a,
        |  sum(coalesce(occ_b, 0))::BIGINT AS occurrences_b
        |FROM ca FULL OUTER JOIN cb ON ca.term = cb.term
        |GROUP BY 1 ORDER BY status""".stripMargin,

    "text_lm_score" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(string_split(lower(text), ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf
        |  FROM tok WHERE length(token) > 0 GROUP BY 1, 2),
        |cf AS (SELECT token, sum(tf)::BIGINT AS cf FROM tf GROUP BY 1)
        |SELECT tf.doc_id, sum(tf.tf)::BIGINT AS n_tokens,
        |  sum(tf.tf * cf.cf)::BIGINT AS freq_sum,
        |  (sum(tf.tf * cf.cf)::DOUBLE / sum(tf.tf)::DOUBLE) AS mean_token_freq
        |FROM tf JOIN cf USING (token)
        |GROUP BY 1 ORDER BY doc_id""".stripMargin,


    // mirrors TextStats.bigramBackoffScore exactly: 2^20 fixed point,
    // hit = c2/c1(w1), backoff = ½·c1(w2)/N, OOV = 0; every product is
    // < 2^53 so the double ops are exact and the floor is portable
    "text_lm_bigram" ->
      """WITH tw AS (SELECT doc_id, source,
        |    list_filter(string_split(lower(text), ' '), t -> len(t) > 0) AS w
        |  FROM documents),
        |dp AS (SELECT doc_id, source, w[i] AS w1, w[i + 1] AS w2
        |  FROM tw, unnest(range(1, len(w))) AS t(i)),
        |pf AS (SELECT doc_id, w1, w2, count(*)::BIGINT AS pf
        |  FROM dp GROUP BY 1, 2, 3),
        |rp AS (SELECT w1, w2, count(*)::BIGINT AS c2 FROM dp
        |  WHERE source IN ('src0', 'src1') GROUP BY 1, 2),
        |uc AS (SELECT u AS token, count(*)::BIGINT AS c1 FROM
        |    (SELECT unnest(w) AS u FROM tw WHERE source IN ('src0', 'src1'))
        |  GROUP BY 1),
        |nt AS (SELECT sum(c1)::BIGINT AS n_total FROM uc),
        |sc AS (SELECT pf.doc_id, pf.pf, rp.c2, u1.c1 AS c1w1, u2.c1 AS c1w2,
        |    nt.n_total
        |  FROM pf LEFT JOIN rp USING (w1, w2)
        |    LEFT JOIN uc u1 ON u1.token = pf.w1
        |    LEFT JOIN uc u2 ON u2.token = pf.w2
        |    CROSS JOIN nt),
        |agg AS (SELECT doc_id, sum(pf)::BIGINT AS n_bigrams,
        |    sum(CASE WHEN c2 IS NOT NULL THEN pf ELSE 0 END)::BIGINT
        |      AS hit_bigrams,
        |    sum(pf * (CASE
        |      WHEN c2 IS NOT NULL THEN floor(1048576.0 * c2 / c1w1)
        |      WHEN c1w2 IS NOT NULL
        |        THEN floor(1048576.0 * c1w2 / (2.0 * n_total))
        |      ELSE 0 END))::BIGINT AS score_fp
        |  FROM sc GROUP BY doc_id)
        |SELECT doc_id, n_bigrams, hit_bigrams, score_fp,
        |  (score_fp / (n_bigrams * 1048576.0)) AS mean_score
        |FROM agg ORDER BY doc_id""".stripMargin,


    // mirrors TextStats.trigramBackoffScore exactly: 2^20 fixed point,
    // hit = c3/c2(w1,w2), tail-bigram backoff = ½·c2(w2,w3)/c1(w2),
    // unigram backoff = ¼·c1(w3)/N, OOV = 0; every product < 2^53 so the
    // double ops are exact and the floor is portable
    "text_lm_trigram" ->
      """WITH tw AS (SELECT doc_id, source,
        |    list_filter(string_split(lower(text), ' '), t -> len(t) > 0) AS w
        |  FROM documents),
        |dt AS (SELECT doc_id, source, w[i] AS w1, w[i + 1] AS w2, w[i + 2] AS w3
        |  FROM tw, unnest(range(1, len(w) - 1)) AS t(i)),
        |tf AS (SELECT doc_id, w1, w2, w3, count(*)::BIGINT AS tf
        |  FROM dt GROUP BY 1, 2, 3, 4),
        |r3 AS (SELECT w1, w2, w3, count(*)::BIGINT AS c3 FROM dt
        |  WHERE source IN ('src0', 'src1') GROUP BY 1, 2, 3),
        |r2 AS (SELECT w1 AS b1, w2 AS b2, count(*)::BIGINT AS c2 FROM
        |    (SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
        |     FROM tw, unnest(range(1, len(w))) AS t(i)
        |     WHERE source IN ('src0', 'src1'))
        |  GROUP BY 1, 2),
        |uc AS (SELECT u AS token, count(*)::BIGINT AS c1 FROM
        |    (SELECT unnest(w) AS u FROM tw WHERE source IN ('src0', 'src1'))
        |  GROUP BY 1),
        |nt AS (SELECT sum(c1)::BIGINT AS n_total FROM uc),
        |sc AS (SELECT tf.doc_id, tf.tf, r3.c3, b12.c2 AS c2_12,
        |    b23.c2 AS c2_23, u2.c1 AS c1w2, u3.c1 AS c1w3, nt.n_total
        |  FROM tf LEFT JOIN r3 USING (w1, w2, w3)
        |    LEFT JOIN r2 b12 ON b12.b1 = tf.w1 AND b12.b2 = tf.w2
        |    LEFT JOIN r2 b23 ON b23.b1 = tf.w2 AND b23.b2 = tf.w3
        |    LEFT JOIN uc u2 ON u2.token = tf.w2
        |    LEFT JOIN uc u3 ON u3.token = tf.w3
        |    CROSS JOIN nt),
        |agg AS (SELECT doc_id, sum(tf)::BIGINT AS n_trigrams,
        |    sum(CASE WHEN c3 IS NOT NULL THEN tf ELSE 0 END)::BIGINT
        |      AS hit_trigrams,
        |    sum(CASE WHEN c3 IS NULL AND c2_23 IS NOT NULL THEN tf
        |      ELSE 0 END)::BIGINT AS hit_bigrams,
        |    sum(tf * (CASE
        |      WHEN c3 IS NOT NULL THEN floor(1048576.0 * c3 / c2_12)
        |      WHEN c2_23 IS NOT NULL
        |        THEN floor(1048576.0 * c2_23 / (2.0 * c1w2))
        |      WHEN c1w3 IS NOT NULL
        |        THEN floor(1048576.0 * c1w3 / (4.0 * n_total))
        |      ELSE 0 END))::BIGINT AS score_fp
        |  FROM sc GROUP BY doc_id)
        |SELECT doc_id, n_trigrams, hit_trigrams, hit_bigrams, score_fp,
        |  (score_fp / (n_trigrams * 1048576.0)) AS mean_score
        |FROM agg ORDER BY doc_id""".stripMargin,


    // interpolated KN restated stage by stage: the c3/c2 frames, the five
    // continuation-count aggregates OF those frames, the seven left joins,
    // and the fixed p1→p2→p3 IEEE tree with d = 0.75 — any drift in a
    // count, a coalesce, or the operation order hash-fails
    "text_lm_kn" ->
      """WITH tw AS (SELECT doc_id, source,
        |    list_filter(string_split(lower(text), ' '), t -> len(t) > 0) AS w
        |  FROM documents),
        |dt AS (SELECT doc_id, source, w[i] AS w1, w[i + 1] AS w2, w[i + 2] AS w3
        |  FROM tw, unnest(range(1, len(w) - 1)) AS t(i)),
        |tf AS (SELECT doc_id, w1, w2, w3, count(*)::BIGINT AS tf
        |  FROM dt GROUP BY 1, 2, 3, 4),
        |r3 AS (SELECT w1, w2, w3, count(*)::BIGINT AS c3 FROM dt
        |  WHERE source IN ('src0', 'src1') GROUP BY 1, 2, 3),
        |r2 AS (SELECT w1 AS b1, w2 AS b2, count(*)::BIGINT AS c2 FROM
        |    (SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
        |     FROM tw, unnest(range(1, len(w))) AS t(i)
        |     WHERE source IN ('src0', 'src1'))
        |  GROUP BY 1, 2),
        |k12 AS (SELECT w1, w2, count(*)::BIGINT AS n12dot FROM r3 GROUP BY 1, 2),
        |k23 AS (SELECT w2, w3, count(*)::BIGINT AS ndot23 FROM r3 GROUP BY 1, 2),
        |k2 AS (SELECT w2, count(*)::BIGINT AS ndot2dot FROM r3 GROUP BY 1),
        |g2 AS (SELECT b1 AS w2, count(*)::BIGINT AS n2dot FROM r2 GROUP BY 1),
        |g3 AS (SELECT b2 AS w3, count(*)::BIGINT AS ndot3 FROM r2 GROUP BY 1),
        |nb AS (SELECT count(*)::BIGINT AS n_bigrams FROM r2),
        |sc AS (SELECT tf.doc_id, tf.tf, r3.c3, b12.c2 AS c2_12, k12.n12dot,
        |    k23.ndot23, k2.ndot2dot, g2.n2dot, g3.ndot3, nb.n_bigrams
        |  FROM tf LEFT JOIN r3 USING (w1, w2, w3)
        |    LEFT JOIN r2 b12 ON b12.b1 = tf.w1 AND b12.b2 = tf.w2
        |    LEFT JOIN k12 ON k12.w1 = tf.w1 AND k12.w2 = tf.w2
        |    LEFT JOIN k23 ON k23.w2 = tf.w2 AND k23.w3 = tf.w3
        |    LEFT JOIN k2 ON k2.w2 = tf.w2
        |    LEFT JOIN g2 ON g2.w2 = tf.w2
        |    LEFT JOIN g3 ON g3.w3 = tf.w3
        |    CROSS JOIN nb),
        |pp AS (SELECT *, CASE WHEN n_bigrams > 0 THEN
        |      CAST(coalesce(ndot3, 0) AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
        |    ELSE 0.0 END AS p1
        |  FROM sc),
        |q2 AS (SELECT *, CASE WHEN ndot2dot IS NOT NULL THEN
        |      greatest(CAST(coalesce(ndot23, 0) AS DOUBLE) - 0.75, 0.0)
        |        / CAST(ndot2dot AS DOUBLE)
        |      + ((0.75 * CAST(coalesce(n2dot, 0) AS DOUBLE))
        |        / CAST(ndot2dot AS DOUBLE)) * p1
        |    ELSE p1 END AS p2 FROM pp),
        |q3 AS (SELECT *, CASE WHEN c2_12 IS NOT NULL THEN
        |      greatest(CAST(coalesce(c3, 0) AS DOUBLE) - 0.75, 0.0)
        |        / CAST(c2_12 AS DOUBLE)
        |      + ((0.75 * CAST(coalesce(n12dot, 0) AS DOUBLE))
        |        / CAST(c2_12 AS DOUBLE)) * p2
        |    ELSE p2 END AS p3 FROM q2),
        |agg AS (SELECT doc_id, sum(tf)::BIGINT AS n_trigrams,
        |    sum(CASE WHEN c3 IS NOT NULL THEN tf ELSE 0 END)::BIGINT
        |      AS hit_trigrams,
        |    sum(tf * floor(1048576.0 * p3))::BIGINT AS score_fp
        |  FROM q3 GROUP BY doc_id)
        |SELECT doc_id, n_trigrams, hit_trigrams, score_fp,
        |  (score_fp / (n_trigrams * 1048576.0)) AS mean_score
        |FROM agg ORDER BY doc_id""".stripMargin,
  )
}
