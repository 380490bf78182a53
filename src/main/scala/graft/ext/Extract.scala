package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MAIN-CONTENT extraction — the boilerplate-removal step between crawl
  * fetch and quality filtering that every production curation pipeline
  * carries (C4, RefinedWeb, Gopher all run one): tag stripping alone
  * ([[TextStats.stripMarkup]]) keeps navigation bars, footers, and
  * link-farm chrome, which then poison dedup (every page of a site shares
  * its nav text) and quality scoring (chrome inflates stopword and symbol
  * ratios).
  *
  * The heuristic is the public block-classification family (Boilerpipe,
  * Kohlschütter et al. WSDM 2010; JusText, Pomikálek 2011) reduced to its
  * two strongest, ENGINE-PORTABLE signals:
  *
  *  - documents split into BLOCKS at block-level tag boundaries
  *    (`p`, `div`, `h1..h6`, `li`, `table` rows/cells, semantic HTML5
  *    containers, `br`);
  *  - a block survives iff it has at least `minWords` words of visible
  *    text AND its LINK DENSITY is at most 1/3 — compared in exact integer
  *    arithmetic (3·link_chars ≤ chars), so the decision restates
  *    bit-identically in any engine. Boilerplate is short and link-heavy
  *    (nav: all links; footer: copyright + link row); body prose is long
  *    and link-sparse — the two thresholds separate them cleanly.
  *
  * Everything is a zero-shuffle projection over array higher-order
  * functions (split / filter / transform / aggregate): per-row work is
  * linear in the document, nothing leaves the partition, and the whole
  * operator pipelines inside whole-stage codegen at any corpus size.
  * Entity decoding is deliberately NOT done here — compose with
  * [[TextStats.stripMarkup]] downstream, which owns the pinned decode
  * order. */
object Extract {

  /** Block-level boundary tags: structural + semantic HTML5 + `br`.
    * Inline markup (`a`, `b`, `i`, `span`, `em`, …) stays INSIDE a block —
    * that is what makes link density computable per block. */
  private val BlockTag: String =
    "(?i)</?(?:p|div|h[1-6]|li|ul|ol|br|table|tr|td|th|section|article|" +
      "header|footer|nav|aside|blockquote|html|body|head|title)" +
      "(?:\\s[^>]*)?/?>"

  /** Anchor element with its text (group 1); lazy body, first `</a>`
    * closes. Case-insensitive like the tag split, and DOTALL — real HTML
    * wraps anchor text across lines, and without (?s) a multi-line anchor
    * contributes ZERO link chars, letting link-heavy boilerplate pass the
    * density gate. (?s) has the same semantics in Java regex and RE2, so
    * the oracle twins carry it verbatim. */
  private val AnchorRe: String = "(?is)<a(?:\\s[^>]*)?>(.*?)</a>"

  /** Visible text of a fragment: tags → space, whitespace collapsed,
    * trimmed. Exact on both engines (same regex class semantics). */
  private def plainOf(b: Column): Column =
    trim(regexp_replace(regexp_replace(b, "(?i)<[^>]*>", " "), "\\s+", " "))

  private def nWordsOf(plain: Column): Column =
    when(plain === "", lit(0)).otherwise(size(split(plain, " ")))

  /** Total visible characters inside anchors of a block — the link-density
    * numerator. Strict left fold with an integer seed: exact. */
  private def linkCharsOf(b: Column): Column =
    aggregate(
      transform(regexp_extract_all(b, lit(AnchorRe), lit(1)),
        t => length(plainOf(t))),
      lit(0), (acc, x) => acc + x)

  /** The survival rule: ≥ `minWords` visible words AND link density
    * ≤ 1/3, tested as 3·link_chars ≤ chars (integer-exact). */
  private def keepRule(b: Column, minWords: Int): Column = {
    val plain = plainOf(b)
    (nWordsOf(plain) >= minWords) &&
      (lit(3) * linkCharsOf(b) <= length(plain))
  }

  /** Per-block diagnostic frame: (id, block_no, block_text, n_chars,
    * n_words, link_chars, keep) — one row per block in document order.
    * The explode is the only row multiplication; still no shuffle. */
  def mainContentBlocks(df: DataFrame, idCol: String, htmlCol: String,
                        minWords: Int = 5): DataFrame = {
    require(minWords >= 1, s"minWords must be positive: $minWords")
    df.select(col(idCol),
        posexplode(split(col(htmlCol), BlockTag)).as(Seq("block_no", "raw")))
      .select(col(idCol), col("block_no"),
        plainOf(col("raw")).as("block_text"),
        length(plainOf(col("raw"))).as("n_chars"),
        nWordsOf(plainOf(col("raw"))).as("n_words"),
        linkCharsOf(col("raw")).as("link_chars"),
        keepRule(col("raw"), minWords).as("keep"))
  }

  /** [[extractMain]]'s extracted text as a single COLUMN over an html
    * expression — for pipelines that replace a text column IN PLACE
    * (keeping every other column) instead of joining the extraction frame
    * back by id: surviving blocks' visible text joined with newlines, in
    * document order. */
  def mainTextOf(html: Column, minWords: Int = 5): Column =
    textOfKeptBlocks(keptBlocksOf(html, minWords))

  /** The raw blocks of `html` surviving the keep rule, in document order —
    * the shared sub-expression of [[mainTextOf]] and [[keptBlockCount]].
    * Callers that need BOTH the survival filter and the extracted text
    * should project THIS array once (behind a Generate barrier if a filter
    * sits between — Catalyst's predicate pushdown clones a projected alias
    * into the filter, and codegen subexpression elimination does not span
    * the filter/project boundary, so a naive filter-then-project runs the
    * regex-heavy keep rule twice per page) and derive both from it. */
  def keptBlocksOf(html: Column, minWords: Int = 5): Column = {
    require(minWords >= 1, s"minWords must be positive: $minWords")
    filter(split(html, BlockTag), b => keepRule(b, minWords))
  }

  /** Visible text of a pre-computed [[keptBlocksOf]] array, joined with
    * newlines — the derivation half of the evaluate-once pattern above. */
  def textOfKeptBlocks(kept: Column): Column =
    array_join(transform(kept, plainOf(_)), "\n")

  /** Number of blocks the survival rule keeps — the companion of
    * [[mainTextOf]] (a page with zero kept blocks is all chrome and is
    * usually dropped, not carried as an empty string). */
  def keptBlockCount(html: Column, minWords: Int = 5): Column =
    size(keptBlocksOf(html, minWords))

  /** Document-level extraction: (id, main_text, n_blocks_kept,
    * n_blocks_total) — surviving blocks' visible text joined with
    * newlines, in document order. Pure projection, zero shuffle. */
  def extractMain(df: DataFrame, idCol: String, htmlCol: String,
                  minWords: Int = 5): DataFrame = {
    require(minWords >= 1, s"minWords must be positive: $minWords")
    df.select(col(idCol),
      mainTextOf(col(htmlCol), minWords).as("main_text"),
      keptBlockCount(col(htmlCol), minWords).as("n_blocks_kept"),
      size(split(col(htmlCol), BlockTag)).as("n_blocks_total"))
  }

  /** SITE-TEMPLATE removal — the CROSS-PAGE half of boilerplate
    * extraction ([[extractMain]] is the per-page half): a block whose
    * exact visible text recurs on at least `templatePages` distinct pages
    * of the SAME host is site chrome (sidebar, promo box, cookie banner)
    * no per-page heuristic can catch — it is long enough and link-sparse
    * enough to pass the word/density rule on every page it infects. The
    * production-pipeline precedent is RefinedWeb/CCNet's
    * repeated-paragraph pruning, keyed by site.
    *
    * Rule (integer-exact, engine-portable): per (host, block-text) count
    * DISTINCT pages; a block survives iff it passes [[extractMain]]'s
    * per-page rule AND its (host, text) page count < `templatePages`.
    * Output: (id, main_text, n_blocks_kept, n_blocks_dropped_template) —
    * one row per page with at least one rule-passing block (a page whose
    * every block is per-page chrome contributes no row, exactly like a
    * page [[extractMain]] empties).
    *
    * Scale shape: one explode to block rows; the page count is an EXACT
    * distinct-(host, text, id) aggregation keyed on (host, text) —
    * map-side partial distinct, then counts joined back on the same key
    * (the count frame is one row per distinct block text, far smaller
    * than the block rows). Hosts never concentrate: every exchange key
    * includes the block TEXT, so even a giant host spreads across its
    * distinct blocks. Reassembly groups by page, block order restored by
    * sorting the page's own (position, text) structs — bounded by the
    * page's block count. */
  def dropTemplates(df: DataFrame, idCol: String, hostCol: String,
                    htmlCol: String, minWords: Int = 5,
                    templatePages: Int = 3): DataFrame = {
    require(minWords >= 1 && templatePages >= 2,
      s"bad params: $minWords/$templatePages")
    val blocks = df.select(col(idCol).as("_id"), col(hostCol).as("_host"),
        posexplode(split(col(htmlCol), BlockTag)).as(Seq("_bno", "_raw")))
      .where(keepRule(col("_raw"), minWords))
      .select(col("_id"), col("_host"), col("_bno"),
        plainOf(col("_raw")).as("_text"))
    val pageCounts = blocks.select(col("_host"), col("_text"), col("_id"))
      .distinct()
      .groupBy(col("_host"), col("_text"))
      .agg(count(lit(1)).as("_pages"))
    val kept = blocks.join(pageCounts, Seq("_host", "_text"))
      .withColumn("_tpl", col("_pages") >= templatePages)
    kept.groupBy(col("_id"))
      .agg(
        array_join(transform(array_sort(collect_list(
            when(!col("_tpl"), struct(col("_bno"), col("_text"))))),
          s => s.getField("_text")), "\n").as("main_text"),
        count(when(!col("_tpl"), lit(1))).as("n_blocks_kept"),
        count(when(col("_tpl"), lit(1))).as("n_blocks_dropped_template"))
      .select(col("_id").as(idCol), col("main_text"),
        col("n_blocks_kept").cast("int").as("n_blocks_kept"),
        col("n_blocks_dropped_template").cast("int")
          .as("n_blocks_dropped_template"))
  }
}
