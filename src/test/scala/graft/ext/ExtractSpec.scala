package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExtractSpec extends SparkSpec {
  import spark.implicits._

  private val page =
    "<html><body>" +
      "<div class=\"nav\"><a href=\"/\">Home</a> <a href=\"/x\">About us</a></div>" +
      "<h1>Tiny title</h1>" +
      "<p>this paragraph carries the actual body prose of the page</p>" +
      "<p>Read more</p>" +
      "<div>Copyright 2017 <a href=\"/t\">Terms of service</a> " +
      "<a href=\"/p\">Privacy policy</a></div>" +
      "</body></html>"

  test("extractMain: body prose survives, nav/heading/stub/footer drop") {
    val got = Extract.extractMain(
        Seq((1L, page)).toDF("doc_id", "html"), "doc_id", "html")
      .as[(Long, String, Int, Int)].head()
    assert(got._2 ===
      "this paragraph carries the actual body prose of the page")
    assert(got._3 === 1) // exactly one surviving block
    assert(got._4 > 1)   // out of many
  }

  test("mainContentBlocks: per-block metrics are integer-exact, " +
      "boundaries behave (word gate inclusive, density at exactly 1/3 kept)") {
    val rows = Extract.mainContentBlocks(
        Seq((1L, page)).toDF("doc_id", "html"), "doc_id", "html")
      .where(col("block_text") =!= "")
      .select("block_text", "n_chars", "n_words", "link_chars", "keep")
      .as[(String, Int, Int, Int, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // nav: every visible char inside anchors → density 1, and < 5 words
    val nav = rows("Home About us")
    assert(nav._4 === "HomeAbout us".length && !nav._5)
    // footer: 7 words ≥ 5 (alive past the word gate) but 3·30 > 46
    val foot = rows("Copyright 2017 Terms of service Privacy policy")
    assert(foot._3 === 7 && foot._4 === 30 && foot._2 === 46 && !foot._5)
    // body: no links, ≥ 5 words → kept
    assert(rows("this paragraph carries the actual body prose of the page")._5)
    // stub: 2 words → dropped
    assert(!rows("Read more")._5)

    // boundary law: exactly minWords words passes (inclusive); link
    // density of exactly 1/3 passes (3·lc ≤ chars), one char past fails
    val edge = Seq(
      (1L, "<p>one two three four five</p>"),                  // 5 words, 0 links
      (2L, "<p><a href=\"/\">abcd</a> padpadpad</p>"),         // lc=4, chars=14 wait
      (3L, "<p><a href=\"/\">abcde</a> w x y z padab</p>")
    ).toDF("doc_id", "html")
    val e1 = Extract.mainContentBlocks(edge, "doc_id", "html")
      .where(col("n_words") >= 1)
      .select("doc_id", "n_chars", "n_words", "link_chars", "keep")
      .as[(Long, Int, Int, Int, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(e1(1L)._5, "exactly minWords words must pass (inclusive gate)")
    // doc 3: plain = "abcde w x y z padab" → 19 chars, 6 words, lc=5 →
    // 3·5 = 15 ≤ 19 → kept (density below 1/3)
    assert(e1(3L)._2 === 19 && e1(3L)._4 === 5 && e1(3L)._5)
  }

  test("mainContentBlocks: anchors wrapping across newlines still count " +
      "as link chars (DOTALL regression)") {
    // real HTML wraps anchor text; without (?s) this nav contributed ZERO
    // link chars and survived the density gate as main content
    val wrapped = "<div><a href=\"/\">\n  Home page link\n</a> " +
      "<a href=\"/y\">\n  About the site\n</a></div>" +
      "<p>this paragraph carries the actual body prose of the page</p>"
    val rows = Extract.mainContentBlocks(
        Seq((1L, wrapped)).toDF("doc_id", "html"), "doc_id", "html")
      .where(col("block_text") =!= "")
      .select("block_text", "link_chars", "keep")
      .as[(String, Int, Boolean)].collect().map(r => r._1 -> r).toMap
    val nav = rows("Home page link About the site")
    assert(nav._2 > 0, "multi-line anchor text must count as link chars")
    assert(!nav._3, "the pure-link nav must not be kept")
    assert(rows("this paragraph carries the actual body prose of the page")._3)
  }

  test("extractMain: exact density boundary — 3·link_chars == chars keeps, " +
      "+1 link char drops") {
    // plain = "abcdef ww x y zz" → 16 chars... construct exact: links 'abcdef'
    // (6), rest 'ww x y zz' → total chars 6+1+9 = 16? build precisely:
    // plain = "aaaaaa bb cc dd ee" = 18 chars, lc = 6 → 3·6 = 18 == 18 → keep
    val keep = Seq((1L, "<p><a href=\"/\">aaaaaa</a> bb cc dd ee</p>"))
      .toDF("doc_id", "html")
    val k = Extract.extractMain(keep, "doc_id", "html")
      .select("n_blocks_kept").as[Int].head()
    assert(k === 1, "density of exactly 1/3 must be kept (<= rule)")
    // one more link char: lc = 7, chars 19 → 21 > 19 → dropped
    val drop = Seq((1L, "<p><a href=\"/\">aaaaaaa</a> bb cc dd ee</p>"))
      .toDF("doc_id", "html")
    val d = Extract.extractMain(drop, "doc_id", "html")
      .select("n_blocks_kept").as[Int].head()
    assert(d === 0, "density past 1/3 must drop")
  }

  test("dropTemplates: host-frequency rule — chrome dies at >= 3 pages, " +
      "survives at 2, hosts isolated, order preserved") {
    val sidebar = "<div>visit our site map and partner portal today</div>"
    def page(id: Long, host: String, body: String) =
      (id, host, s"$sidebar<p>$body</p>")
    val docs = Seq(
      page(1L, "a", "unique body one with plenty of words inside"),
      page(2L, "a", "unique body two with plenty of words inside"),
      page(3L, "a", "unique body three with plenty of words inside"),
      page(4L, "b", "unique body four with plenty of words inside"),
      page(5L, "b", "unique body five with plenty of words inside")
    ).toDF("doc_id", "host", "html")
    val got = Extract.dropTemplates(docs, "doc_id", "host", "html",
        minWords = 5, templatePages = 3)
      .orderBy("doc_id")
      .as[(Long, String, Int, Int)].collect()
    // host a (3 pages): sidebar is a template — dropped everywhere
    got.filter(_._1 <= 3).foreach { r =>
      assert(r._3 === 1 && r._4 === 1, r.toString)
      assert(!r._2.contains("site map"), r.toString)
    }
    // host b (2 pages): the SAME text sits under the threshold — kept,
    // and in document order (sidebar precedes the body)
    got.filter(_._1 >= 4).foreach { r =>
      assert(r._3 === 2 && r._4 === 0, r.toString)
      assert(r._2.startsWith("visit our site map"), r.toString)
    }
    assert(got.find(_._1 == 1).get._2 ===
      "unique body one with plenty of words inside")
  }

  test("curation extraction stage evaluates the keep rule ONCE per page") {
    import graft.ext.{CacheScope, Curation}
    val body = (0 until 40).map(i => s"word$i").mkString(" ")
    val docs = Seq((1L, s"<p>$body</p><div>x</div>")).toDF("doc_id", "text")
    val scope = new CacheScope
    try {
      val out = Curation.curate(docs, "doc_id", "text",
        Curation.Config(extractMinWords = Some(5)), scope)
      // The regex-heavy block split + keep rule (anchor-extraction
      // aggregate per RAW block, chrome included) must appear exactly ONCE
      // per plan branch: the Generate barrier in Curation.stages stops
      // predicate pushdown from cloning it into the filter above (which
      // would double the per-page extraction CPU — codegen CSE does not
      // span the filter/project boundary). The exact-dedup stage's
      // semi-join legitimately re-evaluates the extraction on its
      // aggregate branch, so the whole-plan count is 2 — one per branch;
      // the pre-barrier shape was 2 per branch (4 total). Counting the
      // distinctive head of the BlockTag pattern is plan-shape, not
      // result-shape — a pushdown regression doubles it again.
      val plan = out.queryExecution.optimizedPlan.toString
      val hits = "\\(\\?i\\)</\\?\\(\\?:p\\|div".r.findAllIn(plan).length
      assert(hits === 2, s"block-split evaluated $hits times:\n$plan")
      assert(out.count() === 1)
    } finally scope.close()
  }

  test("extractMain feeds the gate pipeline: catalog row end-to-end") {
    val r = graft.ExtQueries.all("curation_extract_main")(
      spark, "/root/testdata/sf0.001")
    val n = r.count()
    assert(n === 500)
    // the planted chrome never leaks into the extracted text
    assert(r.where(col("main_text").contains("Copyright") ||
      col("main_text").contains("Home") ||
      col("main_text").contains("Read more")).count() === 0)
    // exactly the body paragraph survives for every doc (min 10 words)
    assert(r.where(col("n_blocks_kept") =!= 1).count() === 0)
  }
}
