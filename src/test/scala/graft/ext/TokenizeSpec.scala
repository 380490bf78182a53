package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TokenizeSpec extends SparkSpec {
  import spark.implicits._

  private val han = (0x4E00 to 0x4E02).map(_.toChar).mkString   // 3 ideographs
  private val kana = (0x30A1 to 0x30A2).map(_.toChar).mkString  // 2 katakana
  private val thai = (0x0E01 to 0x0E02).map(_.toChar).mkString  // 2 thai
  private val hangul = 0xAC00.toChar.toString                   // 1 syllable

  test("ScriptAware: per-codepoint script tokens, latin still whitespace") {
    val text = s"Alpha beta$han gamma $kana$thai${hangul}delta"
    val got = Seq(text).toDF("t")
      .select(Tokenizer.ScriptAware.tokens(col("t"))).as[Seq[String]].head()
    val expected = Seq("alpha", "beta") ++ han.map(_.toString) ++
      Seq("gamma") ++ kana.map(_.toString) ++ thai.map(_.toString) ++
      Seq(hangul, "delta")
    assert(got === expected)
  }

  test("ScriptAware == Whitespace on single-spaced latin text; drops " +
      "empties where Whitespace keeps them") {
    val latin = "The quick brown Fox"
    val df = Seq(latin).toDF("t")
    val ws = df.select(Tokenizer.Whitespace.tokens(col("t"))).as[Seq[String]].head()
    val sa = df.select(Tokenizer.ScriptAware.tokens(col("t"))).as[Seq[String]].head()
    assert(ws === sa)
    val doubled = Seq("a  b").toDF("t")
    assert(doubled.select(Tokenizer.Whitespace.tokens(col("t")))
      .as[Seq[String]].head() === Seq("a", "", "b"))
    assert(doubled.select(Tokenizer.ScriptAware.tokens(col("t")))
      .as[Seq[String]].head() === Seq("a", "b"))
  }

  test("whitespace degeneracy on CJK vs the script-aware fix: minhashStore " +
      "emits no signature for a glued CJK doc under Whitespace, a full row " +
      "under ScriptAware; default params stay byte-identical") {
    val cjkDoc = Seq((1L, han + kana + thai)).toDF("doc_id", "text")
    // glued CJK = ONE whitespace token < shingleLen → no signature row
    assert(Dedup.minhashStore(cjkDoc, "doc_id", "text").count() === 0)
    // per-codepoint tokens (7) ≥ shingleLen → signature present
    val sa = Dedup.minhashStore(cjkDoc, "doc_id", "text",
      tok = Tokenizer.ScriptAware)
    assert(sa.count() === 1)
    assert(sa.select(size(col("sig"))).as[Int].head() === 16)
    // the seam default IS the historical path: same rows, same signatures
    val docs = Seq((1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta")).toDF("doc_id", "text")
    val legacy = Dedup.minhashStore(docs, "doc_id", "text")
      .as[(Long, Seq[Long])].collect().toMap
    val seam = Dedup.minhashStore(docs, "doc_id", "text",
        tok = Tokenizer.Whitespace)
      .as[(Long, Seq[Long])].collect().toMap
    assert(legacy === seam)
    val p1 = Dedup.nearDuplicates(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    val p2 = Dedup.nearDuplicates(docs, "doc_id", "text",
        tok = Tokenizer.Whitespace)
      .as[(Long, Long, Double)].collect().toSet
    assert(p1 === p2)
  }

  test("ScriptAware minhash finds the CJK near-dup Whitespace cannot see") {
    // two docs: identical 12-ideograph body, one trailing ideograph differs
    val body = (0 until 12).map(k => (0x4E00 + k).toChar).mkString
    val docs = Seq((1L, body + 0x4E20.toChar),
      (2L, body + 0x4E21.toChar)).toDF("doc_id", "text")
    val ws = Dedup.nearDuplicates(docs, "doc_id", "text", numHashes = 8)
    assert(ws.count() === 0) // one whitespace token each, differing → nothing
    val sa = Dedup.nearDuplicates(docs, "doc_id", "text", numHashes = 8,
      tok = Tokenizer.ScriptAware)
    val got = sa.as[(Long, Long, Double)].collect()
    assert(got.length === 1)
    assert(got.head._1 === 1L && got.head._2 === 2L)
    assert(got.head._3 > 0.5) // J = 10/12 over 3-shingles
  }

  test("streamingNearDedup honors the tokenizer: the pre-filter and the " +
      "default signature both run the script-aware law") {
    import graft.streaming.EventTimeOps
    val body = (0 until 12).map(k => (0x4E00 + k).toChar).mkString
    val docs = Seq((1L, body + 0x4E20.toChar),
      (2L, body + 0x4E21.toChar)).toDF("doc_id", "text")
    // whitespace: each doc is ONE token — dropped by the pre-filter
    assert(EventTimeOps.streamingNearDedup(docs, "doc_id", "text",
      numHashes = 12).count() === 0)
    // script-aware: per-codepoint shingles, 11/13 agreement expected high
    val got = EventTimeOps.streamingNearDedup(docs, "doc_id", "text",
        numHashes = 12, threshold = 0.5, tok = Tokenizer.ScriptAware)
      .dropDuplicates("a_id", "b_id") // one candidate per shared bucket
      .collect()
    assert(got.length === 1)
    assert(got.head.a_id === 1L && got.head.b_id === 2L)
  }

  test("the served-store probe family is tokenizer-consistent: a " +
      "script-aware store probed script-aware finds the CJK incremental " +
      "near-dup end to end") {
    val body = (0 until 12).map(k => (0x4E00 + k).toChar).mkString
    val store = Seq((1L, body + 0x4E20.toChar)).toDF("doc_id", "text")
    val batch = Seq((2L, body + 0x4E21.toChar)).toDF("doc_id", "text")
    val sa = Tokenizer.ScriptAware
    // flat store probe
    val flat = Dedup.nearDupAgainstStore(
      Dedup.minhashStore(store, "doc_id", "text", tok = sa),
      batch, "doc_id", "text", tok = sa)
    assert(flat.count() === 1)
    // banded build → append → probe, all script-aware
    val served = Dedup.minhashStoreBanded(store, "doc_id", "text",
      cap = 4, tok = sa)
    val delta = Dedup.minhashStoreBandedAppend(served,
      Seq((3L, "unrelated latin words entirely")).toDF("doc_id", "text"),
      "doc_id", "text", cap = 4, tok = sa)
    val probed = Dedup.nearDupAgainstBandedStore(served.unionByName(delta),
        batch, "doc_id", "text", tok = sa)
      .as[(Long, Long, Int, Double)].collect()
    assert(probed.length === 1 && probed.head._2 === 1L)
    // the whitespace default still sees nothing (one glued token per doc)
    assert(Dedup.nearDupAgainstStore(
      Dedup.minhashStore(store, "doc_id", "text"),
      batch, "doc_id", "text").count() === 0)
  }

  test("chunkWordsTok: case-preserving script-aware windows; decontaminate " +
      "catches the CJK probe overlap whitespace cannot") {
    // chunking: 12 ideographs + 2 latin words → window 5 / stride 5 gives
    // ceil(14/5) = 3 chunks with the original case preserved
    val body = (0 until 12).map(k => (0x4E00 + k).toChar).mkString
    val doc = Seq((1L, s"Alpha $body End")).toDF("doc_id", "text")
    val ws = TextStats.chunkWords(doc, "doc_id", "text", window = 5, stride = 5)
    assert(ws.count() === 1) // 3 whitespace tokens: one undersized window
    val sa = TextStats.chunkWordsTok(doc, "doc_id", "text", window = 5,
      stride = 5, tok = Tokenizer.ScriptAware)
    val chunks = sa.orderBy("chunk_no")
      .select("chunk_text").as[String].collect()
    assert(chunks.length === 3)
    assert(chunks.head.startsWith("Alpha ")) // case preserved
    assert(chunks.flatMap(_.split(" ")).mkString("") === s"Alpha$body" + "End")
    // decontamination: an 8-ideograph probe excerpt shares every 4-gram
    // with the doc under script-aware grams; whitespace sees zero overlap
    val probe = Seq(Tuple1(body.substring(2, 10))).toDF("text")
    assert(Decontaminate.contaminatedDocs(doc, "doc_id", "text", probe,
      "text", n = 4).count() === 0)
    val hits = Decontaminate.contaminatedDocs(doc, "doc_id", "text", probe,
      "text", n = 4, tok = Tokenizer.ScriptAware)
    assert(hits.count() === 1)
    assert(Decontaminate.decontaminate(doc, "doc_id", "text", probe, "text",
      n = 4, tok = Tokenizer.ScriptAware).count() === 0) // doc dropped
  }

  test("repetitionStats under ScriptAware: native kernel == explode twin; " +
      "whitespace is blind to intra-run repetition") {
    // four repeats of a 2-ideograph phrase glued together: whitespace sees
    // ONE token (no bigram at all), script-aware sees the repeated bigram
    val phrase = han.take(2)
    val doc = Seq((1L, phrase * 4)).toDF("doc_id", "text")
    assert(TextStats.repetitionStats(doc, "doc_id", "text", n = 2).count() === 0)
    val sa = TextStats.repetitionStats(doc, "doc_id", "text", n = 2,
        tok = Tokenizer.ScriptAware)
      .as[(Long, Long, Long, Double)].head()
    assert(sa._3 === 7)      // 8 codepoints → 7 bigrams
    assert(sa._2 === 4)      // the repeated (h1,h0) ... top bigram count
    // native one-pass kernel == the portable explode twin, same tokenizer
    val docs = Seq((1L, phrase * 4), (2L, s"x y $phrase$phrase y x"))
      .toDF("doc_id", "text")
    val native = TextStats.repetitionStats(docs, "doc_id", "text", 2,
      Tokenizer.ScriptAware).as[(Long, Long, Long, Double)].collect().toSet
    val explode = TextStats.repetitionStatsViaExplode(docs, "doc_id", "text",
      2, Tokenizer.ScriptAware).as[(Long, Long, Long, Double)].collect().toSet
    assert(native === explode)
  }

  test("bigramBackoffScore under ScriptAware: script-run bigrams score; " +
      "whitespace emits no row for a glued CJK doc") {
    val doc = Seq((1L, han + kana)).toDF("doc_id", "text")
    // whitespace: one token → no bigram → no row
    assert(TextStats.bigramBackoffScore(doc, "doc_id", "text",
      maxBroadcast = Long.MaxValue).count() === 0)
    // script-aware, self-reference: every bigram is a hit, score = FP each
    val r = TextStats.bigramBackoffScore(doc, "doc_id", "text",
        maxBroadcast = Long.MaxValue, tok = Tokenizer.ScriptAware)
      .select("n_bigrams", "hit_bigrams").as[(Long, Long)].head()
    assert(r._1 === 4 && r._2 === 4) // 5 codepoints → 4 bigrams, all seen
  }

  test("bm25TopK with ScriptAware matches single-ideograph queries") {
    val docs = Seq(
      (1L, "intro words " + han),            // contains the han run
      (2L, "other content entirely here"),
      (3L, han.take(1) + " standalone")      // first ideograph only
    ).toDF("doc_id", "text")
    val q = Seq((0L, han(0).toString)).toDF("query_id", "token")
    val hits = Retrieval.bm25TopK(docs, "doc_id", "text", q, k = 5,
        tok = Tokenizer.ScriptAware)
      .select("doc_id").as[Long].collect().toSet
    assert(hits === Set(1L, 3L))
    // whitespace tokenization: the glued ideograph never matches
    assert(Retrieval.bm25TopK(docs, "doc_id", "text", q, k = 5).count() === 1)
  }

  // a tiny Thai lexicon: water, rice, eat, person, Thailand/country/Thai
  // (the compound ⊃ constituents pair that distinguishes maximal munch)
  private val nam = "น้ำ"                       // น้ำ water
  private val khao = "ข้าว"                // ข้าว rice
  private val kin = "กิน"                       // กิน eat
  private val khon = "คน"                            // คน person
  private val prathet = "ประเทศ" // ประเทศ
  private val thaiW = "ไทย"                     // ไทย
  private val prathetThai = prathet + thaiW                    // ประเทศไทย

  test("Dictionary: maximal munch — longest lexicon word wins at each " +
      "position, compounds beat their constituents") {
    val dict = Tokenizer.Dictionary(
      Seq(nam, khao, kin, khon, prathet, thaiW, prathetThai))
    def toksOf(s: String): Seq[String] =
      Seq(s).toDF("t").select(dict.tokens(col("t"))).as[Seq[String]].head()
    // คนกินข้าว (person eats rice), no spaces → three words
    assert(toksOf(khon + kin + khao) === Seq(khon, kin, khao))
    // the compound is in the lexicon: longest-first beats ประเทศ+ไทย
    assert(toksOf(prathetThai) === Seq(prathetThai))
    // without the compound entry, the constituents segment
    val noCompound = Tokenizer.Dictionary(Seq(prathet, thaiW))
    assert(Seq(prathetThai).toDF("t")
      .select(noCompound.tokens(col("t"))).as[Seq[String]].head()
      === Seq(prathet, thaiW))
  }

  test("Dictionary: out-of-lexicon runs degrade per-codepoint; latin " +
      "still splits on spaces; case folds") {
    val dict = Tokenizer.Dictionary(Seq(nam, kin))
    val unknown = "งจ" // two codepoints no lexicon word covers
    val got = Seq(s"Rice Bowl $kin$unknown$nam end").toDF("t")
      .select(dict.tokens(col("t"))).as[Seq[String]].head()
    assert(got === Seq("rice", "bowl", kin, "ง", "จ", nam, "end"))
  }

  test("Dictionary: id is lexicon-content-derived (order-insensitive via " +
      "the canonical sort) and fromId refuses it loudly") {
    val a = Tokenizer.Dictionary(Seq(nam, kin))
    val b = Tokenizer.Dictionary(Seq(kin, nam))
    val c = Tokenizer.Dictionary(Seq(nam, kin, khon))
    assert(a.id === b.id)
    assert(a.id !== c.id)
    assert(a.id.startsWith("dict-"))
    val e = intercept[RuntimeException](Tokenizer.fromId(a.id))
    assert(e.getMessage.contains("Dictionary"))
  }

  test("Dictionary rejects words outside the unsegmented-script class " +
      "(they would need regex escaping, which RE2 lacks portably)") {
    val e = intercept[IllegalArgumentException] {
      Tokenizer.Dictionary(Seq("latin"))
    }
    assert(e.getMessage.contains("unsegmented-script"))
    intercept[IllegalArgumentException](Tokenizer.Dictionary(Seq("")))
    intercept[IllegalArgumentException](Tokenizer.Dictionary(Seq.empty))
  }
}
