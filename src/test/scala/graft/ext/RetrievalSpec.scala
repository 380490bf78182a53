package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "spark shuffle join"),
    (2L, "spark spark window"),
    (3L, "window window window join"),
    (4L, "csv parquet")).toDF("doc_id", "text")

  /** Independent reimplementation of the fixed-point score for one
    * (doc, query) — plain Scala doubles in the operator's documented op
    * order. */
  private def scoreFp(terms: Seq[String], docId: Long): Long = {
    val docs = Map(
      1L -> Seq("spark", "shuffle", "join"),
      2L -> Seq("spark", "spark", "window"),
      3L -> Seq("window", "window", "window", "join"),
      4L -> Seq("csv", "parquet"))
    val n = docs.size.toDouble
    val avgdl = docs.values.map(_.size).sum.toDouble / docs.size.toDouble
    val dfm = docs.values.flatMap(_.distinct).groupBy(identity).view.mapValues(_.size).toMap
    terms.flatMap { t =>
      val tf = docs(docId).count(_ == t)
      if (tf == 0 || !dfm.contains(t)) None
      else {
        val df = dfm(t).toDouble
        val idf = (n - df + 0.5) / (df + 0.5)
        val tfn = (tf * (1.2 + 1.0)) /
          (tf + 1.2 * (0.25 + 0.75 * (docs(docId).size / avgdl)))
        Some(math.floor(idf * tfn * 1048576.0).toLong)
      }
    }.sum
  }

  test("bm25TopK matches an independent fixed-point reimplementation") {
    val q = Seq((0L, "spark"), (0L, "window")).toDF("query_id", "token")
    val got = Retrieval.bm25TopK(corpus, "doc_id", "text", q, k = 10)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getLong(3)))
    val expected = Seq(1L, 2L, 3L)
      .map(d => (d, scoreFp(Seq("spark", "window"), d)))
      .sortBy { case (d, s) => (-s, d) }
      .zipWithIndex.map { case ((d, s), i) => (d, i + 1, s) }
    assert(got.toSeq === expected)
    // doc 4 shares no term: absent, not zero-scored
    assert(!got.exists(_._1 == 4L))
  }

  test("bm25TopK tie-break and k bound") {
    // two docs with identical token multisets score identically ⇒ doc id
    // breaks the tie; k=1 keeps only the lower id
    val twins = Seq((7L, "a b"), (5L, "a b"), (9L, "c")).toDF("doc_id", "text")
    val q = Seq((0L, "a")).toDF("query_id", "token")
    val r = Retrieval.bm25TopK(twins, "doc_id", "text", q, k = 1).collect()
    assert(r.length === 1 && r.head.getLong(1) === 5L)
  }

  test("maxDf drops stopword-class terms from candidate generation") {
    val q = Seq((0L, "window"), (0L, "join")).toDF("query_id", "token")
    // "window" df=2, "join" df=2; cap at 1 ⇒ no candidates at all
    val r = Retrieval.bm25TopK(corpus, "doc_id", "text", q, k = 10,
      maxDf = Some(1L))
    assert(r.count() === 0)
    // cap at 2 keeps both
    val r2 = Retrieval.bm25TopK(corpus, "doc_id", "text", q, k = 10,
      maxDf = Some(2L))
    assert(r2.count() === 3)
  }

  test("rrfFuse matches an independent integer reimplementation") {
    // list A: docs 10,20,30 at ranks 1..3; list B: 20,10,40
    val a = Seq((0L, 10L, 1), (0L, 20L, 2), (0L, 30L, 3))
      .toDF("query_id", "id", "rank")
    val b = Seq((0L, 20L, 1), (0L, 10L, 2), (0L, 40L, 3))
      .toDF("query_id", "id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), k = 10)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getLong(3)))
    def c(rank: Int): Long = 1048576L / (60L + rank)
    val expected = Map(
        10L -> (c(1) + c(2)), 20L -> (c(2) + c(1)),
        30L -> c(3), 40L -> c(3))
      .toSeq.sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, s), i) => (id, i + 1, s) }
    assert(got.toSeq === expected)
    // 10 and 20 tie exactly (same contributions, opposite order): id asc
    assert(got(0)._1 === 10L && got(1)._1 === 20L
      && got(0)._3 === got(1)._3)
    // 30 and 40 tie at rank-3-only: id asc again
    assert(got(2)._1 === 30L && got(3)._1 === 40L)
  }

  test("rrfFuse: fusing a list with itself doubles scores, keeps order") {
    val a = Seq((0L, 5L, 1), (0L, 7L, 2), (1L, 9L, 1))
      .toDF("query_id", "id", "rank")
    val once = Retrieval.rrfFuse(Seq(a), k = 10)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    val twice = Retrieval.rrfFuse(Seq(a, a), k = 10)
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(once.map(t => (t._1, t._2, t._3)).toSeq
      === twice.map(t => (t._1, t._2, t._3)).toSeq)
    assert(twice.map(_._4).toSeq === once.map(_._4 * 2).toSeq)
  }

  test("rrfFuse k bound and absent-list candidates") {
    val a = Seq((0L, 1L, 1), (0L, 2L, 2), (0L, 3L, 3))
      .toDF("query_id", "id", "rank")
    val b = Seq((0L, 2L, 1)).toDF("query_id", "id", "rank")
    // doc 2 in both lists outranks doc 1 (rank-1 once) despite a's order
    val r = Retrieval.rrfFuse(Seq(a, b), k = 2).orderBy("rank").collect()
    assert(r.length === 2)
    assert(r.map(_.getLong(1)).toSeq === Seq(2L, 1L))
  }

  test("logIdf variant ranks rare-term docs above stopword-heavy ones too") {
    val q = Seq((0L, "shuffle"), (0L, "window")).toDF("query_id", "token")
    val r = Retrieval.bm25TopK(corpus, "doc_id", "text", q, k = 10,
      logIdf = true).orderBy("rank").collect()
    // "shuffle" (df=1, rare) outweighs "window" under either idf: doc 1 first
    assert(r.head.getLong(1) === 1L)
    assert(r.forall(_.getLong(3) >= 0L))
  }
}
