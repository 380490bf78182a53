package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.{AsofJoin, BloomJoin, Curation, Decontaminate, Dedup, Dsir, Funnel, Graph, Layout, Multimodal, RangeJoin, Resample, Sampling, Similarity, SkewJoin, Sketches, TextStats, Urls}
import graft.streaming.EventTimeOps

/** Extension-operator catalog (SURVEY §2.8 + coverage breadth): dedup,
  * similarity search, text analysis, multimodal plumbing, streaming-window
  * shape, CSV round-trip, and SQL-surface breadth queries — each with a
  * DuckDB oracle that reproduces the Spark result bit-for-bit.
  *
  * Cross-engine portability rules on top of [[Queries]]' rules:
  *  - hashes are md5-derived (md5 is engine-independent); minhash minimizes
  *    the md5 *string* so no integer overflow semantics are involved;
  *  - float vector math happens in double after an exact float→double cast,
  *    as a strict left fold in index order (fp addition isn't associative —
  *    identical order ⟹ identical bits);
  *  - ratio metrics are single divisions of exact integers;
  *  - rolling hashes are mod 1e9+7 so every intermediate fits well under
  *    2^63 in any engine.
  */
object ExtQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Queries.table(spark, dir, name)

  /** Scratch dirs for write/read-back queries: one per-process parent
    * (UUID-suffixed, so concurrent harness runs over the same sf dir can
    * never overwrite each other's files mid-read) holding a subdir per
    * (prefix, dataset path — sanitized, not hashed: abs(hashCode) keeps
    * Int.MinValue negative and distinct paths can collide). The parent is
    * deleted by a JVM shutdown hook — the read-back frames are lazy, so
    * deletion can only happen after every consuming action is done, and
    * repeated runs leave nothing behind in the tmp dir. */
  private lazy val scratchRoot: String = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_scratch_" +
      java.util.UUID.randomUUID().toString.take(8)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def del(f: java.io.File): Unit = {
        val children = f.listFiles()
        if (children != null) children.foreach(del)
        f.delete(): Unit
      }
      del(new java.io.File(root))
    }))
    root
  }
  private def scratchDir(prefix: String, datasetDir: String): String =
    s"$scratchRoot/${prefix}_${datasetDir.replaceAll("[^A-Za-z0-9]", "_")}"

  /** Deterministic per-document URL for the two URL rows: five construction
    * branches (doc_id mod 5) over the `source` column, chosen so every
    * canonicalization rule is exercised — mixed-case scheme and host,
    * userinfo, explicit default port (dropped by canon) and non-default
    * port (kept), empty path (canon "/"), trailing-dot host, a multi-label
    * public suffix (co.uk), query string, fragment. All five hosts are
    * DISTINCT per source, so host ↔ (source, branch) is bijective — the
    * property curation_host_rank's integer host id relies on. */
  private def synthUrl: Column = {
    val s = col("source")
    val id = col("doc_id").cast("string")
    val m = col("doc_id") % 5
    when(m === 0, concat(lit("https://WWW."), s, lit(".Example.CO.UK:443/wiki/"),
        id, lit("?q=spark&lang=en#Top")))
      .when(m === 1, concat(lit("http://u:p@api."), upper(s),
        lit(".example.com:8080/a/b/c")))
      .when(m === 2, concat(lit("https://cdn."), s, lit(".example.com/assets/"),
        id, lit(".js?v=2&x=")))
      .when(m === 3, concat(lit("HTTP://"), s, lit(".example.com:80")))
      .otherwise(concat(lit("ftp://files."), s, lit(".example.org./pub/"),
        id, lit("#readme")))
  }

  /** Pinned PQ codebook for sim_topk_pq_fixed: m=16 subspaces × ksub=8
    * codewords × dsub=4 dims over the 64-dim embeddings, every value from
    * one integer formula, divided by 8 (a power of two, so each codeword
    * coordinate is an EXACT double both engines reconstruct bit-for-bit). */
  private lazy val pinnedCodebook: Seq[Seq[Seq[Double]]] =
    (0 until 16).map(sub => (0 until 8).map(code =>
      (0 until 4).map(pos =>
        (((sub * 31 + code * 7 + pos * 3) % 11) - 5) / 8.0).toSeq).toSeq)

  /** Pinned BPE merge table for text_bpe_encode (rank = Seq position) —
    * letter pairs that actually fire on the corpus, with two-stage chains
    * (t+h→th, th+e→the; a+n→an, an+d→and) so rank precedence and merged-
    * symbol re-merging are both exercised. 8 rounds is at-or-beyond
    * convergence for every chain here, so the fixed budget equals fixpoint. */
  private val bpeMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n",
    "e" -> "r", "o" -> "n", "an" -> "d", "e" -> "d")
  private val bpeRounds = 8

  /** Benford expected-share table ×10⁶, pre-rounded ONCE here and embedded
    * as the same literals on both engine sides. */
  private val benfordP: Seq[(Int, Long)] =
    (1 to 9).map(d => (d, Math.round(1e6 * Math.log10(1.0 + 1.0 / d))))

  /** One unrolled BPE merge round for the DuckDB oracle, over the
    * "(sym)(sym)…" wrapped-symbol encoding: the CASE picks the LOWEST-RANK
    * pair present (first match in table order), and `replace`'s
    * non-overlapping left-to-right scan — continuing AFTER each replacement
    * — is exactly the kernel's scan-skip merge ("(a)(a)(a)" → "(aa)(a)").
    * The wrapping makes matches exact: a letter-only pattern "(a)(b)" can
    * only match at a symbol boundary, because multi-char symbols are
    * letter-only concatenations and paren CHARS in text wrap to "(()"/"())"
    * which contain no letters. */
  private def bpeRoundSql(prev: String): String =
    bpeMerges.map { case (a, b) =>
      s"WHEN contains($prev, '($a)($b)') THEN replace($prev, '($a)($b)', '($a$b)')"
    }.mkString("CASE ", " ", s" ELSE $prev END")

  /** Unrolled DuckDB restatement of TextStats.perceptronTrain(dim=64): the
    * feature space is E9g's (unigrams + `_`-bigrams, md5 bucket), one fx
    * row per feature OCCURRENCE so Σy over joined rows equals Σ y·count.
    * Each epoch chains off the previous epoch's weight CTE. */
  private def perceptronChain(epochs: Int, trainWhere: String,
                              dim: Int): String = {
    val rounds = (1 to epochs).map { e =>
      val pw = s"w${e - 1}"
      s"""d$e AS (SELECT fx.doc_id, fx.y, sum(w.wt)::BIGINT AS dot
         |  FROM fx JOIN $pw w USING (b) GROUP BY fx.doc_id, fx.y),
         |m$e AS (SELECT doc_id FROM d$e
         |  WHERE (CASE WHEN dot >= 0 THEN 1 ELSE -1 END) <> y),
         |g$e AS (SELECT fx.b, sum(fx.y)::BIGINT AS delta
         |  FROM fx JOIN m$e USING (doc_id) GROUP BY fx.b),
         |w$e AS (SELECT $pw.b, ($pw.wt + coalesce(g$e.delta, 0))::BIGINT AS wt
         |  FROM $pw LEFT JOIN g$e USING (b))""".stripMargin
    }.mkString(",\n")
    s"""t0 AS (SELECT doc_id, y,
       |    list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
       |  FROM corpus$trainWhere),
       |f0 AS (SELECT doc_id, y, list_concat(toks,
       |    CASE WHEN len(toks) >= 2
       |      THEN list_transform(range(1, len(toks)), i -> toks[i] || '_' || toks[i + 1])
       |      ELSE []::VARCHAR[] END) AS feats FROM t0),
       |fx AS (SELECT doc_id, y,
       |    ('0x' || substr(md5(f || 'qc'), 1, 8))::BIGINT % $dim AS b
       |  FROM (SELECT doc_id, y, unnest(feats) AS f FROM f0)),
       |w0 AS (SELECT unnest(range(0, $dim))::BIGINT AS b, 0::BIGINT AS wt),
       |$rounds""".stripMargin
  }

  private def perceptronTrainOracle(epochs: Int): String =
    s"""WITH corpus AS (SELECT doc_id,
       |    (CASE WHEN lang = 'en' THEN 1 ELSE -1 END)::BIGINT AS y, text
       |  FROM documents),
       |${perceptronChain(epochs, "", dim = 64)}
       |SELECT b::INT AS bucket, wt AS w FROM w$epochs ORDER BY bucket""".stripMargin

  /** The e2e corpus: a PLANTED noisy class signal — marker token matches
    * the ±1 label for 85% of docs (the 15% flip set is a keyed hash of
    * doc_id), so held-out accuracy ≈ the planted signal strength and the
    * row demonstrates GENERALIZATION, not memorization. Label (doc_id%4<2)
    * is balanced within each parity half, so the even/odd split stratifies. */
  private val perceptronE2eCorpus: String =
    s"""corpus AS (SELECT doc_id,
       |    (CASE WHEN doc_id % 4 < 2 THEN 1 ELSE -1 END)::BIGINT AS y,
       |    text || repeat(' ' || (CASE WHEN (doc_id % 4 < 2) <>
       |        ((doc_id * 1103515245 + 12345) % 100 < 15)
       |      THEN 'qpos' ELSE 'qneg' END), 8) AS text
       |  FROM documents)""".stripMargin

  /** Train on even doc_ids, score the odd held-out half against the final
    * weight CTE. The LEFT JOIN keeps zero-feature docs (dot coalesces to 0,
    * matching the Spark fold over an empty bucket array). */
  private def perceptronE2eOracle(epochs: Int): String =
    s"""WITH $perceptronE2eCorpus,
       |${perceptronChain(epochs, " WHERE doc_id % 2 = 0", dim = 128)},
       |wavg AS (SELECT b, sum(wt)::BIGINT AS wt FROM (
       |  ${(1 to epochs).map(e => s"SELECT b, wt FROM w$e").mkString(" UNION ALL ")}
       |  ) GROUP BY b),
       |odd AS (SELECT doc_id, y,
       |    list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
       |  FROM corpus WHERE doc_id % 2 = 1),
       |of0 AS (SELECT doc_id, y, list_concat(toks,
       |    CASE WHEN len(toks) >= 2
       |      THEN list_transform(range(1, len(toks)), i -> toks[i] || '_' || toks[i + 1])
       |      ELSE []::VARCHAR[] END) AS feats FROM odd),
       |ofx AS (SELECT doc_id,
       |    ('0x' || substr(md5(f || 'qc'), 1, 8))::BIGINT % 128 AS b
       |  FROM (SELECT doc_id, unnest(feats) AS f FROM of0)),
       |dots AS (SELECT ofx.doc_id, sum(w.wt)::BIGINT AS dot
       |  FROM ofx JOIN wavg w USING (b) GROUP BY ofx.doc_id),
       |sc AS (SELECT odd.doc_id, coalesce(dots.dot, 0)::BIGINT AS score_fp, odd.y
       |  FROM odd LEFT JOIN dots USING (doc_id))
       |SELECT doc_id, score_fp,
       |  (CASE WHEN score_fp >= 0 THEN 1 ELSE -1 END)::INT AS pred,
       |  (CASE WHEN (CASE WHEN score_fp >= 0 THEN 1 ELSE -1 END) = y
       |     THEN 1 ELSE 0 END)::INT AS correct
       |FROM sc ORDER BY doc_id""".stripMargin

  /** Shared CTE program for the hierarchical-ANN oracles: the md5-geometric
    * level law, the three nested layer node sets with their kNN graphs
    * (k=5, bits=6 multi-probe candidate rule — the sim_topk_graph build
    * restated per layer), and the full beam descent (all top-layer nodes →
    * 1 hop per upper layer → 2 hops in the base). `f0_2` is the final base
    * beam both consumers rank. */
  private lazy val hnswOracleCtes: String = {
    val h = "('0x' || substr(md5(vec_id::VARCHAR || 'hnsw'), 1, 15))::BIGINT"
    def layer(nl: String, gl: String, whereLvl: String): String =
      s"""$nl AS (SELECT vec_id, v, nm, bucket FROM lv$whereLvl),
         |pr_$nl AS (SELECT vec_id, v, nm,
         |  unnest(list_concat([bucket],
         |    list_transform(range(0, 6), i -> xor(bucket, 1::BIGINT << i)))) AS pbucket
         |  FROM $nl),
         |gc_$nl AS (SELECT a.vec_id AS id, b.vec_id AS nbr_id,
         |  ${Sql.dot("a.v", "b.v")} / (a.nm * b.nm) AS score
         |  FROM pr_$nl a JOIN $nl b ON a.pbucket = b.bucket AND a.vec_id <> b.vec_id),
         |$gl AS (SELECT id, nbr_id FROM (
         |  SELECT id, nbr_id, row_number() OVER (
         |    PARTITION BY id ORDER BY score DESC, nbr_id ASC) AS rk FROM gc_$nl)
         |  WHERE rk <= 5)""".stripMargin
    Seq(
      s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |  (${Sql.signBucket6})::BIGINT AS bucket FROM embeddings),
         |n AS (SELECT vec_id, v, bucket, sqrt(${Sql.dot("v", "v")}) AS nm FROM e),
         |lv AS (SELECT vec_id, v, nm, bucket,
         |  (CASE WHEN $h % 64 = 0 THEN 2 WHEN $h % 8 = 0 THEN 1 ELSE 0 END) AS lvl
         |  FROM n),
         |q AS (SELECT vec_id AS query_id, v AS qv, nm AS qnm FROM n WHERE vec_id < 5)""".stripMargin,
      layer("n2", "g2", " WHERE lvl >= 2"),
      layer("n1", "g1", " WHERE lvl >= 1"),
      layer("n0", "g0", ""),
      "e2 AS (SELECT q.query_id, c.vec_id AS id FROM q CROSS JOIN n2 c)",
      beamRankCte("f2_0", "e2", "n2", 16),
      beamExpandCte("c2_1", "f2_0", "g2"),
      beamRankCte("f2_1", "c2_1", "n2", 16),
      beamRankCte("f1_0", "f2_1", "n1", 16),
      beamExpandCte("c1_1", "f1_0", "g1"),
      beamRankCte("f1_1", "c1_1", "n1", 16),
      beamRankCte("f0_0", "f1_1", "n0", 16),
      beamExpandCte("c0_1", "f0_0", "g0"),
      beamRankCte("f0_1", "c0_1", "n0", 16),
      beamExpandCte("c0_2", "f0_1", "g0"),
      beamRankCte("f0_2", "c0_2", "n0", 16)
    ).mkString(",\n")
  }

  /** One beam re-rank: keep the top-`width` of candidate set `cands`
    * (query_id, id) scored against layer node set `nl`, self excluded —
    * the beamOf step of Similarity's beam loop. */
  private def beamRankCte(out: String, cands: String, nl: String,
                          width: Int): String =
    s"""$out AS (SELECT query_id, id FROM (
       |  SELECT cd.query_id, cd.id, row_number() OVER (
       |    PARTITION BY cd.query_id
       |    ORDER BY ${Sql.dot("q.qv", "c.v")} / (q.qnm * c.nm) DESC, cd.id) AS rk
       |  FROM $cands cd JOIN q ON q.query_id = cd.query_id
       |  JOIN $nl c ON c.vec_id = cd.id
       |  WHERE cd.id <> cd.query_id) WHERE rk <= $width)""".stripMargin

  /** One hop expansion: beam ∪ beam-neighbors along `g`, distinct. */
  private def beamExpandCte(out: String, beam: String, g: String): String =
    s"""$out AS (SELECT DISTINCT query_id, id FROM (
       |  SELECT query_id, id FROM $beam
       |  UNION ALL
       |  SELECT b.query_id, g.nbr_id AS id FROM $beam b JOIN $g g ON b.id = g.id))""".stripMargin

  /** Unrolled DuckDB restatement of the ONE-VS-ALL trained language ID
    * (TextStats.perceptronTrainOvA + argmax inference): three independent
    * per-class epoch chains over one shared hashed-feature CTE (`fxe`),
    * averaged snapshots per class, held-out odd-half scoring, first-wins
    * argmax — every per-doc score, the prediction, and correctness on the
    * hash. */
  private def langidTrainedOracle(epochs: Int, dim: Int): String = {
    def chain(k: Int): String = {
      val rounds = (1 to epochs).map { e =>
        val pw = s"w${k}_${e - 1}"
        s"""d${k}_$e AS (SELECT fx.doc_id, y.y, sum(w.wt)::BIGINT AS dot
           |  FROM fxe fx JOIN y$k y USING (doc_id) JOIN $pw w USING (b)
           |  GROUP BY fx.doc_id, y.y),
           |m${k}_$e AS (SELECT doc_id FROM d${k}_$e
           |  WHERE (CASE WHEN dot >= 0 THEN 1 ELSE -1 END) <> y),
           |g${k}_$e AS (SELECT fx.b, sum(y.y)::BIGINT AS delta
           |  FROM fxe fx JOIN y$k y USING (doc_id) JOIN m${k}_$e USING (doc_id)
           |  GROUP BY fx.b),
           |w${k}_$e AS (SELECT p.b, (p.wt + coalesce(g.delta, 0))::BIGINT AS wt
           |  FROM $pw p LEFT JOIN g${k}_$e g USING (b))""".stripMargin
      }.mkString(",\n")
      s"""y$k AS (SELECT doc_id, (CASE WHEN c = $k THEN 1 ELSE -1 END)::BIGINT AS y
         |  FROM corpus WHERE doc_id % 2 = 0),
         |w${k}_0 AS (SELECT unnest(range(0, $dim))::BIGINT AS b, 0::BIGINT AS wt),
         |$rounds,
         |wa$k AS (SELECT b, sum(wt)::BIGINT AS wt FROM (
         |  ${(1 to epochs).map(e => s"SELECT b, wt FROM w${k}_$e").mkString(" UNION ALL ")}
         |  ) GROUP BY b),
         |dt$k AS (SELECT ofx.doc_id, sum(w.wt)::BIGINT AS dot
         |  FROM ofx JOIN wa$k w USING (b) GROUP BY ofx.doc_id)""".stripMargin
    }
    val feats =
      """list_concat(toks, CASE WHEN len(toks) >= 2
        |      THEN list_transform(range(1, len(toks)), i -> toks[i] || '_' || toks[i + 1])
        |      ELSE []::VARCHAR[] END)""".stripMargin
    s"""WITH corpus AS (SELECT doc_id, doc_id % 3 AS c,
       |    text || repeat(' ' || (CASE ((doc_id % 3 +
       |        CASE WHEN (doc_id * 1103515245 + 12345) % 100 < 15 THEN 1 ELSE 0 END) % 3)
       |      WHEN 0 THEN 'lza' WHEN 1 THEN 'lzb' ELSE 'lzc' END), 8) AS text
       |  FROM documents),
       |t0e AS (SELECT doc_id,
       |    list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
       |  FROM corpus WHERE doc_id % 2 = 0),
       |f0e AS (SELECT doc_id, $feats AS feats FROM t0e),
       |fxe AS (SELECT doc_id,
       |    ('0x' || substr(md5(f || 'qc'), 1, 8))::BIGINT % $dim AS b
       |  FROM (SELECT doc_id, unnest(feats) AS f FROM f0e)),
       |odd AS (SELECT doc_id, c,
       |    list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
       |  FROM corpus WHERE doc_id % 2 = 1),
       |of0 AS (SELECT doc_id, $feats AS feats FROM odd),
       |ofx AS (SELECT doc_id,
       |    ('0x' || substr(md5(f || 'qc'), 1, 8))::BIGINT % $dim AS b
       |  FROM (SELECT doc_id, unnest(feats) AS f FROM of0)),
       |${(0 until 3).map(chain).mkString(",\n")},
       |sc AS (SELECT odd.doc_id, odd.c,
       |    coalesce(dt0.dot, 0)::BIGINT AS s0, coalesce(dt1.dot, 0)::BIGINT AS s1,
       |    coalesce(dt2.dot, 0)::BIGINT AS s2
       |  FROM odd LEFT JOIN dt0 USING (doc_id) LEFT JOIN dt1 USING (doc_id)
       |    LEFT JOIN dt2 USING (doc_id))
       |SELECT doc_id, s0, s1, s2,
       |  (CASE WHEN s0 >= s1 AND s0 >= s2 THEN 0
       |    WHEN s1 >= s2 THEN 1 ELSE 2 END)::BIGINT AS pred,
       |  (CASE WHEN (CASE WHEN s0 >= s1 AND s0 >= s2 THEN 0
       |    WHEN s1 >= s2 THEN 1 ELSE 2 END) = c THEN 1 ELSE 0 END)::INT AS correct
       |FROM sc ORDER BY doc_id""".stripMargin
  }

  /** Unrolled DuckDB restatement of TextStats.bpeTrainMerges: per round r,
    * p_r = weighted adjacent-pair counts over the wrapped-symbol state,
    * b_r = the argmax under the (count DESC, a, b) tie-break, s_r = the
    * chosen merge applied via `replace`'s non-overlapping left-to-right
    * scan (= the fold's scan-skip). The state chain s0→s8 makes every
    * round's selection depend on every earlier round's application. */
  /** The alphanumeric-only corpus filter shared by the BPE train rows: it
    * guarantees every symbol — single chars AND learned concatenations —
    * is paren-free, which is what makes the wrapped-symbol "(a)(b)" string
    * patterns provably exact even for DYNAMIC (learned) pairs. */
  // \z-anchored (not $): Java regex '$' matches before a trailing newline
  // while RE2's does not — \z means absolute end-of-text in BOTH engines,
  // so a future newline-bearing fixture can't silently diverge the gates.
  private val bpeCorpusRe = "^[a-z0-9 ]*\\z"

  /** The training CTE chain (wf → s0 → p/b/s per round): b$r holds round
    * r's learned (a, b, c). Callers append their own final SELECT. */
  private def bpeTrainChain(nMerges: Int): String = {
    val rounds = (1 to nMerges).map { r =>
      val prev = s"s${r - 1}"
      s"""p$r AS (SELECT pr.a AS a, pr.b AS b, sum(cnt)::BIGINT AS c FROM (
         |  SELECT unnest(list_transform(range(1, len(tl)),
         |    i -> {'a': tl[i], 'b': tl[i+1]})) AS pr, cnt
         |  FROM (SELECT string_split(substr(s, 2, length(s) - 2), ')(') AS tl,
         |        cnt FROM $prev)) GROUP BY pr.a, pr.b),
         |b$r AS (SELECT a, b, c FROM p$r ORDER BY c DESC, a, b LIMIT 1),
         |s$r AS (SELECT replace(s, '(' || a || ')(' || b || ')',
         |  '(' || a || b || ')') AS s, cnt FROM $prev CROSS JOIN b$r)""".stripMargin
    }.mkString(",\n")
    s"""wf AS (SELECT w, count(*)::BIGINT AS cnt FROM (
       |    SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS w
       |    FROM documents WHERE regexp_matches(text, '$bpeCorpusRe')) GROUP BY w),
       |s0 AS (SELECT regexp_replace(w, '(.)', '(\\1)', 'g') AS s, cnt FROM wf),
       |$rounds""".stripMargin
  }

  private def bpeTrainOracle(nMerges: Int): String = {
    val out = (1 to nMerges)
      .map(r => s"SELECT $r AS rank, a, b, c AS pair_count FROM b$r")
      .mkString("\nUNION ALL ")
    s"""WITH ${bpeTrainChain(nMerges)}
       |$out
       |ORDER BY rank""".stripMargin
  }

  /** Train (8 merges) then ENCODE docs < 40 with the LEARNED table: each
    * encode round's lowest-rank-present CASE cross-joins the single-row
    * b1..b8 CTEs, so the patterns are dynamic — the round-10 tokenizer
    * loop closed inside one restatable query. 12 rounds ≥ fixpoint for any
    * table because no corpus word exceeds 13 chars (a word of length L
    * converges in ≤ L−1 rounds). */
  /** Shared train-chain + learned-pair encode CTEs ending at `toks`
    * (doc_id, word_ord, token-list). */
  private def bpeEncodeChain(nMerges: Int, encRounds: Int,
                             docWhere: String): String = {
    val ms = (1 to nMerges).map(r => s"b$r m$r").mkString(", ")
    def dynCase(prev: String): String =
      (1 to nMerges).map { r =>
        val pat = s"'(' || m$r.a || ')(' || m$r.b || ')'"
        val rep = s"'(' || m$r.a || m$r.b || ')'"
        s"WHEN contains($prev, $pat) THEN replace($prev, $pat, $rep)"
      }.mkString("CASE ", " ", s" ELSE $prev END")
    val encChain = (1 to encRounds).map { r =>
      val from = if (r == 1) "e0" else s"e${r - 1}"
      s"e$r AS (SELECT doc_id, word_ord, ${dynCase("s")} AS s FROM $from, $ms)"
    }.mkString(",\n")
    s"""${bpeTrainChain(nMerges)},
       |enc AS (SELECT doc_id,
       |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS wl
       |  FROM documents WHERE $docWhere AND regexp_matches(text, '$bpeCorpusRe')),
       |ew AS (SELECT doc_id, unnest(range(1, len(wl)+1)) AS word_ord,
       |  unnest(wl) AS w FROM enc),
       |e0 AS (SELECT doc_id, word_ord,
       |  regexp_replace(w, '(.)', '(\\1)', 'g') AS s FROM ew),
       |$encChain,
       |toks AS (SELECT doc_id, word_ord,
       |  string_split(substr(s, 2, length(s) - 2), ')(') AS tl FROM e$encRounds)""".stripMargin
  }

  private def bpeE2eOracle(nMerges: Int, encRounds: Int): String =
    s"""WITH ${bpeEncodeChain(nMerges, encRounds, "doc_id < 40")},
       |ex AS (SELECT doc_id, word_ord, unnest(range(1, len(tl)+1)) AS tok_ord,
       |  unnest(tl) AS token FROM toks)
       |SELECT doc_id, (row_number() OVER (PARTITION BY doc_id
       |    ORDER BY word_ord, tok_ord) - 1)::INT AS pos, token
       |FROM ex ORDER BY doc_id, pos""".stripMargin

  /** chars-per-token ratio under the learned table: char counts join the
    * per-doc token counts (empty-token docs keep ratio 0). */
  private def bpeRatioOracle(nMerges: Int, encRounds: Int): String =
    s"""WITH ${bpeEncodeChain(nMerges, encRounds, "doc_id < 200")},
       |tc AS (SELECT doc_id, sum(len(tl))::INT AS n_tokens FROM toks GROUP BY doc_id),
       |cc AS (SELECT doc_id,
       |    length(replace(lower(text), ' ', ''))::INT AS n_chars
       |  FROM documents WHERE doc_id < 200 AND regexp_matches(text, '$bpeCorpusRe'))
       |SELECT cc.doc_id, n_chars, coalesce(n_tokens, 0)::INT AS n_tokens,
       |  (CASE WHEN coalesce(n_tokens, 0) = 0 THEN 0
       |   ELSE (n_chars * 1000) // n_tokens END)::BIGINT AS ratio_fp
       |FROM cc LEFT JOIN tc USING (doc_id) ORDER BY doc_id""".stripMargin

  /** Header checksum: sum of the first 16 character codes (= payload bytes
    * for ASCII payloads). NULL for empty text — matching DuckDB's
    * list_sum([]) = NULL (and dodging Spark's descending sequence(1,0)). */
  private def headerSum(c: Column): Column =
    when(length(c) === 0, lit(null).cast("long"))
      .otherwise(aggregate(sequence(lit(1), least(length(c), lit(16))), lit(0L),
        (a, i) => a + ascii(substr(c, i, lit(1)))))

  private val langClasses: Seq[(String, Seq[String])] = Seq(
    "tabular" -> Seq("table", "row", "column", "scan"),
    "streaming" -> Seq("stream", "batch", "window", "state"),
    "relational" -> Seq("join", "merge", "hash", "shuffle"))

  private val stopwords = Seq("data", "table", "row", "value")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ───────────────────────── deduplication (§2.8) ───────────────────────
    // Exact dedup: one hash-aggregate on the normalization fingerprint.
    "dedup_exact" -> ((s, d) => {
      Dedup.exactGroups(t(s, d, "documents"), "doc_id", "text")
        .orderBy("fingerprint")
    }),

    // Span-level exact dedup: tile into 16-token spans, keep the first
    // corpus-wide occurrence of each distinct span, reassemble survivors.
    "dedup_spans" -> ((s, d) => {
      Dedup.dedupSpans(t(s, d, "documents"), "doc_id", "text", window = 16)
        .orderBy("doc_id")
    }),

    // TRUE substring dedup at ARBITRARY offsets (Lee et al. 2021) via
    // distributed prefix-doubling suffix ranks: every 16-char window that
    // repeats anywhere in the corpus — any doc, any offset, any phase —
    // yields a merged duplicated span for each non-first occurrence. The
    // fixture is CONSTRUCTED (ids from the documents table, text from
    // integer formulas both engines restate): a shared 24-char motif
    // planted at a per-doc arbitrary offset inside quadratic-residue
    // filler, so the duplicate alignment differs doc to doc — exactly what
    // the tile/anchor stand-ins cannot see below their period. The oracle
    // brute-forces every window of the same constructed text.
    "dedup_substring_sa" -> ((s, d) => {
      val did = col("doc_id")
      def seg(n: Column, f: Column => Column): Column =
        array_join(transform(sequence(lit(0), n.cast("int") - 1),
          j => chr(f(j) % 26 + 97)), "")
      val motifStr = (0 until 24).map(j => ('a' + (5 * j + 2) % 26).toChar).mkString
      val docs = t(s, d, "documents").select(col("doc_id")).where(did < 26)
        .select(did, concat(
          seg(lit(8) + (did * 3) % 11, j => did * 7 + j * j),
          lit(motifStr),
          seg(lit(10) + (did * 5) % 9, j => did * 7 + (j + 40) * (j + 40)))
          .as("text"))
      Dedup.substringDupSpans(docs, "doc_id", "text", minLen = 16)
        .orderBy("doc_id", "span_start")
    }),

    // Shingle-anchored span dedup: spans cut at content-defined boundaries
    // (portable token hash ≡ 0 mod 8), so a duplicated passage aligns to
    // the same spans at ANY document offset — the phase-robust variant of
    // dedup_spans (fixed tiles miss phase-shifted duplicates).
    "dedup_spans_anchored" -> ((s, d) => {
      Dedup.dedupSpansAnchored(t(s, d, "documents"), "doc_id", "text",
          anchorMod = 8)
        .orderBy("doc_id")
    }),

    // The PRODUCTION anchored-span path: codegen'd xxhash64 anchors instead
    // of the portable md5 token hash (~10× cheaper per token). Cut positions
    // differ from the md5 form and DuckDB has no xxhash64, so no external
    // oracle can restate the spans — rows-only by design (like
    // dedup_minhash_fast's band hashes); ExtSpec pins the phase-robustness
    // contract across both hash families.
    "dedup_spans_anchored_fast" -> ((s, d) => {
      Dedup.dedupSpansAnchored(t(s, d, "documents"), "doc_id", "text",
          anchorMod = 8, fastHash = true)
        .orderBy("doc_id")
    }),

    // Shuffle-lean span dedup: ownership keyed on xxhash64(chunk_text)
    // (fixed-width exchange rows instead of text keys); reassembly re-slices
    // surviving tiles from the doc's own text, so corpus text crosses one
    // exchange instead of two. Result ≡ dedup_spans absent a 64-bit span
    // collision — the text-keyed oracle SQL applies verbatim.
    "dedup_spans_hashed" -> ((s, d) => {
      Dedup.dedupSpansHashed(t(s, d, "documents"), "doc_id", "text",
          window = 16)
        .orderBy("doc_id")
    }),

    // Incremental dedup: a new batch checked against a historical store via
    // a BloomFilterAggregate blob + exact confirm join — the store is
    // scanned but NEVER shuffled (the continuous-ingest shape at 100 TB).
    // Result is exact (the bloom only routes candidates; the confirm join
    // compares fingerprint values), so the plain NOT EXISTS oracle applies.
    "dedup_incremental" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), md5(lower(col("text"))).as("fingerprint"))
      val hist = docs.where(col("doc_id") % 10 < 7)
      val batch = docs.where(col("doc_id") % 10 >= 7)
      Dedup.newAgainstHistory(batch, hist, "fingerprint",
          expectedHistItems = 4096, fpp = 0.01)
        .select(col("doc_id"), col("fingerprint"))
        .orderBy("doc_id")
    }),

    // MinHash + LSH near-dup: shingle → signature → band bucket join →
    // exact-Jaccard verify. The at-scale dedup workhorse.
    "dedup_minhash" -> ((s, d) => {
      Dedup.nearDuplicates(t(s, d, "documents"), "doc_id", "text",
          shingleLen = 3, numHashes = 8, threshold = 0.5)
        .orderBy("a_id", "b_id")
    }),

    // The at-scale minhash: xxhash64 signatures (codegen'd long arithmetic)
    // with 16 seeds / 1-row bands, so LSH recall ≥ 1-2^-16 per true pair and
    // the exact-Jaccard verify makes the output the TRUE pair set — which is
    // what the oracle checks, via an exhaustive pair scan (no hash to
    // reproduce cross-engine). This is the benched dedup path; dedup_minhash
    // above stays as the portable-hash oracle row.
    "dedup_minhash_fast" -> ((s, d) => {
      Dedup.nearDuplicatesFast(t(s, d, "documents"), "doc_id", "text",
          shingleLen = 3, numHashes = 16, threshold = 0.5)
        .orderBy("a_id", "b_id")
    }),

    // Pair → cluster resolution: connected components over the MinHash
    // near-dup pairs, every member labeled with its component's min id (the
    // survivor). Without this step A≈B, B≈C dedup keeps two survivors.
    "dedup_clusters" -> ((s, d) => {
      val pairs = Dedup.nearDuplicates(t(s, d, "documents"), "doc_id", "text")
      Dedup.duplicateClusters(pairs)
        .select(col("id").as("doc_id"), col("rep"))
        .orderBy("doc_id")
    }),

    // Same clusters via large-star/small-star (the O(log n)-round published
    // algorithm for web-scale graphs) — two independent CC algorithms pinned
    // to one oracle answer.
    "dedup_clusters_star" -> ((s, d) => {
      val pairs = Dedup.nearDuplicates(t(s, d, "documents"), "doc_id", "text")
      Dedup.connectedComponentsStar(pairs)
        .select(col("id").as("doc_id"), col("rep"))
        .orderBy("doc_id")
    }),

    // Quality-priority cluster survivors: per near-dup cluster keep the
    // highest-quality member (regex word count; ties → min doc_id) — the
    // production survivor policy (keep the cleanest copy of a duplicated
    // page, not whichever crawl got the lowest id). Spark side is a
    // partial-aggregating max(struct(quality, -id)); the oracle restates it
    // as a rank window.
    "dedup_survivors_quality" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val clusters = Dedup.duplicateClusters(
          Dedup.nearDuplicates(docs, "doc_id", "text"))
        .select(col("id"), col("rep"))
      val quality = docs.select(col("doc_id"),
        TextStats.nWords(col("text")).as("q"))
      Dedup.qualitySurvivors(clusters, quality, "doc_id", "q")
        .orderBy("rep")
    }),

    // The full curation pipeline: exact dedup → near-dup cluster dedup →
    // quality gate; output = surviving document ids.
    "curation_pipeline" -> ((s, d) => {
      Curation.curate(t(s, d, "documents"), "doc_id", "text")
        .select(col("doc_id")).orderBy("doc_id")
    }),

    // Per-source data card — the summary a curation run publishes with a
    // released dataset: doc/token volume, language breadth, exact-dup
    // membership (global fingerprint groups ≥ 2, counted per source), and
    // the classifier pass rate (native kernel as a projection). One
    // fingerprint-keyed aggregation + one broadcast-able dup-set join +
    // one source-keyed aggregation.
    "curation_datacard" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val stats = docs.select(col("source"), col("lang"),
        size(split(col("text"), " ")).as("n_tok"),
        md5(lower(col("text"))).as("fp"),
        when(TextStats.hashedLinearScoreCol(col("text"))
          .getField("score_fp") > 0, 1L).otherwise(0L).as("pos"))
      val dupFps = stats.groupBy(col("fp"))
        .agg(count(lit(1)).as("_n")).where(col("_n") >= 2).select(col("fp"))
      stats.join(dupFps.withColumn("_dup", lit(1L)), Seq("fp"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok").cast("long")).as("n_tokens"),
          countDistinct(col("lang")).as("n_langs"),
          sum(coalesce(col("_dup"), lit(0L))).as("n_dup_docs"),
          sum(col("pos")).as("n_quality_pos"))
        .orderBy("source")
    }),

    // The WHOLE training-data recipe in one row: curate (exact + near dedup
    // + quality gates) → hashed-linear classifier gate (score_fp > 0, a
    // pure scan-level filter via the native kernel — no score join) →
    // fractional-epoch materialization by source. Output is the final
    // repeated multiset a trainer would read; the oracle restates every
    // stage (curation CTEs + classifier arithmetic + floor/hash epochs).
    "curation_recipe_e2e" -> ((s, d) => {
      val surv = Curation.curate(t(s, d, "documents"), "doc_id", "text")
      val kept = surv.where(
        TextStats.hashedLinearScoreCol(col("text")).getField("score_fp") > 0)
      Sampling.epochMaterialize(kept, "source", "doc_id",
          Map("src0" -> 2.5, "src1" -> 2.0, "src2" -> 0.75),
          defaultEpochs = 1.0, salt = "ep")
        .select(col("doc_id"), col("source"), col("copy_no"))
        .orderBy("doc_id", "copy_no")
    }),

    // The same pipeline under the quality-priority survivor policy: each
    // near-dup cluster keeps its max-word-count member instead of min id.
    "curation_pipeline_quality" -> ((s, d) => {
      Curation.curate(t(s, d, "documents"), "doc_id", "text",
          Curation.Config(survivorQuality = Some(TextStats.nWords(col("text")))))
        .select(col("doc_id")).orderBy("doc_id")
    }),

    // The curation audit: per-stage funnel counts (input → exact dedup →
    // near-dup dedup → quality gate → PII scrub) — the numbers a curation
    // run reports. scrubPii on: the 5_scrubbed row pins the stage ORDER
    // (scrub last, a row-preserving projection — its count equals the
    // quality gate's, which is exactly what the oracle asserts).
    // Incremental curation: the batch (doc_id % 10 >= 7) curated with the
    // kept-fingerprint store of a previous run over the rest — the history
    // probe (bloom + exact confirm, store never shuffled) runs BEFORE the
    // pipeline; the oracle feeds the same NOT EXISTS-filtered batch
    // through the shared curation CTE chain.
    "curation_pipeline_incremental" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val hist = docs.where(col("doc_id") % 10 < 7)
        .select(md5(lower(col("text"))).as("fingerprint"))
      Curation.curate(docs.where(col("doc_id") % 10 >= 7), "doc_id", "text",
          Curation.Config(history = Some(hist)))
        .select(col("doc_id"))
        .orderBy("doc_id")
    }),

    "curation_funnel" -> ((s, d) => {
      Curation.funnel(t(s, d, "documents"), "doc_id", "text",
          Curation.Config(scrubPii = true))
        .orderBy("stage")
    }),

    // Cross-source contamination audit: distinct canonical-fingerprint
    // overlap per source pair — run before mixing corpora.
    "curation_source_overlap" -> ((s, d) => {
      Curation.sourceOverlap(t(s, d, "documents"), "source", "text")
        .orderBy("src_a", "src_b")
    }),

    // SimHash fingerprints (16-bit) per document.
    "dedup_simhash" -> ((s, d) => {
      Dedup.simhashOf(t(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // SimHash near-dup PAIRS: banded-nibble candidates (exact by pigeonhole
    // for hamming <= 3) + Hamming verify — the join that turns E3's
    // fingerprints into an actual dedup operator.
    "dedup_simhash_pairs" -> ((s, d) => {
      Dedup.simhashPairs(t(s, d, "documents"), "doc_id", "text", maxHamming = 2)
        .orderBy("a_id", "b_id")
    }),

    // The at-scale SimHash pair join: 60-bit fingerprints, 6 bands of 10
    // bits (exact for hamming <= 5; ~2^-10 per-band random collision where
    // the 16-bit variant's nibbles saturate on a big corpus).
    "dedup_simhash_pairs_wide" -> ((s, d) => {
      Dedup.simhashPairsWide(t(s, d, "documents"), "doc_id", "text",
          maxHamming = 4)
        .orderBy("a_id", "b_id")
    }),

    // Blocked character-n-gram Jaccard near-dup (quadratic within a block).
    "dedup_ngram" -> ((s, d) => {
      Dedup.blockedNgramPairs(t(s, d, "documents"), "doc_id", "text",
          blockCol = "lang", n = 4, threshold = 0.5)
        .orderBy("a_id", "b_id")
    }),

    // EXACT word-set Jaccard >= 1/2 pairs via prefix filtering (PPJoin
    // family) — no blocking key, no false negatives; the oracle is the
    // exhaustive all-pairs scan, so a single missed or phantom pair
    // hash-fails. Evidence is integer-exact (intersection/union counts).
    "dedup_jaccard_prefix" -> ((s, d) => {
      Dedup.prefixJaccardPairs(t(s, d, "documents"), "doc_id", "text",
          thresholdNum = 1L, thresholdDen = 2L)
        .orderBy("a_id", "b_id")
    }),

    // Blocked edit-distance near-dup: quadratic within a block, so the demo
    // models the documented STRONG-blocking contract — (length bucket ×
    // first token), under which edit-dist<=50 survivors are near-identical
    // records (a `lang` block is the scaladoc's own anti-pattern: 5 blocks
    // of 100+ docs each ran 43 s at sf0.1; this key runs in bench-class
    // time). A <=50-edit pair CAN straddle a 50-length bucket boundary or
    // differ in token 1 — the block defines the operator's contract, and
    // the oracle mirrors it exactly.
    "dedup_editdist" -> ((s, d) => {
      val blocked = t(s, d, "documents").withColumn("blk",
        concat_ws("|", floor(length(col("text")) / 50).cast("int"),
          element_at(split(col("text"), " "), 1)))
      Dedup.editDistancePairs(blocked, "doc_id", "text",
          blockCol = "blk", maxDist = 50)
        .orderBy("a_id", "b_id")
    }),

    // Embedding-cosine near-dup pairs.
    "dedup_embedding" -> ((s, d) => {
      Similarity.cosineNearDupPairs(t(s, d, "embeddings"), "vec_id",
          "embedding", threshold = 0.4)
        .orderBy("a_id", "b_id")
    }),

    // Sign-bucketed embedding near-dup — the scale path (equi-join on the
    // bucket replaces the all-pairs cross product).
    "dedup_embedding_lsh" -> ((s, d) => {
      Similarity.cosineNearDupPairsBucketed(t(s, d, "embeddings"), "vec_id",
          "embedding", threshold = 0.3, bits = 6)
        .orderBy("a_id", "b_id")
    }),

    // Multi-probe variant: probe side expanded to its bucket + every
    // single-bit flip — recovers near-dup pairs straddling one sign
    // boundary, the dominant single-bucket miss mode. Candidate set is a
    // strict superset of dedup_embedding_lsh's.
    "dedup_embedding_lsh_mp" -> ((s, d) => {
      Similarity.cosineNearDupPairsMultiProbe(t(s, d, "embeddings"), "vec_id",
          "embedding", threshold = 0.3, bits = 6)
        .orderBy("a_id", "b_id")
    }),

    // Rotated-bucketing multi-probe: single-bit-flip probing UNION a second
    // independent sign bucketing over dims 7-12 — recovers pairs at
    // bucket-Hamming >= 2 in the first slice that every flip probe misses.
    // Candidates are a strict superset of dedup_embedding_lsh_mp's.
    "dedup_embedding_lsh_rot" -> ((s, d) => {
      Similarity.cosineNearDupPairsRotated(t(s, d, "embeddings"), "vec_id",
          "embedding", threshold = 0.3, bits = 6, rotOffset = 6)
        .orderBy("a_id", "b_id")
    }),

    // SemDeDup-shaped semantic dedup: Voronoi cells around the 8 lowest-id
    // vectors (deterministic init), within-cell cosine >= 0.4 to a lower id
    // marks a duplicate. The oracle restates centroid choice, argmax cell
    // assignment (score desc, cent_id asc tie-break, zero-norm at -2), and
    // the pair rule verbatim.
    "dedup_semantic" -> ((s, d) => {
      Similarity.semanticDedup(t(s, d, "embeddings"), "vec_id", "embedding",
          nCells = 8, threshold = 0.4)
        .orderBy("id")
    }),

    // ─────────────────────── similarity search (§2.8) ─────────────────────
    // Brute-force cosine top-k (query set = vec_id < 5, k = 10).
    "sim_topk" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.bruteForceTopK(e, e.where(col("vec_id") < 5),
          "vec_id", "embedding", k = 10)
        .orderBy("query_id", "rank")
    }),

    // Sign-quantization LSH bucketed top-k (the pruned scale path).
    "sim_topk_lsh" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.bucketedTopK(e, e.where(col("vec_id") < 5),
          "vec_id", "embedding", k = 5, bits = 6)
        .orderBy("query_id", "rank")
    }),

    // ANN recall EVALUATION harness (E15g): recall@5 of the pruned LSH
    // path against brute-force ground truth, per query, in fixed point —
    // quality measurement as a first-class operator (the number a recall
    // SLO monitors), not a spec-only assertion. Both retrievers' own scale
    // shapes; the comparison is two tiny top-k frames joined on
    // (query, id).
    "sim_recall_eval" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val q = e.where(col("vec_id") < 5)
      val bf = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      val lsh = Similarity.bucketedTopK(e, q, "vec_id", "embedding",
        k = 5, bits = 6)
      val mp = Similarity.bucketedTopKMultiProbe(e, q, "vec_id", "embedding",
        k = 5, bits = 6)
      def hitsOf(got: DataFrame, name: String) =
        bf.select(col("query_id"), col("id"))
          .join(got.select(col("query_id"), col("id")), Seq("query_id", "id"))
          .groupBy("query_id").agg(count(lit(1)).as(name))
      bf.groupBy("query_id").agg(count(lit(1)).as("n_true"))
        .join(hitsOf(lsh, "hits_lsh"), Seq("query_id"), "left")
        .join(hitsOf(mp, "hits_mp"), Seq("query_id"), "left")
        .select(col("query_id"), col("n_true"),
          coalesce(col("hits_lsh"), lit(0L)).as("hits_lsh"),
          coalesce(col("hits_mp"), lit(0L)).as("hits_mp"))
        .select(col("query_id"), col("n_true"), col("hits_lsh"), col("hits_mp"),
          expr("(hits_lsh * 1000000) div n_true").as("recall_lsh_fp"),
          expr("(hits_mp * 1000000) div n_true").as("recall_mp_fp"))
        .orderBy("query_id")
    }),

    // MMR diversified re-ranking (E15h): greedy rel − ½·max-sim-to-selected
    // over the brute top-10, five unrolled rounds — the anti-redundancy
    // pass a RAG context builder runs after retrieval, fully restated
    // (selection order AND scores compared).
    "sim_mmr_rerank" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.mmrRerank(e, e.where(col("vec_id") < 5), "vec_id",
          "embedding", kCand = 10, kSel = 5)
        .orderBy("query_id", "sel_rank")
    }),

    // IVF ANN with every cell probed (nProbe = nCells) — returns exactly the
    // brute-force answer FOR ANY CENTROIDS, so the oracle is sim_topk's SQL
    // even with k-means-fitted cells (fitIters=2 exercises the fitting under
    // the gate); the point under test is the zero-exchange cell-assignment
    // projection + cell-keyed probe join (ExtSpec asserts the plan).
    "sim_topk_ivf" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.ivfTopK(e, e.where(col("vec_id") < 5),
          "vec_id", "embedding", k = 10, nCells = 8, nProbe = 8, fitIters = 2)
        .orderBy("query_id", "rank")
    }),

    // Filtered vector search: top-k among label=2 vectors only (~10% of the
    // corpus) — PRE-filter semantics (a full k from the eligible set, not a
    // thinned post-filtered list), centroids still fit on everything
    // (prebuilt-index semantics). nProbe = nCells keeps the exactness
    // contract, so the oracle is the brute force over the eligible subset —
    // and exactness under full probe holds for ANY centroid set, so this
    // headline row skips the k-means fit (fitIters = 0): it measures the
    // filtered SEARCH path, not the index build the `sim_topk_ivf` row
    // already exercises (a prebuilt index is not re-fit per query batch).
    "sim_topk_ivf_filtered" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.ivfTopKFiltered(e, e.where(col("vec_id") < 5),
          "vec_id", "embedding", predicate = col("label") === 2,
          k = 10, nCells = 8, nProbe = 8)
        .orderBy("query_id", "rank")
    }),

    // k-NN graph construction: every vector's 5 nearest neighbors among
    // multi-probe sign-bucket candidates — the precursor structure for
    // graph ANN and embedding-space clustering. Bucket equi-join + the
    // bounded-heap TopK; the sign buckets are portable, so the oracle
    // restates the full candidate rule.
    "sim_knn_graph" -> ((s, d) => {
      Similarity.knnGraph(t(s, d, "embeddings"), "vec_id", "embedding",
          k = 5, bits = 6)
        .orderBy("id", "rank")
    }),

    // Link-graph centrality for corpus curation (the Common-Crawl-style
    // host ranking that feeds web-scale quality gates): integer fixed-point
    // PageRank over the bidirectional customer<->supplier trade graph, 3
    // iterations. Every arithmetic step is exact BIGINT (truncating div),
    // so the fixed-iteration run is restated verbatim in the oracle as
    // unrolled CTEs — no float reduction order anywhere. Supplier nodes are
    // offset by 10^6 to disambiguate the shared integer key space.
    "graph_pagerank" -> ((s, d) => {
      val oj = t(s, d, "orders").join(t(s, d, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      val fwd = oj.select(col("o_custkey").as("src"),
        (col("l_suppkey") + 1000000L).as("dst"))
      val e = fwd.unionByName(
        fwd.select(col("dst").as("src"), col("src").as("dst")))
      Graph.pageRankExact(e, "src", "dst", iters = 3).orderBy("node")
    }),

    // Exact triangle count (E30b) over a circulant doc graph (strides
    // 1,2,3 mod N — exactly 3·N triangles, an analytic cross-check): the
    // degree-ordered wedge join, each triangle once, fan-out bounded by
    // the max ORIENTED out-degree (O(√m) on any graph — the celebrity-node
    // guard). All joins node-keyed; output is the 1-row census.
    "graph_triangles" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"))
      val nRow = docs.agg(count(lit(1)).as("n"))
      val e = docs.crossJoin(nRow)
        .select(col("doc_id"), col("n"),
          explode(array(lit(1L), lit(2L), lit(3L))).as("k"))
        .select(col("doc_id").as("src"),
          pmod(col("doc_id") + col("k"), col("n")).as("dst"))
      Graph.triangleStats(e, "src", "dst")
    }),

    // URL parse + canonicalization — the first hop of a crawl-curation
    // pipeline. The fixture has no URL column, so one is SYNTHESIZED
    // deterministically per document (five construction branches exercising
    // mixed-case scheme/host, userinfo, explicit default + non-default
    // ports, empty path, trailing-dot host, multi-label public suffix,
    // query, fragment); the oracle restates the BRANCH ARITHMETIC — the
    // expected field values per branch — so the Spark side's actual regex
    // parse is what's on the hash, with zero regex-dialect coupling. The
    // whole row is one codegen'd projection: no shuffle before the
    // determinism sort.
    "text_url_parse" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("source"))
        .withColumn("url", synthUrl)
      Urls.withUrlPartsNative(docs, "url")
        .select(col("doc_id"), col("url"), col("scheme"), col("host"),
          col("port"), col("reg_domain"), col("path"), col("query"),
          col("frag"), col("canon_url"))
        .orderBy("doc_id")
    }),

    // Registered-domain blocklist — the most common crawl-curation gate
    // (spam/adult/boilerplate domain lists): reg_domain derived per doc
    // (zero-shuffle projection), membership against a broadcast-literal
    // blocklist, kept docs pass. Drops the ftp branch's example.org docs
    // plus one co.uk entry, so both the multi-label suffix rule and the
    // filter itself are on the hash.
    "curation_domain_filter" -> ((s, d) => {
      val blocked = Seq("example.org", "example.co.uk")
      val docs = t(s, d, "documents").select(col("doc_id"), col("source"))
        .withColumn("url", synthUrl)
        .withColumn("host", Urls.urlHostNative(col("url")))
      docs
        .withColumn("reg_domain", Urls.registeredDomain(col("host")))
        .where(!col("reg_domain").isInCollection(blocked))
        .select(col("doc_id"), col("host"), col("reg_domain"))
        .orderBy("doc_id")
    }),

    // URL-level dedup through canonicalization — crawl frontier dedup: the
    // same page surfaces under cosmetically different URLs and the
    // canonical form is the equality key. Each doc contributes its branch
    // URL plus a textually-distinct twin (fragment appended; offset id)
    // that MUST collapse onto the same canonical key — and branch 3's URL
    // embeds no doc id, so whole (source, branch) groups collapse too.
    // Shape: projection + ONE canon-keyed aggregation with map-side
    // partials — the crawl-dedup plan that holds at frontier scale.
    "dedup_url" -> ((s, d) => {
      val base = t(s, d, "documents").select(col("doc_id"), col("source"))
        .withColumn("url", synthUrl)
      val twin = base.select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("url"), lit("#m")).as("url"))
      base.select(col("doc_id"), col("url")).unionByName(twin)
        .select(col("doc_id"), Urls.canonicalUrlNative(col("url")).as("canon_url"))
        .groupBy(col("canon_url"))
        .agg(min(col("doc_id")).as("survivor_id"),
          count(lit(1)).as("n_urls"))
        .orderBy("canon_url")
    }),

    // Host-level quality join — the consumer graph_pagerank was built for:
    // canonical hosts derived from the synthesized URLs, a host link graph
    // (each doc's host links to the hosts of docs id+1 and id+29 — stride
    // self-joins keyed on doc_id, no corpus count and no cross join
    // anywhere; tail ids simply emit fewer edges), integer fixed-point
    // PageRank over it, and the per-host rank joined back onto every
    // document through a BROADCAST of the host dim — documents never
    // shuffle for the join. Oracle: same construction + unrolled 3-iter
    // PageRank CTEs.
    "curation_host_rank" -> ((s, d) => {
      val withHost = t(s, d, "documents").select(col("doc_id"), col("source"))
        .withColumn("url", synthUrl)
        .withColumn("host", Urls.urlHostNative(col("url")))
        // host ↔ (source number, branch) is bijective by construction, so
        // an arithmetic integer node id avoids hashing hosts to longs
        .withColumn("host_id",
          regexp_extract(col("host"), "src([0-9]+)", 1).cast("long") * 5
            + col("doc_id") % 5)
      val dstSide = withHost.select(col("doc_id").as("dst_doc"),
        col("host_id").as("dst_host"))
      val edges = Seq(1, 29).map { k =>
        withHost.select((col("doc_id") + k).as("dst_doc"),
            col("host_id").as("src"))
          .join(dstSide, "dst_doc")
          .select(col("src"), col("dst_host").as("dst"))
      }.reduce(_ unionByName _)
      val ranks = Graph.pageRankExact(edges, "src", "dst", iters = 3)
      Urls.hostRankJoin(withHost.select(col("doc_id"), col("host"),
          col("host_id")), "host_id", ranks, "node", "rank")
        .select(col("doc_id"), col("host"), col("host_rank"))
        .orderBy("doc_id")
    }),

    // PQ-compressed ANN via asymmetric distance computation: the corpus is
    // stored as m=16 code ints (16× compression vs 64 raw floats; a real
    // deployment packs them into 16 bytes) and each candidate costs 16
    // table lookups instead of 64 multiplies. Scores are quantized by
    // codebook resolution, so no external engine can restate them —
    // rows-only by design; ExtSpec pins recall vs the exact scan (≥0.6
    // measured 0.70 on this corpus — random embeddings are PQ's worst
    // case) and exactness when the codebook covers the corpus.
    "sim_topk_pq" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.pqTopK(e, e.where(col("vec_id") < 5),
          "vec_id", "embedding", k = 10, m = 16, ksub = 64, fitIters = 2)
        .orderBy("query_id", "rank")
    }),

    // PQ ADC with a PINNED arithmetic codebook (the production shape:
    // codebooks trained offline, shipped as an artifact) — and because the
    // codebook is an explicit constant, the full encode→ADC→rank pipeline
    // IS restatable: the oracle rebuilds the same codebook from the same
    // integer formula and mirrors every fold in index order. This is the
    // oracle-carrying twin of the rows-only fitted row above.
    "sim_topk_pq_fixed" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.pqTopKPinned(e, e.where(col("vec_id") < 5),
          "vec_id", "embedding", k = 10, cb = pinnedCodebook)
        .orderBy("query_id", "rank")
    }),

    // IVF-PQ with pinned codebook + deterministic centroids and REAL
    // partial-probe pruning (nProbe=4 of 8 cells — candidates genuinely
    // drop, unlike the full-probe identity): the billion-scale composition
    // under a complete oracle — cell assignment (argmax cosine, min-id
    // ties, zero-norm → -2), query-side top-4 probe cells, PQ encode, ADC,
    // and ranking all restated in DuckDB.
    "sim_topk_ivfpq_fixed" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.ivfPqTopKPinned(e, e.where(col("vec_id") < 5),
          "vec_id", "embedding", k = 10, nCells = 8, nProbe = 4,
          cb = pinnedCodebook)
        .orderBy("query_id", "rank")
    }),

    // IVF-PQ: inverted-file candidate pruning composed with the PQ ADC scan
    // — the classic billion-scale ANN recipe (prune by cell, score against
    // codes, never touch raw vectors after encode). Rows-only for the same
    // reason as sim_topk_pq.
    "sim_topk_ivfpq" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.ivfPqTopK(e, e.where(col("vec_id") < 5),
          "vec_id", "embedding", k = 10, nCells = 8, nProbe = 4,
          m = 16, ksub = 64, fitIters = 2)
        .orderBy("query_id", "rank")
    }),

    // Int8-quantized brute-force ANN: 4x smaller corpus vectors (memory
    // bandwidth IS the brute-force bottleneck at scale), integer-dot
    // cosine. Deterministic floor(x*127/maxabs + 0.5) quantization makes
    // codes AND scores engine-exact, so the quantized search is fully
    // oracle-checked — unlike PQ's fitted codebooks.
    "sim_topk_int8" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.int8TopK(e, e.where(col("vec_id") < 5),
          "vec_id", "embedding", k = 10)
        .orderBy("query_id", "rank")
    }),

    // Two-stage refined ANN: prefix-dim scoring shortlists 50 candidates
    // per query (a 4× flop cut on the all-N stage), exact full-dim cosine
    // re-ranks the shortlist — the retrieve-then-rerank pattern. Both
    // stages are deterministic strict folds, so the WHOLE pipeline is
    // restated in the oracle (shortlist membership included), unlike
    // PQ's codebook-dependent shortlist.
    "sim_topk_refined" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.refinedTopK(e, e.where(col("vec_id") < 5),
          "vec_id", "embedding", k = 10, prefixDims = 16, shortlist = 50)
        .orderBy("query_id", "rank")
    }),

    // Hard-negative mining (E15f): per anchor, the 10 most-similar vectors
    // of a DIFFERENT label — the contrastive-training batch builder.
    // bruteForceTopK's scan shape with a pair-level label-mismatch filter.
    "sim_hard_negatives" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.hardNegativesTopK(e, e.where(col("vec_id") < 5),
          "vec_id", "embedding", "label", k = 10)
        .orderBy("query_id", "rank")
    }),

    // Portable integer k-means (E15e): Lloyd's over int8 codes — cosine
    // assignment on exact-integer arithmetic, truncating-integer-mean
    // centroid update — so unlike the FP kmeansCentroids fit (reduction-
    // order-dependent, never restatable) BOTH the fitted centroids and the
    // final assignments are on the hash: the oracle unrolls all three
    // assignment passes and both updates (Sql.kmeansUnrolled). k = 8 cells
    // seeded from the 8 lowest vec_ids, 2 Lloyd rounds, one row per vector.
    "sim_kmeans" -> ((s, d) => {
      Similarity.kmeansAssignPortable(t(s, d, "embeddings"), "vec_id",
          "embedding", k = 8, updates = 2)
        .orderBy("vec_id")
    }),

    // Cluster-balanced downsampling (the E15e consumer): cap every fitted
    // k-means cell at 40 vectors by deterministic hash order — the
    // diversity-preserving prune (SemDeDup-style: dense cells shed
    // redundant mass, sparse cells survive whole). Assignment is the
    // zero-exchange kmeans projection; the cap runs the bounded-heap
    // skew-safe path, so one mega-cell costs O(partitions·cap), not
    // O(cell) — the window twin would serialize it through one task.
    "sample_cluster_balance" -> ((s, d) => {
      val assigned = Similarity.kmeansAssignPortable(t(s, d, "embeddings"),
          "vec_id", "embedding", k = 8, updates = 2)
      Sampling.capPerGroupSkewSafe(assigned, "cell", "vec_id", 40, salt = "bal")
        .select(col("vec_id"), col("cell"))
        .orderBy("vec_id")
    }),

    // Streaming near-dup candidates, driven in batch mode (the whole frame
    // as one micro-batch): deterministic pair SET (per-bucket processing is
    // id-ordered), but the decision is a signature-agreement ESTIMATE the
    // oracle cannot restate without xxhash64 — rows-only by design, like
    // the sketches below; the streaming statefulness is MemoryStream-tested.
    "q_streaming_neardup" -> ((s, d) => {
      EventTimeOps.streamingNearDedup(t(s, d, "documents"), "doc_id", "text")
        .dropDuplicates("a_id", "b_id")
        .orderBy("a_id", "b_id")
        .toDF()
    }),

    // The ORACLE-GATED twin of q_streaming_neardup: the SAME stateful LSH
    // operator (banding, bucket state, in-batch id-order processing,
    // agreement scoring) running the portable md5-60bit signature family
    // instead of xxhash64. At gate SF no bucket approaches the caps, so
    // the emitted pair set is exactly {(a,b): n_agree >= 8 of 16}, which
    // DuckDB restates from the md5 signature law — the statefulness itself
    // is MemoryStream-pinned (streamed == batch) in EventTimeSpec.
    "q_streaming_neardup_portable" -> ((s, d) => {
      EventTimeOps.streamingNearDedup(t(s, d, "documents"), "doc_id", "text",
          signature = Some(Dedup.minhashSignature60(col("text"), 3, 16)))
        .dropDuplicates("a_id", "b_id")
        .orderBy("a_id", "b_id")
        .toDF()
    }),

    // Streaming SCD2, batch-driven: the stateful dimension-history op run
    // over the full events table as one batch — closed versions are
    // deterministic (a version is final exactly when its successor opens),
    // so unlike the near-dup stream this row IS oracle-checkable.
    "q_streaming_scd2" -> ((s, d) => {
      import s.implicits._
      val ev = t(s, d, "events")
      val obs = ev.select(
          col("user_id").as("key"), Queries.epochMicrosOf(ev, "ts").as("ts"),
          col("event_type").as("attr"), col("event_id").as("tie"))
        .as[EventTimeOps.ScdObs]
      EventTimeOps.streamingScd2(obs).toDF()
        .select(col("key").as("user_id"), col("attr").as("event_type"),
          col("valid_from"), col("valid_to"), col("version"))
        .orderBy("user_id", "version")
    }),

    // Streaming funnel, batch-driven: the full transition set (every
    // depth advance with its time), which the oracle restates as the
    // union of the iterative join chain's per-step rows — each s_k CTE is
    // literally the set of depth-k transitions. Cross-micro-batch state
    // continuation is MemoryStream-tested in EventTimeSpec.
    "q_streaming_funnel" -> ((s, d) => {
      import s.implicits._
      val step = when(col("event_type") === "signup", 1)
        .when(col("event_type") === "view", 2)
        .when(col("event_type") === "purchase", 3)
      val ev0 = t(s, d, "events")
      val evs = ev0
        .where(col("event_type").isin("signup", "view", "purchase"))
        .select(col("user_id").as("key"),
          Queries.epochMicrosOf(ev0, "ts").as("ts"),
          step.cast("int").as("step"))
        .as[EventTimeOps.StepEvent]
      EventTimeOps.streamingFunnel(evs, 3).toDF()
        .select(col("key").as("user_id"), col("depth"),
          date_format(timestamp_micros(col("ts")), "yyyyMMddHHmmss.SSSSSS")
            .as("t"))
        .orderBy("user_id", "depth")
    }),

    // Watermarked stream-stream interval join, batch-driven: every view of
    // the same user within 30 minutes BEFORE a purchase — the two-stream
    // enrichment/attribution shape. The batch form the oracle restates is
    // the same call (plain keyed join + range filter); the streaming
    // statefulness (both-side buffers bounded by watermark + lag,
    // cross-micro-batch matching) is MemoryStream-tested in EventTimeSpec.
    "q_stream_stream_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("v_id"), col("ts").as("v_ts"))
      EventTimeOps.streamStreamJoin(purchases, views, "user_id",
          "p_ts", "v_ts", maxLag = "30 MINUTE", watermark = "1 hour")
        .select(col("user_id"), col("p_id"),
          date_format(col("p_ts"), "yyyyMMddHHmmss.SSSSSS").as("p_ts_s"),
          col("v_id"),
          date_format(col("v_ts"), "yyyyMMddHHmmss.SSSSSS").as("v_ts_s"))
        .orderBy("p_id", "v_id")
    }),

    // Left-OUTER stream-stream interval join, batch-driven: every purchase
    // with its 30-minute-preceding view count — zero for the unmatched ones
    // (the "which conversions had NO preceding touchpoint" attribution
    // question). Aggregated to counts so no nullable sort key crosses
    // engines (null ordering differs); the streaming semantics — the
    // null-extended row emits only once the watermark closes the window —
    // are MemoryStream-pinned in EventTimeSpec.
    "q_stream_stream_outer" -> ((s, d) => {
      val ev = t(s, d, "events")
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("v_id"), col("ts").as("v_ts"))
      EventTimeOps.streamStreamJoin(purchases, views, "user_id",
          "p_ts", "v_ts", maxLag = "30 MINUTE", watermark = "1 hour",
          joinType = "left_outer")
        .groupBy(col("p_id"))
        .agg(count(col("v_id")).as("n_views_30m"),
          coalesce(min(col("v_id")), lit(-1L)).as("first_v_id"))
        .orderBy("p_id")
    }),

    // Mergeable-sketch aggregates (HLL distinct, quantile sketch): the
    // at-scale shape for distincts/percentiles — partial sketches merge
    // map-side, so the shuffle carries sketches, not values. Estimates are
    // engine-specific ⇒ deliberately NO DuckDB oracle (rows-only check).
    "q_sketch_distinct" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("approx_users"),
          hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("hll_users"))
        .orderBy("event_type")
    }),

    // PORTABLE integer HLL (E26c) — the oracle-gated sibling of the
    // engine-specific rows-only sketch above: md5-derived 60-bit hash,
    // 64 max-merged registers, and a fixed-point estimate with NO float
    // rounding anywhere, so both engines agree bit-for-bit. Register table
    // + denominator + estimate + the exact distinct all in one 64-row
    // frame (est/exact constant per row — everything post-shuffle is ≤ 64
    // rows; the one real aggregation is the 64-group map-side max).
    "q_hll_portable" -> ((s, d) => {
      val ev = t(s, d, "events")
      val regs = Sketches.hllRegisters(ev, col("user_id"))
      val est = Sketches.hllEstimate(regs)
      val exact = ev.agg(count_distinct(col("user_id")).as("exact_users"))
      regs.crossJoin(est).crossJoin(exact)
        .select(col("bucket"), col("register"), col("d_denom"),
          col("est").as("est_users"), col("exact_users"))
        .orderBy("bucket")
    }),

    // Per-hour portable-HLL estimates (E19d): one sketch per window via
    // the SPINE-FREE grouped shape — only observed buckets aggregate; each
    // empty register adds exactly 2^55 to the denominator in closed form,
    // so nothing widens to 64 rows per group (the many-groups shape: a
    // sketch per hour×source at 100 TB). Streaming twin
    // (EventTimeOps.streamingHllRegisters) is EventTimeSpec-pinned equal.
    "q_hll_windowed" -> ((s, d) => {
      val hr = date_format(date_trunc("hour", col("ts")), "yyyyMMddHH").as("hr")
      val ev = t(s, d, "events").withColumn("hr", hr)
      val exact = ev.groupBy(col("hr"))
        .agg(count_distinct(col("user_id")).as("exact_users"))
      Sketches.hllEstimateBy(ev, Seq("hr"), col("user_id"))
        .join(exact, "hr")
        .select(col("hr"), col("buckets_hit"), col("d_denom"),
          col("est").as("est_users"), col("exact_users"))
        .orderBy("hr")
    }),

    // PORTABLE Count-Min Sketch (E19e): the frequency member of the sketch
    // triad — 4×256 SUM counters (order-independent, mergeable, map-side
    // combining), point estimate = min over rows, always ≥ truth. Probes =
    // the 10 most frequent tokens; the compared surface includes the
    // overcount, so hash/row/min drift anywhere fails.
    "q_cms_portable" -> ((s, d) => {
      val toks = t(s, d, "documents")
        .select(explode(filter(TextStats.tokens(col("text")),
          x => length(x) > 0)).as("tok"))
      val truth = toks.groupBy("tok").agg(count(lit(1)).as("true_n"))
        .orderBy(col("true_n").desc, col("tok")).limit(10)
      Sketches.cmsEstimates(toks, truth)
        .select(col("tok"), col("true_n"), col("cms_est"),
          (col("cms_est") - col("true_n")).as("overcount"))
        .orderBy(col("true_n").desc, col("tok"))
    }),

    // Sliding-window distinct via REGISTER MERGE (E19g): hourly HLL
    // partials are built ONCE, then every 3-hour sliding window derives
    // purely from the tiny register table (each hourly register feeds the
    // 3 windows that cover it; merge = max) — the sketch-merge payoff: the
    // slide never rescans events. Exact twin computed per window for the
    // compared surface.
    "q_hll_sliding" -> ((s, d) => {
      val ev = t(s, d, "events")
      val hr = date_trunc("hour", col("ts"))
      val hourly = ev.select(hr.as("hr"),
          Sketches.hllBucket(col("user_id")).as("bucket"),
          Sketches.hllRho(col("user_id")).as("rho"))
        .groupBy("hr", "bucket").agg(max(col("rho")).as("register"))
      val winRegs = hourly
        .select(col("hr"), col("bucket"), col("register"),
          explode(sequence(lit(0), lit(2))).as("o"))
        .select(expr("hr + make_interval(0, 0, 0, 0, o)").as("win_hr"),
          col("bucket"), col("register"))
        .groupBy("win_hr", "bucket").agg(max(col("register")).as("register"))
      val est = Sketches.hllEstimateFromRegisters(winRegs, Seq("win_hr"))
      val exact = ev
        .select(hr.as("hr"), col("user_id"),
          explode(sequence(lit(0), lit(2))).as("o"))
        .select(expr("hr + make_interval(0, 0, 0, 0, o)").as("win_hr"),
          col("user_id"))
        .groupBy("win_hr").agg(count_distinct(col("user_id")).as("exact_users"))
      est.join(exact, "win_hr")
        .select(date_format(col("win_hr"), "yyyyMMddHH").as("win_hr"),
          col("buckets_hit"), col("d_denom"), col("est").as("est_users"),
          col("exact_users"))
        .orderBy("win_hr")
    }),

    // PORTABLE quantile sketch (E19c) — oracle-gated sibling of the
    // rows-only percentile_approx row below: equi-width integer histogram
    // (the proven q_histogram bucketing), φ-quantile = smallest bucket with
    // cum ≥ ⌈φ·N⌉ via exact integral arithmetic. Mergeable; the window
    // runs on the ≤ |groups|·128 aggregated frame, never on raw rows.
    "q_quantile_portable" -> ((s, d) => {
      Sketches.histogramQuantiles(t(s, d, "lineitem"), "l_returnflag",
          "l_extendedprice", width = 1000.0, nBuckets = 128,
          phis = Seq(("p50", 1, 2), ("p95", 19, 20)))
        .withColumnRenamed("g", "l_returnflag")
        .orderBy("l_returnflag")
    }),

    // Scalar p50/p95 projections (not the raw array<double>): the driver's
    // rows-only check hashes each output cell, and an array cell is
    // unhashable on the pandas side — same sketch, scalar columns.
    "q_sketch_quantiles" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.95)), lit(10000)).as("q"))
        .select(col("l_returnflag"),
          element_at(col("q"), 1).as("p50"),
          element_at(col("q"), 2).as("p95"))
        .orderBy("l_returnflag")
    }),

    // ──────────────── sampling / splits / decontamination (§2.8) ──────────
    // Deterministic hash sample: membership is a pure function of the key,
    // so the oracle re-derives the exact row set (no rand() anywhere).
    "sample_hash" -> ((s, d) => {
      Sampling.sampleByHash(t(s, d, "documents"), "doc_id", 0.2)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy("lang")
    }),

    // Deterministic global corpus shuffle: pseudo-random order as a pure
    // function of (key, salt) — the retry-stable, engine-reproducible
    // replacement for orderBy(rand()) before sequence packing. The oracle
    // re-derives the exact permutation (shuffle_key is portable md5).
    "sample_shuffle" -> ((s, d) => {
      Sampling.deterministicShuffle(t(s, d, "documents"), "doc_id", salt = "ep1")
        .select(col("doc_id"), col("shuffle_key"))
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

    // ─────────────────────── text analysis (§2.8) ─────────────────────────
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

    // Vocabulary analysis: top-10 tokens per language by document frequency
    // (the stopword-discovery / corpus-stats primitive).
    "text_top_tokens" -> ((s, d) => {
      TextStats.topTokens(t(s, d, "documents"), "text", "lang", k = 10)
        .select(col("lang"), col("token"), col("n_docs"), col("rk"))
        .orderBy("lang", "rk")
    }),

    // Graph-ANN beam search: greedy navigation of the kNN graph from a
    // deterministic entry set (2 hops, beam 16) — the HNSW-style search
    // path over the graph sim_knn_graph builds. Fully deterministic
    // relational ops, so the oracle restates entries, both hops, and the
    // final ranking verbatim.
    "sim_topk_graph" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val graph = Similarity.knnGraph(emb, "vec_id", "embedding",
          k = 5, bits = 6)
        .select(col("id"), col("nbr_id"))
      Similarity.graphTopK(emb, "vec_id", "embedding", graph,
          emb.where(col("vec_id") < 5), "vec_id", "embedding",
          k = 10, beamWidth = 16, hops = 2, entryMod = 8)
        .orderBy("query_id", "rank")
    }),

    // HIERARCHICAL graph ANN (HNSW-style): deterministic md5-geometric
    // levels (m=8, 2 upper layers), per-layer kNN graphs, top-layer entry
    // set + beam DESCENT (1 hop per upper layer, 2 in the base) — the
    // log-scale entry structure that keeps hop counts flat at 10⁹ vectors,
    // next to the single-layer sim_topk_graph. The oracle restates the
    // level law, all three layer graphs, and every beam round.
    "sim_topk_hnsw" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.hnswTopK(emb, "vec_id", "embedding",
          emb.where(col("vec_id") < 5), "vec_id", "embedding",
          k = 10, beamWidth = 16, knnK = 5, bits = 6)
        .orderBy("query_id", "rank")
    }),

    // Graph-ANN recall comparison at EQUAL budget: recall@5 of flat
    // single-layer search vs the hierarchical descent, same beam width
    // (16), same base graph (k=5, bits=6), same base hops (2), and the
    // SAME entry count — 5 entry points each (flat: vec_id % 100 = 0;
    // hnsw: the 5-node top layer). The hierarchy's descent is the only
    // difference, so the recall gap measures exactly what the layers buy.
    // In-engine quality measurement like sim_recall_eval, oracle-gated.
    "sim_recall_graph" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val q = e.where(col("vec_id") < 5)
      val bf = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      val g0 = Similarity.knnGraph(e, "vec_id", "embedding", k = 5, bits = 6)
        .select(col("id"), col("nbr_id"))
      val flat = Similarity.graphTopK(e, "vec_id", "embedding", g0, q,
        "vec_id", "embedding", k = 5, beamWidth = 16, hops = 2,
        entryMod = 100)
      val hnsw = Similarity.hnswTopK(e, "vec_id", "embedding", q, "vec_id",
        "embedding", k = 5, beamWidth = 16, knnK = 5, bits = 6)
      def hitsOf(got: DataFrame, name: String) =
        bf.select(col("query_id"), col("id"))
          .join(got.select(col("query_id"), col("id")), Seq("query_id", "id"))
          .groupBy("query_id").agg(count(lit(1)).as(name))
      bf.groupBy("query_id").agg(count(lit(1)).as("n_true"))
        .join(hitsOf(flat, "hits_flat"), Seq("query_id"), "left")
        .join(hitsOf(hnsw, "hits_hnsw"), Seq("query_id"), "left")
        .select(col("query_id"), col("n_true"),
          coalesce(col("hits_flat"), lit(0L)).as("hits_flat"),
          coalesce(col("hits_hnsw"), lit(0L)).as("hits_hnsw"))
        .select(col("query_id"), col("n_true"), col("hits_flat"),
          col("hits_hnsw"),
          expr("(hits_flat * 1000000) div n_true").as("recall_flat_fp"),
          expr("(hits_hnsw * 1000000) div n_true").as("recall_hnsw_fp"))
        .orderBy("query_id")
    }),

    // Sparse lexical cosine pairs: tf-vector cosine over the df<=maxDf
    // vocabulary (stopword-class terms dropped = Bayardo-style df-capped
    // all-pairs) — the term-overlap retrieval modality next to the dense
    // ANN suite. Integer dots/norms + correctly-rounded sqrt/div keep the
    // score bit-portable.
    "sim_lexical_pairs" -> ((s, d) => {
      Similarity.lexicalCosinePairs(t(s, d, "documents"), "doc_id", "text",
          maxDf = 50, threshold = 0.5)
        .orderBy("a_id", "b_id")
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

    // ─────────────────────── multimodal plumbing (§2.8) ───────────────────
    // Binary payload + typed metadata stats (decode itself is the stubbed
    // per-partition step — see graft.ext.Multimodal and its spec).
    "mm_payload_stats" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Multimodal.assetsFromDocuments(docs)
        .join(docs.select(col("doc_id").as("asset_id"), col("text")), "asset_id")
        .select(col("asset_id"), col("modality"),
          col("meta.bytes").as("payload_bytes"),
          headerSum(col("text")).as("header_sum"))
        .orderBy("asset_id")
    }),

    // Frame-sampling plumbing over video assets: every 2nd 16-byte frame,
    // counted per asset (the decode itself is the stubbed mapPartitions
    // step; this checks the explode/sampling arithmetic end-to-end).
    "mm_frame_sample" -> ((s, d) => {
      val assets = Multimodal.assetsFromDocuments(t(s, d, "documents"))
      Multimodal.frameSample(assets, frameBytes = 16, everyN = 2)
        .groupBy(col("asset_id"))
        .agg(count(lit(1)).as("n_sampled"), max(col("frame_no")).as("max_frame"))
        .orderBy("asset_id")
    }),

    // End-to-end container decode gate: synthesize a spec-valid payload per
    // doc (PPM/WAV/PNG/JPEG round-robin, dimensions derived from doc_id),
    // run the REAL ByteCodec parse in the distributed typed-decode path,
    // emit the parsed geometry. The oracle restates the construction
    // arithmetic — any header-parse bug (endianness, offsets, marker/chunk
    // walk) makes parse ≠ construction and breaks the hash.
    "mm_decode_containers" -> ((s, d) => {
      import s.implicits._
      val ids = t(s, d, "documents").select(col("doc_id")).as[Long]
      val assets = ids.map { id =>
        val (fmt, bytes) = Multimodal.syntheticContainerPayload(id)
        Multimodal.RawAsset(id, fmt, bytes)
      }
      Multimodal.decode(assets).toDF()
        .select(col("asset_id"), col("modality").as("fmt"),
          col("width"), col("height"), col("n_frames"))
        .orderBy("asset_id")
    }),

    // FULL PNG pixel decode (E32f): CRC-verified chunk walk, multi-IDAT
    // zlib concatenation, Inflater, and real unfiltering of all five PNG
    // filter types (every synthetic image cycles None/Sub/Up/Average/Paeth
    // per row). The oracle restates the pixel-construction arithmetic
    // ((id + i) % 256): exact channel sums plus the position-weighted sum
    // that pins byte ORDER, so any filter/stride/offset bug hash-fails.
    // Every 29th asset carries a corrupted IDAT (flipped byte AFTER the
    // CRC was computed) and must be quarantined — the oracle excludes
    // exactly those ids, so skipping CRC verification also hash-fails.
    "mm_decode_png_pixels" -> ((s, d) => {
      import s.implicits._
      val ids = t(s, d, "documents").select(col("doc_id")).as[Long]
      val assets = ids.map { id =>
        Multimodal.RawAsset(id, "png",
          Multimodal.syntheticPngPixelPayload(id, corrupt = id % 29 == 0))
      }
      assets.mapPartitions(_.flatMap(Multimodal.decodePngPixels)).toDF()
        .orderBy("asset_id")
    }),

    // Image RESIZE stage (E32e): nearest-neighbor 2× downsample of the
    // synthesized P6 PPMs with the REAL byte walk (header parse + strided
    // pixel reads); exact per-channel integer sums. The oracle restates
    // the pixel-construction arithmetic ((id + offset) % 256 at the
    // sampled offsets), so parse ≠ construction — a stride/offset/header
    // bug — hash-fails. Non-PPM assets (3 of every 4) emit no row.
    "mm_resize" -> ((s, d) => {
      import s.implicits._
      val ids = t(s, d, "documents").select(col("doc_id")).as[Long]
      val assets = ids.map { id =>
        val (fmt, bytes) = Multimodal.syntheticContainerPayload(id)
        Multimodal.RawAsset(id, fmt, bytes)
      }
      Multimodal.resizePpm(assets, factor = 2).toDF().orderBy("asset_id")
    }),

    // Per-hour quantile sketch (E19f): the E19c histogram grouped by hour
    // — the windowed-percentile dashboard (p50/p95 latency-style) from the
    // same mergeable counters; one (hr,bucket)-keyed count, windows only
    // on the aggregated frame.
    "q_quantile_windowed" -> ((s, d) => {
      val ev = t(s, d, "events").select(
        date_format(date_trunc("hour", col("ts")), "yyyyMMddHH").as("hr"),
        col("value"))
      Sketches.histogramQuantiles(ev, "hr", "value", width = 25.0,
          nBuckets = 20, phis = Seq(("p50", 1, 2), ("p95", 19, 20)))
        .withColumnRenamed("g", "hr")
        .orderBy("hr")
    }),

    // Corpus snapshot DIFF (E28d): the dataset-versioning audit — old vs a
    // deterministically perturbed new snapshot (drop %17, rewrite %13, add
    // %19 under shifted ids), compared by doc_id + text fingerprint via
    // ONE full-outer join; the added/removed/changed/unchanged census is
    // what a release note and a reproducibility check both need.
    "curation_snapshot_diff" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val old = docs.select(col("doc_id"), md5(col("text")).as("fp_old"))
      val neu = docs.where(col("doc_id") % 17 =!= 0)
        .select(col("doc_id"), md5(when(col("doc_id") % 13 === 0,
          concat(col("text"), lit(" v2"))).otherwise(col("text"))).as("fp_new"))
        .unionByName(docs.where(col("doc_id") % 19 === 0)
          .select((col("doc_id") + 100000L).as("doc_id"),
            md5(col("text")).as("fp_new")))
      old.join(neu, Seq("doc_id"), "full_outer")
        .agg(
          sum(when(col("fp_old").isNull, 1L).otherwise(0L)).as("n_added"),
          sum(when(col("fp_new").isNull, 1L).otherwise(0L)).as("n_removed"),
          sum(when(col("fp_old").isNotNull && col("fp_new").isNotNull &&
            col("fp_old") =!= col("fp_new"), 1L).otherwise(0L)).as("n_changed"),
          sum(when(col("fp_old") === col("fp_new"), 1L).otherwise(0L))
            .as("n_unchanged"))
    }),

    // Word2vec-style negative-sampling table (E23k): unigram^(3/4)
    // weights (Mikolov et al. 2013) with NO float power — c^(3/4) =
    // floor(sqrt(c·floor(sqrt(c)))): sqrt is IEEE-correctly-rounded on
    // exact-integer inputs < 2^53, so both engines floor the same value
    // and the table restates exactly. Top-15 tokens + fixed-point shares;
    // one token aggregation, then tiny frames only.
    "sample_negatives" -> ((s, d) => {
      val toks = t(s, d, "documents")
        .select(explode(filter(TextStats.tokens(col("text")),
          x => length(x) > 0)).as("tok"))
      val top = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok")).limit(15)
        .withColumn("w34",
          expr("CAST(floor(sqrt(CAST(cnt * CAST(floor(sqrt(CAST(cnt AS DOUBLE))) AS BIGINT) AS DOUBLE))) AS BIGINT)"))
      top.crossJoin(top.agg(sum(col("w34")).as("w_total")))
        .select(col("tok"), col("cnt"), col("w34"),
          expr("(w34 * 1000000) div w_total").as("share_fp"))
        .orderBy(col("cnt").desc, col("tok"))
    }),

    // Source-concentration diagnostics (E28c): HHI (Σ share², the
    // antitrust/data-mixing concentration index) and top-source share in
    // exact integer fixed-point (×10⁶, integral division) — the balance
    // check a mixture designer runs before weighting sources. One count
    // aggregation + a 1-row reduction.
    "curation_source_mix" -> ((s, d) => {
      t(s, d, "documents")
        .groupBy(col("source")).agg(count(lit(1)).as("cnt"))
        .agg(count(lit(1)).as("n_sources"), sum(col("cnt")).as("n_total"),
          sum(col("cnt") * col("cnt")).as("sum_sq"), max(col("cnt")).as("max_cnt"))
        .select(col("n_sources"),
          expr("(sum_sq * 1000000) div (n_total * n_total)").as("hhi_fp"),
          expr("(max_cnt * 1000000) div n_total").as("top_share_fp"))
    }),

    // A/B chi-square (E2e): users hash-split into two arms, outcome =
    // any event with value > 222 (the per-user-max median, so the split
    // is balanced; every user has every event TYPE, so type-based
    // outcomes degenerate); the 2×2 contingency table plus the χ² statistic
    // in exact integer fixed-point (×1000) — χ² is RATIONAL
    // (n·(ad−bc)²/row·col products), so no float ever appears; wide
    // decimals carry the squared cross-term at any scale.
    "q_ab_chisq" -> ((s, d) => {
      val conv = t(s, d, "events")
        .groupBy(col("user_id"))
        .agg(max(when(col("value") > 222.0, 1).otherwise(0)).as("conv"))
        .select(col("user_id") % 2 === 0 as "arm_a", col("conv") === 1 as "c")
      conv.agg(
          sum(when(col("arm_a") && col("c"), 1L).otherwise(0L)).as("a"),
          sum(when(col("arm_a") && !col("c"), 1L).otherwise(0L)).as("b"),
          sum(when(!col("arm_a") && col("c"), 1L).otherwise(0L)).as("c"),
          sum(when(!col("arm_a") && !col("c"), 1L).otherwise(0L)).as("d"))
        .select(col("a"), col("b"), col("c"), col("d"),
          // a zero margin (degenerate table under a future data regen)
          // yields the sentinel -1 instead of an ANSI divide-by-zero
          // cross-term and margin products widen to DECIMAL(38,0) BEFORE
          // multiplying: with arm counts ~3e9 the 64-bit products would
          // wrap silently in non-ANSI Spark (and error in DuckDB)
          expr("CASE WHEN CAST(a + b AS DECIMAL(38,0)) * (c + d) * (a + c) * (b + d) = 0 THEN -1 " +
            "ELSE ((CAST(a AS DECIMAL(38,0)) + b + c + d) * " +
            "(CAST(a AS DECIMAL(38,0))*d - CAST(b AS DECIMAL(38,0))*c) * " +
            "(CAST(a AS DECIMAL(38,0))*d - CAST(b AS DECIMAL(38,0))*c) * 1000) div " +
            "(CAST(a + b AS DECIMAL(38,0)) * (c + d) * (a + c) * (b + d)) END").as("chi2_fp"))
    }),

    // Integer 3σ anomaly detection (E2f): per event_type, flag values
    // with |x−μ| > 3σ using the ALL-INTEGER inequality
    // (n·x − S)² > 9·(n·Q − S²) over cents (S=Σx, Q=Σx²) — variance is
    // rational, so the z-test needs no sqrt and restates exactly; wide
    // decimals carry the squares. Outliers are PLANTED (value×10 on
    // event_id % 499 == 0) since the uniform base has none; the tiny
    // per-type stats frame broadcasts back to the scan.
    "q_anomaly_events" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("event_id"), col("event_type"),
        (when(col("event_id") % 499 === 0, col("value") * 10)
          .otherwise(col("value")).cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
      val stats = ev.groupBy("event_type").agg(count(lit(1)).as("n"),
        sum(col("cents")).as("s"),
        sum(col("cents").cast("decimal(38,0)") * col("cents")).as("q"))
      ev.join(broadcast(stats), "event_type")
        .where(expr("(CAST(n AS DECIMAL(38,0))*cents - s) * (CAST(n AS DECIMAL(38,0))*cents - s) > " +
          "9 * (CAST(n AS DECIMAL(38,0))*q - CAST(s AS DECIMAL(38,0))*s)"))
        .select(col("event_id"), col("event_type"), col("cents"))
        .orderBy("event_id")
    }),

    // Winsorization (E5c): clip each event's value at its type's PORTABLE
    // p99 (the E19c histogram bound — no engine percentile involved), then
    // the per-type census of survivors/clipped/sum — the outlier-robust
    // cleaning stage, with the bound frame broadcast back to the scan.
    "etl_winsorize" -> ((s, d) => {
      val ev = t(s, d, "events")
      val bounds = Sketches.histogramQuantiles(ev, "event_type", "value",
          width = 5.0, nBuckets = 100, phis = Seq(("p99", 99, 100)))
        .select(col("g").as("event_type"), col("p99_hi"))
      ev.join(broadcast(bounds), "event_type")
        .select(col("event_type"),
          (least(col("value"), col("p99_hi")).cast("decimal(18,2)") * 100)
            .cast("long").as("cents"),
          (col("value") > col("p99_hi")).cast("long").as("clipped"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("clipped").as("n_clipped"),
          sum("cents").as("sum_cents_clipped"))
        .orderBy("event_type")
    }),

    // Hourly rank movers (E2g): rank event types by hourly volume, then
    // each type's rank delta vs the previous hour (lag) — the "what moved"
    // dashboard. Both windows run on the 720×5 aggregated frame only.
    "q_rank_movers" -> ((s, d) => {
      val hourly = t(s, d, "events")
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyyMMddHH").as("hr"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
      val ranked = hourly.withColumn("rnk",
        rank().over(Window.partitionBy("hr")
          .orderBy(col("n").desc, col("event_type"))))
      ranked.withColumn("prev_rnk",
          lag(col("rnk"), 1).over(Window.partitionBy("event_type").orderBy("hr")))
        .select(col("hr"), col("event_type"), col("n"), col("rnk"),
          coalesce(col("prev_rnk"), lit(-1)).as("prev_rnk"),
          (col("rnk") - coalesce(col("prev_rnk"), col("rnk"))).as("delta"))
        .orderBy("hr", "event_type")
    }),

    // Data-quality EXPECTATIONS suite (E5b): five rules (null key,
    // nonpositive user, unknown enum, nonpositive measure, timestamp
    // window) over a deterministically CORRUPTED twin of events — each
    // rule's violation count is nonzero and prime-keyed to a distinct
    // corruption, so a rule that silently stops firing (or fires on the
    // wrong column) hash-fails. One pass: five conditional sums collapsed
    // map-side, then a 5-row unpivot.
    "etl_expectations" -> ((s, d) => {
      val ev = t(s, d, "events")
      val corrupted = ev.select(
        when(col("event_id") % 997 === 0, lit(null).cast("bigint"))
          .otherwise(col("event_id")).as("event_id"),
        col("ts"),
        when(col("event_id") % 991 === 0, -col("user_id"))
          .otherwise(col("user_id")).as("user_id"),
        when(col("event_id") % 983 === 0, lit("bogus"))
          .otherwise(col("event_type")).as("event_type"),
        when(col("event_id") % 977 === 0, -col("value"))
          .otherwise(col("value")).as("value"))
      corrupted.agg(
          sum(when(col("event_id").isNull, 1L).otherwise(0L)).as("r1"),
          sum(when(col("user_id") <= 0, 1L).otherwise(0L)).as("r2"),
          sum(when(!col("event_type").isin(
            "click", "error", "purchase", "signup", "view"), 1L)
            .otherwise(0L)).as("r3"),
          sum(when(col("value") <= 0, 1L).otherwise(0L)).as("r4"),
          sum(when(col("ts") < lit("2024-01-01 00:00:00")
            .cast("timestamp_ntz"), 1L).otherwise(0L)).as("r5"))
        .select(expr("stack(5, 'null_event_id', r1, 'nonpositive_user', r2, " +
          "'unknown_event_type', r3, 'nonpositive_value', r4, " +
          "'ts_before_window', r5) AS (rule, n_violations)"))
        .withColumn("pass", (col("n_violations") === 0).cast("int"))
        .orderBy("rule")
    }),

    // Cohort retention (E2d): cohort = a user's first active hour;
    // retention = distinct users active at hour offsets 0..5 from their
    // cohort — the canonical product-analytics matrix. Two user-keyed
    // aggregations + one user-keyed join, nothing row-quadratic.
    "q_cohort_retention" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
      val first = ev.groupBy("user_id").agg(min(col("hr")).as("cohort"))
      ev.join(first, "user_id")
        .select(col("user_id"), col("cohort"),
          expr("timestampdiff(HOUR, cohort, hr)").as("offset_hr"))
        .where(col("offset_hr") <= 5)
        .groupBy(date_format(col("cohort"), "yyyyMMddHH").as("cohort_hr"),
          col("offset_hr"))
        .agg(count_distinct(col("user_id")).as("n_users"))
        .orderBy("cohort_hr", "offset_hr")
    }),

    // MP4/ISO-BMFF container walk (E32f): spec-valid synthesized boxes
    // (real big-endian sizes, nested moov{mvhd+trak*}), parsed by the REAL
    // walker in the typed mapPartitions path; the oracle restates the
    // construction arithmetic, so an endianness/offset/nesting bug makes
    // parse ≠ construction and hash-fails — video-container coverage next
    // to the PNG/JPEG/PPM/WAV codecs.
    "mm_decode_mp4" -> ((s, d) => {
      import s.implicits._
      val ids = t(s, d, "documents").select(col("doc_id")).as[Long]
      ids.map(id => Multimodal.RawAsset(id, "mp4",
          Multimodal.syntheticMp4Payload(id)))
        .mapPartitions(_.flatMap(Multimodal.decodeMp4))
        .toDF().orderBy("asset_id")
    }),

    // ───────────── streaming-window shape / sources / SQL breadth ─────────
    // Tumbling event-time window (batch semantics of the streaming agg).
    "q_tumbling_window" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(date_format(col("window.start"), "yyyyMMddHH").as("hr"),
          col("event_type"), col("n"))
        .orderBy("hr", "event_type")
    }),

    // Sliding event-time window (2h window, 1h slide): each event lands in
    // two windows; batch semantics of the watermarked streaming agg.
    "q_sliding_window" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(date_format(col("window.start"), "yyyyMMddHH").as("ws"),
          col("event_type"), col("n"))
        .orderBy("ws", "event_type")
    }),

    // As-of join: each purchase picks up the user's most recent prior view
    // value (union + keyed window, one shuffle — oracle is DuckDB's native
    // ASOF LEFT JOIN).
    "q_asof_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("value"))
      AsofJoin.asof(purchases, views, "user_id", "ts", Seq("value"))
        .select(col("event_id"), col("asof_value"))
        .orderBy("event_id")
    }),

    // Range join: events matched to derived value bands (bucketized
    // point-in-interval equi-join, not a cross-join filter).
    "q_range_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      // avg via exact decimal sum so band bounds are engine-identical
      val bands = ev.groupBy(col("event_type").as("band_type"))
        .agg((sum(col("value").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("avg_v"))
        .select(col("band_type"), (col("avg_v") * 0.5).as("lo"),
          (col("avg_v") * 1.5).as("hi"))
      RangeJoin.pointInInterval(ev.select(col("value")), bands,
          "value", "lo", "hi", bucketWidth = 10.0)
        .groupBy(col("band_type")).agg(count(lit(1)).as("n"))
        .orderBy("band_type")
    }),

    // Interval-overlap join (interval × interval, the range-join general
    // form): signup value-windows × error value-windows. Bucketized to an
    // equi-join on the cell, pairs emitted only in their overlap-start
    // cell (exactly-once without a distinct); the oracle is the plain
    // inequality join, so any duplicate or dropped pair hash-fails.
    "q_interval_overlap" -> ((s, d) => {
      val ev = t(s, d, "events")
      val a = ev.where(col("event_type") === "signup")
        .select(col("event_id").as("a_id"), col("value").as("a_lo"),
          (col("value") + 15.0).as("a_hi"))
      val b = ev.where(col("event_type") === "error")
        .select(col("event_id").as("b_id"), col("value").as("b_lo"),
          (col("value") + 10.0).as("b_hi"))
      RangeJoin.intervalOverlap(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
          bucketWidth = 20.0)
        .select(col("a_id"), col("b_id"))
        .orderBy("a_id", "b_id")
    }),

    // Gap-based session windows (built-in session_window; identical code
    // runs over readStream with a watermark — see EventTimeSpec).
    "q_session_window" -> ((s, d) => {
      val purchases = t(s, d, "events").where(col("event_type") === "purchase")
      EventTimeOps.sessionCounts(purchases, "ts", "user_id", "10 minutes")
        .select(col("user_id"),
          date_format(col("session_window.start"), "yyyyMMddHHmmss.SSSSSS")
            .as("session_start"),
          col("n"))
        .orderBy("user_id", "session_start")
    }),

    // Ordered funnel (signup → view → purchase), earliest-transition
    // semantics: ONE user-keyed exchange + a codegen'd fold over each
    // user's time-sorted step events. The oracle restates it as the
    // iterative join chain (t_{k+1} = min ts > t_k), so the fold ≡ join
    // chain equivalence is itself the checked contract.
    "q_funnel_depth" -> ((s, d) => {
      Funnel.funnelDepth(t(s, d, "events"), "user_id", "event_type", "ts",
          Seq("signup", "view", "purchase"))
        .select(col("user_id"), col("steps_completed"),
          date_format(col("t_reached"), "yyyyMMddHHmmss.SSSSSS").as("t_reached"))
        .orderBy("user_id")
    }),

    // The funnel chart derived from the same fold: users reaching each step.
    "q_funnel_counts" -> ((s, d) => {
      Funnel.funnelCounts(t(s, d, "events"), "user_id", "event_type", "ts",
          Seq("signup", "view", "purchase"))
    }),

    // Tamper-evident export ledger (E5f): per day, an md5 HASH CHAIN over
    // the rows in (ts, event_id) order — one reordered/dropped/altered row
    // changes every downstream digest (unlike the commutative shard
    // checksum of E23j, order is part of the contract here). Day-bounded
    // group fold — the real-ledger contract chains within bounded shards;
    // the day key IS the shard.
    "etl_ledger_chain" -> ((s, d) => {
      val lst = t(s, d, "events")
        .select(date_format(date_trunc("day", col("ts")), "yyyyMMdd").as("day"),
          struct(col("ts"), col("event_id")).as("ord"),
          md5(col("event_id").cast("string")).as("rd"))
        .groupBy("day")
        .agg(count(lit(1)).as("n"),
          collect_list(struct(col("ord"), col("rd"))).as("lst"))
      lst.select(col("day"), col("n"),
          aggregate(
            transform(array_sort(col("lst")), x => x.getField("rd")),
            lit("seed"),
            (acc, x) => md5(concat(acc, x))).as("chain"))
        .orderBy("day")
    }),

    // Benford first-digit audit (E5e): the fraud/data-quality classic —
    // observed leading-digit counts of the integer cents vs the Benford
    // expectation, whose 9 log10 probabilities ride as the SAME pre-rounded
    // fixed-point literal table on both engines (the HLL linear-counting
    // trick). Leading digit via integer string length — no float
    // formatting anywhere.
    "q_benford_audit" -> ((s, d) => {
      val cents = (col("value").cast("decimal(18,2)") * 100).cast("long")
      val digit = expr("cents div CAST(pow(10, length(CAST(cents AS STRING)) - 1) AS BIGINT)")
      val obs = t(s, d, "events")
        .select(cents.as("cents")).where(col("cents") > 0)
        .select(digit.cast("int").as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n_obs"))
      val total = obs.agg(sum(col("n_obs")).as("n_total"))
      import s.implicits._
      obs.join(benfordP.toDF("digit", "p_fp"), "digit")
        .crossJoin(total)
        .select(col("digit"), col("n_obs"),
          expr("(n_obs * 1000000) div n_total").as("share_fp"), col("p_fp"))
        .orderBy("digit")
    }),

    // Partition-skew audit (E5d): daily row counts + the max/mean skew
    // ratio in fixed point ((max·n_days·10⁶) div total — rational, no
    // float) — the pre-run diagnostic that decides whether a date-keyed
    // write needs salting/AQE before it burns a cluster.
    "etl_partition_skew_audit" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyyMMdd").as("day"))
        .agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("n_days"), sum(col("n")).as("total_rows"),
          max(col("n")).as("max_day_rows"))
        .select(col("n_days"), col("total_rows"), col("max_day_rows"),
          expr("(max_day_rows * n_days * 1000000) div total_rows")
            .as("skew_fp"))
    }),

    // Hourly trend slope (E2i): least-squares slope of hourly volume per
    // event_type — RATIONAL (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²), so the
    // regression restates in exact integer fixed-point ×10⁶ with no float;
    // the intercept derives from the already-rounded slope identically on
    // both sides. One hourly aggregation, then per-type sums.
    "q_trend_slope" -> ((s, d) => {
      val hourly = t(s, d, "events")
        .groupBy(col("event_type"),
          expr("timestampdiff(HOUR, TIMESTAMP_NTZ '2024-01-01 00:00:00', " +
            "date_trunc('hour', ts))").as("x"))
        .agg(count(lit(1)).as("y"))
      hourly.groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("event_type"), col("cnt").as("n_hours"),
          expr("CASE WHEN cnt * sxx - sx * sx = 0 THEN 0 " +
            "ELSE ((cnt * sxy - sx * sy) * 1000000) div (cnt * sxx - sx * sx) END")
            .as("slope_fp"))
        .orderBy("event_type")
    }),

    // Funnel conversion RATES (E2h): step-over-step rates in integer
    // fixed-point ×10⁶ on top of the ordered-funnel counts (step 1 rates
    // against the distinct-user total). The lag window runs on the 3-row
    // counts frame only.
    "q_funnel_rates" -> ((s, d) => {
      val counts = Funnel.funnelCounts(t(s, d, "events"), "user_id",
        "event_type", "ts", Seq("signup", "view", "purchase"))
      val total = t(s, d, "events")
        .agg(count_distinct(col("user_id")).as("n_total"))
      counts
        .withColumn("prev", lag(col("n_users"), 1).over(
          Window.orderBy("step")))
        .crossJoin(total)
        .select(col("step"), col("step_name"), col("n_users"),
          expr("(n_users * 1000000) div coalesce(prev, n_total)")
            .as("rate_fp"))
        .orderBy("step")
    }),

    // Leave-one-out bigram NOVELTY (E9l): the share of a doc's distinct
    // bigrams that appear in NO other document (df = 1) — original content
    // scores high, boilerplate low. One gram-keyed aggregation (the
    // canonical shape), then the df frame joins back on the gram key.
    "text_ngram_novelty" -> ((s, d) => {
      val toks = filter(TextStats.tokens(col("text")), x => length(x) > 0)
      val nb = size(toks) - 1
      val grams = when(nb >= 1, array_distinct(
          zip_with(slice(toks, lit(1), nb), slice(toks, lit(2), nb),
            (a, b) => concat(a, lit("_"), b))))
        .otherwise(array().cast("array<string>"))
      val g = t(s, d, "documents")
        .select(col("doc_id"), explode(grams).as("g"))
      val df = g.groupBy("g").agg(count(lit(1)).as("df"))
      g.join(df, "g")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
        .select(col("doc_id"), col("n_grams"), col("n_unique"),
          expr("(n_unique * 1000000) div n_grams").as("novelty_fp"))
        .orderBy("doc_id")
    }),

    // Custom keyed state (mapGroupsWithState) — batch mode is oracle-checked
    // here; cross-micro-batch accumulation is covered by EventTimeSpec.
    "q_running_stats" -> ((s, d) => {
      import s.implicits._
      val typed = t(s, d, "events").where(col("event_type") === "purchase")
        .select(col("user_id").as("key"), col("ts"))
        .as[EventTimeOps.KeyedEvent]
      EventTimeOps.runningStats(typed).toDF()
        .select(col("key").as("user_id"), col("n"),
          date_format(col("first_ts"), "yyyyMMddHHmmss.SSSSSS").as("first_ts"),
          date_format(col("last_ts"), "yyyyMMddHHmmss.SSSSSS").as("last_ts"))
        .orderBy("user_id")
    }),

    // CSV sink + scan round-trip with the reference's quote/escape options
    // (SURVEY §2 rows 1, 3): write a slice, read it back, aggregate. The
    // oracle aggregates the original rows — any quoting infidelity breaks it.
    "etl_csv_roundtrip" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val tmp = scratchDir("graft_csv_rt", d)
      t(s, d, "events").where(col("event_id") % 7 === 0)
        .select(col("event_id"), col("event_type"), col("props"))
        .write.mode("overwrite")
        .option("header", "true").option("quote", "\"").option("escape", "\\")
        .csv(tmp)
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("event_type", StringType),
        StructField("props", StringType)))
      s.read.schema(schema)
        .option("header", "true").option("quote", "\"").option("escape", "\\")
        .csv(tmp)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), min(col("props")).as("min_props"),
          countDistinct(col("props")).as("n_props"))
        .orderBy("event_type")
    }),

    // SCD Type-2 historization: each user's event_type stream becomes
    // validity intervals (valid_from/valid_to/version/is_current) — the
    // standard warehouse extension of the reference's SCD1 dim upsert.
    // Timestamps are formatted to strings for cross-engine comparison
    // (DuckDB reads the parquet as TIMESTAMP_NS, Spark as truncated micros
    // — both are µs-aligned in this data, asserted before adoption).
    "etl_scd2" -> ((s, d) => {
      graft.etl.Scd.historize(t(s, d, "events"),
          "user_id", "ts", "event_type", "event_id")
        .select(col("user_id"), col("event_type"),
          date_format(col("valid_from"), "yyyyMMddHHmmss.SSSSSS").as("valid_from"),
          date_format(col("valid_to"), "yyyyMMddHHmmss.SSSSSS").as("valid_to"),
          col("version"), col("is_current"))
        .orderBy("user_id", "version")
    }),

    // SCD2 incremental upsert under the driver gate: fold the second half
    // of the month into the first half's historized dim and compare against
    // the FULL-REBUILD oracle (etl_scd2's own SQL) — upsert∘historize ≡
    // historize∘union is the operator's contract, so the full rebuild IS
    // the oracle. The ts<=T / ts>T split satisfies the strict per-key
    // watermark the contract requires.
    "etl_scd2_upsert" -> ((s, d) => {
      val obs = t(s, d, "events")
      val split = to_timestamp(lit("2024-01-16 00:00:00"))
      val first = graft.etl.Scd.historize(obs.where(col("ts") <= split),
        "user_id", "ts", "event_type", "event_id")
      graft.etl.Scd.upsert(first, obs.where(col("ts") > split),
          "user_id", "ts", "event_type", "event_id")
        .select(col("user_id"), col("event_type"),
          date_format(col("valid_from"), "yyyyMMddHHmmss.SSSSSS").as("valid_from"),
          date_format(col("valid_to"), "yyyyMMddHHmmss.SSSSSS").as("valid_to"),
          col("version"), col("is_current"))
        .orderBy("user_id", "version")
    }),

    // SCD2 point-in-time resolve: purchase facts (ts shifted back 1h, so
    // probes land mid-history and some fall BEFORE their user's first
    // version → NULL resolution, the left-join contract) against the full
    // historized dim. The oracle restates it as the general INTERVAL join
    // (ts >= valid_from AND ts < valid_to OR open) — asof-carry ≡ interval
    // join on a tiling dim is exactly the operator's contract, so the row
    // cross-checks the two formulations against each other.
    "etl_scd2_resolve" -> ((s, d) => {
      val ev = t(s, d, "events")
      val dim = graft.etl.Scd.historize(ev, "user_id", "ts", "event_type", "event_id")
      val facts = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          (col("ts") - expr("INTERVAL 1 HOUR")).as("ts"))
      graft.etl.Scd.resolveAtTime(facts, dim, "user_id", "ts", "event_type")
        .select(col("user_id"), col("event_id"),
          date_format(col("ts"), "yyyyMMddHHmmss.SSSSSS").as("ts_s"),
          col("asof_event_type"),
          date_format(col("asof_valid_from"), "yyyyMMddHHmmss.SSSSSS").as("valid_from_s"),
          col("asof_version"))
        .orderBy("user_id", "event_id")
    }),

    // CDC changelog apply (the general MERGE): a synthetic I/U/D changelog
    // derived from orders (latest o_orderkey per customer wins; every 37th
    // orderkey is a delete) merged into the customer snapshot. The oracle
    // restates compact-then-apply with QUALIFY + anti-select + union — any
    // wrong survivor (stale seq, resurrected delete, dropped untouched
    // key) hash-fails.
    "etl_cdc_apply" -> ((s, d) => {
      val base = t(s, d, "customer").select(col("c_custkey").as("k"),
        col("c_name").as("name"),
        col("c_acctbal").cast("decimal(18,2)").as("bal"))
      val changes = t(s, d, "orders").select(col("o_custkey").as("k"),
        col("o_orderkey").as("seq"),
        when(pmod(col("o_orderkey"), lit(37)) === 0, lit("D"))
          .otherwise(lit("U")).as("op"),
        concat(lit("upd_"), col("o_orderkey")).as("name"),
        col("o_totalprice").cast("decimal(18,2)").as("bal"))
      // `bal` emitted as integer cents: the driver's value-hash canonicalizes
      // DECIMAL differently across engines (the r7 q_rank_funcs failure
      // class), and (decimal(18,2) * 100) :: bigint is exact on both sides.
      graft.etl.Cdc.applyChangelog(base, changes, Seq("k"), "seq", "op")
        .select(col("k"), col("name"),
          (col("bal") * 100).cast("bigint").as("bal_cents"))
        .orderBy("k")
    }),

    // Per-key minute-grid gap fill with carry-forward: densify each user's
    // day-1 event stream onto its observed minute span — the resampling
    // step between raw telemetry and evenly-spaced consumers. Carried raw
    // values + an observed flag; timestamps formatted for the cross-engine
    // hash (the scd2 convention).
    "etl_gap_fill" -> ((s, d) => {
      val ev = t(s, d, "events")
        .where(col("user_id") < 20 && dayofmonth(col("ts")) === 1)
      Resample.gapFillMinutes(ev, "user_id", "ts", "value", "event_id")
        .select(col("user_id"),
          date_format(col("minute"), "yyyyMMddHHmm").as("minute_s"),
          col("value"), col("is_observed"))
        .orderBy("user_id", "minute_s")
    }),

    // BM25 retrieval top-k — the search-engine modality next to the dense
    // ANN suite: three 2-term queries against the corpus, k=10 each. Every
    // scoring ingredient is an exact integer (tf/df/dl/N/Σdl) and the
    // per-term contribution is floored to 2^20 fixed point after a fixed
    // order of correctly-rounded IEEE ops, so the score is an
    // order-independent integer sum restated verbatim in the oracle — the
    // rational-idf variant exists precisely because ln is NOT
    // correctly-rounded across engines (see Retrieval scaladoc).
    "text_bm25_topk" -> ((s, d) => {
      import s.implicits._
      val q = Seq((0L, "vector"), (0L, "stream"), (1L, "customer"),
        (1L, "query"), (2L, "scan"), (2L, "window")).toDF("query_id", "token")
      ext.Retrieval.bm25TopK(t(s, d, "documents"), "doc_id", "text", q, k = 10)
        .orderBy("query_id", "rank")
    }),

    // RAG indexing pipeline composed (E39): chunk (32-token window, 24
    // stride) → BM25 over the CHUNK corpus → top-5 chunks per query with
    // (doc_id, chunk_no) provenance — retrieval returns the passage, not
    // the document, which is what a RAG consumer actually feeds a model.
    // Chunk ids are doc_id·1000 + chunk_no (docs are far under 1000
    // chunks), so provenance is pure arithmetic; every stage reuses an
    // already-gated operator and the oracle restates the whole chain.
    "rag_pipeline_e2e" -> ((s, d) => {
      import s.implicits._
      val chunks = TextStats.chunkWords(t(s, d, "documents"), "doc_id",
          "text", window = 32, stride = 24)
        .select((col("doc_id") * 1000 + col("chunk_no")).as("chunk_id"),
          col("chunk_text"))
      val q = Seq((0L, "vector"), (0L, "stream"), (1L, "customer"),
        (1L, "query"), (2L, "scan"), (2L, "window")).toDF("query_id", "token")
      ext.Retrieval.bm25TopK(chunks, "chunk_id", "chunk_text", q, k = 5)
        .select(col("query_id"), col("rank"),
          expr("doc_id div 1000").as("doc_id"),
          expr("doc_id % 1000").cast("int").as("chunk_no"), col("score_fp"))
        .orderBy("query_id", "rank")
    }),

    // Hybrid retrieval: BM25 text ranks ⊕ dense cosine ranks, fused with
    // reciprocal-rank fusion. Query ids are shared across modalities
    // (testdata links doc_id ↔ vec_id 1:1): each query is 2 BM25 terms
    // against `documents` plus the embedding of vec_id = query_id against
    // `embeddings`, depth 20 per list, final top-10. The fused score is
    // pure integer arithmetic (2^20 div (60 + rank), summed) so the
    // oracle restates both rankings AND the fusion bit-exactly.
    "sim_hybrid_topk" -> ((s, d) => {
      import s.implicits._
      val q = Seq((0L, "vector"), (0L, "stream"), (1L, "customer"),
        (1L, "query"), (2L, "scan"), (2L, "window")).toDF("query_id", "token")
      val text = ext.Retrieval
        .bm25TopK(t(s, d, "documents"), "doc_id", "text", q, k = 20)
        .select(col("query_id"), col("doc_id").as("id"), col("rank"))
      val e = t(s, d, "embeddings")
      val dense = Similarity
        .bruteForceTopK(e, e.where(col("vec_id") < 3),
          "vec_id", "embedding", k = 20)
        .select(col("query_id"), col("id"), col("rank"))
      ext.Retrieval.rrfFuse(Seq(text, dense), k = 10)
        .orderBy("query_id", "rank")
    }),

    // Z-order (Morton) layout key — the OPTIMIZE ZORDER BY capability of
    // Delta/Iceberg-class formats: interleave the bits of two columns into
    // one sort key so range-partitioned parquet gets row-group min/max
    // locality on BOTH dimensions (a single-column sort clusters only
    // itself; MeasureZorder quantifies the 2-D pruning win at sf0.1). Pure
    // shift/and/or integer arithmetic — codegen primitives, engine-exact,
    // so the key itself is fully oracle-checked via the same unrolled
    // arithmetic in DuckDB. The layout write path (range partition on the
    // key = disjoint curve segments per file) is pinned in LayoutSpec.
    "etl_zorder_key" -> ((s, d) => {
      t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
        Layout.zorderKey(16, col("l_partkey"), col("l_suppkey")).as("zkey"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Small-file compaction: fragment the table into 16 files, bin-pack
    // back via the shuffle-free coalesce rewrite (file-count collapse and
    // the no-Exchange plan are LayoutSpec's claims), and aggregate the
    // COMPACTED copy — the oracle aggregates the original table, so any
    // content infidelity in the rewrite (lost/duplicated rows, value
    // corruption) breaks the hash.
    "etl_compact" -> ((s, d) => {
      val root = scratchDir("graft_compact", d)
      val frag = s"$root/frag"
      val packed = s"$root/packed"
      t(s, d, "documents").repartition(16)
        .write.mode("overwrite").parquet(frag)
      Layout.compactTo(s, frag, packed, targetFileBytes = 1L << 30)
      s.read.parquet(packed)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("sum_id"),
          sum(length(col("text"))).as("sum_len"))
        .orderBy("lang")
    }),

    // OHLC bars: resample each user's value stream to hourly
    // open/high/low/close — the time-series downsampling aggregation.
    // open/close are SELECTED doubles (min_by/max_by on the unique
    // (ts, event_id) order — no arithmetic, so raw doubles hash-compare),
    // restated in DuckDB as ordered first()/last().
    "q_ohlc" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(col("user_id"),
          date_format(date_trunc("hour", col("ts")), "yyyyMMddHH").as("hr"))
        .agg(
          min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
          count(lit(1)).as("n"))
        .orderBy("user_id", "hr")
    }),

    // Equi-width histogram: portable arithmetic bucketing (floor(value/10)
    // capped at the top bucket — no engine histogram function involved),
    // integer counts + integer-cents mass per bucket. The groupBy is the
    // histogram; map-side partials make it one small exchange at any scale.
    "q_histogram" -> ((s, d) => {
      val bucket = least(floor(col("value") / 10.0), lit(19.0)).cast("int")
      t(s, d, "events")
        .groupBy(bucket.as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
            .as("mass_cents"))
        .orderBy("bucket")
    }),

    // RANGE-frame window over event time: each event's trailing-1-hour
    // per-user count and value sum. The frame bound is an integer
    // epoch-microsecond range on BOTH engines — interval frames restate
    // portably once the ordering key is integral; the sum is carried as
    // integer cents ((value::dec(18,2)*100)::bigint) so the output schema
    // has no raw decimal for the driver's value-hash to re-encode.
    "q_range_frame" -> ((s, d) => {
      val ev = t(s, d, "events")
      val w = Window.partitionBy(col("user_id"))
        .orderBy(Queries.epochMicrosOf(ev, "ts"))
        .rangeBetween(-3600000000L, 0L)
      ev
        .select(col("event_id"), col("user_id"),
          count(lit(1)).over(w).cast("long").as("n_1h"),
          sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
            .over(w).as("sum_1h_cents"))
        .orderBy("event_id")
    }),

    // Schema-evolution scan: two parquet batches with DIFFERENT column
    // sets (old writer / new writer), read back as one frame via
    // mergeSchema — the source-breadth case every long-lived lake hits.
    // The oracle aggregates the ORIGINAL rows, so missing-column nulls,
    // column alignment, and the union semantics are all on the hash.
    "etl_schema_evolution" -> ((s, d) => {
      val tmp = scratchDir("graft_schema_ev", d)
      val ev = t(s, d, "events")
      ev.where(col("event_id") % 2 === 0)
        .select(col("event_id"), col("user_id"))
        .write.mode("overwrite").parquet(s"$tmp/b1")
      ev.where(col("event_id") % 2 === 1)
        .select(col("event_id"), col("value"))
        .write.mode("overwrite").parquet(s"$tmp/b2")
      s.read.option("mergeSchema", "true").parquet(s"$tmp/b1", s"$tmp/b2")
        .agg(count(lit(1)).as("n"),
          count(col("user_id")).as("n_user"),
          count(col("value")).as("n_value"),
          sum(col("user_id")).as("sum_user"),
          sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
            .as("sum_value_cents"))
    }),

    // Dynamic partition overwrite: write a partitioned store, then
    // overwrite ONLY the partitions present in a corrective batch (day 5
    // re-stated with doubled values) — untouched partitions must survive.
    // The read-back aggregation is hashed against the oracle's CASE
    // restatement over the original rows.
    "etl_partition_overwrite" -> ((s, d) => {
      val tmp = scratchDir("graft_part_ow", d)
      val ev = t(s, d, "events")
        .withColumn("day", dayofmonth(col("ts")).cast("int"))
      ev.where(col("day") <= 10)
        .select(col("event_id"), col("value"), col("day"))
        .write.partitionBy("day").mode("overwrite").parquet(tmp)
      ev.where(col("day") === 5)
        .select(col("event_id"), (col("value") * 2).as("value"), col("day"))
        .write.partitionBy("day").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic").parquet(tmp)
      s.read.parquet(tmp)
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n"),
          sum((col("value").cast("decimal(18,2)") * 100).cast("long"))
            .as("sum_value_cents"))
        .orderBy("day")
    }),

    // Snapshot TIME TRAVEL over the versioned star publish: three batches
    // land (days 1-3, 4-5, 6) under retainVersions=2, so version 1 is
    // retention-swept and versions 2 and 3 stay readable; each retained
    // version is then read AS OF its publish — fact row count, dim_date
    // cardinality and max minute key, dim_title cardinality — and the
    // oracle restates every snapshot from the cumulative day ranges. A
    // stale read (current-version leak into v2) or a broken sweep (v1
    // surviving) both change the emitted rows.
    "etl_time_travel" -> ((s, d) => {
      val tmp = scratchDir("graft_time_travel", d)
      val store = graft.etl.StarStore(s, tmp, Int.MaxValue, 2)
      val ev = t(s, d, "events")
      def raw(lo: Int, hi: Int) = ev
        .where(dayofmonth(col("ts")).between(lo, hi))
        .select(
          date_format(date_trunc("minute", col("ts")),
            "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").as("DateTime"),
          concat(lit("news| T"), (col("user_id") % 97).cast("string"))
            .as("VideoTitle"),
          lit("206").as("events"))
      store.runBatch(raw(1, 3), "tt1")
      store.runBatch(raw(4, 5), "tt2")
      store.runBatch(raw(6, 6), "tt3")
      store.versions.map { v =>
        store.readVersion("fact", v).agg(count(lit(1)).as("n_fact"))
          .crossJoin(store.readVersion("dim_date", v)
            .agg(count(lit(1)).as("n_minutes"),
              max(col("DATETIME")).as("max_minute")))
          .crossJoin(store.readVersion("dim_title", v)
            .agg(count(lit(1)).as("n_titles")))
          .select(lit(v).as("version"), col("n_fact"), col("n_minutes"),
            col("max_minute"), col("n_titles"))
      }.reduce(_.unionByName(_)).orderBy("version")
    }),

    // ORC sink + scan round-trip — the third columnar/source format next to
    // CSV and JSON-lines: Spark's native ORC writer+reader (vectorized,
    // predicate-pushdown-capable like parquet), gated by an oracle that
    // aggregates the ORIGINAL rows, so type or timestamp infidelity across
    // the format boundary breaks the hash. The read-back filter runs on the
    // ORC scan itself, where ORC's min/max stripe stats can serve it.
    "etl_orc_roundtrip" -> ((s, d) => {
      val tmp = scratchDir("graft_orc_rt", d)
      t(s, d, "events").where(col("event_id") % 13 === 0)
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))
        .write.mode("overwrite").orc(tmp)
      s.read.orc(tmp)
        .where(col("event_type") =!= "error")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
          date_format(max(col("ts")), "yyyyMMddHHmmss.SSSSSS").as("max_ts"))
        .orderBy("event_type")
    }),

    // JSON-lines sink + scan round-trip with an explicit schema — source-
    // format breadth next to the CSV round-trip; the oracle aggregates the
    // ORIGINAL rows, so any serialization infidelity (quoting, escapes in
    // the nested-JSON props string) breaks the hash.
    "etl_json_roundtrip" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val tmp = scratchDir("graft_json_rt", d)
      t(s, d, "events").where(col("event_id") % 11 === 0)
        .select(col("event_id"), col("event_type"), col("props"))
        .write.mode("overwrite").json(tmp)
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("event_type", StringType),
        StructField("props", StringType)))
      s.read.schema(schema).json(tmp)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), min(col("props")).as("min_props"),
          sum(col("event_id")).as("sum_id"))
        .orderBy("event_type")
    }),

    // Hive-style partitioned write + partition-pruned read-back: the scan
    // must touch only the purchase partition (PlanSpec asserts the
    // PartitionFilters); the oracle aggregates the original rows.
    "etl_partitioned_scan" -> ((s, d) => {
      val tmp = scratchDir("graft_part", d)
      t(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          dayofmonth(col("ts")).as("day"))
        .write.mode("overwrite").partitionBy("event_type").parquet(tmp)
      s.read.parquet(tmp)
        .where(col("event_type") === "purchase")
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
        .orderBy("day")
    }),

    // UNION ALL with provenance tag.
    "q_union_all" -> ((s, d) => {
      val ev = t(s, d, "events")
      def half(tag: String, pred: Column) = ev.where(pred)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .select(lit(tag).as("half"), col("event_type"), col("n"))
      half("h1", dayofmonth(col("ts")) <= 15)
        .unionByName(half("h2", dayofmonth(col("ts")) > 15))
        .orderBy("half", "event_type")
    }),

    // EXCEPT (distinct set difference).
    "q_except" -> ((s, d) => {
      val ev = t(s, d, "events")
      def minutes(typ: String) = ev.where(col("event_type") === typ)
        .select(date_format(date_trunc("minute", col("ts")), "yyyyMMddHHmm")
          .as("datetime_key"))
      minutes("view").except(minutes("purchase")).orderBy("datetime_key")
    }),

    // String-function surface: upper/lower/substr/replace/lpad/length/reverse.
    "q_string_funcs" -> ((s, d) => {
      t(s, d, "customer").where(col("c_custkey") % 37 === 0)
        .select(col("c_custkey"),
          upper(col("c_name")).as("up_name"),
          substring(col("c_name"), 1, 8).as("name_head"),
          regexp_replace(col("c_name"), "#", "-").as("dashed"),
          lpad(col("c_custkey").cast("string"), 10, "0").as("padded_key"),
          length(col("c_name")).as("name_len"),
          reverse(col("c_name")).as("rev_name"))
        .orderBy("c_custkey")
    }),

    // Date-function surface: date_add / datediff / last_day / quarter.
    "q_date_funcs" -> ((s, d) => {
      t(s, d, "orders").where(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"),
          date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("od_plus30"),
          datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
            .as("days_since"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
          quarter(col("o_orderdate")).as("qtr"))
        .orderBy("o_orderkey")
    }),

    // JSON scalar extraction from the events props column.
    "q_json_extract" -> ((s, d) => {
      t(s, d, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k"))
        .orderBy("event_type")
    }),

    // FULL OUTER join over partially-overlapping daily aggregates.
    "q_full_outer" -> ((s, d) => {
      val ev = t(s, d, "events")
      val views = ev.where(col("event_type") === "view" && dayofmonth(col("ts")) <= 20)
        .groupBy(dayofmonth(col("ts")).as("day")).agg(count(lit(1)).as("n_views"))
      val purch = ev.where(col("event_type") === "purchase" && dayofmonth(col("ts")) >= 10)
        .groupBy(dayofmonth(col("ts")).as("day")).agg(count(lit(1)).as("n_purchases"))
      views.join(purch, Seq("day"), "full_outer").orderBy("day")
    }),

    // Salted skew join — the salt must be semantically invisible: the oracle
    // is the PLAIN join, so any salting bug (dup/dropped rows) hash-fails.
    "q_salted_join" -> ((s, d) => {
      val big = t(s, d, "lineitem")
        .select(col("l_partkey").as("partkey"), col("l_quantity"))
      val small = t(s, d, "part")
        .select(col("p_partkey").as("partkey"), col("p_brand"))
      SkewJoin.saltedEquiJoin(big, small, "partkey", saltFactor = 8)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"))
        .orderBy("p_brand")
    }),

    // Bloom-prefiltered join — like the salt, the bloom must be
    // semantically invisible: the oracle is the PLAIN selective join, so a
    // false NEGATIVE (dropped matching row) or a leaked false positive
    // hash-fails. The build side (p_size <= 3) matches ~6% of parts, so the
    // probe prefilter drops the bulk of lineitem before the join exchange —
    // the shape whose shuffle-byte cut PlanSpec measures directly.
    "q_bloom_join" -> ((s, d) => {
      val probe = t(s, d, "lineitem")
        .select(col("l_partkey").as("partkey"), col("l_quantity"),
          col("l_extendedprice").cast("decimal(18,2)").as("price"))
      val build = t(s, d, "part").where(col("p_size") <= 3)
        .select(col("p_partkey").as("partkey"), col("p_brand"))
      BloomJoin.prefilteredEquiJoin(probe, build, "partkey",
          expectedBuildItems = 1L << 14)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"),
          sum(col("price")).cast("double").as("sum_price"))
        .orderBy("p_brand")
    }),

    // Scalar-aggregate join (TPC-H Q17 shape): lineitems below 20% of their
    // part's mean quantity. Mean of integral doubles = exact sum / count.
    "q17_small_qty" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val thresh = li.groupBy(col("l_partkey"))
        .agg((lit(0.2) * (sum(col("l_quantity")) / count(lit(1)))).as("qty_thresh"))
      li.join(thresh, "l_partkey")
        .where(col("l_quantity") < col("qty_thresh"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("sum_extprice"))
    })
  )

  // ───────────────────────────── oracles ──────────────────────────────────

  /** Shared SQL fragments (generated where repetitive). */
  private object Sql {
    // MinHash-LSH near-dup pairs → recursive-reachability connected
    // components (shared by the label-propagation row and its
    // large/small-star twin: two independent algorithms, one oracle answer)
    lazy val dedupClustersCc: String =
      s"""WITH RECURSIVE
         |w AS (SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents),
         |sh AS (SELECT doc_id, $wordShingles3 AS s FROM w),
         |sh2 AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
         |sig AS (SELECT doc_id, $minhashSigs AS sigs FROM sh2),
         |bands AS (SELECT doc_id, unnest(range(1, 5)) AS band,
         |  unnest($minhashBands) AS v FROM sig),
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
         |  UNION SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s)
         |SELECT s AS doc_id, least(s, min(t))::BIGINT AS rep
         |FROM reach GROUP BY s ORDER BY doc_id""".stripMargin

    // non-overlapping 16-token tile dedup (shared by the text-keyed
    // dedup_spans row and its hash-keyed shuffle-lean twin, which is
    // result-identical absent a 64-bit span-hash collision)
    lazy val dedupSpansTiled: String =
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |st AS (SELECT doc_id, words,
        |  unnest(generate_series(0, len(words) - 1, 16)) AS s FROM w),
        |c AS (SELECT doc_id, (s // 16)::INT AS chunk_no,
        |    array_to_string(words[s + 1 : s + 16], ' ') AS chunk_text FROM st),
        |k AS (SELECT doc_id, chunk_no, chunk_text FROM c
        |  QUALIFY row_number() OVER (PARTITION BY chunk_text
        |    ORDER BY doc_id, chunk_no) = 1)
        |SELECT doc_id, string_agg(chunk_text, ' ' ORDER BY chunk_no) AS clean_text,
        |  count(*)::BIGINT AS n_spans
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin

    // synthUrl's five construction branches verbatim (doc_id concatenated
    // via an explicit ::VARCHAR — same digits as Spark's cast("string")).
    // NOTE: no line here may START with '||' — this fragment is spliced
    // into oracle strings whose OUTER .stripMargin would eat the first '|'.
    val urlCase: String =
      """CASE m
        |  WHEN 0 THEN 'https://WWW.' || s || '.Example.CO.UK:443/wiki/' ||
        |    doc_id::VARCHAR || '?q=spark&lang=en#Top'
        |  WHEN 1 THEN 'http://u:p@api.' || upper(s) || '.example.com:8080/a/b/c'
        |  WHEN 2 THEN 'https://cdn.' || s || '.example.com/assets/' ||
        |    doc_id::VARCHAR || '.js?v=2&x='
        |  WHEN 3 THEN 'HTTP://' || s || '.example.com:80'
        |  ELSE 'ftp://files.' || s || '.example.org./pub/' || doc_id::VARCHAR || '#readme'
        |  END""".stripMargin

    // the EXPECTED canonical host per branch: lowercased, userinfo and port
    // stripped, trailing root dot removed (s itself is already lowercase)
    val urlHostCase: String =
      """CASE m
        |  WHEN 0 THEN 'www.' || s || '.example.co.uk'
        |  WHEN 1 THEN 'api.' || s || '.example.com'
        |  WHEN 2 THEN 'cdn.' || s || '.example.com'
        |  WHEN 3 THEN s || '.example.com'
        |  ELSE 'files.' || s || '.example.org' END""".stripMargin

    // the EXPECTED canonical URL per branch: lowercased scheme+host,
    // default ports dropped, empty path → '/', fragment dropped (same
    // no-line-starts-with-'||' rule as urlCase)
    val urlCanonCase: String =
      """CASE m
        |  WHEN 0 THEN 'https://www.' || s || '.example.co.uk/wiki/' ||
        |    doc_id::VARCHAR || '?q=spark&lang=en'
        |  WHEN 1 THEN 'http://api.' || s || '.example.com:8080/a/b/c'
        |  WHEN 2 THEN 'https://cdn.' || s || '.example.com/assets/' ||
        |    doc_id::VARCHAR || '.js?v=2&x='
        |  WHEN 3 THEN 'http://' || s || '.example.com/'
        |  ELSE 'ftp://files.' || s || '.example.org/pub/' || doc_id::VARCHAR
        |  END""".stripMargin

    // Shared CTE chain for the pinned-codebook PQ oracles (mirrors
    // Similarity.pqScore over ExtQueries.pinnedCodebook): codebook from the
    // integer formula, encode = strict-< argmin of left-fold sq dists
    // (= ORDER BY d, code pick-first under exact double equality),
    // reconstruction norms and query dot-tables with every fold in index
    // order. Ends with codes/recon/q/qtab; callers append candidate
    // generation, the ADC sum (list(... ORDER BY sub) keeps subspace
    // order), and ranking.
    lazy val pqPinnedCtes: String =
      s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |cb AS (SELECT s.s AS sub, c.c AS code,
         |  list_transform(range(0, 4), p ->
         |    ((((s.s * 31 + c.c * 7 + p * 3) % 11) - 5)::DOUBLE / 8.0)) AS cw
         |  FROM (SELECT unnest(range(0, 16)) AS s) s,
         |       (SELECT unnest(range(0, 8)) AS c) c),
         |cbn AS (SELECT sub, code, cw,
         |  list_reduce(list_prepend(0.0::DOUBLE, list_transform(cw, x -> x * x)),
         |    (x, y) -> x + y) AS nsq FROM cb),
         |dist AS (SELECT e.vec_id, cb.sub, cb.code,
         |  list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 5), i ->
         |    (e.v[cb.sub * 4 + i] - cb.cw[i]) * (e.v[cb.sub * 4 + i] - cb.cw[i]))),
         |    (x, y) -> x + y) AS d
         |  FROM e, cb),
         |codes AS (SELECT vec_id, sub, code FROM (
         |    SELECT vec_id, sub, code, row_number() OVER (
         |      PARTITION BY vec_id, sub ORDER BY d, code) AS rn FROM dist)
         |  WHERE rn = 1),
         |recon AS (SELECT c.vec_id,
         |  list_reduce(list_prepend(0.0::DOUBLE, list(n.nsq ORDER BY c.sub)),
         |    (x, y) -> x + y) AS rsq
         |  FROM codes c JOIN cbn n ON n.sub = c.sub AND n.code = c.code
         |  GROUP BY c.vec_id),
         |q AS (SELECT vec_id AS query_id, v,
         |  sqrt(${dot("v", "v")}) AS qn FROM e WHERE vec_id < 5),
         |qtab AS (SELECT q.query_id, cb.sub, cb.code,
         |  list_reduce(list_prepend(0.0::DOUBLE, list_transform(range(1, 5), i ->
         |    q.v[cb.sub * 4 + i] * cb.cw[i])), (x, y) -> x + y) AS qd
         |  FROM q, cb)""".stripMargin

    // Unrolled integer fixed-point PageRank (mirrors Graph.pageRankExact at
    // the default 85/100 damping, 10^6 scale): requires a prior CTE
    // e(src, dst) of DISTINCT edges; ends in CTE r<iters>(node, rank).
    // `//` is DuckDB's truncating integer division = Spark's `div`.
    def pagerankUnrolled(iters: Int): String = {
      val iterCtes = (1 to iters).map { i =>
        s"""s$i AS (SELECT e.dst AS node, sum(r.rank // d.outdeg) AS in_sum
           |  FROM e JOIN deg d ON d.src = e.src
           |  JOIN r${i - 1} r ON r.node = e.src
           |  GROUP BY e.dst),
           |r$i AS (SELECT n.node,
           |  (150000 + (85 * COALESCE(s.in_sum, 0)) // 100)::BIGINT AS rank
           |  FROM nodes n LEFT JOIN s$i s ON s.node = n.node)""".stripMargin
      }.mkString(",\n")
      s"""deg AS (SELECT src, count(*)::BIGINT AS outdeg FROM e GROUP BY src),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |r0 AS (SELECT node, 1000000::BIGINT AS rank FROM nodes),
         |$iterCtes""".stripMargin
    }

    // Morton/Z-order bit interleave, unrolled to shift/and/or terms —
    // mirrors Layout.zorderKey exactly (bit i of column j → bit i·d + j,
    // inputs clamped to [0, 2^bits) after a BIGINT cast)
    def zorder(colsExpr: Seq[String], bits: Int): String = {
      val d = colsExpr.size
      colsExpr.zipWithIndex.flatMap { case (c, j) =>
        val cl = s"least(greatest($c::BIGINT, 0), ${(1L << bits) - 1})"
        (0 until bits).map(i => s"((($cl >> $i) & 1) << ${i * d + j})")
      }.mkString(" | ")
    }

    // DSIR hashed-bigram fixed-point weight table (mirrors
    // Dsir.importanceWeightsFixed at n=2, scale=2^20, denominator-only
    // smoothing; target = src0 docs, raw = all documents). Ends in CTE
    // `wt(bucket, pf, qf)`.
    def dsirWeights(nBuckets: Int): String =
      s"""tw AS (SELECT list_filter(string_split(lower(text), ' '), t -> len(t) > 0) AS w
         |  FROM documents WHERE source = 'src0'),
         |rw AS (SELECT list_filter(string_split(lower(text), ' '), t -> len(t) > 0) AS w
         |  FROM documents),
         |tg AS (SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS gram
         |  FROM tw WHERE len(w) >= 2),
         |rg AS (SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS gram
         |  FROM rw WHERE len(w) >= 2),
         |tc AS (SELECT ('0x' || substr(md5(gram), 1, 8))::BIGINT % $nBuckets AS bucket,
         |    count(*)::BIGINT AS cnt FROM tg GROUP BY 1),
         |rc AS (SELECT ('0x' || substr(md5(gram), 1, 8))::BIGINT % $nBuckets AS bucket,
         |    count(*)::BIGINT AS cnt FROM rg GROUP BY 1),
         |sup AS (SELECT unnest(range(0, $nBuckets))::BIGINT AS bucket),
         |wt AS (SELECT s.bucket,
         |    ((coalesce(tc.cnt, 0) * 1048576)
         |      // ((SELECT coalesce(sum(cnt), 0) + $nBuckets FROM tc)::BIGINT))::BIGINT AS pf,
         |    ((coalesce(rc.cnt, 0) * 1048576)
         |      // ((SELECT coalesce(sum(cnt), 0) + $nBuckets FROM rc)::BIGINT))::BIGINT AS qf
         |  FROM sup s LEFT JOIN tc ON s.bucket = tc.bucket
         |    LEFT JOIN rc ON s.bucket = rc.bucket)""".stripMargin

    // per-document DSIR scores on top of dsirWeights — ends in CTE
    // `dsir_scores(doc_id, score_fixed, n_grams)`, gram-less docs at 0
    def dsirScores(nBuckets: Int): String =
      s"""${dsirWeights(nBuckets)},
         |docw AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> len(t) > 0) AS w
         |  FROM documents),
         |docg AS (SELECT doc_id, unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS gram
         |  FROM docw WHERE len(w) >= 2),
         |occ AS (SELECT doc_id, ('0x' || substr(md5(gram), 1, 8))::BIGINT % $nBuckets AS bucket
         |  FROM docg),
         |osum AS (SELECT doc_id, sum(wt.pf - wt.qf)::BIGINT AS score_fixed,
         |    count(*)::BIGINT AS n_grams
         |  FROM occ JOIN wt USING (bucket) GROUP BY doc_id),
         |dsir_scores AS (SELECT d.doc_id,
         |    coalesce(o.score_fixed, 0)::BIGINT AS score_fixed,
         |    coalesce(o.n_grams, 0)::BIGINT AS n_grams
         |  FROM documents d LEFT JOIN osum o USING (doc_id))""".stripMargin

    // integer dot product of two BIGINT[] code arrays (exact — order-free)
    def intDot(a: String, b: String): String =
      s"list_reduce(list_concat([0::BIGINT], list_transform(range(1, 65), i -> $a[i] * $b[i])), (x, y) -> x + y)"

    // strict-left-fold dot product of two DOUBLE[] expressions over the
    // first n dims (mirrors Similarity.dotHof's fold order exactly)
    def dotN(a: String, b: String, n: Int): String =
      s"list_reduce(list_concat([0.0::DOUBLE], list_transform(range(1, ${n + 1}), i -> $a[i] * $b[i])), (x, y) -> x + y)"

    // strict-left-fold dot product of two DOUBLE[] expressions, 64 dims
    def dot(a: String, b: String): String = dotN(a, b, 64)

    // int8 quantization of embeddings into BIGINT[] codes — the
    // sim_topk_int8-proven restatement of Similarity.quantizeInt8. Ends in
    // CTE qt(vec_id, cq).
    lazy val int8Codes: String =
      """qe AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |qm AS (SELECT vec_id, v,
        |  list_max(list_transform(v, x -> abs(x))) AS ma FROM qe),
        |qt AS (SELECT vec_id, CASE WHEN ma = 0
        |    THEN list_transform(v, x -> 0::BIGINT)
        |    ELSE list_transform(v, x -> floor(x * 127.0 / ma + 0.5)::BIGINT)
        |  END AS cq FROM qm)""".stripMargin

    // Unrolled portable integer k-means (mirrors
    // Similarity.kmeansAssignPortable at k cells / `updates` Lloyd rounds):
    // exact-integer cosine assignment over the int8 codes (score DESC,
    // cent_id ASC tie-break, zero-norm coalesced to -2 — DuckDB's x/0.0 is
    // NULL like Spark's try_divide), truncating integer mean update (`//`
    // truncates toward zero = Scala Long division), empty cells keep their
    // previous centroid via the LEFT JOIN coalesce. Requires a prior CTE
    // qt(vec_id, cq BIGINT[]) — see [[int8Codes]] — and ends in CTE
    // a<updates+1>(vec_id, cell, score).
    def kmeansUnrolled(k: Int, updates: Int): String = {
      def assign(i: Int, cFrom: String) =
        s"""sc$i AS (SELECT q.vec_id, c.cent_id,
           |  coalesce((${intDot("q.cq", "c.cq")})::DOUBLE /
           |    (sqrt((${intDot("q.cq", "q.cq")})::DOUBLE) *
           |     sqrt((${intDot("c.cq", "c.cq")})::DOUBLE)), -2.0) AS score
           |  FROM qt q CROSS JOIN $cFrom c),
           |a$i AS (SELECT vec_id, cent_id AS cell, score FROM sc$i
           |  QUALIFY row_number() OVER (PARTITION BY vec_id
           |    ORDER BY score DESC, cent_id) = 1)""".stripMargin
      def update(i: Int) =
        s"""s$i AS (SELECT a.cell, p.pos, sum(q.cq[p.pos]) AS s, count(*) AS n
           |  FROM a$i a JOIN qt q ON q.vec_id = a.vec_id
           |  CROSS JOIN (SELECT unnest(range(1, 65)) AS pos) p
           |  GROUP BY a.cell, p.pos),
           |m$i AS (SELECT cell, list(s // n ORDER BY pos) AS cq
           |  FROM s$i GROUP BY cell),
           |c$i AS (SELECT p.cent_id, coalesce(m.cq, p.cq) AS cq
           |  FROM c${i - 1} p LEFT JOIN m$i m ON m.cell = p.cent_id)""".stripMargin
      val rounds = (1 to updates)
        .map(i => assign(i, s"c${i - 1}") + ",\n" + update(i)).mkString(",\n")
      s"""c0 AS (SELECT vec_id AS cent_id, cq FROM qt ORDER BY vec_id LIMIT $k),
         |$rounds,
         |${assign(updates + 1, s"c$updates")}""".stripMargin
    }

    val minhashSigs: String =
      "[" + (1 to 8).map(j =>
        s"list_min(list_transform(s, x -> md5('$j:' || x)))").mkString(", ") + "]"

    // 2-row bands over the 8 signature values (mirrors Dedup bandRows=2)
    val minhashBands: String =
      "[" + (0 until 4).map(b => s"sigs[${2 * b + 1}] || sigs[${2 * b + 2}]")
        .mkString(", ") + "]"

    val simhashBits: String = simhashBitsN(16)

    def simhashBitsN(n: Int): String =
      (0 until n).map(i =>
        s"(CASE WHEN list_sum(list_transform(hs, h -> ((h >> $i) & 1) * 2 - 1)) > 0 THEN ${1L << i} ELSE 0 END)")
        .mkString(" + ")

    val signBucket6: String = signBucket6At(0)

    // sign bucket over dims offset+1 .. offset+6 (rotated second bucketing)
    def signBucket6At(offset: Int): String =
      (0 until 6).map(i =>
        s"(CASE WHEN embedding[${offset + i + 1}] > 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")

    def markerCount(markers: Seq[String]): String = markerCountOver(markers, "toks")

    def markerCountOver(markers: Seq[String], listExpr: String): String =
      s"len(list_filter($listExpr, tk -> list_contains([${markers.map("'" + _ + "'").mkString(",")}], tk)))"

    // word n-gram shingles (range end is exclusive: 1..len-n+1 positions)
    val wordShingles3: String = wordShinglesN(3)

    def wordShinglesN(n: Int): String =
      s"""CASE WHEN len(words) >= $n
         |  THEN list_distinct(list_transform(range(1, len(words) - ${n - 2}),
         |       i -> array_to_string(words[i:i+${n - 1}], ' ')))
         |  ELSE []::VARCHAR[] END""".stripMargin

    // portable unit hash: first 8 md5 hex digits over (key || salt), as a
    // double in [0,1) — mirrors graft.ext.Sampling.unitHash exactly
    def unitHash(keyExpr: String, salt: String = ""): String =
      s"(('0x' || substr(md5($keyExpr || '$salt'), 1, 8))::BIGINT / 4294967296.0)"

    val charShingles4: String =
      """CASE WHEN length(lt) >= 4
        |  THEN list_distinct(list_transform(range(1, length(lt) - 2),
        |       i -> substr(lt, i, 4)))
        |  ELSE []::VARCHAR[] END""".stripMargin

    val rollHash: String =
      """list_reduce(list_concat([0::BIGINT],
        |  list_transform(range(1, length(text) + 1), i -> ord(substr(text, i, 1)))),
        |  (acc, ch) -> (acc * 31 + ch) % 1000000007)""".stripMargin

    // The shared curation-pipeline CTE chain (exact dedup survivors →
    // minhash LSH pairs → connected components → losers), used by the
    // curation_pipeline/_quality/_incremental and curation_funnel oracles.
    // Must follow a "WITH RECURSIVE" header. `src` is the input relation —
    // a table name or a parenthesized subquery (the incremental row feeds
    // the history-filtered batch through the SAME chain).
    def curationCtes(src: String = "documents"): String =
      s"""docs0 AS (SELECT doc_id, text FROM $src d0 WHERE doc_id IN (
         |  SELECT min(doc_id) FROM $src d1 GROUP BY md5(lower(text)))),
         |w AS (SELECT doc_id, string_split(lower(text), ' ') AS words FROM docs0),
         |sh AS (SELECT doc_id, $wordShingles3 AS s FROM w),
         |sh2 AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
         |sig AS (SELECT doc_id, $minhashSigs AS sigs FROM sh2),
         |bands AS (SELECT doc_id, unnest(range(1, 5)) AS band,
         |  unnest($minhashBands) AS v FROM sig),
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
         |losers AS (SELECT s FROM reach GROUP BY s HAVING least(s, min(t)) <> s)""".stripMargin

    // the quality-gate predicate over docs0 rows (min tokens + stopword cap)
    lazy val curationQualityPred: String =
      s"""len(string_split(text, ' ')) >= 30
         |  AND ${markerCountOver(stopwords, "string_split(lower(text), ' ')")}::DOUBLE / len(string_split(text, ' ')) <= 0.25""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(lower(text)) AS fingerprint, min(doc_id)::BIGINT AS keep_id,
        |  count(*)::BIGINT AS n_copies
        |FROM documents GROUP BY 1 ORDER BY fingerprint""".stripMargin,

    // non-overlapping 16-token tiles; first owner by (doc_id, chunk_no) —
    // the same lexicographic order Spark's min(struct(id, chunk_no)) uses
    "dedup_spans" -> Sql.dedupSpansTiled,

    // mirrors dedup_substring_sa: the same constructed fixture text, then
    // BRUTE-FORCE window comparison — every 16-char window, grouped by its
    // literal string; non-first occurrences (global (doc_id, pos) order)
    // union their [i, i+16) cover and merge to islands per doc
    "dedup_substring_sa" ->
      """WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 26),
        |txt AS (SELECT doc_id,
        |  array_to_string(list_transform(range(0, 8 + (doc_id * 3) % 11),
        |    j -> chr(((doc_id * 7 + j * j) % 26 + 97)::INT)), '')
        |  || array_to_string(list_transform(range(0, 24),
        |    j -> chr(((5 * j + 2) % 26 + 97)::INT)), '')
        |  || array_to_string(list_transform(range(0, 10 + (doc_id * 5) % 9),
        |    j -> chr(((doc_id * 7 + (j + 40) * (j + 40)) % 26 + 97)::INT)), '')
        |  AS text FROM d),
        |w AS (SELECT doc_id, unnest(range(0, length(text) - 15)) AS i, text
        |  FROM txt),
        |win AS (SELECT doc_id, i, substr(text, (i + 1)::INT, 16) AS wdw FROM w),
        |firsts AS (SELECT wdw, min(doc_id * 1000 + i) AS firstkey,
        |  count(*) AS n FROM win GROUP BY wdw),
        |dup AS (SELECT win.doc_id, win.i FROM win JOIN firsts USING (wdw)
        |  WHERE firsts.n > 1 AND (win.doc_id * 1000 + win.i) <> firsts.firstkey),
        |cov AS (SELECT DISTINCT doc_id, p FROM (
        |  SELECT doc_id, unnest(range(i, i + 16)) AS p FROM dup)),
        |isl AS (SELECT doc_id, p,
        |  p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp FROM cov)
        |SELECT doc_id, min(p)::BIGINT AS span_start,
        |  (max(p) - min(p) + 1)::BIGINT AS span_len
        |FROM isl GROUP BY doc_id, grp ORDER BY doc_id, span_start""".stripMargin,

    // the hash-keyed form is result-identical to the text-keyed one absent
    // a 64-bit span-hash collision (none at this scale, deterministically),
    // so the same oracle SQL checks it bit-for-bit
    "dedup_spans_hashed" -> Sql.dedupSpansTiled,

    // content-defined tiling: cut after every token whose md5-prefix hash
    // ≡ 0 mod 8 (the same portable tokenHash the Spark side uses), then the
    // identical first-owner + reassembly chain as dedup_spans
    "dedup_spans_anchored" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |b AS (SELECT doc_id, words, list_concat(list_concat(
        |    [0],
        |    list_filter(range(1, len(words) + 1),
        |      i -> ('0x' || substr(md5(words[i]), 1, 8))::BIGINT % 8 = 0)),
        |    [len(words)]) AS bounds FROM w),
        |sp AS (SELECT doc_id, unnest(range(1, len(bounds))) AS pos, words, bounds
        |  FROM b),
        |s0 AS (SELECT doc_id, pos,
        |    array_to_string(words[bounds[pos] + 1 : bounds[pos + 1]], ' ') AS chunk_text
        |  FROM sp),
        |c AS (SELECT doc_id,
        |    (row_number() OVER (PARTITION BY doc_id ORDER BY pos) - 1)::INT AS chunk_no,
        |    chunk_text
        |  FROM s0 WHERE chunk_text <> ''),
        |k AS (SELECT doc_id, chunk_no, chunk_text FROM c
        |  QUALIFY row_number() OVER (PARTITION BY chunk_text
        |    ORDER BY doc_id, chunk_no) = 1)
        |SELECT doc_id, string_agg(chunk_text, ' ' ORDER BY chunk_no) AS clean_text,
        |  count(*)::BIGINT AS n_spans
        |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "dedup_minhash" ->
      s"""WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents),
         |sh AS (SELECT doc_id, ${Sql.wordShingles3} AS s FROM w),
         |sh2 AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
         |sig AS (SELECT doc_id, ${Sql.minhashSigs} AS sigs FROM sh2),
         |bands AS (SELECT doc_id, unnest(range(1, 5)) AS band,
         |  unnest(${Sql.minhashBands}) AS v FROM sig),
         |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.v = b.v
         |  AND a.doc_id < b.doc_id),
         |j AS (SELECT a_id, b_id,
         |  len(list_intersect(x.s, y.s))::DOUBLE / len(list_distinct(list_concat(x.s, y.s))) AS jaccard
         |  FROM cand JOIN sh2 x ON x.doc_id = cand.a_id JOIN sh2 y ON y.doc_id = cand.b_id)
         |SELECT a_id, b_id, jaccard FROM j WHERE jaccard >= 0.5
         |ORDER BY a_id, b_id""".stripMargin,

    // TRUE pair set via exhaustive pair scan — the fast path's xxhash64 LSH
    // is not reproduced here, only its contract: every jaccard>=0.5 pair.
    "dedup_minhash_fast" ->
      s"""WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents),
         |sh AS (SELECT doc_id, ${Sql.wordShingles3} AS s FROM w),
         |sh2 AS (SELECT doc_id, s FROM sh WHERE len(s) > 0)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
         |FROM sh2 a JOIN sh2 b ON a.doc_id < b.doc_id
         |WHERE len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(list_concat(a.s, b.s))) >= 0.5
         |ORDER BY a_id, b_id""".stripMargin,

    "curation_pipeline" ->
      s"""WITH RECURSIVE
         |${Sql.curationCtes()}
         |SELECT doc_id FROM docs0
         |WHERE doc_id NOT IN (SELECT s FROM losers)
         |  AND ${Sql.curationQualityPred}
         |ORDER BY doc_id""".stripMargin,

    // volume, language breadth, global dup membership, classifier pass
    // rate — the classifier arithmetic restated once more as a gate
    "curation_datacard" ->
      """WITH st AS (SELECT source, lang,
        |    len(string_split(text, ' '))::BIGINT AS n_tok,
        |    md5(lower(text)) AS fp,
        |    CASE WHEN coalesce(list_sum(list_transform(
        |        (SELECT list_concat(toks,
        |           CASE WHEN len(toks) >= 2
        |             THEN list_transform(range(1, len(toks)), i -> toks[i] || '_' || toks[i + 1])
        |             ELSE []::VARCHAR[] END)
        |         FROM (SELECT list_filter(string_split(lower(text), ' '),
        |           t -> t <> '') AS toks)),
        |        t -> ((('0x' || substr(md5(t || 'qc'), 1, 8))::BIGINT % 4096)
        |          * 1103515245 + 12345) % 2001 - 1000)), 0) > 0
        |      THEN 1 ELSE 0 END::BIGINT AS pos
        |  FROM documents),
        |dup AS (SELECT fp FROM st GROUP BY fp HAVING count(*) >= 2)
        |SELECT source, count(*)::BIGINT AS n_docs,
        |  sum(n_tok)::BIGINT AS n_tokens,
        |  count(DISTINCT lang)::BIGINT AS n_langs,
        |  sum(CASE WHEN st.fp IN (SELECT fp FROM dup) THEN 1 ELSE 0 END)::BIGINT
        |    AS n_dup_docs,
        |  sum(pos)::BIGINT AS n_quality_pos
        |FROM st GROUP BY source ORDER BY source""".stripMargin,

    // every stage of the one-row recipe restated: the shared curation CTE
    // chain, then the classifier's feature-hash arithmetic as a gate, then
    // the floor+hash epoch multiset — a drift in ANY stage hash-fails
    "curation_recipe_e2e" ->
      s"""WITH RECURSIVE
         |${Sql.curationCtes()},
         |surv AS (SELECT doc_id, text FROM docs0
         |  WHERE doc_id NOT IN (SELECT s FROM losers)
         |    AND ${Sql.curationQualityPred}),
         |survs AS (SELECT surv.doc_id, surv.text, d.source
         |  FROM surv JOIN documents d ON d.doc_id = surv.doc_id),
         |tok AS (SELECT doc_id, source,
         |    list_filter(string_split(lower(text), ' '), t -> t <> '') AS toks
         |  FROM survs),
         |f AS (SELECT doc_id, source, list_concat(toks,
         |    CASE WHEN len(toks) >= 2
         |      THEN list_transform(range(1, len(toks)), i -> toks[i] || '_' || toks[i + 1])
         |      ELSE []::VARCHAR[] END) AS feats
         |  FROM tok),
         |sc AS (SELECT doc_id, source,
         |    coalesce(list_sum(list_transform(feats, t ->
         |      ((('0x' || substr(md5(t || 'qc'), 1, 8))::BIGINT % 4096)
         |        * 1103515245 + 12345) % 2001 - 1000)), 0)::BIGINT AS score_fp
         |  FROM f),
         |kept AS (SELECT doc_id, source FROM sc WHERE score_fp > 0),
         |e AS (SELECT doc_id, source,
         |    CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 2.0
         |         WHEN 'src2' THEN 0.75 ELSE 1.0 END AS ep
         |  FROM kept),
         |n AS (SELECT doc_id, source,
         |    (floor(ep) + CASE WHEN ${Sql.unitHash("doc_id::VARCHAR", "ep")} < ep - floor(ep)
         |       THEN 1 ELSE 0 END)::INT AS nc
         |  FROM e)
         |SELECT doc_id, source, unnest(generate_series(1, nc))::INT AS copy_no
         |FROM n WHERE nc >= 1 ORDER BY doc_id, copy_no""".stripMargin,

    // quality-priority survivor policy: losers = cluster members minus each
    // cluster's (quality DESC, doc_id ASC) best; quality = regex word count
    // over the exact-dedup survivors, exactly as the Spark side computes it
    "curation_pipeline_quality" ->
      s"""WITH RECURSIVE
         |${Sql.curationCtes()},
         |cl AS (SELECT s AS doc_id, least(s, min(t)) AS rep FROM reach GROUP BY s),
         |q AS (SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z]+')) AS q FROM docs0),
         |surv AS (SELECT doc_id FROM (
         |  SELECT cl.doc_id, row_number() OVER (PARTITION BY cl.rep
         |    ORDER BY q.q DESC, cl.doc_id ASC) AS rk
         |  FROM cl JOIN q USING (doc_id)) WHERE rk = 1),
         |qlosers AS (SELECT doc_id AS s FROM cl
         |  WHERE doc_id NOT IN (SELECT doc_id FROM surv))
         |SELECT doc_id FROM docs0
         |WHERE doc_id NOT IN (SELECT s FROM qlosers)
         |  AND ${Sql.curationQualityPred}
         |ORDER BY doc_id""".stripMargin,

    "curation_pipeline_incremental" ->
      s"""WITH RECURSIVE
         |${Sql.curationCtes("""(SELECT d.doc_id, d.text FROM documents d
           |  WHERE d.doc_id % 10 >= 7 AND NOT EXISTS (
           |    SELECT 1 FROM documents h WHERE h.doc_id % 10 < 7
           |    AND md5(lower(h.text)) = md5(lower(d.text))))""".stripMargin)}
         |SELECT doc_id FROM docs0
         |WHERE doc_id NOT IN (SELECT s FROM losers)
         |  AND ${Sql.curationQualityPred}
         |ORDER BY doc_id""".stripMargin,

    "curation_funnel" ->
      s"""WITH RECURSIVE
         |${Sql.curationCtes()}
         |SELECT '0_input' AS stage, (SELECT count(*) FROM documents)::BIGINT AS n_docs
         |UNION ALL
         |SELECT '1_exact_dedup', (SELECT count(*) FROM docs0)::BIGINT
         |UNION ALL
         |SELECT '2_neardup_dedup',
         |  ((SELECT count(*) FROM docs0) - (SELECT count(*) FROM losers))::BIGINT
         |UNION ALL
         |SELECT '3_quality_gate', (SELECT count(*) FROM docs0
         |  WHERE doc_id NOT IN (SELECT s FROM losers)
         |    AND ${Sql.curationQualityPred})::BIGINT
         |UNION ALL
         |SELECT '5_scrubbed', (SELECT count(*) FROM docs0
         |  WHERE doc_id NOT IN (SELECT s FROM losers)
         |    AND ${Sql.curationQualityPred})::BIGINT
         |ORDER BY stage""".stripMargin,

    // same fingerprint idiom as text_fingerprint's canon_fp
    "curation_source_overlap" ->
      """WITH fp AS (SELECT DISTINCT source AS src,
        |    md5(array_to_string(list_sort(list_distinct(
        |      string_split(lower(text), ' '))), ' ')) AS fp
        |  FROM documents)
        |SELECT a.src AS src_a, b.src AS src_b, count(*)::BIGINT AS n_common
        |FROM fp a JOIN fp b ON a.fp = b.fp AND a.src < b.src
        |GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin,

    "dedup_clusters" -> Sql.dedupClustersCc,

    // identical reachability oracle: the star-alternation row must produce
    // the exact same component labeling as the label-propagation row
    "dedup_clusters_star" -> Sql.dedupClustersCc,

    // same reachability CTE as dedup_clusters, then the survivor choice
    // restated as a rank window (quality DESC, doc_id ASC) — the Spark side
    // computes the identical row via partial-aggregating max(struct)
    "dedup_survivors_quality" ->
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
         |cl AS (SELECT s AS doc_id, least(s, min(t)) AS rep FROM reach GROUP BY s),
         |q AS (SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z]+'))::BIGINT AS q FROM documents)
         |SELECT rep::BIGINT AS rep, doc_id::BIGINT AS survivor_id, q::BIGINT AS quality FROM (
         |  SELECT cl.rep, cl.doc_id, q.q,
         |    row_number() OVER (PARTITION BY cl.rep ORDER BY q.q DESC, cl.doc_id ASC) AS rk
         |  FROM cl JOIN q USING (doc_id))
         |WHERE rk = 1 ORDER BY rep""".stripMargin,

    "dedup_simhash" ->
      s"""SELECT doc_id, (${Sql.simhashBits})::BIGINT AS simhash FROM (
         |  SELECT doc_id, list_distinct(list_transform(
         |    string_split(lower(text), ' '),
         |    tk -> ('0x' || substr(md5(tk), 1, 8))::BIGINT)) AS hs
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin,

    // exhaustive scan — the banded Spark plan is provably recall-1 for
    // hamming <= 3, so the true pair set IS its contract
    "dedup_simhash_pairs" ->
      s"""WITH f AS (
         |  SELECT doc_id, (${Sql.simhashBits})::BIGINT AS simhash FROM (
         |    SELECT doc_id, list_distinct(list_transform(
         |      string_split(lower(text), ' '),
         |      tk -> ('0x' || substr(md5(tk), 1, 8))::BIGINT)) AS hs
         |    FROM documents))
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  bit_count(xor(a.simhash, b.simhash))::INT AS hamming
         |FROM f a JOIN f b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
         |ORDER BY a_id, b_id""".stripMargin,

    "dedup_simhash_pairs_wide" ->
      s"""WITH f AS (
         |  SELECT doc_id, (${Sql.simhashBitsN(60)})::BIGINT AS simhash FROM (
         |    SELECT doc_id, list_distinct(list_transform(
         |      string_split(lower(text), ' '),
         |      tk -> ('0x' || substr(md5(tk), 1, 15))::BIGINT)) AS hs
         |    FROM documents))
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  bit_count(xor(a.simhash, b.simhash))::INT AS hamming
         |FROM f a JOIN f b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 4
         |ORDER BY a_id, b_id""".stripMargin,

    "dedup_ngram" ->
      s"""WITH c AS (SELECT doc_id, lang, lower(text) AS lt FROM documents),
         |sh AS (SELECT doc_id, lang, ${Sql.charShingles4} AS s FROM c),
         |sh2 AS (SELECT doc_id, lang, s FROM sh WHERE len(s) > 0)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
         |FROM sh2 a JOIN sh2 b ON a.lang = b.lang AND a.doc_id < b.doc_id
         |WHERE len(list_intersect(a.s, b.s))::DOUBLE / len(list_distinct(list_concat(a.s, b.s))) >= 0.5
         |ORDER BY a_id, b_id""".stripMargin,

    // exhaustive exact restatement: the prefix filter is a Spark-side
    // optimization with a no-false-negative theorem, so the oracle checks
    // the SEMANTICS (all qualifying pairs) against a full quadratic scan
    "dedup_jaccard_prefix" ->
      """WITH w AS (SELECT doc_id,
        |    list_distinct(list_filter(string_split(lower(text), ' '),
        |      t -> len(t) > 0)) AS ts
        |  FROM documents),
        |w2 AS (SELECT doc_id, ts FROM w WHERE len(ts) > 0)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  len(list_intersect(a.ts, b.ts))::BIGINT AS inter_cnt,
        |  (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts)))::BIGINT AS union_cnt
        |FROM w2 a JOIN w2 b ON a.doc_id < b.doc_id
        |WHERE 2 * len(list_intersect(a.ts, b.ts))
        |  >= (len(a.ts) + len(b.ts) - len(list_intersect(a.ts, b.ts)))
        |ORDER BY a_id, b_id""".stripMargin,

    // the (length bucket × first token) block restated as a two-condition
    // equi-join — injective vs the Spark side's "len|tok" key (the int
    // component cannot contain the '|' delimiter)
    "dedup_editdist" ->
      """SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  levenshtein(a.text, b.text)::INT AS edit_dist
        |FROM documents a JOIN documents b
        |  ON (length(a.text) // 50) = (length(b.text) // 50)
        |  AND string_split(a.text, ' ')[1] = string_split(b.text, ' ')[1]
        |  AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.text, b.text) <= 50
        |ORDER BY a_id, b_id""".stripMargin,

    "dedup_embedding" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(${Sql.dot("v", "v")}) AS nm FROM e)
         |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |  ${Sql.dot("a.v", "b.v")} / (a.nm * b.nm) AS score
         |FROM n a JOIN n b ON a.vec_id < b.vec_id
         |WHERE ${Sql.dot("a.v", "b.v")} / (a.nm * b.nm) >= 0.4
         |ORDER BY a_id, b_id""".stripMargin,

    // mirrors Similarity.semanticDedup: centroids = 8 lowest-id vectors,
    // cell = argmax cosine (desc score, asc cent_id tie-break, null→-2),
    // dup = any lower-id cell-mate at cosine >= 0.4
    "dedup_semantic" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |c AS (SELECT vec_id AS cent_id, v AS cv FROM e ORDER BY vec_id LIMIT 8),
         |sc AS (SELECT e.vec_id, e.v, c.cent_id,
         |    coalesce(${Sql.dot("e.v", "c.cv")} /
         |      (sqrt(${Sql.dot("e.v", "e.v")}) * sqrt(${Sql.dot("c.cv", "c.cv")})),
         |      -2.0) AS score
         |  FROM e CROSS JOIN c),
         |asn AS (SELECT vec_id, v, cent_id AS cell FROM sc
         |  QUALIFY row_number() OVER (PARTITION BY vec_id
         |    ORDER BY score DESC, cent_id) = 1),
         |d AS (SELECT DISTINCT b.vec_id AS id FROM asn a JOIN asn b
         |  ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE ${Sql.dot("a.v", "b.v")} /
         |    (sqrt(${Sql.dot("a.v", "a.v")}) * sqrt(${Sql.dot("b.v", "b.v")})) >= 0.4)
         |SELECT asn.vec_id AS id, asn.cell, (d.id IS NOT NULL) AS is_dup
         |FROM asn LEFT JOIN d ON d.id = asn.vec_id
         |ORDER BY id""".stripMargin,

    "dedup_embedding_lsh" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |  (${Sql.signBucket6})::BIGINT AS bucket FROM embeddings),
         |n AS (SELECT vec_id, v, bucket, sqrt(${Sql.dot("v", "v")}) AS nm FROM e)
         |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |  ${Sql.dot("a.v", "b.v")} / (a.nm * b.nm) AS score
         |FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE ${Sql.dot("a.v", "b.v")} / (a.nm * b.nm) >= 0.3
         |ORDER BY a_id, b_id""".stripMargin,

    "dedup_embedding_lsh_mp" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |  (${Sql.signBucket6})::BIGINT AS bucket FROM embeddings),
         |n AS (SELECT vec_id, v, bucket, sqrt(${Sql.dot("v", "v")}) AS nm FROM e),
         |pr AS (SELECT vec_id, v, nm,
         |  unnest(list_concat([bucket],
         |    list_transform(range(0, 6), i -> xor(bucket, 1::BIGINT << i)))) AS pbucket
         |  FROM n)
         |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |  ${Sql.dot("a.v", "b.v")} / (a.nm * b.nm) AS score
         |FROM pr a JOIN n b ON a.pbucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE ${Sql.dot("a.v", "b.v")} / (a.nm * b.nm) >= 0.3
         |ORDER BY a_id, b_id""".stripMargin,

    // single-bit-flip probe UNION rotated second bucketing (dims 7-12);
    // UNION is set-semantics, deduplicating pairs found by both branches
    // (scores are bit-identical: same strict left fold)
    "dedup_embedding_lsh_rot" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |  (${Sql.signBucket6})::BIGINT AS bucket,
         |  (${Sql.signBucket6At(6)})::BIGINT AS rbucket FROM embeddings),
         |n AS (SELECT vec_id, v, bucket, rbucket, sqrt(${Sql.dot("v", "v")}) AS nm FROM e),
         |pr AS (SELECT vec_id, v, nm,
         |  unnest(list_concat([bucket],
         |    list_transform(range(0, 6), i -> xor(bucket, 1::BIGINT << i)))) AS pbucket
         |  FROM n)
         |SELECT a_id, b_id, score FROM (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |    ${Sql.dot("a.v", "b.v")} / (a.nm * b.nm) AS score
         |  FROM pr a JOIN n b ON a.pbucket = b.bucket AND a.vec_id < b.vec_id
         |  WHERE ${Sql.dot("a.v", "b.v")} / (a.nm * b.nm) >= 0.3
         |  UNION
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |    ${Sql.dot("a.v", "b.v")} / (a.nm * b.nm) AS score
         |  FROM n a JOIN n b ON a.rbucket = b.rbucket AND a.vec_id < b.vec_id
         |  WHERE ${Sql.dot("a.v", "b.v")} / (a.nm * b.nm) >= 0.3)
         |ORDER BY a_id, b_id""".stripMargin,

    "sim_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(${Sql.dot("v", "v")}) AS nm FROM e),
         |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS id,
         |  ${Sql.dot("q.v", "c.v")} / (q.nm * c.nm) AS score
         |  FROM n q JOIN n c ON q.vec_id < 5 AND c.vec_id <> q.vec_id),
         |ranked AS (SELECT query_id, id, score, row_number() OVER (
         |  PARTITION BY query_id ORDER BY score DESC, id)::INT AS rank FROM scored)
         |SELECT query_id, rank, id, score FROM ranked WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin,

    // mirrors Similarity.pqTopKPinned: the shared pinned-PQ CTE chain
    // (Sql.pqPinnedCtes), a flat-scan ADC over every (query, corpus) pair,
    // score = adc / (qn · sqrt(reconSq)) — every double op in the same
    // order as the Spark plan
    "sim_topk_pq_fixed" ->
      s"""WITH ${Sql.pqPinnedCtes},
         |adc AS (SELECT t.query_id, c.vec_id AS id,
         |  list_reduce(list_prepend(0.0::DOUBLE, list(t.qd ORDER BY c.sub)),
         |    (x, y) -> x + y) AS adot
         |  FROM codes c JOIN qtab t ON t.sub = c.sub AND t.code = c.code
         |  GROUP BY t.query_id, c.vec_id),
         |scored AS (SELECT a.query_id, a.id,
         |  a.adot / (q.qn * sqrt(r.rsq)) AS score
         |  FROM adc a JOIN recon r ON r.vec_id = a.id
         |  JOIN q ON q.query_id = a.query_id
         |  WHERE a.id <> a.query_id)
         |SELECT query_id, rank, id, score FROM (
         |  SELECT query_id, id, score, row_number() OVER (
         |    PARTITION BY query_id ORDER BY score DESC, id)::INT AS rank
         |  FROM scored)
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // mirrors Similarity.ivfPqTopKPinned: the same pinned-PQ chain plus
    // IVF — centroids = 8 lowest-id vectors, corpus cell = argmax cosine
    // (coalesce -2 for zero norm, min cent_id ties — dedup_semantic's
    // proven restatement), query probes its top-4 cells, and the ADC sum
    // runs only over candidates whose cell is probed
    "sim_topk_ivfpq_fixed" ->
      s"""WITH ${Sql.pqPinnedCtes},
         |cent AS (SELECT vec_id AS cent_id, v AS cv FROM e
         |  ORDER BY vec_id LIMIT 8),
         |casn AS (SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, c.cent_id AS cell, row_number() OVER (
         |      PARTITION BY e.vec_id ORDER BY
         |        coalesce(${Sql.dot("e.v", "c.cv")} /
         |          (sqrt(${Sql.dot("e.v", "e.v")}) * sqrt(${Sql.dot("c.cv", "c.cv")})),
         |          -2.0) DESC, c.cent_id) AS rn
         |    FROM e CROSS JOIN cent c) WHERE rn = 1),
         |probe AS (SELECT query_id, cell FROM (
         |    SELECT q.query_id, c.cent_id AS cell, row_number() OVER (
         |      PARTITION BY q.query_id ORDER BY
         |        coalesce(${Sql.dot("q.v", "c.cv")} /
         |          (sqrt(${Sql.dot("q.v", "q.v")}) * sqrt(${Sql.dot("c.cv", "c.cv")})),
         |          -2.0) DESC, c.cent_id) AS rn
         |    FROM q CROSS JOIN cent c) WHERE rn <= 4),
         |cand AS (SELECT p.query_id, a.vec_id
         |  FROM casn a JOIN probe p ON p.cell = a.cell),
         |adc AS (SELECT cd.query_id, c.vec_id AS id,
         |  list_reduce(list_prepend(0.0::DOUBLE, list(t.qd ORDER BY c.sub)),
         |    (x, y) -> x + y) AS adot
         |  FROM cand cd
         |  JOIN codes c ON c.vec_id = cd.vec_id
         |  JOIN qtab t ON t.query_id = cd.query_id
         |    AND t.sub = c.sub AND t.code = c.code
         |  GROUP BY cd.query_id, c.vec_id),
         |scored AS (SELECT a.query_id, a.id,
         |  a.adot / (q.qn * sqrt(r.rsq)) AS score
         |  FROM adc a JOIN recon r ON r.vec_id = a.id
         |  JOIN q ON q.query_id = a.query_id
         |  WHERE a.id <> a.query_id)
         |SELECT query_id, rank, id, score FROM (
         |  SELECT query_id, id, score, row_number() OVER (
         |    PARTITION BY query_id ORDER BY score DESC, id)::INT AS rank
         |  FROM scored)
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "sim_topk_int8" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |m AS (SELECT vec_id, v,
         |  list_max(list_transform(v, x -> abs(x))) AS ma FROM e),
         |qt AS (SELECT vec_id, CASE WHEN ma = 0
         |    THEN list_transform(v, x -> 0::BIGINT)
         |    ELSE list_transform(v, x -> floor(x * 127.0 / ma + 0.5)::BIGINT)
         |  END AS cv FROM m),
         |n AS (SELECT vec_id, cv,
         |  sqrt((${Sql.intDot("cv", "cv")})::DOUBLE) AS nm FROM qt),
         |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS id,
         |  (${Sql.intDot("q.cv", "c.cv")})::DOUBLE / (q.nm * c.nm) AS score
         |  FROM n q JOIN n c ON q.vec_id < 5 AND c.vec_id <> q.vec_id),
         |ranked AS (SELECT query_id, id, score, row_number() OVER (
         |  PARTITION BY query_id ORDER BY score DESC, id)::INT AS rank FROM scored)
         |SELECT query_id, rank, id, score FROM ranked WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin,

    "sim_topk_refined" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |n AS (SELECT vec_id, v,
         |  sqrt(${Sql.dotN("v", "v", 16)}) AS pnm,
         |  sqrt(${Sql.dot("v", "v")}) AS nm FROM e),
         |pre AS (SELECT q.vec_id AS query_id, c.vec_id AS id,
         |  ${Sql.dotN("q.v", "c.v", 16)} / (q.pnm * c.pnm) AS pscore
         |  FROM n q JOIN n c ON q.vec_id < 5 AND c.vec_id <> q.vec_id),
         |short AS (SELECT query_id, id FROM (
         |  SELECT query_id, id, row_number() OVER (
         |    PARTITION BY query_id ORDER BY pscore DESC, id) AS r FROM pre)
         |  WHERE r <= 50),
         |rescored AS (SELECT s.query_id, s.id,
         |  ${Sql.dot("q.v", "c.v")} / (q.nm * c.nm) AS score
         |  FROM short s
         |  JOIN n q ON q.vec_id = s.query_id
         |  JOIN n c ON c.vec_id = s.id),
         |ranked AS (SELECT query_id, id, score, row_number() OVER (
         |  PARTITION BY query_id ORDER BY score DESC, id)::INT AS rank FROM rescored)
         |SELECT query_id, rank, id, score FROM ranked WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin,

    // mirrors Similarity.hardNegativesTopK: sim_topk's scored join under a
    // label-mismatch predicate (which also excludes the anchor itself)
    "sim_hard_negatives" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |n AS (SELECT vec_id, label, v, sqrt(${Sql.dot("v", "v")}) AS nm FROM e),
         |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS id,
         |  ${Sql.dot("q.v", "c.v")} / (q.nm * c.nm) AS score
         |  FROM n q JOIN n c
         |  ON q.vec_id < 5 AND c.label <> q.label),
         |ranked AS (SELECT query_id, id, score, row_number() OVER (
         |  PARTITION BY query_id ORDER BY score DESC, id)::INT AS rank FROM scored)
         |SELECT query_id, rank, id, score FROM ranked WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin,

    // mirrors Similarity.kmeansAssignPortable(k=8, updates=2): int8 codes,
    // three unrolled exact-integer cosine assignments, two truncating
    // integer-mean updates — fitted centroids AND assignments on the hash
    "sim_kmeans" ->
      s"""WITH ${Sql.int8Codes},
         |${Sql.kmeansUnrolled(8, 2)}
         |SELECT vec_id, cell, score FROM a3 ORDER BY vec_id""".stripMargin,

    // mirrors Sampling.capPerGroupSkewSafe over the kmeans cells (kept set
    // identical to the rank-window form, which the oracle restates)
    "sample_cluster_balance" ->
      s"""WITH ${Sql.int8Codes},
         |${Sql.kmeansUnrolled(8, 2)}
         |SELECT vec_id, cell FROM a3
         |QUALIFY row_number() OVER (PARTITION BY cell
         |  ORDER BY ${Sql.unitHash("vec_id::VARCHAR", "bal")} ASC, vec_id ASC) <= 40
         |ORDER BY vec_id""".stripMargin,

    "sim_topk_lsh" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |  (${Sql.signBucket6})::BIGINT AS bucket FROM embeddings),
         |n AS (SELECT vec_id, v, bucket, sqrt(${Sql.dot("v", "v")}) AS nm FROM e),
         |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS id,
         |  ${Sql.dot("q.v", "c.v")} / (q.nm * c.nm) AS score
         |  FROM n q JOIN n c ON q.bucket = c.bucket AND q.vec_id < 5
         |  AND c.vec_id <> q.vec_id),
         |ranked AS (SELECT query_id, id, score, row_number() OVER (
         |  PARTITION BY query_id ORDER BY score DESC, id)::INT AS rank FROM scored)
         |SELECT query_id, rank, id, score FROM ranked WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    // mirrors Similarity.mmrRerank(kCand=10, kSel=5): brute candidates,
    // candidate-pair cosines, then the greedy rounds unrolled — each
    // round's penalty joins the accumulated selection
    "sim_mmr_rerank" -> {
      val rounds = (2 to 5).map { r =>
        val prev = s"sa${r - 1}"
        s"""pen$r AS (SELECT s.query_id, s.a AS id, max(s.sim) AS maxsim
           |  FROM sims s JOIN $prev t ON t.query_id = s.query_id AND t.id = s.b
           |  GROUP BY 1, 2),
           |cr$r AS (SELECT c.query_id, c.id, c.rel - 0.5 * p.maxsim AS sc
           |  FROM cands c JOIN pen$r p ON p.query_id = c.query_id AND p.id = c.id
           |  WHERE NOT EXISTS (SELECT 1 FROM $prev t
           |    WHERE t.query_id = c.query_id AND t.id = c.id)),
           |sel$r AS (SELECT query_id, $r AS sel_rank, id, sc AS mmr FROM (
           |  SELECT query_id, id, sc, row_number() OVER (PARTITION BY query_id
           |    ORDER BY sc DESC, id) AS rn FROM cr$r) WHERE rn = 1),
           |sa$r AS (SELECT * FROM $prev UNION ALL SELECT * FROM sel$r)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(${Sql.dot("v", "v")}) AS nm FROM e),
         |bsc AS (SELECT q.vec_id AS query_id, c.vec_id AS id,
         |  ${Sql.dot("q.v", "c.v")} / (q.nm * c.nm) AS score
         |  FROM n q JOIN n c ON q.vec_id < 5 AND c.vec_id <> q.vec_id),
         |brk AS (SELECT query_id, id, score, row_number() OVER (
         |  PARTITION BY query_id ORDER BY score DESC, id) AS rank FROM bsc),
         |cands AS (SELECT query_id, id, score AS rel FROM brk WHERE rank <= 10),
         |cv AS (SELECT c.query_id, c.id, n.v, n.nm FROM cands c
         |  JOIN n ON n.vec_id = c.id),
         |sims AS (SELECT x.query_id, x.id AS a, y.id AS b,
         |  ${Sql.dot("x.v", "y.v")} / (x.nm * y.nm) AS sim
         |  FROM cv x JOIN cv y ON x.query_id = y.query_id AND x.id <> y.id),
         |sa1 AS (SELECT query_id, 1 AS sel_rank, id, rel AS mmr FROM (
         |  SELECT query_id, id, rel, row_number() OVER (PARTITION BY query_id
         |    ORDER BY rel DESC, id) AS rn FROM cands) WHERE rn = 1),
         |$rounds
         |SELECT query_id, sel_rank, id, mmr FROM sa5
         |ORDER BY query_id, sel_rank""".stripMargin
    },

    // mirrors sim_recall_eval: the brute and LSH chains side by side, then
    // the per-query overlap census
    "sim_recall_eval" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |  (${Sql.signBucket6})::BIGINT AS bucket FROM embeddings),
         |n AS (SELECT vec_id, v, bucket, sqrt(${Sql.dot("v", "v")}) AS nm FROM e),
         |bsc AS (SELECT q.vec_id AS query_id, c.vec_id AS id,
         |  ${Sql.dot("q.v", "c.v")} / (q.nm * c.nm) AS score
         |  FROM n q JOIN n c ON q.vec_id < 5 AND c.vec_id <> q.vec_id),
         |brk AS (SELECT query_id, id, row_number() OVER (
         |  PARTITION BY query_id ORDER BY score DESC, id) AS rank FROM bsc),
         |bf AS (SELECT query_id, id FROM brk WHERE rank <= 5),
         |lsc AS (SELECT q.vec_id AS query_id, c.vec_id AS id,
         |  ${Sql.dot("q.v", "c.v")} / (q.nm * c.nm) AS score
         |  FROM n q JOIN n c ON q.bucket = c.bucket AND q.vec_id < 5
         |  AND c.vec_id <> q.vec_id),
         |lrk AS (SELECT query_id, id, row_number() OVER (
         |  PARTITION BY query_id ORDER BY score DESC, id) AS rank FROM lsc),
         |ls AS (SELECT query_id, id FROM lrk WHERE rank <= 5),
         |mpr AS (SELECT vec_id AS query_id, v, nm,
         |  unnest(list_concat([bucket],
         |    list_transform(range(0, 6), i -> xor(bucket, 1::BIGINT << i)))) AS pbucket
         |  FROM n WHERE vec_id < 5),
         |msc AS (SELECT p.query_id, c.vec_id AS id,
         |  ${Sql.dot("p.v", "c.v")} / (p.nm * c.nm) AS score
         |  FROM mpr p JOIN n c ON p.pbucket = c.bucket AND c.vec_id <> p.query_id),
         |mrk AS (SELECT query_id, id, row_number() OVER (
         |  PARTITION BY query_id ORDER BY score DESC, id) AS rank FROM msc),
         |ms AS (SELECT query_id, id FROM mrk WHERE rank <= 5),
         |tn AS (SELECT query_id, count(*)::BIGINT AS n_true FROM bf GROUP BY 1),
         |h1 AS (SELECT bf.query_id, count(*)::BIGINT AS hits_lsh
         |  FROM bf JOIN ls USING (query_id, id) GROUP BY 1),
         |h2 AS (SELECT bf.query_id, count(*)::BIGINT AS hits_mp
         |  FROM bf JOIN ms USING (query_id, id) GROUP BY 1)
         |SELECT tn.query_id, n_true,
         |  coalesce(hits_lsh, 0)::BIGINT AS hits_lsh,
         |  coalesce(hits_mp, 0)::BIGINT AS hits_mp,
         |  ((coalesce(hits_lsh, 0) * 1000000) // n_true)::BIGINT AS recall_lsh_fp,
         |  ((coalesce(hits_mp, 0) * 1000000) // n_true)::BIGINT AS recall_mp_fp
         |FROM tn LEFT JOIN h1 USING (query_id) LEFT JOIN h2 USING (query_id)
         |ORDER BY query_id""".stripMargin,

    // full-probe IVF ≡ brute force, so this is sim_topk's oracle verbatim
    "sim_topk_ivf" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(${Sql.dot("v", "v")}) AS nm FROM e),
         |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS id,
         |  ${Sql.dot("q.v", "c.v")} / (q.nm * c.nm) AS score
         |  FROM n q JOIN n c ON q.vec_id < 5 AND c.vec_id <> q.vec_id),
         |ranked AS (SELECT query_id, id, score, row_number() OVER (
         |  PARTITION BY query_id ORDER BY score DESC, id)::INT AS rank FROM scored)
         |SELECT query_id, rank, id, score FROM ranked WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin,

    "sim_topk_ivf_filtered" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |n AS (SELECT vec_id, label, v, sqrt(${Sql.dot("v", "v")}) AS nm FROM e),
         |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS id,
         |  ${Sql.dot("q.v", "c.v")} / (q.nm * c.nm) AS score
         |  FROM n q JOIN n c
         |  ON q.vec_id < 5 AND c.vec_id <> q.vec_id AND c.label = 2),
         |ranked AS (SELECT query_id, id, score, row_number() OVER (
         |  PARTITION BY query_id ORDER BY score DESC, id)::INT AS rank FROM scored)
         |SELECT query_id, rank, id, score FROM ranked WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin,

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
    "q_hll_sliding" ->
      s"""WITH h AS (SELECT date_trunc('hour', ts) AS hr, user_id,
         |    ('0x' || substr(md5(user_id::VARCHAR || 'hll'), 1, 15))::BIGINT AS x
         |  FROM events),
         |r AS (SELECT hr, x & 63 AS bucket,
         |  CASE WHEN (x >> 6) = 0 THEN 55
         |       ELSE 55 - length(bin(x >> 6)) END AS rho FROM h),
         |regs AS (SELECT hr, bucket, max(rho) AS register FROM r GROUP BY 1, 2),
         |m AS (SELECT hr + o.o * INTERVAL 1 HOUR AS win_hr, bucket, register
         |  FROM regs, (SELECT unnest(range(0, 3)) AS o) o),
         |wr AS (SELECT win_hr, bucket, max(register) AS register FROM m GROUP BY 1, 2),
         |agg AS (SELECT win_hr, count(*)::BIGINT AS buckets_hit,
         |  sum((2.0 ** (55 - register))::BIGINT)::BIGINT AS d_obs FROM wr GROUP BY 1),
         |d AS (SELECT win_hr, buckets_hit,
         |  (d_obs + (64 - buckets_hit) * (1::BIGINT << 55))::BIGINT AS d_denom FROM agg),
         |est AS (SELECT win_hr, buckets_hit, d_denom,
         |  ${Sketches.hllCorrectedSql(
             s"((${Sketches.HllEstNumerator}::HUGEINT) // (1000::HUGEINT * d_denom))::BIGINT",
             "buckets_hit")}
         |    AS est_users FROM d),
         |ex AS (SELECT hr + o.o * INTERVAL 1 HOUR AS win_hr,
         |  count(DISTINCT user_id)::BIGINT AS exact_users
         |  FROM h, (SELECT unnest(range(0, 3)) AS o) o GROUP BY 1)
         |SELECT strftime(est.win_hr, '%Y%m%d%H') AS win_hr, buckets_hit,
         |  d_denom, est_users, exact_users
         |FROM est JOIN ex USING (win_hr) ORDER BY win_hr""".stripMargin,

    // mirrors q_quantile_windowed: the E19c histogram law per hour
    "q_quantile_windowed" ->
      """WITH c AS (SELECT strftime(date_trunc('hour', ts), '%Y%m%d%H') AS g,
        |    least(floor(value / 25.0), 19)::INT AS bucket,
        |    count(*)::BIGINT AS c FROM events GROUP BY 1, 2),
        |cum AS (SELECT g, bucket, c,
        |    sum(c) OVER (PARTITION BY g ORDER BY bucket)::BIGINT AS cum,
        |    sum(c) OVER (PARTITION BY g)::BIGINT AS n FROM c),
        |p50 AS (SELECT g, min(bucket)::INT AS p50_bucket FROM cum
        |  WHERE cum >= (n * 1 + 1) // 2 GROUP BY g),
        |p95 AS (SELECT g, min(bucket)::INT AS p95_bucket FROM cum
        |  WHERE cum >= (n * 19 + 19) // 20 GROUP BY g),
        |base AS (SELECT g, max(n)::BIGINT AS n FROM cum GROUP BY g)
        |SELECT base.g AS hr, n,
        |  p50_bucket, ((p50_bucket + 1) * 25.0)::DOUBLE AS p50_hi,
        |  p95_bucket, ((p95_bucket + 1) * 25.0)::DOUBLE AS p95_hi
        |FROM base JOIN p50 USING (g) JOIN p95 USING (g)
        |ORDER BY hr""".stripMargin,

    // mirrors curation_snapshot_diff's perturbation + full-outer census
    "curation_snapshot_diff" ->
      """WITH old AS (SELECT doc_id, md5(text) AS fp_old FROM documents),
        |neu AS (SELECT doc_id,
        |    md5(CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END) AS fp_new
        |  FROM documents WHERE doc_id % 17 <> 0
        |  UNION ALL SELECT doc_id + 100000, md5(text) FROM documents
        |  WHERE doc_id % 19 = 0)
        |SELECT
        |  sum(CASE WHEN fp_old IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_added,
        |  sum(CASE WHEN fp_new IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_removed,
        |  sum(CASE WHEN fp_old IS NOT NULL AND fp_new IS NOT NULL
        |      AND fp_old <> fp_new THEN 1 ELSE 0 END)::BIGINT AS n_changed,
        |  sum(CASE WHEN fp_old = fp_new THEN 1 ELSE 0 END)::BIGINT AS n_unchanged
        |FROM old FULL OUTER JOIN neu USING (doc_id)""".stripMargin,

    // mirrors sample_negatives' sqrt-composed 3/4-power arithmetic
    "sample_negatives" ->
      """WITH tk AS (SELECT unnest(list_filter(string_split(lower(text), ' '),
        |    x -> x <> '')) AS tok FROM documents),
        |top AS (SELECT tok, count(*)::BIGINT AS cnt FROM tk GROUP BY tok
        |  ORDER BY cnt DESC, tok LIMIT 15),
        |w AS (SELECT tok, cnt,
        |  floor(sqrt(cnt * floor(sqrt(cnt))::BIGINT))::BIGINT AS w34 FROM top),
        |t AS (SELECT sum(w34)::BIGINT AS w_total FROM w)
        |SELECT tok, cnt, w34, ((w34 * 1000000) // w_total)::BIGINT AS share_fp
        |FROM w, t ORDER BY cnt DESC, tok""".stripMargin,

    // mirrors curation_source_mix's fixed-point concentration arithmetic
    "curation_source_mix" ->
      """WITH c AS (SELECT source, count(*)::BIGINT AS cnt FROM documents GROUP BY source),
        |a AS (SELECT count(*)::BIGINT AS n_sources, sum(cnt)::BIGINT AS n_total,
        |  sum(cnt * cnt)::BIGINT AS sum_sq, max(cnt)::BIGINT AS max_cnt FROM c)
        |SELECT n_sources, ((sum_sq * 1000000) // (n_total * n_total))::BIGINT AS hhi_fp,
        |  ((max_cnt * 1000000) // n_total)::BIGINT AS top_share_fp FROM a""".stripMargin,

    // mirrors q_ab_chisq: hash-parity arms, purchase conversion, rational χ²
    "q_ab_chisq" ->
      """WITH u AS (SELECT user_id, user_id % 2 = 0 AS arm_a,
        |  max(CASE WHEN value > 222.0 THEN 1 ELSE 0 END) = 1 AS c
        |  FROM events GROUP BY user_id),
        |t AS (SELECT
        |  sum(CASE WHEN arm_a AND c THEN 1 ELSE 0 END)::BIGINT AS a,
        |  sum(CASE WHEN arm_a AND NOT c THEN 1 ELSE 0 END)::BIGINT AS b,
        |  sum(CASE WHEN NOT arm_a AND c THEN 1 ELSE 0 END)::BIGINT AS c,
        |  sum(CASE WHEN NOT arm_a AND NOT c THEN 1 ELSE 0 END)::BIGINT AS d
        |  FROM u)
        |SELECT a, b, c, d,
        |  (CASE WHEN (a::HUGEINT + b) * (c + d) * (a + c) * (b + d) = 0 THEN -1
        |   ELSE ((a::HUGEINT + b + c + d) * (a::HUGEINT*d - b::HUGEINT*c) *
        |         (a::HUGEINT*d - b::HUGEINT*c) * 1000) //
        |        ((a::HUGEINT + b) * (c + d) * (a + c) * (b + d)) END)::BIGINT AS chi2_fp
        |FROM t""".stripMargin,

    // mirrors q_anomaly_events: planted ×10 outliers, the integer z² test
    "q_anomaly_events" ->
      """WITH e AS (SELECT event_id, event_type,
        |  ((CASE WHEN event_id % 499 = 0 THEN value * 10 ELSE value END)
        |    ::DECIMAL(18,2) * 100)::BIGINT AS cents FROM events),
        |st AS (SELECT event_type, count(*)::BIGINT AS n, sum(cents)::BIGINT AS s,
        |  sum(cents::HUGEINT * cents)::HUGEINT AS q FROM e GROUP BY event_type)
        |SELECT event_id, e.event_type, cents
        |FROM e JOIN st ON e.event_type = st.event_type
        |WHERE (n::HUGEINT*cents - s) * (n::HUGEINT*cents - s) >
        |      9 * (n::HUGEINT*q - s::HUGEINT*s)
        |ORDER BY event_id""".stripMargin,

    // mirrors etl_winsorize: the E19c p99 bound per type, then the clip
    "etl_winsorize" ->
      """WITH c AS (SELECT event_type AS g,
        |    least(floor(value / 5.0), 99)::INT AS bucket,
        |    count(*)::BIGINT AS c FROM events GROUP BY 1, 2),
        |cum AS (SELECT g, bucket, c,
        |    sum(c) OVER (PARTITION BY g ORDER BY bucket)::BIGINT AS cum,
        |    sum(c) OVER (PARTITION BY g)::BIGINT AS n FROM c),
        |p99 AS (SELECT g, min(bucket)::INT AS p99_bucket FROM cum
        |  WHERE cum >= (n * 99 + 99) // 100 GROUP BY g),
        |b AS (SELECT g AS event_type, ((p99_bucket + 1) * 5.0)::DOUBLE AS p99_hi
        |  FROM p99)
        |SELECT e.event_type, count(*)::BIGINT AS n,
        |  sum(CASE WHEN e.value > b.p99_hi THEN 1 ELSE 0 END)::BIGINT AS n_clipped,
        |  sum((least(e.value, b.p99_hi)::DECIMAL(18,2) * 100)::BIGINT)::BIGINT
        |    AS sum_cents_clipped
        |FROM events e JOIN b USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    // mirrors q_rank_movers: hourly volume rank + previous-hour lag
    "q_rank_movers" ->
      """WITH h AS (SELECT strftime(date_trunc('hour', ts), '%Y%m%d%H') AS hr,
        |    event_type, count(*)::BIGINT AS n FROM events GROUP BY 1, 2),
        |r AS (SELECT hr, event_type, n,
        |  rank() OVER (PARTITION BY hr ORDER BY n DESC, event_type)::INT AS rnk
        |  FROM h),
        |m AS (SELECT hr, event_type, n, rnk,
        |  lag(rnk) OVER (PARTITION BY event_type ORDER BY hr) AS prev
        |  FROM r)
        |SELECT hr, event_type, n, rnk,
        |  coalesce(prev, -1)::INT AS prev_rnk,
        |  (rnk - coalesce(prev, rnk))::INT AS delta
        |FROM m ORDER BY hr, event_type""".stripMargin,

    // mirrors etl_expectations' corrupted twin + five conditional sums
    "etl_expectations" ->
      """WITH c AS (SELECT
        |  CASE WHEN event_id % 997 = 0 THEN NULL ELSE event_id END AS eid,
        |  ts,
        |  CASE WHEN event_id % 991 = 0 THEN -user_id ELSE user_id END AS uid,
        |  CASE WHEN event_id % 983 = 0 THEN 'bogus' ELSE event_type END AS et,
        |  CASE WHEN event_id % 977 = 0 THEN -value ELSE value END AS v
        |  FROM events),
        |a AS (SELECT
        |  sum(CASE WHEN eid IS NULL THEN 1 ELSE 0 END)::BIGINT AS r1,
        |  sum(CASE WHEN uid <= 0 THEN 1 ELSE 0 END)::BIGINT AS r2,
        |  sum(CASE WHEN et NOT IN ('click','error','purchase','signup','view')
        |      THEN 1 ELSE 0 END)::BIGINT AS r3,
        |  sum(CASE WHEN v <= 0 THEN 1 ELSE 0 END)::BIGINT AS r4,
        |  sum(CASE WHEN ts < TIMESTAMP '2024-01-01 00:00:00'
        |      THEN 1 ELSE 0 END)::BIGINT AS r5
        |  FROM c),
        |u AS (SELECT 'null_event_id' AS rule, r1 AS n_violations FROM a
        |  UNION ALL SELECT 'nonpositive_user', r2 FROM a
        |  UNION ALL SELECT 'unknown_event_type', r3 FROM a
        |  UNION ALL SELECT 'nonpositive_value', r4 FROM a
        |  UNION ALL SELECT 'ts_before_window', r5 FROM a)
        |SELECT rule, n_violations,
        |  (CASE WHEN n_violations = 0 THEN 1 ELSE 0 END)::INT AS pass
        |FROM u ORDER BY rule""".stripMargin,

    // mirrors q_cohort_retention: first-hour cohort join, hour offsets
    "q_cohort_retention" ->
      """WITH e AS (SELECT user_id, date_trunc('hour', ts) AS hr FROM events),
        |f AS (SELECT user_id, min(hr) AS cohort FROM e GROUP BY user_id),
        |j AS (SELECT e.user_id, f.cohort,
        |  date_diff('hour', f.cohort, e.hr) AS offset_hr
        |  FROM e JOIN f USING (user_id))
        |SELECT strftime(cohort, '%Y%m%d%H') AS cohort_hr, offset_hr,
        |  count(DISTINCT user_id)::BIGINT AS n_users
        |FROM j WHERE offset_hr <= 5 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // mirrors syntheticMp4Payload: 3 top boxes, 1+id%3 traks, timescale
    // 1000+id%9000, duration (id·37)%100000
    "mm_decode_mp4" ->
      """SELECT doc_id AS asset_id, 3 AS n_top_boxes,
        |  (1 + doc_id % 3)::INT AS n_traks,
        |  (1000 + doc_id % 9000)::BIGINT AS timescale,
        |  ((doc_id * 37) % 100000)::BIGINT AS duration
        |FROM documents ORDER BY asset_id""".stripMargin,

    // mirrors Multimodal.decodePngPixels: byte i of asset id decodes to
    // (id + i) % 256 (i row-major interleaved over 3·w·h bytes); corrupted
    // ids (doc_id % 29 = 0) are quarantined and must be absent
    "mm_decode_png_pixels" ->
      """WITH px AS (SELECT doc_id, (1 + doc_id % 13)::INT AS w,
        |    (1 + doc_id % 7)::INT AS h
        |  FROM documents WHERE doc_id % 29 <> 0),
        |e AS (SELECT doc_id, w, h, unnest(range(0, 3 * w * h)) AS i FROM px)
        |SELECT doc_id AS asset_id, w AS width, h AS height,
        |  sum(CASE WHEN i % 3 = 0 THEN (doc_id + i) % 256 END)::BIGINT AS r_sum,
        |  sum(CASE WHEN i % 3 = 1 THEN (doc_id + i) % 256 END)::BIGINT AS g_sum,
        |  sum(CASE WHEN i % 3 = 2 THEN (doc_id + i) % 256 END)::BIGINT AS b_sum,
        |  sum((i + 1) * ((doc_id + i) % 256))::BIGINT AS wsum
        |FROM e GROUP BY doc_id, w, h ORDER BY asset_id""".stripMargin,

    // mirrors Multimodal.resizePpm(factor=2): PPM assets are doc_id%4==0
    // with w=1+id%13, h=1+id%7, pixel byte (id + offset) % 256 at offset
    // 3·(y·w+x)+c — restated at exactly the strided sample positions
    "mm_resize" ->
      """WITH p AS (SELECT doc_id AS asset_id, (1 + doc_id % 13)::INT AS w,
        |    (1 + doc_id % 7)::INT AS h
        |  FROM documents WHERE doc_id % 4 = 0),
        |sx AS (SELECT asset_id, w, h, unnest(range(0, w, 2)) AS x FROM p),
        |s AS (SELECT asset_id, w, h, x, unnest(range(0, h, 2)) AS y FROM sx),
        |sums AS (SELECT asset_id,
        |  max((w + 1) // 2)::INT AS w_out, max((h + 1) // 2)::INT AS h_out,
        |  count(*)::BIGINT AS n_sampled,
        |  sum((asset_id + 3*(y*w + x)) % 256)::BIGINT AS r_sum,
        |  sum((asset_id + 3*(y*w + x) + 1) % 256)::BIGINT AS g_sum,
        |  sum((asset_id + 3*(y*w + x) + 2) % 256)::BIGINT AS b_sum
        |  FROM s GROUP BY asset_id)
        |SELECT asset_id, w_out, h_out, n_sampled, r_sum, g_sum, b_sum
        |FROM sums ORDER BY asset_id""".stripMargin,

    // mirrors Graph.triangleStats over the stride-1,2,3 circulant: same
    // canonical undirected edges, same (degree, id) orientation, same
    // wedge + closure joins
    "graph_triangles" ->
      """WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),
        |e0 AS (SELECT doc_id AS src, (doc_id + k.k) % nn.n AS dst
        |  FROM documents, nn, (SELECT unnest([1, 2, 3]) AS k) k),
        |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM e0 WHERE src <> dst),
        |deg AS (SELECT x AS node, count(*)::BIGINT AS deg FROM (
        |  SELECT a AS x FROM und UNION ALL SELECT b FROM und) GROUP BY 1),
        |wd AS (SELECT und.a, und.b, da.deg AS da, db.deg AS db FROM und
        |  JOIN deg da ON da.node = und.a JOIN deg db ON db.node = und.b),
        |o AS (SELECT
        |  CASE WHEN da < db OR (da = db AND a < b) THEN a ELSE b END AS u,
        |  CASE WHEN da < db OR (da = db AND a < b) THEN b ELSE a END AS v
        |  FROM wd),
        |w AS (SELECT e1.u AS u, e1.v AS v, e2.v AS w
        |  FROM o e1 JOIN o e2 ON e1.v = e2.u),
        |tri AS (SELECT count(*)::BIGINT AS n_triangles
        |  FROM w JOIN o ON w.u = o.u AND w.w = o.v)
        |SELECT (SELECT count(*) FROM deg)::BIGINT AS n_nodes,
        |  (SELECT count(*) FROM und)::BIGINT AS n_edges,
        |  (SELECT count(*) FROM w)::BIGINT AS n_wedges,
        |  n_triangles
        |FROM tri""".stripMargin,

    // mirrors Sketches.cmsEstimates(d=4, w=256): per row j a bucket-keyed
    // SUM counter frame under salt cms<j>; estimate = least of the four
    "q_cms_portable" -> {
      def b(expr: String, j: Int) =
        s"(('0x' || substr(md5($expr || 'cms$j'), 1, 15))::BIGINT & 255)"
      val counters = (0 until 4).map(j =>
        s"c$j AS (SELECT ${b("tok", j)} AS b, count(*)::BIGINT AS c FROM tk GROUP BY 1)")
        .mkString(",\n")
      val joins = (0 until 4).map(j =>
        s"JOIN c$j x$j ON ${b("t.tok", j)} = x$j.b").mkString("\n")
      val m = (0 until 4).map(j => s"x$j.c").mkString("least(", ", ", ")")
      s"""WITH tk AS (SELECT unnest(list_filter(string_split(lower(text), ' '),
         |    x -> x <> '')) AS tok FROM documents),
         |truth AS (SELECT tok, count(*)::BIGINT AS true_n FROM tk
         |  GROUP BY tok ORDER BY true_n DESC, tok LIMIT 10),
         |$counters
         |SELECT t.tok, t.true_n, $m::BIGINT AS cms_est,
         |  ($m - t.true_n)::BIGINT AS overcount
         |FROM truth t
         |$joins
         |ORDER BY true_n DESC, tok""".stripMargin
    },

    // mirrors Sketches.hllEstimateBy grouped by hour: observed-bucket max,
    // closed-form 2^55 per empty register, integral-division estimate
    "q_hll_windowed" ->
      s"""WITH h AS (SELECT strftime(date_trunc('hour', ts), '%Y%m%d%H') AS hr,
         |    ('0x' || substr(md5(user_id::VARCHAR || 'hll'), 1, 15))::BIGINT AS h
         |  FROM events),
         |r AS (SELECT hr, h & 63 AS bucket,
         |  CASE WHEN (h >> 6) = 0 THEN 55
         |       ELSE 55 - length(bin(h >> 6)) END AS rho FROM h),
         |regs AS (SELECT hr, bucket, max(rho) AS register FROM r GROUP BY hr, bucket),
         |agg AS (SELECT hr, count(*)::BIGINT AS buckets_hit,
         |  sum((2.0 ** (55 - register))::BIGINT)::BIGINT AS d_obs
         |  FROM regs GROUP BY hr),
         |d AS (SELECT hr, buckets_hit,
         |  (d_obs + (64 - buckets_hit) * (1::BIGINT << 55))::BIGINT AS d_denom
         |  FROM agg),
         |est AS (SELECT hr, buckets_hit, d_denom,
         |  ${Sketches.hllCorrectedSql(
             s"((${Sketches.HllEstNumerator}::HUGEINT) // (1000::HUGEINT * d_denom))::BIGINT",
             "buckets_hit")}
         |    AS est_users FROM d),
         |ex AS (SELECT strftime(date_trunc('hour', ts), '%Y%m%d%H') AS hr,
         |  count(DISTINCT user_id)::BIGINT AS exact_users FROM events GROUP BY 1)
         |SELECT est.hr, buckets_hit, d_denom, est_users, exact_users
         |FROM est JOIN ex USING (hr) ORDER BY hr""".stripMargin,

    // mirrors Sketches.histogramQuantiles(width=1000, n=128, p50, p95):
    // capped equi-width buckets, per-group cumulative counts, smallest
    // bucket with cum ≥ the exact integral ceiling threshold
    "q_quantile_portable" ->
      """WITH c AS (SELECT l_returnflag AS g,
        |    least(floor(l_extendedprice / 1000.0), 127)::INT AS bucket,
        |    count(*)::BIGINT AS c FROM lineitem GROUP BY 1, 2),
        |cum AS (SELECT g, bucket, c,
        |    sum(c) OVER (PARTITION BY g ORDER BY bucket)::BIGINT AS cum,
        |    sum(c) OVER (PARTITION BY g)::BIGINT AS n FROM c),
        |p50 AS (SELECT g, min(bucket)::INT AS p50_bucket FROM cum
        |  WHERE cum >= (n * 1 + 1) // 2 GROUP BY g),
        |p95 AS (SELECT g, min(bucket)::INT AS p95_bucket FROM cum
        |  WHERE cum >= (n * 19 + 19) // 20 GROUP BY g),
        |base AS (SELECT g, max(n)::BIGINT AS n FROM cum GROUP BY g)
        |SELECT base.g AS l_returnflag, n,
        |  p50_bucket, ((p50_bucket + 1) * 1000.0)::DOUBLE AS p50_hi,
        |  p95_bucket, ((p95_bucket + 1) * 1000.0)::DOUBLE AS p95_hi
        |FROM base JOIN p50 USING (g) JOIN p95 USING (g)
        |ORDER BY l_returnflag""".stripMargin,

    // mirrors Sketches.hllRegisters + hllEstimate: 60-bit md5 hash, low 6
    // bits → bucket, rho = 55 − bitlength(rem) via bin() (55 when rem=0),
    // D = Σ 2^(55−register) as exact integers, est = the 24-digit decimal
    // numerator integral-divided by 1000·D (HUGEINT here, DECIMAL(38,0) div
    // on the Spark side — both truncate toward zero on positives)
    "q_hll_portable" ->
      s"""WITH h AS (SELECT ('0x' || substr(md5(user_id::VARCHAR || 'hll'), 1, 15))::BIGINT AS h
         |  FROM events),
         |b AS (SELECT h & 63 AS bucket, h >> 6 AS rem FROM h),
         |r AS (SELECT bucket,
         |  CASE WHEN rem = 0 THEN 55 ELSE 55 - length(bin(rem)) END AS rho FROM b),
         |regs AS (SELECT bucket, max(rho) AS register FROM r GROUP BY bucket),
         |spine AS (SELECT unnest(range(0, 64)) AS bucket),
         |f AS (SELECT spine.bucket, coalesce(register, 0)::INT AS register
         |  FROM spine LEFT JOIN regs USING (bucket)),
         |d AS (SELECT sum((2.0 ** (55 - register))::BIGINT)::BIGINT AS d_denom FROM f),
         |hits AS (SELECT sum(CASE WHEN register > 0 THEN 1 ELSE 0 END)::BIGINT
         |  AS buckets_hit FROM f),
         |est AS (SELECT d_denom,
         |  ${Sketches.hllCorrectedSql(
             s"((${Sketches.HllEstNumerator}::HUGEINT) // (1000::HUGEINT * d_denom))::BIGINT",
             "buckets_hit")}
         |    AS est_users FROM d, hits),
         |ex AS (SELECT count(DISTINCT user_id)::BIGINT AS exact_users FROM events)
         |SELECT bucket, register, d_denom, est_users, exact_users
         |FROM f, est, ex ORDER BY bucket""".stripMargin,

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

    "graph_pagerank" ->
      """WITH eb AS (SELECT DISTINCT o_custkey AS src,
        |    1000000 + l_suppkey AS dst
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |e AS (SELECT src, dst FROM eb UNION SELECT dst, src FROM eb),
        |deg AS (SELECT src, count(*)::BIGINT AS outdeg FROM e GROUP BY src),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |r0 AS (SELECT node, 1000000::BIGINT AS rank FROM nodes),
        |s1 AS (SELECT e.dst AS node, sum(r.rank // d.outdeg) AS in_sum
        |  FROM e JOIN deg d ON d.src = e.src JOIN r0 r ON r.node = e.src
        |  GROUP BY e.dst),
        |r1 AS (SELECT n.node,
        |  (150000 + (85 * COALESCE(s.in_sum, 0)) // 100)::BIGINT AS rank
        |  FROM nodes n LEFT JOIN s1 s ON s.node = n.node),
        |s2 AS (SELECT e.dst AS node, sum(r.rank // d.outdeg) AS in_sum
        |  FROM e JOIN deg d ON d.src = e.src JOIN r1 r ON r.node = e.src
        |  GROUP BY e.dst),
        |r2 AS (SELECT n.node,
        |  (150000 + (85 * COALESCE(s.in_sum, 0)) // 100)::BIGINT AS rank
        |  FROM nodes n LEFT JOIN s2 s ON s.node = n.node),
        |s3 AS (SELECT e.dst AS node, sum(r.rank // d.outdeg) AS in_sum
        |  FROM e JOIN deg d ON d.src = e.src JOIN r2 r ON r.node = e.src
        |  GROUP BY e.dst),
        |r3 AS (SELECT n.node,
        |  (150000 + (85 * COALESCE(s.in_sum, 0)) // 100)::BIGINT AS rank
        |  FROM nodes n LEFT JOIN s3 s ON s.node = n.node)
        |SELECT node, rank FROM r3 ORDER BY node""".stripMargin,

    // Restates synthUrl's construction and the EXPECTED parse fields per
    // branch (not a second regex parse — zero regex-dialect coupling):
    // a wrong offset, missed lowercase, kept default port, or unstripped
    // trailing dot on the Spark side hash-fails against these literals.
    "text_url_parse" ->
      s"""WITH u AS (SELECT doc_id, source AS s, doc_id % 5 AS m FROM documents)
         |SELECT doc_id,
         |  ${Sql.urlCase} AS url,
         |  CASE m WHEN 0 THEN 'https' WHEN 1 THEN 'http' WHEN 2 THEN 'https'
         |    WHEN 3 THEN 'http' ELSE 'ftp' END AS scheme,
         |  ${Sql.urlHostCase} AS host,
         |  (CASE m WHEN 0 THEN 443 WHEN 1 THEN 8080 WHEN 3 THEN 80
         |    ELSE NULL END)::INT AS port,
         |  CASE m WHEN 0 THEN 'example.co.uk' WHEN 4 THEN 'example.org'
         |    ELSE 'example.com' END AS reg_domain,
         |  CASE m WHEN 0 THEN '/wiki/' || doc_id WHEN 1 THEN '/a/b/c'
         |    WHEN 2 THEN '/assets/' || doc_id || '.js' WHEN 3 THEN ''
         |    ELSE '/pub/' || doc_id END AS path,
         |  CASE m WHEN 0 THEN 'q=spark&lang=en' WHEN 2 THEN 'v=2&x='
         |    ELSE NULL END AS "query",
         |  CASE m WHEN 0 THEN 'Top' WHEN 4 THEN 'readme'
         |    ELSE NULL END AS frag,
         |  ${Sql.urlCanonCase} AS canon_url
         |FROM u ORDER BY doc_id""".stripMargin,

    // branch hosts → branch reg domains; blocked = example.org (branch 4)
    // and example.co.uk (branch 0) — survivors are branches 1/2/3
    "curation_domain_filter" ->
      s"""WITH u AS (SELECT doc_id, source AS s, doc_id % 5 AS m FROM documents)
         |SELECT doc_id, ${Sql.urlHostCase} AS host,
         |  CASE m WHEN 0 THEN 'example.co.uk' WHEN 4 THEN 'example.org'
         |    ELSE 'example.com' END AS reg_domain
         |FROM u WHERE m IN (1, 2, 3)
         |ORDER BY doc_id""".stripMargin,

    // base + fragment-twin rows both restate to the branch's canonical
    // URL; the group-by is the dedup — a canonicalizer that kept the
    // fragment, the default port, or host case would split groups and
    // hash-fail
    "dedup_url" ->
      s"""WITH u AS (SELECT doc_id, source AS s, doc_id % 5 AS m FROM documents),
         |c AS (SELECT doc_id, ${Sql.urlCanonCase} AS canon_url FROM u
         |  UNION ALL
         |  SELECT doc_id + 1000000, ${Sql.urlCanonCase} AS canon_url FROM u)
         |SELECT canon_url, min(doc_id)::BIGINT AS survivor_id,
         |  count(*)::BIGINT AS n_urls
         |FROM c GROUP BY 1 ORDER BY canon_url""".stripMargin,

    // Same construction, then the stride host link graph (id+1, id+29)
    // and the SAME unrolled integer PageRank as graph_pagerank, joined
    // back per document through the arithmetic host id.
    "curation_host_rank" ->
      s"""WITH u AS (SELECT doc_id, source AS s, doc_id % 5 AS m FROM documents),
         |h AS (SELECT doc_id, ${Sql.urlHostCase} AS host,
         |  (regexp_extract(s, 'src([0-9]+)', 1)::BIGINT * 5 + m)::BIGINT AS host_id
         |  FROM u),
         |e AS (SELECT a.host_id AS src, b.host_id AS dst
         |  FROM h a JOIN h b ON b.doc_id = a.doc_id + 1
         |  UNION
         |  SELECT a.host_id, b.host_id
         |  FROM h a JOIN h b ON b.doc_id = a.doc_id + 29),
         |${Sql.pagerankUnrolled(3)}
         |SELECT h.doc_id, h.host, r.rank AS host_rank
         |FROM h LEFT JOIN r3 r ON r.node = h.host_id
         |ORDER BY doc_id""".stripMargin,

    "sim_knn_graph" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |  (${Sql.signBucket6})::BIGINT AS bucket FROM embeddings),
         |n AS (SELECT vec_id, v, bucket, sqrt(${Sql.dot("v", "v")}) AS nm FROM e),
         |pr AS (SELECT vec_id, v, nm,
         |  unnest(list_concat([bucket],
         |    list_transform(range(0, 6), i -> xor(bucket, 1::BIGINT << i)))) AS pbucket
         |  FROM n),
         |cand AS (SELECT a.vec_id AS id, b.vec_id AS nbr_id,
         |  ${Sql.dot("a.v", "b.v")} / (a.nm * b.nm) AS score
         |  FROM pr a JOIN n b ON a.pbucket = b.bucket AND a.vec_id <> b.vec_id)
         |SELECT id, rank::INT AS rank, nbr_id, score FROM (
         |  SELECT id, nbr_id, score,
         |    row_number() OVER (PARTITION BY id ORDER BY score DESC, nbr_id ASC) AS rank
         |  FROM cand)
         |WHERE rank <= 5 ORDER BY id, rank""".stripMargin,

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

    "mm_payload_stats" ->
      """SELECT doc_id AS asset_id,
        |  ['image','audio','video'][(doc_id % 3 + 1)::INT] AS modality,
        |  octet_length(encode(text))::BIGINT AS payload_bytes,
        |  list_sum(list_transform(range(1, least(length(text), 16) + 1),
        |    i -> ord(substr(text, i, 1))))::BIGINT AS header_sum
        |FROM documents ORDER BY asset_id""".stripMargin,

    // video assets are doc_id % 3 == 2; frames 0..ceil(bytes/16)-1, sampled
    // where frame_no % 2 = 0 → n_sampled = ceil(nframes/2), max sampled
    // frame = 2*(ceil(nframes/2)-1). Zero-frame (empty-payload) assets emit
    // NO row — matching the Spark side, where posexplode of an empty frame
    // array yields nothing (a groupBy after it cannot see the asset).
    "mm_frame_sample" ->
      """SELECT doc_id AS asset_id,
        |  ((ceil(octet_length(encode(text)) / 16.0)::BIGINT + 1) // 2)::BIGINT
        |    AS n_sampled,
        |  (2 * (((ceil(octet_length(encode(text)) / 16.0)::BIGINT + 1) // 2) - 1))::INT
        |    AS max_frame
        |FROM documents WHERE doc_id % 3 = 2 AND octet_length(encode(text)) > 0
        |ORDER BY asset_id""".stripMargin,

    // restates syntheticContainerPayload's dimension arithmetic: the Spark
    // side must recover exactly these values by PARSING the bytes it built
    "mm_decode_containers" ->
      """SELECT doc_id AS asset_id,
        |  CASE (doc_id % 4) WHEN 0 THEN 'ppm' WHEN 1 THEN 'wav'
        |    WHEN 2 THEN 'png' ELSE 'jpeg' END AS fmt,
        |  (CASE (doc_id % 4) WHEN 1 THEN 8000 ELSE 1 + doc_id % 13 END)::INT
        |    AS width,
        |  (CASE (doc_id % 4) WHEN 1 THEN 1 + doc_id % 2
        |    ELSE 1 + doc_id % 7 END)::INT AS height,
        |  (CASE (doc_id % 4) WHEN 1 THEN 1 + doc_id % 5 ELSE 1 END)::INT
        |    AS n_frames
        |FROM documents ORDER BY asset_id""".stripMargin,

    "q_tumbling_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y%m%d%H') AS hr, event_type,
        |  count(*)::BIGINT AS n
        |FROM events GROUP BY 1, 2 ORDER BY hr, event_type""".stripMargin,

    // an event at t belongs to the windows starting at trunc(t,1h) and
    // trunc(t,1h)-1h — exactly Spark's sliding-window membership
    "q_sliding_window" ->
      """SELECT strftime(ws, '%Y%m%d%H') AS ws, event_type, count(*)::BIGINT AS n
        |FROM (SELECT event_type,
        |  unnest([date_trunc('hour', ts),
        |          date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws
        |  FROM events)
        |GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,

    "q_asof_join" ->
      """SELECT l.event_id, r.value AS asof_value
        |FROM (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'purchase') l
        |ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
        |      WHERE event_type = 'view') r
        |ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY event_id""".stripMargin,

    "q_range_join" ->
      """WITH iv AS (SELECT event_type AS band_type,
        |    (sum(value::DECIMAL(18,2)))::DOUBLE / count(*) AS avg_v
        |  FROM events GROUP BY 1)
        |SELECT band_type, count(*)::BIGINT AS n
        |FROM events p JOIN iv
        |ON p.value >= iv.avg_v * 0.5 AND p.value < iv.avg_v * 1.5
        |GROUP BY band_type ORDER BY band_type""".stripMargin,

    // Gaps-and-islands restatement of session_window: a session breaks when
    // the gap to the previous event is >= 10 minutes (Spark's session extends
    // while the next event is strictly inside last_ts + gap).
    "q_session_window" ->
      """WITH p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
        |x AS (SELECT user_id, ts, CASE WHEN lag(ts) OVER w IS NULL
        |    OR ts - lag(ts) OVER w >= INTERVAL '10 minutes' THEN 1 ELSE 0 END AS new_s
        |  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |y AS (SELECT user_id, ts, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |  ROWS UNBOUNDED PRECEDING) AS sid FROM x)
        |SELECT user_id, strftime(min(ts), '%Y%m%d%H%M%S.%f') AS session_start,
        |  count(*)::BIGINT AS n
        |FROM y GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,

    "q_interval_overlap" ->
      """SELECT a.event_id AS a_id, b.event_id AS b_id
        |FROM (SELECT event_id, value AS lo, value + 15.0 AS hi FROM events
        |      WHERE event_type = 'signup') a
        |JOIN (SELECT event_id, value AS lo2, value + 10.0 AS hi2 FROM events
        |      WHERE event_type = 'error') b
        |  ON a.lo < b.hi2 AND b.lo2 < a.hi
        |ORDER BY a_id, b_id""".stripMargin,

    "q_funnel_depth" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
        |SELECT s1.user_id,
        |  (CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
        |    ELSE 1 END)::INT AS steps_completed,
        |  strftime(coalesce(t3, t2, t1), '%Y%m%d%H%M%S.%f') AS t_reached
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |ORDER BY s1.user_id""".stripMargin,

    "q_funnel_counts" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
        |SELECT step, step_name, n_users FROM (
        |  SELECT 1::INT AS step, 'signup' AS step_name,
        |    (SELECT count(*) FROM s1)::BIGINT AS n_users
        |  UNION ALL SELECT 2, 'view', (SELECT count(*) FROM s2)
        |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
        |WHERE n_users > 0 ORDER BY step""".stripMargin,

    // mirrors etl_ledger_chain: ordered list + seeded left fold of md5
    "etl_ledger_chain" ->
      """WITH e AS (SELECT strftime(date_trunc('day', ts), '%Y%m%d') AS day,
        |    ts, event_id, md5(event_id::VARCHAR) AS rd FROM events),
        |l AS (SELECT day, count(*)::BIGINT AS n,
        |  list(rd ORDER BY ts, event_id) AS lst FROM e GROUP BY day)
        |SELECT day, n,
        |  list_reduce(list_prepend('seed', lst), (acc, x) -> md5(acc || x)) AS chain
        |FROM l ORDER BY day""".stripMargin,

    // mirrors q_benford_audit: same literal expectation table, same
    // string-length leading-digit extraction over cents
    "q_benford_audit" -> {
      val table = benfordP
        .map { case (dd, p) => s"($dd, ${p}::BIGINT)" }.mkString(", ")
      s"""WITH c AS (SELECT (value::DECIMAL(18,2) * 100)::BIGINT AS cents
         |  FROM events),
         |p AS (SELECT cents,
         |  (cents // (10 ** (length(cents::VARCHAR) - 1))::BIGINT)::INT AS digit
         |  FROM c WHERE cents > 0),
         |obs AS (SELECT digit, count(*)::BIGINT AS n_obs FROM p GROUP BY digit),
         |t(digit, p_fp) AS (VALUES $table),
         |tot AS (SELECT sum(n_obs)::BIGINT AS n_total FROM obs)
         |SELECT obs.digit, n_obs,
         |  ((n_obs * 1000000) // n_total)::BIGINT AS share_fp, p_fp
         |FROM obs JOIN t USING (digit), tot ORDER BY digit""".stripMargin
    },

    // mirrors etl_partition_skew_audit's rational skew ratio
    "etl_partition_skew_audit" ->
      """WITH d AS (SELECT strftime(date_trunc('day', ts), '%Y%m%d') AS day,
        |    count(*)::BIGINT AS n FROM events GROUP BY 1),
        |a AS (SELECT count(*)::BIGINT AS n_days, sum(n)::BIGINT AS total_rows,
        |  max(n)::BIGINT AS max_day_rows FROM d)
        |SELECT n_days, total_rows, max_day_rows,
        |  ((max_day_rows * n_days * 1000000) // total_rows)::BIGINT AS skew_fp
        |FROM a""".stripMargin,

    // mirrors q_trend_slope's rational least-squares arithmetic
    "q_trend_slope" ->
      """WITH h AS (SELECT event_type,
        |    date_diff('hour', TIMESTAMP '2024-01-01 00:00:00',
        |      date_trunc('hour', ts))::BIGINT AS x,
        |    count(*)::BIGINT AS y
        |  FROM events GROUP BY 1, 2),
        |a AS (SELECT event_type, count(*)::BIGINT AS cnt, sum(x)::BIGINT AS sx,
        |    sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy,
        |    sum(x * x)::BIGINT AS sxx
        |  FROM h GROUP BY event_type)
        |SELECT event_type, cnt AS n_hours,
        |  (CASE WHEN cnt * sxx - sx * sx = 0 THEN 0
        |   ELSE ((cnt * sxy - sx * sy) * 1000000) // (cnt * sxx - sx * sx)
        |   END)::BIGINT AS slope_fp
        |FROM a ORDER BY event_type""".stripMargin,

    // mirrors q_funnel_rates: the funnel CTEs + lag over the counts frame
    "q_funnel_rates" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id),
        |c AS (SELECT step, step_name, n_users FROM (
        |  SELECT 1::INT AS step, 'signup' AS step_name,
        |    (SELECT count(*) FROM s1)::BIGINT AS n_users
        |  UNION ALL SELECT 2, 'view', (SELECT count(*) FROM s2)
        |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
        |  WHERE n_users > 0),
        |t AS (SELECT count(DISTINCT user_id)::BIGINT AS n_total FROM events),
        |l AS (SELECT step, step_name, n_users,
        |  lag(n_users) OVER (ORDER BY step) AS prev FROM c)
        |SELECT step, step_name, n_users,
        |  ((n_users * 1000000) // coalesce(prev, n_total))::BIGINT AS rate_fp
        |FROM l, t ORDER BY step""".stripMargin,

    // mirrors text_ngram_novelty: distinct bigrams per doc, corpus df,
    // df=1 share in fixed point
    "text_ngram_novelty" ->
      """WITH w AS (SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
        |  FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct(
        |    list_transform(range(1, len(toks)), i -> toks[i] || '_' || toks[i+1]))) AS g
        |  FROM w),
        |df AS (SELECT g, count(*)::BIGINT AS df FROM g GROUP BY g)
        |SELECT doc_id, count(*)::BIGINT AS n_grams,
        |  sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)::BIGINT AS n_unique,
        |  ((sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) * 1000000) // count(*))::BIGINT
        |    AS novelty_fp
        |FROM g JOIN df USING (g) GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_running_stats" ->
      """SELECT user_id, count(*)::BIGINT AS n,
        |  strftime(min(ts), '%Y%m%d%H%M%S.%f') AS first_ts,
        |  strftime(max(ts), '%Y%m%d%H%M%S.%f') AS last_ts
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "etl_csv_roundtrip" ->
      """SELECT event_type, count(*)::BIGINT AS n, min(props) AS min_props,
        |  count(DISTINCT props)::BIGINT AS n_props
        |FROM events WHERE event_id % 7 = 0
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "etl_orc_roundtrip" ->
      """SELECT event_type, count(*)::BIGINT AS n,
        |  (sum(value::DECIMAL(18,2)))::DOUBLE AS sum_value,
        |  strftime(max(ts), '%Y%m%d%H%M%S.%f') AS max_ts
        |FROM events WHERE event_id % 13 = 0 AND event_type <> 'error'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "etl_json_roundtrip" ->
      """SELECT event_type, count(*)::BIGINT AS n, min(props) AS min_props,
        |  sum(event_id)::BIGINT AS sum_id
        |FROM events WHERE event_id % 11 = 0
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "etl_gap_fill" ->
      """WITH e AS (SELECT user_id, ts, value, event_id FROM events
        |  WHERE user_id < 20 AND day(ts) = 1),
        |obs AS (SELECT user_id, date_trunc('minute', ts) AS minute,
        |  arg_max(value, strftime(ts, '%Y%m%d%H%M%S.%f') || '-' ||
        |    lpad(event_id::VARCHAR, 12, '0')) AS obs
        |  FROM e GROUP BY 1, 2),
        |grid AS (SELECT user_id, unnest(generate_series(
        |    date_trunc('minute', min(ts)), date_trunc('minute', max(ts)),
        |    INTERVAL 1 MINUTE)) AS minute
        |  FROM e GROUP BY user_id)
        |SELECT g.user_id, strftime(g.minute, '%Y%m%d%H%M') AS minute_s,
        |  last_value(o.obs IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.minute
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
        |  (o.obs IS NOT NULL) AS is_observed
        |FROM grid g LEFT JOIN obs o
        |  ON g.user_id = o.user_id AND g.minute = o.minute
        |ORDER BY g.user_id, minute_s""".stripMargin,

    "text_bm25_topk" ->
      """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ts
        |  FROM documents),
        |dl AS (SELECT doc_id, len(ts)::BIGINT AS dl FROM toks),
        |stats AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS sdl FROM dl),
        |post AS (SELECT doc_id, unnest(ts) AS token FROM toks),
        |tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf
        |  FROM post GROUP BY 1, 2),
        |dfreq AS (SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY 1),
        |q(query_id, token) AS (VALUES (0::BIGINT, 'vector'),
        |  (0::BIGINT, 'stream'), (1::BIGINT, 'customer'),
        |  (1::BIGINT, 'query'), (2::BIGINT, 'scan'), (2::BIGINT, 'window')),
        |scored AS (SELECT q.query_id, tf.doc_id,
        |    sum(floor((((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
        |      * ((tf.tf * (1.2 + 1.0)) / (tf.tf + 1.2 * (0.25 + 0.75
        |          * (dl.dl::DOUBLE / (stats.sdl::DOUBLE / stats.n::DOUBLE)))))
        |      ) * 1048576.0))::BIGINT AS score_fp
        |  FROM tf JOIN q USING (token) JOIN dfreq USING (token)
        |    JOIN dl USING (doc_id) CROSS JOIN stats
        |  GROUP BY 1, 2)
        |SELECT query_id, doc_id, rank, score_fp FROM (
        |  SELECT query_id, doc_id, score_fp,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY score_fp DESC, doc_id)::INT AS rank
        |  FROM scored)
        |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // mirrors rag_pipeline_e2e: the text_chunk CTE → chunk ids → the BM25
    // chain over chunks → provenance arithmetic
    "rag_pipeline_e2e" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |st AS (SELECT doc_id, words,
        |  unnest(generate_series(0, len(words) - 1, 24)) AS s FROM w),
        |ch AS (SELECT doc_id * 1000 + (s // 24) AS chunk_id,
        |  array_to_string(words[s + 1 : s + 32], ' ') AS chunk_text
        |  FROM st WHERE s = 0 OR s + 8 < len(words)),
        |toks AS (SELECT chunk_id, string_split(lower(chunk_text), ' ') AS ts FROM ch),
        |dl AS (SELECT chunk_id, len(ts)::BIGINT AS dl FROM toks),
        |stats AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS sdl FROM dl),
        |post AS (SELECT chunk_id, unnest(ts) AS token FROM toks),
        |tf AS (SELECT chunk_id, token, count(*)::BIGINT AS tf
        |  FROM post GROUP BY 1, 2),
        |dfreq AS (SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY 1),
        |q(query_id, token) AS (VALUES (0::BIGINT, 'vector'),
        |  (0::BIGINT, 'stream'), (1::BIGINT, 'customer'),
        |  (1::BIGINT, 'query'), (2::BIGINT, 'scan'), (2::BIGINT, 'window')),
        |scored AS (SELECT q.query_id, tf.chunk_id,
        |    sum(floor((((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
        |      * ((tf.tf * (1.2 + 1.0)) / (tf.tf + 1.2 * (0.25 + 0.75
        |          * (dl.dl::DOUBLE / (stats.sdl::DOUBLE / stats.n::DOUBLE)))))
        |      ) * 1048576.0))::BIGINT AS score_fp
        |  FROM tf JOIN q USING (token) JOIN dfreq USING (token)
        |    JOIN dl USING (chunk_id) CROSS JOIN stats
        |  GROUP BY 1, 2)
        |SELECT query_id, rank, (chunk_id // 1000)::BIGINT AS doc_id,
        |  (chunk_id % 1000)::INT AS chunk_no, score_fp FROM (
        |  SELECT query_id, chunk_id, score_fp,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY score_fp DESC, chunk_id)::INT AS rank
        |  FROM scored)
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "sim_hybrid_topk" ->
      s"""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS ts
         |  FROM documents),
         |dl AS (SELECT doc_id, len(ts)::BIGINT AS dl FROM toks),
         |stats AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS sdl FROM dl),
         |post AS (SELECT doc_id, unnest(ts) AS token FROM toks),
         |tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf
         |  FROM post GROUP BY 1, 2),
         |dfreq AS (SELECT token, count(*)::BIGINT AS df FROM tf GROUP BY 1),
         |q(query_id, token) AS (VALUES (0::BIGINT, 'vector'),
         |  (0::BIGINT, 'stream'), (1::BIGINT, 'customer'),
         |  (1::BIGINT, 'query'), (2::BIGINT, 'scan'), (2::BIGINT, 'window')),
         |bm25 AS (SELECT q.query_id, tf.doc_id,
         |    sum(floor((((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
         |      * ((tf.tf * (1.2 + 1.0)) / (tf.tf + 1.2 * (0.25 + 0.75
         |          * (dl.dl::DOUBLE / (stats.sdl::DOUBLE / stats.n::DOUBLE)))))
         |      ) * 1048576.0))::BIGINT AS s
         |  FROM tf JOIN q USING (token) JOIN dfreq USING (token)
         |    JOIN dl USING (doc_id) CROSS JOIN stats
         |  GROUP BY 1, 2),
         |text_top AS (SELECT query_id, id, rank FROM (
         |  SELECT query_id, doc_id AS id, row_number() OVER (
         |    PARTITION BY query_id ORDER BY s DESC, doc_id)::INT AS rank
         |  FROM bm25) WHERE rank <= 20),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |nrm AS (SELECT vec_id, v, sqrt(${Sql.dot("v", "v")}) AS nm FROM e),
         |dense AS (SELECT qv.vec_id AS query_id, c.vec_id AS id,
         |  ${Sql.dot("qv.v", "c.v")} / (qv.nm * c.nm) AS score
         |  FROM nrm qv JOIN nrm c ON qv.vec_id < 3 AND c.vec_id <> qv.vec_id),
         |dense_top AS (SELECT query_id, id, rank FROM (
         |  SELECT query_id, id, row_number() OVER (
         |    PARTITION BY query_id ORDER BY score DESC, id)::INT AS rank
         |  FROM dense) WHERE rank <= 20),
         |contrib AS (
         |  SELECT query_id, id, 1048576::BIGINT // (60 + rank)::BIGINT AS c
         |    FROM text_top
         |  UNION ALL
         |  SELECT query_id, id, 1048576::BIGINT // (60 + rank)::BIGINT AS c
         |    FROM dense_top),
         |fused AS (SELECT query_id, id, sum(c)::BIGINT AS score_fp
         |  FROM contrib GROUP BY 1, 2)
         |SELECT query_id, id, rank, score_fp FROM (
         |  SELECT query_id, id, score_fp, row_number() OVER (
         |    PARTITION BY query_id ORDER BY score_fp DESC, id)::INT AS rank
         |  FROM fused)
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "etl_zorder_key" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  (${Sql.zorder(Seq("l_partkey", "l_suppkey"), 16)}) AS zkey
         |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "etl_compact" ->
      """SELECT lang, count(*)::BIGINT AS n, sum(doc_id)::BIGINT AS sum_id,
        |  sum(length(text))::BIGINT AS sum_len
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q_ohlc" ->
      """SELECT user_id, strftime(date_trunc('hour', ts), '%Y%m%d%H') AS hr,
        |  first(value ORDER BY ts, event_id) AS open,
        |  max(value) AS high, min(value) AS low,
        |  last(value ORDER BY ts, event_id) AS close,
        |  count(*)::BIGINT AS n
        |FROM events GROUP BY 1, 2 ORDER BY user_id, hr""".stripMargin,

    "q_histogram" ->
      """SELECT (least(floor(value / 10.0), 19.0))::INT AS bucket,
        |  count(*)::BIGINT AS n,
        |  sum((value::DECIMAL(18,2) * 100)::BIGINT)::BIGINT AS mass_cents
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q_range_frame" ->
      """SELECT event_id, user_id,
        |  (count(*) OVER w)::BIGINT AS n_1h,
        |  (sum((value::DECIMAL(18,2) * 100)::BIGINT) OVER w)::BIGINT
        |    AS sum_1h_cents
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "etl_schema_evolution" ->
      """SELECT count(*)::BIGINT AS n,
        |  count(CASE WHEN event_id % 2 = 0 THEN user_id END)::BIGINT AS n_user,
        |  count(CASE WHEN event_id % 2 = 1 THEN value END)::BIGINT AS n_value,
        |  sum(CASE WHEN event_id % 2 = 0 THEN user_id END)::BIGINT AS sum_user,
        |  sum(CASE WHEN event_id % 2 = 1
        |    THEN (value::DECIMAL(18,2) * 100)::BIGINT END)::BIGINT
        |    AS sum_value_cents
        |FROM events""".stripMargin,

    "etl_partition_overwrite" ->
      """SELECT day(ts)::INT AS day, count(*)::BIGINT AS n,
        |  sum(((CASE WHEN day(ts) = 5 THEN value * 2 ELSE value
        |    END)::DECIMAL(18,2) * 100)::BIGINT)::BIGINT AS sum_value_cents
        |FROM events WHERE day(ts) <= 10
        |GROUP BY 1 ORDER BY day""".stripMargin,

    // mirrors etl_time_travel: version N ≡ the cumulative day range its
    // batches covered; every event row survives clean() by construction
    "etl_time_travel" ->
      """WITH e AS (SELECT date_trunc('minute', ts) AS m, user_id % 97 AS tk,
        |  day(ts) AS dd FROM events),
        |v(version, max_day) AS (VALUES (2, 5), (3, 6))
        |SELECT v.version::BIGINT AS version, count(*)::BIGINT AS n_fact,
        |  count(DISTINCT e.m)::BIGINT AS n_minutes,
        |  strftime(max(e.m), '%Y%m%d%H%M') AS max_minute,
        |  count(DISTINCT e.tk)::BIGINT AS n_titles
        |FROM v JOIN e ON e.dd <= v.max_day
        |GROUP BY v.version ORDER BY version""".stripMargin,

    "etl_scd2" ->
      """WITH obs AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER w0 AS prev,
        |    row_number() OVER w0 AS rn
        |  FROM events
        |  WINDOW w0 AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |cp AS (
        |  SELECT user_id, event_type, ts AS vf, event_id
        |  FROM obs WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
        |SELECT user_id, event_type,
        |  strftime(vf, '%Y%m%d%H%M%S.%f') AS valid_from,
        |  strftime(lead(vf) OVER w, '%Y%m%d%H%M%S.%f') AS valid_to,
        |  (row_number() OVER w)::BIGINT AS version,
        |  (lead(vf) OVER w IS NULL) AS is_current
        |FROM cp
        |WINDOW w AS (PARTITION BY user_id ORDER BY vf, event_id)
        |ORDER BY user_id, version""".stripMargin,

    // mirrors q_streaming_neardup_portable: with 1-row bands a shared
    // bucket ⟺ ≥1 agreeing position, which n_agree >= 8 implies — so the
    // pair set is the all-pairs agreement filter over the md5-60bit
    // signature law (no bucket ever nears the caps at gate SF)
    "q_streaming_neardup_portable" ->
      s"""WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS words
         |  FROM documents),
         |d0 AS (SELECT doc_id, words FROM w WHERE len(words) >= 3),
         |sh AS (SELECT doc_id, ${Sql.wordShingles3} AS s FROM d0),
         |sig AS (SELECT doc_id, [${(1 to 16).map(j =>
             s"('0x' || substr(list_min(list_transform(s, x -> md5('$j:' || x))), 1, 15))::BIGINT")
             .mkString(",\n         |    ")}] AS sigs FROM sh),
         |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |    len(list_filter(range(1, 17), i -> a.sigs[i] = b.sigs[i]))::INT AS n_agree
         |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
         |SELECT a_id, b_id, n_agree, n_agree::DOUBLE / 16 AS est_jaccard
         |FROM p WHERE n_agree >= 8 ORDER BY a_id, b_id""".stripMargin,

    "q_streaming_scd2" ->
      """WITH obs AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER w0 AS prev,
        |    row_number() OVER w0 AS rn
        |  FROM events
        |  WINDOW w0 AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |cp AS (
        |  SELECT user_id, event_type, ts AS vf, event_id
        |  FROM obs WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
        |SELECT user_id, event_type,
        |  epoch_us(vf)::BIGINT AS valid_from,
        |  epoch_us(lead(vf) OVER w)::BIGINT AS valid_to,
        |  (row_number() OVER w)::BIGINT AS version
        |FROM cp
        |WINDOW w AS (PARTITION BY user_id ORDER BY vf, event_id)
        |QUALIFY lead(vf) OVER w IS NOT NULL
        |ORDER BY user_id, version""".stripMargin,

    // identical to etl_scd2's oracle ON PURPOSE: the incremental upsert's
    // contract is equality with the full rebuild
    "etl_scd2_upsert" ->
      """WITH obs AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER w0 AS prev,
        |    row_number() OVER w0 AS rn
        |  FROM events
        |  WINDOW w0 AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |cp AS (
        |  SELECT user_id, event_type, ts AS vf, event_id
        |  FROM obs WHERE rn = 1 OR prev IS DISTINCT FROM event_type)
        |SELECT user_id, event_type,
        |  strftime(vf, '%Y%m%d%H%M%S.%f') AS valid_from,
        |  strftime(lead(vf) OVER w, '%Y%m%d%H%M%S.%f') AS valid_to,
        |  (row_number() OVER w)::BIGINT AS version,
        |  (lead(vf) OVER w IS NULL) AS is_current
        |FROM cp
        |WINDOW w AS (PARTITION BY user_id ORDER BY vf, event_id)
        |ORDER BY user_id, version""".stripMargin,

    "etl_cdc_apply" ->
      """WITH base AS (SELECT c_custkey AS k, c_name AS name,
        |    c_acctbal::DECIMAL(18,2) AS bal FROM customer),
        |ch AS (SELECT o_custkey AS k, o_orderkey AS seq,
        |    CASE WHEN o_orderkey % 37 = 0 THEN 'D' ELSE 'U' END AS op,
        |    'upd_' || o_orderkey AS name, o_totalprice::DECIMAL(18,2) AS bal
        |  FROM orders),
        |latest AS (SELECT * FROM ch QUALIFY
        |  row_number() OVER (PARTITION BY k ORDER BY seq DESC) = 1)
        |SELECT k, name, (bal*100)::BIGINT AS bal_cents FROM base
        |  WHERE k NOT IN (SELECT k FROM latest)
        |UNION ALL
        |SELECT k, name, (bal*100)::BIGINT AS bal_cents FROM latest
        |  WHERE op <> 'D'
        |ORDER BY k""".stripMargin,

    "q_streaming_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
        |SELECT user_id, depth, t FROM (
        |  SELECT user_id, 1::INT AS depth,
        |    strftime(t1, '%Y%m%d%H%M%S.%f') AS t FROM s1
        |  UNION ALL SELECT user_id, 2, strftime(t2, '%Y%m%d%H%M%S.%f') FROM s2
        |  UNION ALL SELECT user_id, 3, strftime(t3, '%Y%m%d%H%M%S.%f') FROM s3)
        |ORDER BY user_id, depth""".stripMargin,

    "q_stream_stream_outer" ->
      """WITH p AS (SELECT user_id, event_id AS p_id, ts AS p_ts FROM events
        |    WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, event_id AS v_id, ts AS v_ts FROM events
        |    WHERE event_type = 'view')
        |SELECT p.p_id, count(v.v_id)::BIGINT AS n_views_30m,
        |  coalesce(min(v.v_id), -1)::BIGINT AS first_v_id
        |FROM p LEFT JOIN v ON p.user_id = v.user_id
        |  AND v.v_ts >= p.p_ts - INTERVAL 30 MINUTE AND v.v_ts <= p.p_ts
        |GROUP BY p.p_id ORDER BY p_id""".stripMargin,

    "q_stream_stream_join" ->
      """SELECT p.user_id, p.event_id AS p_id,
        |  strftime(p.ts, '%Y%m%d%H%M%S.%f') AS p_ts_s,
        |  v.event_id AS v_id,
        |  strftime(v.ts, '%Y%m%d%H%M%S.%f') AS v_ts_s
        |FROM events p JOIN events v
        |  ON p.user_id = v.user_id
        |  AND p.event_type = 'purchase' AND v.event_type = 'view'
        |  AND v.ts >= p.ts - INTERVAL 30 MINUTE AND v.ts <= p.ts
        |ORDER BY p_id, v_id""".stripMargin,

    "etl_scd2_resolve" ->
      """WITH obs AS (
        |  SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER w0 AS prev,
        |    row_number() OVER w0 AS rn
        |  FROM events
        |  WINDOW w0 AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |cp AS (
        |  SELECT user_id, event_type, ts AS vf, event_id
        |  FROM obs WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
        |dim AS (
        |  SELECT user_id, event_type, vf,
        |    lead(vf) OVER w AS vt,
        |    (row_number() OVER w)::BIGINT AS version
        |  FROM cp
        |  WINDOW w AS (PARTITION BY user_id ORDER BY vf, event_id)),
        |facts AS (
        |  SELECT user_id, event_id, ts - INTERVAL 1 HOUR AS fts
        |  FROM events WHERE event_type = 'purchase')
        |SELECT f.user_id, f.event_id,
        |  strftime(f.fts, '%Y%m%d%H%M%S.%f') AS ts_s,
        |  d.event_type AS asof_event_type,
        |  strftime(d.vf, '%Y%m%d%H%M%S.%f') AS valid_from_s,
        |  d.version AS asof_version
        |FROM facts f
        |LEFT JOIN dim d
        |  ON f.user_id = d.user_id AND f.fts >= d.vf
        |  AND (f.fts < d.vt OR d.vt IS NULL)
        |ORDER BY f.user_id, f.event_id""".stripMargin,

    "dedup_incremental" ->
      """WITH fp AS (SELECT doc_id, md5(lower(text)) AS fingerprint
        |  FROM documents),
        |hist AS (SELECT fingerprint FROM fp WHERE doc_id % 10 < 7)
        |SELECT doc_id, fingerprint FROM fp b
        |WHERE doc_id % 10 >= 7
        |  AND NOT EXISTS (SELECT 1 FROM hist h
        |                  WHERE h.fingerprint = b.fingerprint)
        |ORDER BY doc_id""".stripMargin,

    "sim_topk_graph" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |  (${Sql.signBucket6})::BIGINT AS bucket FROM embeddings),
         |n AS (SELECT vec_id, v, bucket, sqrt(${Sql.dot("v", "v")}) AS nm FROM e),
         |pr AS (SELECT vec_id, v, nm,
         |  unnest(list_concat([bucket],
         |    list_transform(range(0, 6), i -> xor(bucket, 1::BIGINT << i)))) AS pbucket
         |  FROM n),
         |gcand AS (SELECT a.vec_id AS id, b.vec_id AS nbr_id,
         |  ${Sql.dot("a.v", "b.v")} / (a.nm * b.nm) AS score
         |  FROM pr a JOIN n b ON a.pbucket = b.bucket AND a.vec_id <> b.vec_id),
         |graph AS (SELECT id, nbr_id FROM (
         |  SELECT id, nbr_id, row_number() OVER (
         |    PARTITION BY id ORDER BY score DESC, nbr_id ASC) AS rk FROM gcand)
         |  WHERE rk <= 5),
         |q AS (SELECT vec_id AS query_id, v AS qv, nm AS qnm FROM n WHERE vec_id < 5),
         |f0 AS (SELECT query_id, id FROM (
         |  SELECT q.query_id, c.vec_id AS id, row_number() OVER (
         |    PARTITION BY q.query_id
         |    ORDER BY ${Sql.dot("q.qv", "c.v")} / (q.qnm * c.nm) DESC, c.vec_id) AS rk
         |  FROM q JOIN n c ON c.vec_id % 8 = 0 AND c.vec_id <> q.query_id)
         |  WHERE rk <= 16),
         |c1 AS (SELECT DISTINCT query_id, id FROM (
         |  SELECT query_id, id FROM f0
         |  UNION ALL
         |  SELECT f0.query_id, g.nbr_id AS id FROM f0 JOIN graph g ON f0.id = g.id)),
         |f1 AS (SELECT query_id, id FROM (
         |  SELECT c1.query_id, c1.id, row_number() OVER (
         |    PARTITION BY c1.query_id
         |    ORDER BY ${Sql.dot("q.qv", "c.v")} / (q.qnm * c.nm) DESC, c1.id) AS rk
         |  FROM c1 JOIN q ON q.query_id = c1.query_id
         |  JOIN n c ON c.vec_id = c1.id
         |  WHERE c1.id <> c1.query_id) WHERE rk <= 16),
         |c2 AS (SELECT DISTINCT query_id, id FROM (
         |  SELECT query_id, id FROM f1
         |  UNION ALL
         |  SELECT f1.query_id, g.nbr_id AS id FROM f1 JOIN graph g ON f1.id = g.id)),
         |f2 AS (SELECT query_id, id FROM (
         |  SELECT c2.query_id, c2.id, row_number() OVER (
         |    PARTITION BY c2.query_id
         |    ORDER BY ${Sql.dot("q.qv", "c.v")} / (q.qnm * c.nm) DESC, c2.id) AS rk
         |  FROM c2 JOIN q ON q.query_id = c2.query_id
         |  JOIN n c ON c.vec_id = c2.id
         |  WHERE c2.id <> c2.query_id) WHERE rk <= 16)
         |SELECT query_id, rank, id, score FROM (
         |  SELECT f2.query_id, f2.id AS id,
         |    ${Sql.dot("q.qv", "c.v")} / (q.qnm * c.nm) AS score,
         |    row_number() OVER (PARTITION BY f2.query_id
         |      ORDER BY ${Sql.dot("q.qv", "c.v")} / (q.qnm * c.nm) DESC, f2.id)::INT AS rank
         |  FROM f2 JOIN q ON q.query_id = f2.query_id
         |  JOIN n c ON c.vec_id = f2.id
         |  WHERE f2.id <> f2.query_id)
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // the shared hierarchical descent CTEs + the final top-10 re-rank
    "sim_topk_hnsw" ->
      s"""WITH $hnswOracleCtes
         |SELECT query_id, rank, id, score FROM (
         |  SELECT f.query_id, f.id AS id,
         |    ${Sql.dot("q.qv", "c.v")} / (q.qnm * c.nm) AS score,
         |    row_number() OVER (PARTITION BY f.query_id
         |      ORDER BY ${Sql.dot("q.qv", "c.v")} / (q.qnm * c.nm) DESC, f.id)::INT AS rank
         |  FROM f0_2 f JOIN q ON q.query_id = f.query_id
         |  JOIN n c ON c.vec_id = f.id
         |  WHERE f.id <> f.query_id)
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    // the same descent CTEs + the flat equal-budget chain (5 entries at
    // vec_id % 100 = 0, 2 hops on the base graph) + brute-force truth and
    // per-query hit counts
    "sim_recall_graph" ->
      s"""WITH $hnswOracleCtes,
         |ef AS (SELECT q.query_id, c.vec_id AS id FROM q
         |  JOIN n c ON c.vec_id % 100 = 0),
         |${beamRankCte("ff_0", "ef", "n0", 16)},
         |${beamExpandCte("cf_1", "ff_0", "g0")},
         |${beamRankCte("ff_1", "cf_1", "n0", 16)},
         |${beamExpandCte("cf_2", "ff_1", "g0")},
         |${beamRankCte("ff_2", "cf_2", "n0", 16)},
         |${beamRankCte("flat5", "ff_2", "n0", 5)},
         |${beamRankCte("hh5", "f0_2", "n0", 5)},
         |bf AS (SELECT query_id, id FROM (
         |  SELECT q.query_id, c.vec_id AS id, row_number() OVER (
         |    PARTITION BY q.query_id
         |    ORDER BY ${Sql.dot("q.qv", "c.v")} / (q.qnm * c.nm) DESC, c.vec_id) AS rk
         |  FROM q JOIN n c ON c.vec_id <> q.query_id) WHERE rk <= 5),
         |agg AS (SELECT query_id, count(*)::BIGINT AS n_true FROM bf GROUP BY 1),
         |hf AS (SELECT bf.query_id, count(*)::BIGINT AS hits
         |  FROM bf JOIN flat5 USING (query_id, id) GROUP BY 1),
         |hh AS (SELECT bf.query_id, count(*)::BIGINT AS hits
         |  FROM bf JOIN hh5 USING (query_id, id) GROUP BY 1)
         |SELECT a.query_id, a.n_true,
         |  coalesce(hf.hits, 0)::BIGINT AS hits_flat,
         |  coalesce(hh.hits, 0)::BIGINT AS hits_hnsw,
         |  ((coalesce(hf.hits, 0) * 1000000) // a.n_true)::BIGINT AS recall_flat_fp,
         |  ((coalesce(hh.hits, 0) * 1000000) // a.n_true)::BIGINT AS recall_hnsw_fp
         |FROM agg a LEFT JOIN hf ON hf.query_id = a.query_id
         |LEFT JOIN hh ON hh.query_id = a.query_id
         |ORDER BY a.query_id""".stripMargin,

    "sim_lexical_pairs" ->
      """WITH tok AS (SELECT doc_id,
        |    unnest(string_split(lower(text), ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
        |  FROM tok WHERE length(term) > 0 GROUP BY 1, 2),
        |keep AS (SELECT term FROM (
        |    SELECT term, count(*) AS df FROM tf GROUP BY 1) WHERE df <= 50),
        |tff AS (SELECT tf.doc_id, tf.term, tf.tf FROM tf JOIN keep USING (term)),
        |norms AS (SELECT doc_id, sum(tf * tf)::BIGINT AS n2 FROM tff GROUP BY 1),
        |dots AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |    sum(a.tf * b.tf)::BIGINT AS dot
        |  FROM tff a JOIN tff b USING (term) WHERE a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT a_id, b_id, dot,
        |  dot::DOUBLE / (sqrt(na.n2::DOUBLE) * sqrt(nb.n2::DOUBLE)) AS cosine
        |FROM dots
        |JOIN norms na ON na.doc_id = a_id
        |JOIN norms nb ON nb.doc_id = b_id
        |WHERE dot::DOUBLE / (sqrt(na.n2::DOUBLE) * sqrt(nb.n2::DOUBLE)) >= 0.5
        |ORDER BY a_id, b_id""".stripMargin,

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

    "etl_partitioned_scan" ->
      """SELECT day(ts)::INT AS day, count(*)::BIGINT AS n,
        |  count(DISTINCT user_id)::BIGINT AS n_users
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY day""".stripMargin,

    "q_union_all" ->
      """SELECT 'h1' AS half, event_type, count(*)::BIGINT AS n FROM events
        |WHERE day(ts) <= 15 GROUP BY event_type
        |UNION ALL
        |SELECT 'h2' AS half, event_type, count(*)::BIGINT AS n FROM events
        |WHERE day(ts) > 15 GROUP BY event_type
        |ORDER BY half, event_type""".stripMargin,

    "q_except" ->
      """SELECT strftime(date_trunc('minute', ts), '%Y%m%d%H%M') AS datetime_key
        |FROM events WHERE event_type = 'view'
        |EXCEPT
        |SELECT strftime(date_trunc('minute', ts), '%Y%m%d%H%M') AS datetime_key
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY datetime_key""".stripMargin,

    "q_string_funcs" ->
      """SELECT c_custkey, upper(c_name) AS up_name,
        |  substr(c_name, 1, 8) AS name_head,
        |  replace(c_name, '#', '-') AS dashed,
        |  lpad(c_custkey::VARCHAR, 10, '0') AS padded_key,
        |  length(c_name)::INT AS name_len,
        |  reverse(c_name) AS rev_name
        |FROM customer WHERE c_custkey % 37 = 0 ORDER BY c_custkey""".stripMargin,

    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS od,
        |  strftime(o_orderdate::DATE + 30, '%Y-%m-%d') AS od_plus30,
        |  date_diff('day', DATE '1995-01-01', o_orderdate::DATE)::INT AS days_since,
        |  strftime(last_day(o_orderdate::DATE), '%Y-%m-%d') AS month_end,
        |  quarter(o_orderdate)::INT AS qtr
        |FROM orders WHERE o_orderkey % 97 = 0 ORDER BY o_orderkey""".stripMargin,

    "q_json_extract" ->
      """SELECT event_type, count(*)::BIGINT AS n,
        |  sum((props->>'$.k')::BIGINT)::BIGINT AS sum_k,
        |  max((props->>'$.k')::BIGINT)::BIGINT AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_full_outer" ->
      """SELECT day, n_views, n_purchases FROM
        |  (SELECT day(ts)::INT AS day, count(*)::BIGINT AS n_views FROM events
        |   WHERE event_type = 'view' AND day(ts) <= 20 GROUP BY 1) v
        |FULL JOIN
        |  (SELECT day(ts)::INT AS day, count(*)::BIGINT AS n_purchases FROM events
        |   WHERE event_type = 'purchase' AND day(ts) >= 10 GROUP BY 1) p
        |USING (day) ORDER BY day""".stripMargin,

    "q_salted_join" ->
      """SELECT p_brand, count(*)::BIGINT AS n, sum(l_quantity) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_bloom_join" ->
      """SELECT p_brand, count(*)::BIGINT AS n, sum(l_quantity) AS sum_qty,
        |  (sum(l_extendedprice::DECIMAL(18,2)))::DOUBLE AS sum_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 3
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q17_small_qty" ->
      """SELECT count(*)::BIGINT AS n,
        |  (sum(l_extendedprice::DECIMAL(18,2)))::DOUBLE AS sum_extprice
        |FROM lineitem l JOIN (
        |  SELECT l_partkey, 0.2 * (sum(l_quantity) / count(*)) AS qty_thresh
        |  FROM lineitem GROUP BY l_partkey) p
        |ON l.l_partkey = p.l_partkey
        |WHERE l.l_quantity < p.qty_thresh""".stripMargin
  )
}
