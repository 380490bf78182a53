package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants for the round-5 text/sampling operators, over
  * generated corpora rather than fixtures (same raw-ScalaCheck style as
  * `graft.etl.PropertySpec` — the scalatest bridge artifact isn't in the
  * offline cache; failures print the seed). */
class ExtPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic forAll replacement: n samples from fixed seeds. */
  private def forSamples[A](gen: Gen[A], n: Int = 8)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      val seed = Seed(i.toLong * 104729)
      gen.apply(Gen.Parameters.default, seed) match {
        case Some(a) =>
          try body(a)
          catch { case e: Throwable =>
            throw new AssertionError(s"property failed for seed $i: $e", e) }
        case None => ()
      }
    }

  private val wordGen: Gen[String] =
    Gen.oneOf("ax", "bx", "cx", "dx", "ex", "fx", "gx", "hx")
  private val docGen: Gen[List[String]] =
    Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, wordGen))

  test("chunkWords properties: coverage, no contained chunks, exact content") {
    val caseGen = for {
      words <- docGen
      window <- Gen.choose(1, 8)
      stride <- Gen.choose(1, window)
    } yield (words, window, stride)
    forSamples(caseGen, n = 12) { case (words, window, stride) =>
      val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val chunks = TextStats.chunkWords(df, "doc_id", "text", window, stride)
        .as[(Long, Int, String, Int)].collect().sortBy(_._2)
      // every token is covered and the ledger is exact
      assert(chunks.map(c => c._2 * stride + c._4).max === words.length)
      // no chunk is contained in its predecessor
      assert(chunks.filter(_._2 > 0).forall(_._4 > window - stride))
      // each chunk is exactly its slice of the document
      chunks.foreach { case (_, no, text, n) =>
        val s = no * stride
        assert(text === words.slice(s, s + window).mkString(" "))
        assert(n === math.min(window, words.length - s))
      }
    }
  }

  test("dedupSpans conservation: survivors carry each distinct span exactly once") {
    val corpusGen = Gen.choose(2, 6)
      .flatMap(k => Gen.listOfN(k, docGen))
    forSamples(corpusGen, n = 8) { docLists =>
      val window = 3
      val docs = docLists.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val out = Dedup.dedupSpans(docs, "doc_id", "text", window)
        .as[(Long, String, Long)].collect()
      val allSpans = docLists.flatMap(ws =>
        ws.grouped(window).map(_.mkString(" ")).toList)
      // each DISTINCT span of the corpus survives exactly once in total
      assert(out.map(_._3).sum === allSpans.distinct.size.toLong)
      // survivors' reassembled text tiles back into original spans only
      out.foreach { case (id, text, n) =>
        val spans = docLists(id.toInt).grouped(window).map(_.mkString(" ")).toSet
        val tiles = text.split(" ").grouped(window).map(_.mkString(" ")).toList
        assert(tiles.length.toLong === n)
        assert(tiles.forall(spans.contains))
      }
    }
  }

  test("scrubPii is idempotent and masks every planted email / long number") {
    val textGen = for {
      words <- docGen
      email <- Gen.oneOf("a.b+c@ex-1.example.org", "x@y.io", "u_1%2@a.b.co")
      num <- Gen.choose(1000000L, 999999999L)
    } yield (words.take(5) ++ List(email) ++ words.drop(5) ++ List(num.toString))
      .mkString(" ")
    forSamples(textGen, n = 10) { text =>
      val once = Seq((1L, text)).toDF("id", "t")
        .select(TextStats.scrubPii(col("t")).as("t"))
        .as[String].head()
      val twice = Seq((1L, once)).toDF("id", "t")
        .select(TextStats.scrubPii(col("t")).as("t"))
        .as[String].head()
      assert(once === twice)                       // idempotent
      assert(!once.contains("@") && !once.matches(".*[0-9]{7,}.*"))
      assert(once.contains("<EMAIL>") && once.contains("<NUM>"))
    }
  }

  test("lshCandidates: capped buckets are excluded from the band-match count") {
    // pins the documented conservative interaction: a bucket above
    // maxBucketSize is dropped BEFORE the pair join, so it contributes
    // neither candidates nor minBandMatches counts — checked against a
    // brute-force reference over generated small-value-space signatures
    // (lots of genuine collisions and hot buckets).
    val caseGen = for {
      nDocs <- Gen.choose(4, 12)
      sigs <- Gen.listOfN(nDocs, Gen.listOfN(6, Gen.choose(0L, 3L)))
      cap <- Gen.choose(2, 5)
      m <- Gen.choose(1, 3)
    } yield (sigs, cap, m)
    forSamples(caseGen, n = 10) { case (sigs, cap, m) =>
      val df = sigs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "sig")
      val scope = new CacheScope
      val got =
        try Dedup.lshCandidates(df, "id", "sig", bandRows = 1,
            maxBucketSize = cap, scope = scope, minBandMatches = m)
          .as[(Long, Long)].collect().toSet
        finally scope.close()
      // reference: band (j, v) survives iff its bucket has <= cap docs; a
      // pair is emitted iff it shares >= m SURVIVING bands
      val ids = sigs.indices
      def bucketSize(j: Int, v: Long) = ids.count(i => sigs(i)(j) == v)
      val ref = (for {
        a <- ids; b <- ids if a < b
        n = (0 until 6).count(j =>
          sigs(a)(j) == sigs(b)(j) && bucketSize(j, sigs(a)(j)) <= cap)
        if n >= m
      } yield (a.toLong, b.toLong)).toSet
      assert(got === ref)
    }
  }

  test("adaptiveBucketCap: per-bucket quadratic cost stays proportional to N") {
    // the formula's whole point: cap(s·N)² / (s·N) == cap(N)² / N for any
    // scale-up s (above the minCap floor), so the bucket self-join stays
    // LINEAR in corpus size with no retuning — checked at two corpus sizes
    // per sample, plus monotonicity and the small-corpus floor
    val caseGen = for {
      n <- Gen.choose(10000L, 10000000L)
      scaleUp <- Gen.oneOf(4L, 100L, 10000L)
      c <- Gen.choose(2.0, 16.0)
    } yield (n, scaleUp, c)
    forSamples(caseGen, n = 12) { case (n, s, c) =>
      val cap1 = Dedup.adaptiveBucketCap(n, c)
      val cap2 = Dedup.adaptiveBucketCap(n * s, c)
      assert(cap2 >= cap1) // monotone in corpus size
      val work1 = cap1.toDouble * cap1 / n
      val work2 = cap2.toDouble * cap2 / (n * s)
      // ceil() rounding perturbs the ratio by at most ~2/(c·√N) per side
      assert(math.abs(work2 - work1) / work1 < 0.01,
        s"per-bucket work must not drift across a ${s}× scale-up: $work1 vs $work2")
    }
    assert(Dedup.adaptiveBucketCap(0L) === 64)    // floor on empty/tiny corpora
    assert(Dedup.adaptiveBucketCap(10L) === 64)
    assert(Dedup.adaptiveBucketCap(1000000L, c = 8.0) === 8000)
  }

  test("deterministicShuffle: exact permutation, stable under repartitioning, salt-independent") {
    val keys = (1L to 300L).toDF("k")
    def order(df: org.apache.spark.sql.DataFrame, salt: String): Seq[Long] =
      Sampling.deterministicShuffle(df, "k", salt).select("k").as[Long].collect().toSeq
    val o1 = order(keys, "ep1")
    assert(o1.sorted === (1L to 300L)) // a permutation — nothing lost or duplicated
    assert(o1 !== (1L to 300L)) // and actually shuffled
    // pure function of the key: the physical layout of the input is irrelevant
    assert(order(keys.repartition(7), "ep1") === o1)
    // different salts → independent epoch orders
    assert(order(keys, "ep2") !== o1)
  }

  test("sampleByHash fractions nest and withSplit partitions exactly") {
    val fracGen = for {
      f1 <- Gen.choose(0.0, 1.0)
      f2 <- Gen.choose(0.0, 1.0)
    } yield (math.min(f1, f2), math.max(f1, f2))
    val keys = (1L to 200L).toDF("k")
    forSamples(fracGen, n = 8) { case (lo, hi) =>
      def ids(f: Double) = Sampling.sampleByHash(keys, "k", f)
        .as[Long].collect().toSet
      val (small, big) = (ids(lo), ids(hi))
      assert(small.subsetOf(big))                  // fractions nest
      val split = Sampling.withSplit(keys, "k", testFraction = lo)
        .groupBy("split").count().as[(String, Long)].collect().toMap
      assert(split.values.sum === 200L)            // exact partition
      assert(split.getOrElse("test", 0L) === small.size.toLong)
    }
  }

  test("funnelDepth equals the iterative join chain on random event logs") {
    // the operator's fold and the textbook formulation (t_{k+1} = min ts
    // strictly after t_k, anchored at the FIRST step-1) must agree on any
    // log — including repeated steps, ties, and out-of-order generation
    val steps = Seq("s1", "s2", "s3")
    val logGen: Gen[List[(Long, String, Long)]] = for {
      n <- Gen.choose(1, 60)
      evs <- Gen.listOfN(n, for {
        user <- Gen.choose(1L, 6L)
        step <- Gen.oneOf("s1", "s2", "s3", "noise")
        ts <- Gen.choose(1L, 20L) // small range forces ties
      } yield (user, step, ts))
    } yield evs
    forSamples(logGen, n = 12) { evs =>
      val df = evs.map { case (u, s, t) => (u, s, new java.sql.Timestamp(t * 1000)) }
        .toDF("user_id", "event_type", "ts")
      val got = Funnel.funnelDepth(df, "user_id", "event_type", "ts", steps)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getTimestamp(2).getTime / 1000))
        .toSet
      // independent reimplementation: per-user iterative min-after chain
      val byUser = evs.groupBy(_._1)
      val expected = byUser.flatMap { case (u, rows) =>
        def minAfter(step: String, after: Option[Long]): Option[Long] = {
          val ts = rows.collect {
            case (_, s, t) if s == step && after.forall(t > _) => t
          }
          if (ts.isEmpty) None else Some(ts.min)
        }
        minAfter("s1", None).map { t1 =>
          val t2 = minAfter("s2", Some(t1))
          val t3 = t2.flatMap(t => minAfter("s3", Some(t)))
          val (depth, t) = t3.map((3, _)).orElse(t2.map((2, _))).getOrElse((1, t1))
          (u, depth, t)
        }
      }.toSet
      assert(got === expected, s"log: $evs")
    }
  }

  test("heavyHitters property: equals the exact HAVING query for any sound (T, cap)") {
    val caseGen = for {
      // zipf-ish multiset: nKeys keys, key k repeated weight(k) times
      nKeys <- Gen.choose(5, 60)
      weights <- Gen.listOfN(nKeys, Gen.choose(1, 50))
      parts <- Gen.choose(1, 9)
      threshold <- Gen.choose(5L, 25L)
    } yield (weights, parts, threshold)
    forSamples(caseGen, n = 10) { case (weights, parts, threshold) =>
      val rows = weights.zipWithIndex.flatMap { case (w, k) =>
        Seq.fill(w)(k.toLong)
      }
      val n = rows.length.toLong
      // smallest sound capacity plus a margin — the property must hold at
      // the BOUNDARY, not only at generous capacities
      val capacity = (n / threshold).toInt + 1
      val df = rows.toDF("key").repartition(parts)
      val want = df.groupBy("key").agg(count(lit(1)).as("n"))
        .where(col("n") >= threshold)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = Sketches.heavyHitters(df, "key", threshold, capacity)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want,
        s"n=$n threshold=$threshold capacity=$capacity parts=$parts")
    }
  }

  test("chunkParagraphs equals a plain-Scala greedy fold on random corpora " +
      "(budget law, oversized isolation, empty-paragraph drops)") {
    val paraGen: Gen[String] = Gen.frequency(
      1 -> Gen.const(""),
      8 -> Gen.choose(1, 9).flatMap(n => Gen.listOfN(n, wordGen).map(_.mkString(" "))))
    val caseGen = for {
      paras <- Gen.choose(1, 10).flatMap(n => Gen.listOfN(n, paraGen))
      budget <- Gen.choose(2, 12)
    } yield (paras, budget)
    forSamples(caseGen, n = 12) { case (paras, budget) =>
      val text = paras.mkString("|")
      val got = TextStats.chunkParagraphs(
          Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
          maxTokens = budget, sep = "|")
        .as[(Long, Int, String, Long)].collect().sortBy(_._2).toList
        .map(r => (r._2, r._3, r._4))
      // reference: the same greedy law in plain Scala
      val kept = paras.map(p => p -> p.split(" ").count(_.nonEmpty).toLong)
        .filter(_._2 > 0)
      val ref = kept.foldLeft(List.empty[(String, Long)]) {
        case (acc, (p, n)) => acc match {
          case (t0, n0) :: rest if n0 + n <= budget => (t0 + "|" + p, n0 + n) :: rest
          case _ => (p, n) :: acc
        }
      }.reverse.zipWithIndex.map { case ((t, n), i) => (i, t, n) }
      assert(got === ref, s"paras=$paras budget=$budget")
      // laws: every chunk except oversized singletons fits the budget, and
      // the concatenation reproduces exactly the kept paragraphs
      got.foreach { case (_, t, n) =>
        assert(n <= budget || !t.contains("|"), s"overfull multi-para chunk: $t")
      }
      assert(got.map(_._2).mkString("|") === kept.map(_._1).mkString("|"))
    }
  }

  test("unigramDiversity equals the relational explode/groupBy twin on " +
      "random corpora (case folds, multi-space, empty docs)") {
    // docs with repeated tokens, mixed case, runs of separators, and the
    // occasional empty string — the fold's run-length state vs a plain
    // explode → per-token count → per-doc aggregate reimplementation
    val rawDocGen: Gen[String] = Gen.frequency(
      1 -> Gen.const(""),
      9 -> (for {
        n <- Gen.choose(1, 30)
        ws <- Gen.listOfN(n, Gen.oneOf("ax", "AX", "bx", "bX", "cx", "", " "))
      } yield ws.mkString(" ")))
    val corpusGen: Gen[List[String]] =
      Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, rawDocGen))
    forSamples(corpusGen, n = 10) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val sig = TextStats.unigramDiversity(col("text"))
      val got = df.select(col("doc_id"), sig("n_tok"), sig("n_distinct"),
          sig("sum_c2"), sig("max_c"))
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
      // relational twin: explode non-empty lowercased tokens, count per
      // (doc, token), aggregate per doc; docs with zero tokens re-enter
      // with zeros via the left join
      val counts = df
        .select(col("doc_id"),
          explode(split(lower(col("text")), " ")).as("tok"))
        .where(col("tok") =!= "")
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      val agg = counts.groupBy("doc_id").agg(
        sum("c").as("n_tok"), count(lit(1)).as("n_distinct"),
        sum(col("c") * col("c")).as("sum_c2"), max("c").as("max_c"))
      val want = df.select("doc_id").join(agg, Seq("doc_id"), "left")
        .na.fill(0L)
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
      assert(got.toSeq === want.toSeq, s"corpus=$texts")
    }
  }
}
