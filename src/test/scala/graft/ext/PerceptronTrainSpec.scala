package graft.ext

import graft.SparkSpec

/** [[TextStats.perceptronTrain]] must agree with a naive in-memory batch
  * perceptron — same feature space (unigrams + `_`-bigrams, md5 bucket),
  * same ≥0 sign convention, same order-independent batch update — and must
  * actually LEARN: zero training error on a linearly separable corpus. */
class PerceptronTrainSpec extends SparkSpec {
  import spark.implicits._

  private def bucketOf(f: String, dim: Int, salt: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest((f + salt).getBytes("UTF-8"))
    ((((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) % dim).toInt
  }

  private def featsOf(text: String): Seq[String] = {
    val toks = text.toLowerCase.split(' ').filter(_.nonEmpty).toSeq
    toks ++ toks.zip(toks.drop(1)).map { case (a, b) => s"${a}_$b" }
  }

  private def naive(docs: Seq[(String, Int)], dim: Int, epochs: Int,
                    salt: String, averaged: Boolean = false): Seq[Long] = {
    val w = Array.fill(dim)(0L)
    val wSum = Array.fill(dim)(0L)
    val bucketed = docs.map { case (t, y) =>
      (y.toLong, featsOf(t).map(bucketOf(_, dim, salt)))
    }
    for (_ <- 1 to epochs) {
      val delta = Array.fill(dim)(0L)
      bucketed.foreach { case (y, bs) =>
        val dot = bs.map(b => w(b)).sum
        val pred = if (dot >= 0) 1L else -1L
        if (pred != y) bs.foreach(b => delta(b) += y)
      }
      for (b <- 0 until dim) { w(b) += delta(b); wSum(b) += w(b) }
    }
    (if (averaged) wSum else w).toSeq
  }

  private def train(docs: Seq[(String, Int)], dim: Int, epochs: Int): Seq[Long] =
    TextStats.perceptronTrain(docs.toDF("text", "y"), "text", "y", dim, epochs)

  test("agrees with the naive model across epochs") {
    val docs = Seq(
      "good clean prose with many words" -> 1,
      "spam spam click here now" -> -1,
      "more good careful writing here" -> 1,
      "click click spam now" -> -1,
      "a" -> 1, "" -> -1, "  " -> 1)
    Seq(1, 2, 3, 5).foreach { e =>
      assert(train(docs, 64, e) === naive(docs, 64, e, "qc"),
        s"diverges at epochs=$e")
    }
  }

  test("reaches zero training error on a separable corpus") {
    val docs = Seq(
      "alpha beta gamma" -> 1, "alpha beta" -> 1, "gamma alpha" -> 1,
      "zeta eta theta" -> -1, "zeta eta" -> -1, "theta zeta" -> -1)
    val dim = 256
    val w = train(docs, dim, epochs = 20)
    val errs = docs.count { case (t, y) =>
      val dot = featsOf(t).map(f => w(bucketOf(f, dim, "qc"))).sum
      (if (dot >= 0) 1 else -1) != y
    }
    assert(errs === 0, s"still $errs training errors: $w")
  }

  test("averaged mode agrees with the naive snapshot sum") {
    val docs = Seq(
      "good clean prose here" -> 1, "spam click now" -> -1,
      "more careful writing" -> 1, "click spam now now" -> -1)
    Seq(2, 4).foreach { e =>
      val got = TextStats.perceptronTrain(docs.toDF("text", "y"),
        "text", "y", 64, e, averaged = true)
      assert(got === naive(docs, 64, e, "qc", averaged = true),
        s"averaged diverges at epochs=$e")
    }
  }

  test("one-vs-all ≡ k independent binary fits; argmax learns a 3-class corpus") {
    val docs = Seq(
      ("alpha beta common", 0), ("beta alpha common", 0), ("alpha alpha", 0),
      ("gamma delta common", 1), ("delta gamma common", 1), ("gamma gamma", 1),
      ("zeta eta common", 2), ("eta zeta common", 2), ("zeta zeta", 2))
    val dim = 256
    val ova = TextStats.perceptronTrainOvA(docs.toDF("text", "c"), "text", "c",
      nClasses = 3, dim = dim, epochs = 10, averaged = true)
    // contract: per-class vector == the independent binary fit with ±1 labels
    (0 until 3).foreach { k =>
      val bin = TextStats.perceptronTrain(
        docs.map { case (t, c) => (t, if (c == k) 1 else -1) }.toDF("text", "y"),
        "text", "y", dim, epochs = 10, averaged = true)
      assert(ova(k) === bin, s"class $k diverges from the binary fit")
    }
    // argmax inference recovers every training label on the separable corpus
    import org.apache.spark.sql.functions.col
    val scored = docs.toDF("text", "c").select(col("c"),
      TextStats.argmaxFirst((0 until 3).map(k =>
        TextStats.trainedScoreCol(col("text"), ova(k)))).as("pred"))
    assert(scored.where(col("pred") =!= col("c")).count() === 0)
  }

  test("argmaxFirst tie-breaks to the lowest class index") {
    import org.apache.spark.sql.functions.lit
    val r = spark.range(1).select(
      TextStats.argmaxFirst(Seq(lit(5L), lit(5L), lit(3L))).as("a"),
      TextStats.argmaxFirst(Seq(lit(1L), lit(2L), lit(2L))).as("b"),
      TextStats.argmaxFirst(Seq(lit(7L))).as("c")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((0L, 1L, 0L)))
  }

  test("argmaxFirst treats null scores as 0 (an external coalesce-to-0 restatement agrees)") {
    import org.apache.spark.sql.functions.lit
    val nul = lit(null).cast("long")
    val r = spark.range(1).select(
      // all null → all 0 → first-wins class 0 (the old fall-through
      // predicted the LAST class here)
      TextStats.argmaxFirst(Seq(nul, nul, nul)).as("a"),
      // null vs positive: the real score must still win
      TextStats.argmaxFirst(Seq(nul, lit(5L), lit(3L))).as("b"),
      // negative scores lose to a null-as-0
      TextStats.argmaxFirst(Seq(lit(-2L), nul, lit(-1L))).as("c")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((0L, 1L, 1L)))
  }

  test("learned weights drop into the E9g scoring seam shape") {
    // the trained vector indexes the same bucket space hashedLinearScore
    // uses — scoring with it is a pure bucket lookup sum
    val docs = Seq("alpha beta" -> 1, "zeta eta" -> -1)
    val w = train(docs, 64, 3)
    assert(w.length === 64 && w.exists(_ != 0L))
  }
}
