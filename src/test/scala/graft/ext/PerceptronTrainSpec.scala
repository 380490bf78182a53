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

  test("learned weights drop into the E9g scoring seam shape") {
    // the trained vector indexes the same bucket space hashedLinearScore
    // uses — scoring with it is a pure bucket lookup sum
    val docs = Seq("alpha beta" -> 1, "zeta eta" -> -1)
    val w = train(docs, 64, 3)
    assert(w.length === 64 && w.exists(_ != 0L))
  }
}
