package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // group sizes by construction: (a,1)x5, (a,2)x3, (b,1)x1, (b,null)x2
  private def frame = (Seq.fill(5)(("a", Option(1))) ++
    Seq.fill(3)(("a", Option(2))) ++ Seq(("b", Option(1))) ++
    Seq.fill(2)(("b", None))).toDF("t", "z")

  test("census counts groups and rows below each threshold") {
    val c = Privacy.kAnonymityCensus(frame, Seq("t", "z"), Seq(2, 4, 10))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(c(2) === ((1L, 1L, 1L, 4L)))   // only the singleton below k=2
    assert(c(4) === ((3L, 6L, 1L, 4L)))   // sizes 3,1,2 below k=4
    assert(c(10) === ((4L, 11L, 1L, 4L))) // everything below k=10
  }

  test("suppressToK keeps exactly the groups at or above k, nulls grouped") {
    val kept = Privacy.suppressToK(frame, Seq("t", "z"), 2)
    assert(kept.count() === 10, "the size-1 group must be suppressed")
    // result is k-anonymous by construction: re-census has min >= k
    val re = Privacy.kAnonymityCensus(kept, Seq("t", "z"), Seq(2))
      .head.getLong(3)
    assert(re >= 2L)
    // the null-QI group (size 2) survived: null matched null in the join
    assert(kept.where(col("z").isNull).count() === 2,
      "null QI group lost — the semi-join is not null-safe")
    // k above every group size suppresses everything
    assert(Privacy.suppressToK(frame, Seq("t", "z"), 100).count() === 0)
  }

  test("pseudonymize: stable across tables, null-preserving, join-consistent") {
    val a = Seq(Some(1L), Some(2L), None).toDF("uid")
    val b = Seq(Some(2L), Some(3L)).toDF("uid")
    val ta = Privacy.pseudonymize(a, Seq("uid"), "s1")
    val tb = Privacy.pseudonymize(b, Seq("uid"), "s1")
    // same value, same salt → same token (referential integrity survives)
    assert(ta.join(tb, "uid").count() === 1, "uid=2 must still join by token")
    // null identity stays null, never a token
    assert(ta.where(col("uid").isNull).count() === 1)
    // a different salt is a different token universe
    val tc = Privacy.pseudonymize(b, Seq("uid"), "s2")
    assert(tb.join(tc, "uid").count() === 0, "salts must not collide")
    // tokens are md5 surrogates — raw values never appear
    assert(ta.where(col("uid").isNotNull)
      .collect().forall(_.getString(0).matches("[0-9a-f]{32}")))
  }

  test("maskKeepLast: redacts all but the tail; short and null values safe") {
    val r = Seq("12345678", "abcd", "ab", "").toDF("v")
      .select(Privacy.maskKeepLast(col("v"), 4).as("m"))
      .collect().map(_.getString(0)).toSeq
    assert(r === Seq("****5678", "abcd", "ab", ""))
    val n = Seq[Option[String]](None).toDF("v")
      .select(Privacy.maskKeepLast(col("v"), 4)).head
    assert(n.isNullAt(0), "null in, null out")
    // keep = 0 is full redaction
    val z = Seq("abc").toDF("v")
      .select(Privacy.maskKeepLast(col("v"), 0)).head.getString(0)
    assert(z === "***")
  }

  test("census agrees with suppression arithmetic on random frames") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((s"t${rnd.nextInt(4)}", rnd.nextInt(6)))
    val df = rows.toDF("t", "z")
    for (k <- Seq(2, 5, 9)) {
      val c = Privacy.kAnonymityCensus(df, Seq("t", "z"), Seq(k)).head
      val keptRows = Privacy.suppressToK(df, Seq("t", "z"), k).count()
      assert(keptRows === 200L - c.getLong(2),
        s"k=$k: suppressed rows must equal the census's n_rows_below")
    }
  }
}
