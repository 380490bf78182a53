package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private def probe = Seq(
    (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"),
    (2L, "b2"), (7L, "g")).toDF("k", "pv")
  private def build = Seq(
    (2L, "B"), (4L, "D"), (9L, "Z")).toDF("k", "bv")

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("inner / left_semi / left_anti are row-identical to the plain join") {
    for (jt <- Seq("inner", "left_semi", "left_anti")) {
      val got = BloomJoin.prefilteredEquiJoin(probe, build, "k", jt)
      val want = probe.join(build, Seq("k"), jt)
      assert(rows(got) === rows(want), s"join type $jt")
    }
  }

  test("an undersized (FP-heavy) filter stays exact — FPs die in the join") {
    // 2 expected items for a 1000-key build at 30% fpp: the filter
    // saturates, most probe rows pass it, and the exact join must still
    // produce the plain-join answer
    val p = (1L to 500L).map(i => (i, i * 10)).toDF("k", "pv")
    val b = (400L to 1400L).map(i => (i, i.toString)).toDF("k", "bv")
    for (jt <- Seq("inner", "left_anti")) {
      val got = BloomJoin.prefilteredEquiJoin(p, b, "k", jt,
        expectedBuildItems = 2L, fpp = 0.3)
      assert(rows(got) === rows(p.join(b, Seq("k"), jt)), s"join type $jt")
    }
  }

  test("null probe keys: dropped by inner/semi, kept by anti — like the plain join") {
    val p = Seq((Some(1L), "a"), (None, "n1"), (Some(8L), "c"), (None, "n2"))
      .toDF("k", "pv")
    val b = Seq((Some(1L), "A"), (None, "N")).toDF("k", "bv")
    for (jt <- Seq("inner", "left_semi", "left_anti")) {
      val got = BloomJoin.prefilteredEquiJoin(p, b, "k", jt)
      assert(rows(got) === rows(p.join(b, Seq("k"), jt)), s"join type $jt")
    }
  }

  test("empty build side degrades to the plain join for every type") {
    val empty = build.limit(0)
    assert(BloomJoin.prefilteredEquiJoin(probe, empty, "k", "inner").count() === 0)
    assert(BloomJoin.prefilteredEquiJoin(probe, empty, "k", "left_semi").count() === 0)
    assert(rows(BloomJoin.prefilteredEquiJoin(probe, empty, "k", "left_anti"))
      === rows(probe))
  }

  test("outer join types are rejected") {
    for (jt <- Seq("left", "left_outer", "right_outer", "full_outer")) {
      val e = intercept[IllegalArgumentException] {
        BloomJoin.prefilteredEquiJoin(probe, build, "k", jt)
      }
      assert(e.getMessage.contains("bloom prefilter"), jt)
    }
  }

  test("scope-less filter blob is destroyed after the first action; scope owns it") {
    val result = BloomJoin.prefilteredEquiJoin(probe, build, "k", "inner")
    assert(result.count() === 3)
    // the destroy listener fires on the async listener bus; once it has, a
    // second action on the same scope-less result must fail loudly
    // (single-consumption contract) — poll until it does
    var secondActionFailed = false
    val deadline2 = System.nanoTime() + 10e9.toLong
    while (!secondActionFailed && System.nanoTime() < deadline2) {
      try {
        result.count()
        Thread.sleep(50)
      } catch { case _: Throwable => secondActionFailed = true }
    }
    assert(secondActionFailed,
      "scope-less result must become unusable once its blob broadcast is destroyed")

    // scope ownership: survives repeated actions, destroyed at close
    val scope = new CacheScope
    val owned = BloomJoin.prefilteredEquiJoin(probe, build, "k", "inner",
      scope = scope)
    assert(owned.count() === 3 && owned.count() === 3, "multi-consumption OK")
    scope.close()
  }
}
