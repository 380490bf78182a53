package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  private val steps = Seq("signup", "view", "purchase")

  private def events = Seq(
    // user 1: full funnel, with decoys (early view before signup must not
    // count; the SECOND view after signup is not needed)
    (1L, "view", ts(1)), (1L, "signup", ts(2)), (1L, "view", ts(5)),
    (1L, "view", ts(7)), (1L, "purchase", ts(9)),
    // user 2: signup then purchase but never a view in between → depth 1
    (2L, "signup", ts(1)), (2L, "purchase", ts(3)),
    // user 3: view and purchase but no signup → not in the funnel at all
    (3L, "view", ts(1)), (3L, "purchase", ts(2)),
    // user 4: signup and view at the SAME instant → strict ordering, depth 1
    (4L, "signup", ts(4)), (4L, "view", ts(4)),
    // user 5: funnel completed only via the LATER signup's chain? No —
    // earliest-transition anchors at the FIRST signup; view at ts(3) is
    // after it, purchase at ts(6) after that → depth 3
    (5L, "signup", ts(1)), (5L, "view", ts(3)), (5L, "signup", ts(4)),
    (5L, "purchase", ts(6)),
    // user 6: non-funnel noise only
    (6L, "click", ts(1)), (6L, "error", ts(2))
  ).toDF("user_id", "event_type", "ts")

  test("funnelDepth: earliest-transition depths, decoys and ties handled") {
    val got = Funnel.funnelDepth(events, "user_id", "event_type", "ts", steps)
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getTimestamp(2))).toSeq
    assert(got === Seq(
      (1L, 3, ts(9)),
      (2L, 1, ts(1)),
      (4L, 1, ts(4)),
      (5L, 3, ts(6))))
  }

  test("funnelDepth picks the earliest chain, not any chain") {
    // the first eligible view (ts 5) is the transition even though a later
    // one (ts 7) also exists — t_reached for a depth-2 funnel pins it
    val got = Funnel.funnelDepth(events.where(col("user_id") === 1L &&
        col("event_type") =!= "purchase"),
        "user_id", "event_type", "ts", steps)
      .collect().map(r => (r.getInt(1), r.getTimestamp(2))).toSeq
    assert(got === Seq((2, ts(5))))
  }

  test("funnelCounts is the cumulative chart and skips empty steps") {
    val got = Funnel.funnelCounts(events, "user_id", "event_type", "ts", steps)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq((1, "signup", 4L), (2, "view", 2L), (3, "purchase", 2L)))
    // no user reaches 'purchase' among depth<3 subsets: counts drop the row
    val none = Funnel.funnelCounts(events.where(col("user_id") === 2L),
      "user_id", "event_type", "ts", steps)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSeq
    assert(none === Seq((1, 1L)))
  }

  test("bad step lists are rejected") {
    intercept[IllegalArgumentException] {
      Funnel.funnelDepth(events, "user_id", "event_type", "ts", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Funnel.funnelDepth(events, "user_id", "event_type", "ts",
        Seq("view", "view"))
    }
  }
}
