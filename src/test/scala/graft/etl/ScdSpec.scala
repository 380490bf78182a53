package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SCD Type-2 semantics: run collapsing, interval chaining, and the
  * incremental-upsert ≡ full-rebuild contract (the etl_scd2 oracle covers
  * the historize shape at sf0.01; these pin the edges the synthetic events
  * table cannot produce — null attribute values, replays, version offsets
  * across an incremental fold). */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def obs(rows: (Long, Long, String, Long)*) =
    rows.toDF("k", "ts", "attr", "tie")

  test("historize collapses runs, chains intervals, numbers versions") {
    val h = Scd.historize(
      obs((1L, 10L, "a", 1L), (1L, 20L, "a", 2L), (1L, 30L, "b", 3L),
          (1L, 40L, "b", 4L), (1L, 50L, "a", 5L),
          (2L, 10L, "x", 6L)),
      "k", "ts", "attr", "tie")
      .orderBy("k", "version")
      .select("k", "attr", "valid_from", "valid_to", "version", "is_current")
      .collect()
    // key 1: a@[10,30) b@[30,50) a@[50,∞) — the repeat observations at
    // ts 20/40 must NOT open versions; key 2: one open run.
    assert(h.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)), r.getLong(4), r.getBoolean(5))).toSeq === Seq(
      (1L, "a", 10L, Some(30L), 1L, false),
      (1L, "b", 30L, Some(50L), 2L, false),
      (1L, "a", 50L, None, 3L, true),
      (2L, "x", 10L, None, 1L, true)))
  }

  test("historize treats NULL as a value: null runs collapse, transitions count") {
    val h = Scd.historize(
      obs((1L, 10L, null, 1L), (1L, 20L, null, 2L), (1L, 30L, "a", 3L),
          (1L, 40L, null, 4L)),
      "k", "ts", "attr", "tie")
      .orderBy("version").collect()
    assert(h.length === 3) // null-run, a, null-run — lag's frame-edge NULL
    assert(h.map(_.getLong(4)).toSeq === Seq(1L, 2L, 3L)) // not conflated
    assert(h.count(_.getBoolean(5)) === 1)
  }

  test("upsert(historize(first), second) == historize(first ∪ second)") {
    // deterministic pseudo-random stream: 8 keys, 40 observations, attr
    // cycles with enough repeats to exercise run collapsing across the split
    val all = (0 until 40).map { i =>
      val k = (i * 7 % 8).toLong
      (k, (i * 13 % 97).toLong * 10 + k, s"v${(i * i) % 3}", i.toLong)
    }
    val df = obs(all: _*)
    val split = 400L // some keys entirely before, some straddling
    val full = Scd.historize(df, "k", "ts", "attr", "tie")
    val inc = Scd.upsert(
      Scd.historize(df.where(col("ts") <= split), "k", "ts", "attr", "tie"),
      df.where(col("ts") > split), "k", "ts", "attr", "tie")
    val fullS = full.orderBy("k", "version")
      .select("k", "attr", "valid_from", "valid_to", "version", "is_current")
      .collect().toSeq
    val incS = inc.orderBy("k", "version")
      .select("k", "attr", "valid_from", "valid_to", "version", "is_current")
      .collect().toSeq
    assert(incS === fullS)
  }

  test("upsert leaves closed versions untouched and extends the open one") {
    val first = Scd.historize(
      obs((1L, 10L, "a", 1L), (1L, 20L, "b", 2L)), "k", "ts", "attr", "tie")
    val upserted = Scd.upsert(first,
      obs((1L, 30L, "b", 3L), (1L, 40L, "c", 4L)), "k", "ts", "attr", "tie")
      .orderBy("version").collect()
    assert(upserted.map(r => (r.getString(1), r.getLong(2), Option(r.get(3)),
        r.getLong(4), r.getBoolean(5))).toSeq === Seq(
      ("a", 10L, Some(20L), 1L, false),
      ("b", 20L, Some(40L), 2L, false), // re-observed b extends, no new version
      ("c", 40L, None, 3L, true)))
  }

  test("resolveAtTime: interval semantics via the asof carry, edges pinned") {
    // key 1: a@[10,30) b@[30,50) a@[50,∞); key 2: x@[10,∞);
    // key 3: same-instant double run — p@[10,10) is EMPTY, q@[10,∞) v2
    val dim = Scd.historize(
      obs((1L, 10L, "a", 1L), (1L, 30L, "b", 2L), (1L, 50L, "a", 3L),
          (2L, 10L, "x", 4L),
          (3L, 10L, "p", 5L), (3L, 10L, "q", 6L)),
      "k", "ts", "attr", "tie")
    val facts = Seq(
      (1L, 5L, 100L),  // before first version → NULL resolution
      (1L, 10L, 101L), // boundary: exactly at valid_from → that version
      (1L, 29L, 102L), // interior of a closed interval
      (1L, 30L, 103L), // boundary: previous valid_to excludes the instant
      (1L, 99L, 104L), // open (current) interval
      (2L, 10L, 105L),
      (3L, 10L, 106L)  // empty-interval run must lose to version 2
    ).toDF("k", "ts", "fid")
    val got = Scd.resolveAtTime(facts, dim, "k", "ts", "attr")
      .orderBy("fid")
      .select("k", "ts", "fid", "asof_attr", "asof_valid_from", "asof_version")
      .collect()
      .map(r => (r.getLong(2), Option(r.get(3)), Option(r.get(4)), Option(r.get(5))))
      .toSeq
    assert(got === Seq(
      (100L, None, None, None),
      (101L, Some("a"), Some(10L), Some(1L)),
      (102L, Some("a"), Some(10L), Some(1L)),
      (103L, Some("b"), Some(30L), Some(2L)),
      (104L, Some("a"), Some(50L), Some(3L)),
      (105L, Some("x"), Some(10L), Some(1L)),
      (106L, Some("q"), Some(10L), Some(2L))))
  }
}
