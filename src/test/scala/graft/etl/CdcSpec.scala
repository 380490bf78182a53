package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)).toDF("k", "name", "v")

  private def apply(changes: org.apache.spark.sql.DataFrame) =
    Cdc.applyChangelog(base, changes, Seq("k"), "seq", "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("latest-wins upsert, delete, insert, and untouched pass-through") {
    val changes = Seq(
      // key 2: two updates — only seq 7 survives
      (2L, 5L, "U", "b5", 25L), (2L, 7L, "U", "b7", 27L),
      // key 3: deleted
      (3L, 1L, "D", "x", 0L),
      // key 4: fresh insert
      (4L, 2L, "I", "d", 40L),
      // key 9: delete for an absent key is a no-op
      (9L, 3L, "D", "x", 0L)
    ).toDF("k", "seq", "op", "name", "v")
    assert(apply(changes) === Set(
      (1L, "a", 10L), (2L, "b7", 27L), (4L, "d", 40L)))
  }

  test("op order within a key is decided by seq, not op kind") {
    // delete then a LATER update: the key survives with the update
    val resurrect = Seq((2L, 1L, "D", "x", 0L), (2L, 2L, "U", "b2", 22L))
      .toDF("k", "seq", "op", "name", "v")
    assert(apply(resurrect) === Set(
      (1L, "a", 10L), (2L, "b2", 22L), (3L, "c", 30L)))
    // update then a LATER delete: the key is gone
    val gone = Seq((2L, 1L, "U", "b1", 21L), (2L, 2L, "D", "x", 0L))
      .toDF("k", "seq", "op", "name", "v")
    assert(apply(gone) === Set((1L, "a", 10L), (3L, "c", 30L)))
  }

  test("an insert on an existing key upserts (at-least-once tolerance)") {
    val ch = Seq((1L, 1L, "I", "a_redelivered", 11L))
      .toDF("k", "seq", "op", "name", "v")
    assert(apply(ch) === Set(
      (1L, "a_redelivered", 11L), (2L, "b", 20L), (3L, "c", 30L)))
  }

  test("empty changelog returns base unchanged") {
    val empty = Seq.empty[(Long, Long, String, String, Long)]
      .toDF("k", "seq", "op", "name", "v")
    assert(apply(empty) === Set(
      (1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
  }

  test("schema mismatches are rejected") {
    val bad = Seq((1L, 1L, "U")).toDF("k", "seq", "op") // missing payload
    intercept[IllegalArgumentException] {
      Cdc.applyChangelog(base, bad, Seq("k"), "seq", "op")
    }
    intercept[IllegalArgumentException] {
      Cdc.applyChangelog(base, base, Seq.empty, "seq", "op")
    }
  }

  test("the base side anti-joins against a broadcast of the changed keys") {
    val changes = Seq((2L, 1L, "U", "b1", 21L))
      .toDF("k", "seq", "op", "name", "v")
    val plan = Cdc.applyChangelog(base, changes, Seq("k"), "seq", "op")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"base must never shuffle for the anti-join:\n$plan")
  }

  test("snapshotDiff: all four statuses; null transitions count as changed") {
    val old = Seq((1L, Option("a"), 10L), (2L, Option.empty[String], 20L),
      (3L, Option("c"), 30L), (4L, Option("d"), 40L)).toDF("k", "name", "v")
    val nu = Seq(
      (2L, Option("b"), 20L),          // null → "b": changed, not a join miss
      (3L, Option("c"), 30L),          // unchanged
      (4L, Option.empty[String], 40L), // "d" → null: changed
      (5L, Option("e"), 50L)           // added; k=1 removed
    ).toDF("k", "name", "v")
    val got = Audit.snapshotDiff(old, nu, Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map(
      "added" -> 1L, "removed" -> 1L, "changed" -> 2L, "unchanged" -> 1L))
  }

  test("snapshotDiff reconciles two readVersion snapshots (time-travel consumer)") {
    // append-only star publish: version N vs N+1 diffs as added+unchanged,
    // never changed/removed — and the surviving dim SKEYs must be stable
    val store = StarStore(spark, tmpDir("graft-star-diff"),
      autoCompactAfter = Int.MaxValue, retainVersions = 3)
    def raw(i: Int) = Seq(
      (f"2017-01-11T00:0$i%d:00.000Z", s"news| Video $i", "206")
    ).toDF("DateTime", "VideoTitle", "events")
    (1 to 2).foreach(i => assert(store.runBatch(raw(i), s"d$i") === 1))
    val diff = Audit.snapshotDiff(
      store.readVersion("dim_title", 1), store.readVersion("dim_title", 2),
      Seq("TITLE"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(diff === Map("added" -> 1L, "unchanged" -> 1L))
  }
}
