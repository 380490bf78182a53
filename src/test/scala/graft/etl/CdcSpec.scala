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
}
