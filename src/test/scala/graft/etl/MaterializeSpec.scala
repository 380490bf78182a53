package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.etl.Materialize.AggSpec

class MaterializeSpec extends SparkSpec {
  import spark.implicits._

  private val aggs = Seq(AggSpec("count", "v", "n"), AggSpec("sum", "v", "s"),
    AggSpec("min", "v", "mn"), AggSpec("max", "v", "mx"))

  private def fullRecompute(rows: Seq[(String, Long)]) =
    rows.toDF("k", "v").groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"),
        min("v").as("mn"), max("v").as("mx"))
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("incremental fold equals full recompute, any batch split") {
    val all = Seq(("a", 5L), ("a", -3L), ("b", 7L), ("a", 9L), ("b", 1L),
      ("c", 0L), ("c", 4L))
    val want = fullRecompute(all)
    // three different splits, including a singleton late batch and a split
    // that scatters one key across every batch
    val splits = Seq(
      Seq(all.take(3), all.slice(3, 5), all.drop(5)),
      Seq(all.take(1), all.slice(1, 6), all.drop(6)),
      Seq(all.filter(_._1 == "a"), all.filter(_._1 == "b"),
        all.filter(_._1 == "c")))
    for (batches <- splits) {
      val got = batches.tail
        .foldLeft(Materialize.partial(batches.head.toDF("k", "v"), Seq("k"), aggs)) {
          (acc, b) =>
            Materialize.merge(acc, Materialize.partial(b.toDF("k", "v"), Seq("k"), aggs),
              Seq("k"), aggs)
        }
        .collect().map(r => (r.getString(0),
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(got === want, s"split $batches diverged from full recompute")
    }
  }

  test("empty batch is a no-op; new key passes through a merge") {
    val base = Materialize.partial(Seq(("a", 2L)).toDF("k", "v"), Seq("k"), aggs)
    val empty = Materialize.partial(
      Seq(("x", 1L)).toDF("k", "v").where(lit(false)), Seq("k"), aggs)
    val afterEmpty = Materialize.merge(base, empty, Seq("k"), aggs).collect()
    assert(afterEmpty.length === 1 && afterEmpty(0).getLong(1) === 1L)
    val fresh = Materialize.partial(Seq(("b", 5L)).toDF("k", "v"), Seq("k"), aggs)
    val merged = Materialize.merge(base, fresh, Seq("k"), aggs)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(merged === Map("a" -> 2L, "b" -> 5L))
  }

  test("non-mergeable aggregate is rejected loudly") {
    val e = intercept[IllegalArgumentException](AggSpec("median", "v", "m"))
    assert(e.getMessage.contains("mergeable"))
  }

  test("streaming foreachBatch maintenance equals the batch recompute") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    // each micro-batch contributes ONE partial; snapshot partial rows per
    // batch (batch frames are only valid inside foreachBatch)
    val partials = scala.collection.mutable.ArrayBuffer.empty[Seq[
      (String, Long, Long, Long, Long)]]
    val q = in.toDF().toDF("k", "v").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        partials += Materialize.partial(b, Seq("k"), aggs).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSeq
        (): Unit
      }
      .start()
    val allRows = Seq(("a", 5L), ("b", 2L), ("a", -1L), ("c", 7L), ("a", 3L))
    in.addData(allRows.take(2): _*); q.processAllAvailable()
    in.addData(allRows.slice(2, 4): _*); q.processAllAvailable()
    in.addData(allRows.drop(4): _*); q.processAllAvailable()
    q.stop()
    assert(partials.length === 3, "one partial per micro-batch")
    val summary = partials.map(p =>
        p.toDF("k", "n", "s", "mn", "mx"))
      .reduce((acc, p) => Materialize.merge(acc, p, Seq("k"), aggs))
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(summary === fullRecompute(allRows),
      "streamed fold diverged from the batch recompute")
  }
}
