package graft.etl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class LateDimSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDim = spark.createDataFrame(
    new java.util.ArrayList[org.apache.spark.sql.Row](),
    StructType(Seq(StructField("skey", LongType), StructField("k", LongType),
      StructField("name", StringType), StructField("is_inferred", BooleanType))))

  test("early facts infer members; enrichment fills in place, SKEYs stable") {
    val facts1 = Seq(10L, 20L, 10L, 30L).toDF("k")
    val dim1 = Dims.upsertInferred(emptyDim, facts1, "k", "skey")
    val rows1 = dim1.orderBy("k").collect()
    assert(rows1.map(_.getLong(1)).toSeq === Seq(10L, 20L, 30L))
    assert(rows1.forall(_.getBoolean(3)), "all members start inferred")
    assert(rows1.forall(_.isNullAt(2)), "inferred members carry no attributes")
    val skeysBefore = rows1.map(r => r.getLong(1) -> r.getLong(0)).toMap

    // the dimension source delivers names for 10 and 99 (99 unknown: ignored)
    val delta = Seq((10L, "ten"), (99L, "nn")).toDF("k", "name")
    val dim2 = Dims.enrich(dim1, delta, "k", Seq("name"))
    val rows2 = dim2.orderBy("k").collect()
    assert(rows2.map(r => r.getLong(1) -> r.getLong(0)).toMap === skeysBefore,
      "enrichment must never re-key")
    assert(rows2.map(_.getLong(1)).toSeq === Seq(10L, 20L, 30L),
      "update-only: the unknown delta member must not insert")
    val byK = rows2.map(r => r.getLong(1) ->
      (Option(r.getString(2)), r.getBoolean(3))).toMap
    assert(byK(10L) === ((Some("ten"), false)))
    assert(byK(20L) === ((None, true)) && byK(30L) === ((None, true)))

    // a second fact batch after the delivery: new member arrives inferred,
    // existing members (incl. the enriched one) untouched
    val dim3 = Dims.upsertInferred(dim2, Seq(10L, 40L).toDF("k"), "k", "skey")
    val rows3 = dim3.orderBy("k").collect()
    assert(rows3.map(_.getLong(1)).toSeq === Seq(10L, 20L, 30L, 40L))
    assert(rows3.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L),
      "new members key past the existing max")
    assert(rows3.last.getBoolean(3) && rows3.last.isNullAt(2))
    assert(!rows3.head.getBoolean(3) && rows3.head.getString(2) === "ten")
  }

  test("re-delivery is idempotent; enriched rows keep their first attributes") {
    val dim1 = Dims.upsertInferred(emptyDim, Seq(1L, 2L).toDF("k"), "k", "skey")
    val d1 = Seq((1L, "first")).toDF("k", "name")
    val dim2 = Dims.enrich(dim1, d1, "k", Seq("name"))
    // a conflicting re-delivery must not overwrite the adopted attributes
    val d2 = Seq((1L, "second"), (2L, "two")).toDF("k", "name")
    val dim3 = Dims.enrich(dim2, d2, "k", Seq("name"))
    val byK = dim3.collect().map(r => r.getLong(1) ->
      (r.getString(2), r.getBoolean(3))).toMap
    assert(byK(1L) === (("first", false)), "first delivery wins")
    assert(byK(2L) === (("two", false)))
  }

  test("a delta delivering the same member twice is refused, not multiplied") {
    val dim1 = Dims.upsertInferred(emptyDim, Seq(1L).toDF("k"), "k", "skey")
    val dup = Seq((1L, "x"), (1L, "y")).toDF("k", "name")
    val e = intercept[IllegalArgumentException](
      Dims.enrich(dim1, dup, "k", Seq("name")).collect())
    assert(e.getMessage.contains("duplicate"))
    // a null natural key is harmless to the join and must NOT read as a
    // phantom duplicate (count(*) vs count_distinct would)
    val withNull = Seq((Some(1L), "one"), (None, "junk")).toDF("k", "name")
    val ok = Dims.enrich(dim1, withNull, "k", Seq("name"))
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(ok === Map(1L -> "one"))
  }

  test("upsertInferred without the is_inferred contract fails loudly") {
    val bare = Seq((1L, 1L)).toDF("skey", "k")
    val e = intercept[IllegalArgumentException](
      Dims.upsertInferred(bare, Seq(2L).toDF("k"), "k", "skey"))
    assert(e.getMessage.contains("is_inferred"))
  }
}
