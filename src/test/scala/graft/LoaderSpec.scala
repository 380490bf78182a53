package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The r8 incident, pinned as a spec: the driver regenerates the testdata
  * between rounds and events.parquet's physical `ts` type has already
  * flipped once (TIMESTAMP(NANOS) → TIMESTAMP_MICROS). `Queries.table`
  * must adapt to whichever fixture generation it meets — with
  * `nanosAsLong` active, a NANOS file reads back as LongType (ns since
  * epoch) and needs the div-1000 rewrite; a MICROS file reads back as a
  * timestamp and must pass through untouched. */
class LoaderSpec extends SparkSpec {

  // one wall-clock instant, expressed both ways
  private val epochMicros = 1704067200000001L // 2024-01-01T00:00:00.000001Z

  test("events loader adapts to a NANOS-era fixture (ts read back as long)") {
    import spark.implicits._
    val dir = tmpDir("loader-nanos")
    // Spark cannot WRITE TIMESTAMP(NANOS) parquet; what the loader actually
    // sees on such a file (with nanosAsLong set) is a LongType column of
    // ns-since-epoch — write exactly that shape.
    Seq((1L, epochMicros * 1000L + 999L, "purchase"))
      .toDF("event_id", "ts", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Queries.table(spark, dir, "events")
    assert(df.schema("ts").dataType === TimestampType)
    // integer div truncates the sub-micro tail, never rounds up
    assert(df.select(unix_micros(col("ts"))).as[Long].head() === epochMicros)
  }

  test("events loader passes a MICROS-era fixture through untouched") {
    import spark.implicits._
    val dir = tmpDir("loader-micros")
    Seq((1L, java.time.LocalDateTime.ofEpochSecond(
        epochMicros / 1000000L, ((epochMicros % 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC), "purchase"))
      .toDF("event_id", "ts", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Queries.table(spark, dir, "events")
    assert(df.schema("ts").dataType === TimestampNTZType)
    assert(df.select(Queries.epochMicrosOf(df, "ts")).as[Long].head()
      === epochMicros)
  }

  test("loader normalizes integer-width drift to the canonical types") {
    import spark.implicits._
    val dir = tmpDir("loader-width")
    // a regenerated fixture that narrowed doc_id/n_chars to int32
    Seq((7, "some text", "en", "src0", 9))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val df = Queries.table(spark, dir, "documents")
    assert(df.schema("doc_id").dataType === LongType)
    assert(df.schema("n_chars").dataType === LongType)
    assert(df.select("doc_id").as[Long].head() === 7L)
    // a matching fixture passes through with no cast in the plan
    val real = Queries.table(spark, "/root/testdata/sf0.001", "documents")
    assert(!real.queryExecution.optimizedPlan.toString.toLowerCase
      .contains("cast(doc_id"), "same-type normalization must be a no-op")
  }

  test("epochMicrosOf is identical across both fixture generations") {
    import spark.implicits._
    // LTZ path (what the nanos rewrite produces)
    val ltz = Seq(1L).toDF("id")
      .select(timestamp_micros(lit(epochMicros)).as("ts"))
    // NTZ path (what a micros file reads back as)
    val ntz = ltz.select(col("ts").cast(TimestampNTZType).as("ts"))
    assert(ltz.select(Queries.epochMicrosOf(ltz, "ts")).as[Long].head()
      === ntz.select(Queries.epochMicrosOf(ntz, "ts")).as[Long].head())
  }

  test("epochMicrosOf on NTZ is invariant under the session time zone") {
    import spark.implicits._
    val ntz = Seq(1L).toDF("id")
      .select(timestamp_micros(lit(epochMicros)).cast(TimestampNTZType).as("ts"))
    val before = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val shifted = ntz.select(Queries.epochMicrosOf(ntz, "ts")).as[Long].head()
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      val utc = ntz.select(Queries.epochMicrosOf(ntz, "ts")).as[Long].head()
      // the NTZ wall clock was produced under UTC, so both must read the
      // original micros — a session-tz-dependent implicit NTZ→LTZ cast
      // (the pre-r10 to_utc_timestamp form) shifts the first by -5/-4 h
      assert(shifted === epochMicros && utc === epochMicros)
    } finally spark.conf.set("spark.sql.session.timeZone", before)
  }

  // ───────────────────────── full-drift soak (r10) ──────────────────────
  // The r8 incident generalized: regenerate EVERY canonical table with
  // narrowed integer widths (bigint→int32 where values fit) plus a
  // NANOS-era events.ts in one temp dir, and assert the whole catalog's
  // table reads come back at the canonical types — so the next driver
  // regen of ANY table (not just events) is provably absorbed.
  test("every canonical table read absorbs a narrowed-int + NANOS-ts regen") {
    val dir = tmpDir("loader-drift-all")
    val src = "/root/testdata/sf0.001"
    Queries.canonicalCols.keys.foreach { name =>
      val real = spark.read.parquet(s"$src/$name.parquet")
      val drifted = real.schema.fields.foldLeft(real.toDF()) { (df, f) =>
        (name, f.name, f.dataType) match {
          case ("events", "ts", _) => // NANOS-era file reads back as long ns
            df.withColumn("ts",
              (Queries.epochMicrosOf(df, "ts") * 1000L).cast(LongType))
          case (_, c, LongType) => df.withColumn(c, col(c).cast(IntegerType))
          case _ => df
        }
      }
      drifted.write.mode("overwrite").parquet(s"$dir/$name.parquet")
      val back = Queries.table(spark, dir, name)
      Queries.canonicalCols(name).foreach { case (c, typ) =>
        assert(back.schema(c).dataType.simpleString === typ,
          s"$name.$c did not normalize back to $typ after drift")
      }
      if (name == "events")
        assert(back.schema("ts").dataType === TimestampType,
          "drifted NANOS events.ts must read back as a timestamp")
    }
  }
}
