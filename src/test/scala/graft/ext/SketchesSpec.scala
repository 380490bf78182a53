package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Sketches]] portable HLL: register table bit-identical to a naive JVM
  * model over the same md5 hash, registers merge by max (the sketch
  * property), and the fixed-point estimate lands within the theoretical
  * error bound on a known cardinality. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def naiveRegisters(keys: Seq[Long], salt: String = "hll"): Array[Int] = {
    val regs = Array.fill(Sketches.HllM)(0)
    val md = java.security.MessageDigest.getInstance("MD5")
    keys.foreach { k =>
      val hex = md.digest((k.toString + salt).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      val bucket = (h & 63L).toInt
      val rem = h >> 6
      val rho = if (rem == 0L) 55 else 55 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
      if (rho > regs(bucket)) regs(bucket) = rho
    }
    regs
  }

  private def sparkRegisters(keys: Seq[Long]): Array[Int] = {
    val out = Array.fill(Sketches.HllM)(0)
    Sketches.hllRegisters(keys.toDF("k"), col("k")).collect()
      .foreach(r => out(r.getLong(0).toInt) = r.getInt(1))
    out
  }

  test("register table matches the naive model") {
    val keys = (1L to 500L) ++ Seq(0L, -7L, Long.MaxValue, 123456789L)
    assert(sparkRegisters(keys) === naiveRegisters(keys))
  }

  test("duplicate keys do not move registers") {
    val once = sparkRegisters(Seq(1L, 2L, 3L))
    val dup = sparkRegisters(Seq(1L, 1L, 2L, 2L, 2L, 3L))
    assert(once === dup)
  }

  test("registers merge by max (union = element-wise max of partials)") {
    val a = (1L to 300L); val b = (200L to 600L)
    val merged = naiveRegisters(a).zip(naiveRegisters(b)).map(t => t._1 max t._2)
    assert(sparkRegisters((a ++ b).distinct) === merged)
  }

  test("histogram quantile brackets the exact quantile within one bucket") {
    val vals = (1 to 1000).map(i => ("g", (i * 7 % 997).toDouble))
    val df = vals.toDF("g", "v")
    val r = Sketches.histogramQuantiles(df, "g", "v", width = 10.0,
      nBuckets = 100, phis = Seq(("p50", 1, 2), ("p90", 9, 10))).collect()(0)
    val sorted = vals.map(_._2).sorted
    def exact(phi: Double) = sorted((phi * sorted.size).ceil.toInt - 1)
    val p50Hi = r.getAs[Double]("p50_hi")
    val p90Hi = r.getAs[Double]("p90_hi")
    assert(exact(0.5) <= p50Hi && exact(0.5) > p50Hi - 10.0 - 1e-9)
    assert(exact(0.9) <= p90Hi && exact(0.9) > p90Hi - 10.0 - 1e-9)
  }

  test("histogram quantile ceiling threshold is exact on boundaries") {
    // 4 values, p50 threshold = ceil(0.5·4) = 2 → the bucket holding the
    // 2nd smallest value, not the 3rd
    val df = Seq(("g", 5.0), ("g", 15.0), ("g", 25.0), ("g", 35.0)).toDF("g", "v")
    val r = Sketches.histogramQuantiles(df, "g", "v", width = 10.0,
      nBuckets = 10, phis = Seq(("p50", 1, 2))).collect()(0)
    assert(r.getAs[Int]("p50_bucket") === 1, r.toString) // bucket of 15.0
  }

  test("histograms merge by addition (sketch property)") {
    val a = (1 to 500).map(i => ("g", i.toDouble))
    val b = (501 to 1000).map(i => ("g", i.toDouble))
    val whole = Sketches.histogramQuantiles((a ++ b).toDF("g", "v"), "g", "v",
      100.0, 16, Seq(("p50", 1, 2))).collect()(0)
    // merged = counts of a + counts of b; p50 over the union must match
    // running the sketch over the concatenated data (addition is the merge)
    assert(whole.getAs[Int]("p50_bucket") === 5) // 500.0 lands in bucket 5
  }

  test("CMS estimates are never below the true count, exact sans collision") {
    val items = (Seq.fill(50)("a") ++ Seq.fill(20)("b") ++
      (1 to 300).map(i => s"t$i")).toDF("tok")
    val probes = Seq("a", "b", "t1").toDF("tok")
    // wBits=4 → 16 buckets for ~302 distinct: collisions guaranteed
    val got = Sketches.cmsEstimates(items, probes, d = 4, wBits = 4)
      .collect().map(r => r.getAs[String]("tok") -> r.getAs[Long]("cms_est")).toMap
    assert(got("a") >= 50 && got("b") >= 20 && got("t1") >= 1)
    // wide sketch: no collisions among 3 distinct keys
    val exact = Sketches.cmsEstimates(
      (Seq.fill(5)("x") ++ Seq.fill(3)("y") ++ Seq("z")).toDF("tok"),
      Seq("x", "y", "z").toDF("tok"), d = 4, wBits = 12)
      .collect().map(r => r.getAs[String]("tok") -> r.getAs[Long]("cms_est")).toMap
    assert(exact === Map("x" -> 5L, "y" -> 3L, "z" -> 1L))
  }

  test("CMS counters merge by addition (sum of halves = whole)") {
    val a = (1 to 200).map(i => s"k${i % 20}")
    val b = (1 to 100).map(i => s"k${i % 10}")
    val whole = Sketches.cmsEstimates((a ++ b).toDF("tok"),
      Seq("k1").toDF("tok"), d = 2, wBits = 10).collect()(0).getAs[Long]("cms_est")
    // k1: 10 in a, 10 in b — counters are sums, so the union sketch sees 20
    assert(whole === 20L)
  }

  test("cmsCountersBy tables union-and-sum to the whole-corpus table; " +
      "estimates off the merged table equal the fused path") {
    import org.apache.spark.sql.functions.{col, sum => fsum}
    val a = (1 to 200).map(i => s"k${i % 20}")
    val b = (1 to 100).map(i => s"k${i % 10}")
    val ta = Sketches.cmsCountersBy(a.toDF("tok"), Nil, col("tok"), d = 3, wBits = 6)
    val tb = Sketches.cmsCountersBy(b.toDF("tok"), Nil, col("tok"), d = 3, wBits = 6)
    val merged = ta.unionByName(tb).groupBy("j", "bucket")
      .agg(fsum("c").as("c"))
    val whole = Sketches.cmsCountersBy((a ++ b).toDF("tok"), Nil, col("tok"),
      d = 3, wBits = 6)
    val mm = merged.as[(Int, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val wm = whole.as[(Int, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(mm === wm)
    // reading estimates off the merged table equals cmsEstimates fused
    val probes = Seq("k1", "k7", "k19").toDF("tok")
    val offTable = Sketches.cmsEstimatesFromCounters(merged, probes, Nil,
        "tok", d = 3, wBits = 6)
      .collect().map(r => r.getAs[String]("tok") -> r.getAs[Long]("cms_est")).toMap
    val fused = Sketches.cmsEstimates((a ++ b).toDF("tok"), probes,
        d = 3, wBits = 6)
      .collect().map(r => r.getAs[String]("tok") -> r.getAs[Long]("cms_est")).toMap
    assert(offTable === fused)
  }

  test("grouped cmsEstimatesFromCounters equals per-group fused estimates") {
    import org.apache.spark.sql.functions.{col, lit}
    // two groups with overlapping keys — the hour-grouped q_cms_windowed
    // shape: estimates off ONE grouped counter table must equal running
    // the fused path per group in isolation
    val items = ((1 to 120).map(i => ("g1", s"k${i % 12}")) ++
      (1 to 90).map(i => ("g2", s"k${i % 8}"))).toDF("grp", "tok")
    val counters = Sketches.cmsCountersBy(items, Seq("grp"), col("tok"),
      d = 3, wBits = 6)
    val probes = Seq(("g1", "k1"), ("g1", "k11"), ("g2", "k1"), ("g2", "k7"))
      .toDF("grp", "tok")
    val got = Sketches.cmsEstimatesFromCounters(counters, probes,
        Seq("grp"), "tok", d = 3, wBits = 6)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[String]("tok")) ->
        r.getAs[Long]("cms_est")).toMap
    val want = Seq("g1", "g2").flatMap { g =>
      Sketches.cmsEstimates(items.where(col("grp") === g).select("tok"),
          probes.where(col("grp") === g).select("tok"), d = 3, wBits = 6)
        .collect().map(r => (g, r.getAs[String]("tok")) ->
          r.getAs[Long]("cms_est"))
    }.toMap
    assert(got === want)
    // and the group boundary is real: g1's k1 count differs from g2's
    assert(got(("g1", "k1")) !== got(("g2", "k1")))
    assert(got.forall(_._2 >= 1L)) // every probe was observed in its group
  }

  test("cmsEstimatesFromCounters matches NULL group keys (estimate >= " +
      "truth holds for null-group data)") {
    import org.apache.spark.sql.functions.col
    // cmsCountersBy's groupBy keeps NULL as its own group; the estimate
    // join must use null-safe equality or a null-group probe reads 0 —
    // an undercount, the one direction a CMS must never err in
    val items = ((1 to 40).map(_ => (Option.empty[String], "k1")) ++
      (1 to 25).map(_ => (Some("g1"), "k1"))).toDF("grp", "tok")
    val counters = Sketches.cmsCountersBy(items, Seq("grp"), col("tok"),
      d = 3, wBits = 8)
    val probes = Seq((Option.empty[String], "k1"), (Some("g1"), "k1"))
      .toDF("grp", "tok")
    val got = Sketches.cmsEstimatesFromCounters(counters, probes,
        Seq("grp"), "tok", d = 3, wBits = 8)
      .collect().map(r => Option(r.getAs[String]("grp")) ->
        r.getAs[Long]("cms_est")).toMap
    assert(got(None) >= 40L, s"null-group estimate ${got(None)} undercounts")
    assert(got(Some("g1")) >= 25L)
    // at this width there are no collisions across 1 distinct key: exact
    assert(got(None) === 40L && got(Some("g1")) === 25L)
  }

  test("linear counting kicks in below the threshold and is near-exact") {
    val n = 30 // well under 2.5·m = 160
    val regs = Sketches.hllRegisters((1L to n.toLong).toDF("k"), col("k"))
    val r = Sketches.hllEstimate(regs).collect()(0)
    val est = r.getAs[Long]("est")
    assert(r.getAs[Long]("est_raw") !== est, "correction should have applied")
    assert(math.abs(est - n) <= 6, s"linear counting too far: $est vs $n")
  }

  test("correction table is the rounded m·ln(m/V) law") {
    assert(Sketches.HllLinearCounting(64) === 0L)   // nothing observed
    assert(Sketches.HllLinearCounting(1) ===
      Math.round(64.0 * Math.log(64.0)))            // one empty register
  }

  test("estimate is within 3 standard errors of a known cardinality") {
    val n = 5000
    val regs = Sketches.hllRegisters((1L to n.toLong).toDF("k"), col("k"))
    val est = Sketches.hllEstimate(regs).collect()(0).getAs[Long]("est")
    val se = 1.04 / math.sqrt(Sketches.HllM) // ≈ 13%
    assert(math.abs(est - n).toDouble / n < 3 * se,
      s"estimate $est too far from $n")
  }

  test("hllUnionRegisters: merge ≡ sketch of the concatenation, exactly; idempotent") {
    val a = (1L to 800L).toDF("k")
    val b = (500L to 1200L).toDF("k")
    val ra = Sketches.hllRegisters(a, col("k"))
    val rb = Sketches.hllRegisters(b, col("k"))
    def regMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // the HLL law the set algebra rests on: register-max merge equals
    // sketching the unioned keys directly — EXACT, not approximate
    val merged = regMap(Sketches.hllUnionRegisters(Seq(ra, rb)))
    val direct = regMap(Sketches.hllRegisters(a.unionByName(b), col("k")))
    assert(merged === direct)
    // idempotent: A ∪ A = A
    assert(regMap(Sketches.hllUnionRegisters(Seq(ra, ra))) === regMap(ra))
  }

  test("exactKth: every rank of a known multiset, duplicates, wide range, nulls excluded") {
    // multiset with duplicates: sorted = [1,2,2,5,5,5,9]
    val m = Seq(5L, 2L, 9L, 5L, 1L, 2L, 5L).toDF("v")
    val sortedVals = Seq(1L, 2L, 2L, 5L, 5L, 5L, 9L)
    sortedVals.zipWithIndex.foreach { case (want, i) =>
      assert(Sketches.exactKth(m, "v", i + 1) === want, s"rank ${i + 1}")
    }
    // range wider than one 256-bucket round forces real refinement
    val wide = ((0L until 1000L).map(_ * 1000003L)).toDF("v")
    assert(Sketches.exactKth(wide, "v", 500) === 499L * 1000003L)
    assert(Sketches.exactKth(wide, "v", 1) === 0L)
    assert(Sketches.exactKth(wide, "v", 1000) === 999L * 1000003L)
    // nulls excluded; k beyond the non-null count is loud
    val withNulls = Seq(Some(3L), None, Some(1L)).toDF("v")
    assert(Sketches.exactKth(withNulls, "v", 2) === 3L)
    intercept[IllegalArgumentException](Sketches.exactKth(withNulls, "v", 3))
  }

  test("exactKthBy: per-group medians match per-group sorts; groups converge independently") {
    // groups with different sizes, ranges, and duplicate structure —
    // including one that needs multiple refinement rounds (wide range)
    // and one that is done after bounds (single value)
    val rows =
      (1L to 101L).map(i => ("a", (i * 9973L) % 100000L)) ++
      Seq(("b", 7L), ("b", 3L), ("b", 7L), ("b", 1L)) ++
      Seq(("c", 42L)) ++
      (1L to 50L).map(i => ("d", i * 1000003L))
    val df = rows.toDF("g", "v")
    val got = Sketches.exactKthBy(df, "g", "v", n => (n + 1) / 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = rows.groupBy(_._1).map { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      g -> (vs.size.toLong, sorted(((vs.size + 1) / 2 - 1).toInt))
    }
    assert(got === want, s"grouped medians diverge: $got vs $want")
    // null groups and null values are excluded, not crashed on
    val withNulls = Seq((Option("a"), Option(5L)), (Option.empty[String], Option(9L)),
      (Option("a"), Option.empty[Long])).toDF("g", "v")
    val g2 = Sketches.exactKthBy(withNulls, "g", "v", n => n)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(g2 === Map("a" -> 5L))
  }

  test("histogramDrift: zero on identical distributions, hand-checked terms on a planted shift") {
    val a = (0 until 100).map(i => (i % 10) * 10.0).toDF("value")
    // identical snapshots → every cross-term (a·B − b·A) is 0 → statistic 0
    val same = Sketches.histogramDrift(a, a, "value", width = 10.0, nBuckets = 10)
    assert(same.agg(sum(col("term_fp"))).head.getLong(0) === 0L)
    // all mass moves one bucket: old all-in-0, new all-in-1, A=B=4
    // → term(0) = (4·4 − 0)²·10^6 / (16·4) = 4·10^6, same for bucket 1
    val o = Seq(1.0, 2.0, 3.0, 4.0).toDF("value")
    val n = Seq(11.0, 12.0, 13.0, 14.0).toDF("value")
    val t = Sketches.histogramDrift(o, n, "value", width = 10.0, nBuckets = 10)
      .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap
    assert(t(0) === 4000000L && t(1) === 4000000L)
    assert((2 until 10).forall(t(_) === 0L))
    // nulls are EXCLUDED, not counted as bucket 0: a new snapshot that
    // went all-null must not read as drift toward zero
    val withNulls = Seq(Some(1.0), None, None, Some(2.0), Some(3.0), Some(4.0))
      .toDF("value")
    val t2 = Sketches.histogramDrift(o, withNulls, "value", 10.0, 10)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(t2(0) === ((4L, 4L)), s"null rows leaked into the histogram: $t2")
  }

  test("hllOverlap: inclusion-exclusion recovers a planted overlap within error") {
    val a = (1L to 1000L).toDF("k")
    val b = (501L to 1500L).toDF("k") // |A|=|B|=1000, |A∩B|=500, |A∪B|=1500
    val r = Sketches.hllOverlap(a, col("k"), b, col("k")).collect()(0)
    val estI = r.getAs[Number]("est_intersect").longValue()
    // inclusion-exclusion compounds the per-sketch error (~13% at m=64);
    // a generous 3x band still catches sign/denominator bugs
    assert(math.abs(estI - 500L) < 500,
      s"intersect estimate $estI implausible for true 500 ($r)")
    assert(r.getAs[Number]("est_union").longValue() >
      r.getAs[Number]("est_a").longValue(), s"union must exceed one side: $r")
  }

  test("heavyHitters equals the exact HAVING-count query on a skewed frame") {
    // zipf-ish: key k appears 200/k times for k=1..40, plus a long tail of
    // singletons — repartitioned so keys straddle partition boundaries
    val rows = (1L to 40L).flatMap(k => Seq.fill((200 / k).toInt)(k)) ++
      (1000L to 1400L)
    val df = rows.toDF("key").repartition(7)
    val want = df.groupBy("key").agg(count(lit(1)).as("n"))
      .where(col("n") >= 25).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(want.nonEmpty && want.size < 40, "fixture lost its skew")
    val got = Sketches.heavyHitters(df, "key", threshold = 25L, capacity = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want, "sketch-guided result must be EXACT")
  }

  test("heavyHitters rejects an unsound threshold/capacity pair loudly") {
    val df = (1L to 1000L).toDF("key")
    val e = intercept[IllegalArgumentException](
      Sketches.heavyHitters(df, "key", threshold = 10L, capacity = 8))
    assert(e.getMessage.contains("unsound"))
  }

  test("heavyHitters drops null keys and survives an all-null frame") {
    val df = Seq(Some(1L), Some(1L), None, None, None).toDF("key")
    val r = Sketches.heavyHitters(df, "key", threshold = 2L, capacity = 8)
      .collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSeq === Seq((1L, 2L)))
    val empty = Seq[Option[Long]](None, None).toDF("key")
    assert(Sketches.heavyHitters(empty, "key", 1L, 8).count() === 0)
  }
}
