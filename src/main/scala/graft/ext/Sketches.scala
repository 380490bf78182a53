package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PORTABLE integer HyperLogLog (Flajolet et al. 2007) — the oracle-gated
  * sibling of the engine-specific `hll_sketch_agg` row: every piece is an
  * exact integer (or an exact power-of-two double), so two engines produce
  * the SAME register table and the SAME fixed-point estimate, bit for bit.
  *
  * Hash: the first 15 hex chars of md5(key || salt) — a 60-bit positive
  * integer. Low 6 bits pick one of m=64 registers; the remaining 54 bits
  * feed rho = position of the leftmost 1-bit (= 55 − bitlength, 55 for an
  * all-zero remainder), computed via `bin()` string length, identical on
  * both engines. The register table is a bucket-keyed MAX — the mergeable
  * sketch shape: partials combine map-side, the shuffle carries ≤ m rows
  * per partition, and unioning two corpora is just max-merging registers.
  *
  * Estimate: alpha_64·m²/Σ2^−M_j restated in integers — the denominator is
  * scaled by 2^55 (every term 2^(55−M) an exact BIGINT, Σ ≤ 64·2^55),
  * and the division is integral: est = (709·4096·2^55) div (1000·D), the
  * 24-digit numerator carried as DECIMAL(38,0)/HUGEINT. No float rounding
  * anywhere ⇒ no order dependence ⇒ restatable. */
object Sketches {

  val HllM = 64
  /** 709·4096·2^55 — alpha_64·m²·2^55 with alpha_64 = 0.709 as 709/1000. */
  val HllEstNumerator = "104629932386080576765952"

  /** Linear-counting small-range correction m·ln(m/V) for V empty
    * registers, PRE-ROUNDED here and embedded as the same literal table on
    * both engine sides — the one place HLL needs a logarithm, made portable
    * by having only 64 possible inputs. Index V (1..64); index 0 unused. */
  val HllLinearCounting: IndexedSeq[Long] =
    0L +: (1 to HllM).map(v =>
      Math.round(HllM.toDouble * Math.log(HllM.toDouble / v)))

  /** The raw estimate switches to linear counting at or below this (the
    * standard 2.5·m threshold) when any register is empty. */
  val HllLcThreshold = 160L

  /** Corrected estimate from (raw est, buckets_hit) — the Column form
    * shared by the grouped and global paths. */
  private def hllCorrected(raw: Column, hit: Column): Column = {
    val lc = array(HllLinearCounting.map(lit): _*)
    when(raw <= HllLcThreshold && hit < HllM,
      element_at(lc, (lit(HllM) - hit + 1).cast("int")))
      .otherwise(raw)
  }

  /** The correction restated for the DuckDB oracle: same literal table,
    * same threshold. `raw`/`hit` are SQL expressions. */
  def hllCorrectedSql(raw: String, hit: String): String = {
    val lcList = HllLinearCounting.mkString("[", ", ", "]")
    s"(CASE WHEN $raw <= $HllLcThreshold AND $hit < $HllM " +
      s"THEN $lcList[$HllM - $hit + 1] ELSE $raw END)::BIGINT"
  }

  /** 60-bit md5 hash of the key (15 hex chars → positive BIGINT). */
  private def hash60(key: Column, salt: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 15), 16, 10)
      .cast("long")

  /** Register index for a key: the hash's low 6 bits. */
  def hllBucket(key: Column, salt: String = "hll"): Column =
    hash60(key, salt).bitwiseAND(lit(63L))

  /** rho for a key: leftmost-1-bit position of the upper 54 hash bits
    * (55 − bitlength via `bin()`, 55 for an all-zero remainder). */
  def hllRho(key: Column, salt: String = "hll"): Column = {
    val rem = shiftright(hash60(key, salt), 6)
    when(rem === 0, lit(55)).otherwise(lit(55) - length(bin(rem)))
  }

  /** The m=64 register table: (bucket, register), every bucket present
    * (empty registers 0). One scan + one 64-group max aggregation. */
  def hllRegisters(df: DataFrame, key: Column,
                   salt: String = "hll"): DataFrame = {
    val spark = df.sparkSession
    val regs = df
      .select(hllBucket(key, salt).as("bucket"), hllRho(key, salt).as("rho"))
      .groupBy("bucket").agg(max(col("rho")).as("register"))
    spark.range(0, HllM).select(col("id").as("bucket"))
      .join(regs, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("register"), lit(0)).as("register"))
  }

  /** Per-group estimates WITHOUT a bucket spine: only observed buckets are
    * aggregated; each of the (64 − hit) empty registers contributes
    * exactly 2^55 to the denominator, added in closed form. One
    * (group, bucket)-keyed max + one group-keyed sum — nothing widens to
    * 64 rows per group, so this is the shape for MANY groups (e.g. one
    * sketch per hour × source at 100 TB). */
  def hllEstimateBy(df: DataFrame, groupCols: Seq[String], key: Column,
                    salt: String = "hll"): DataFrame = {
    val gs = groupCols.map(col)
    val regs = df
      .select(gs :+ hllBucket(key, salt).as("bucket")
        :+ hllRho(key, salt).as("rho"): _*)
      .groupBy(gs :+ col("bucket"): _*)
      .agg(max(col("rho")).as("register"))
    hllEstimateFromRegisters(regs, groupCols)
  }

  /** Estimates from an OBSERVED-bucKET register table (bucket, register,
    * group cols) — the consumption half of [[hllEstimateBy]], split out so
    * MERGED register tables (sliding windows, unions of corpora) estimate
    * without touching raw keys again. */
  def hllEstimateFromRegisters(regs: DataFrame,
                               groupCols: Seq[String]): DataFrame = {
    val gs = groupCols.map(col)
    regs
      // a SPINED register table (e.g. hllRegisters output) carries
      // register=0 rows for never-hit buckets; counting those as
      // buckets_hit would suppress the linear-counting small-range
      // correction, and their 2^55 term is already added in closed form
      // below — so zero registers are dropped here, making observed-only
      // and spined inputs estimate identically
      .where(col("register") > 0)
      .groupBy(gs: _*)
      .agg(count(lit(1)).as("buckets_hit"),
        sum(pow(lit(2.0), lit(55) - col("register")).cast("long")).as("d_obs"))
      .select(gs ++ Seq(
        col("buckets_hit"),
        (col("d_obs") +
          (lit(HllM.toLong) - col("buckets_hit")) * lit(1L << 55))
          .as("d_denom")): _*)
      .withColumn("est_raw",
        expr(s"CAST('$HllEstNumerator' AS DECIMAL(38,0)) div " +
          "(CAST(1000 AS DECIMAL(10,0)) * d_denom)"))
      .withColumn("est", hllCorrected(col("est_raw"), col("buckets_hit")))
  }

  /** (d_denom, buckets_hit, est_raw, est) from a register table: D =
    * Σ 2^(55−M_j) exactly (the powers are exact doubles cast back to
    * BIGINT before summing), raw est via integral division of the decimal
    * numerator, then the literal-table linear-counting correction. */
  def hllEstimate(registers: DataFrame): DataFrame =
    registers
      .agg(sum(pow(lit(2.0), lit(55) - col("register")).cast("long"))
          .as("d_denom"),
        sum(when(col("register") > 0, 1L).otherwise(0L)).as("buckets_hit"))
      .select(col("d_denom"), col("buckets_hit"),
        expr(s"CAST('$HllEstNumerator' AS DECIMAL(38,0)) div " +
          "(CAST(1000 AS DECIMAL(10,0)) * d_denom)").as("est_raw"))
      .withColumn("est", hllCorrected(col("est_raw"), col("buckets_hit")))

  /** Register-table UNION — HLL's defining mergeability (max per bucket):
    * sketches built independently per source / shard / day union without
    * ever touching raw keys again, which is exactly why HLL is THE
    * distinct counter at 100 TB (the union of two 64-row register tables
    * is a 64-row aggregation, not a re-scan of either input). Spined
    * inputs ([[hllRegisters]]) stay spined; observed-only tables mix in
    * freely (max with an absent bucket ≡ max with 0). */
  def hllUnionRegisters(tables: Seq[DataFrame],
                        groupCols: Seq[String] = Nil): DataFrame = {
    require(tables.nonEmpty, "hllUnionRegisters: no register tables")
    tables.reduce(_.unionByName(_))
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("register")).as("register"))
  }

  /** Inclusion–exclusion OVERLAP estimate between two key sets — the
    * cross-source / cross-snapshot contamination question ("how many users
    * appear in BOTH halves?") answered without any exact distinct: sketch
    * each side, union via register max (the native HLL set operation),
    * est∩ = estA + estB − est∪, clamped at 0 because sketch error can
    * drive a small true overlap negative. Every arithmetic step is the
    * portable integer estimator, so the whole set-algebra chain restates
    * exactly in an external engine. Returns one row:
    * (est_a, est_b, est_union, est_intersect). */
  def hllOverlap(a: DataFrame, aKey: Column, b: DataFrame, bKey: Column,
                 salt: String = "hll"): DataFrame = {
    val ra = hllRegisters(a, aKey, salt)
    val rb = hllRegisters(b, bKey, salt)
    val ru = hllUnionRegisters(Seq(ra, rb))
    val ea = hllEstimate(ra).select(col("est").as("est_a"))
    val eb = hllEstimate(rb).select(col("est").as("est_b"))
    val eu = hllEstimate(ru).select(col("est").as("est_union"))
    ea.crossJoin(eb).crossJoin(eu)
      .select(col("est_a"), col("est_b"), col("est_union"),
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L))
          .as("est_intersect"))
  }

  /** PORTABLE Count-Min Sketch (Cormode & Muthukrishnan 2005) — frequency
    * estimation completing the sketch triad (distinct/quantile/frequency).
    * d rows × 2^wBits counters; row j's hash is the md5-60-bit under salt
    * "cms<j>", masked to wBits. Counters are SUMS — order-independent,
    * mergeable by addition, map-side-combining into ≤ d·w cells — so the
    * whole structure restates exactly. A point estimate is the MIN over
    * the d counters and always ≥ the true count (spec-pinned).
    *
    * `items`: one row per occurrence, column `tok`. `probes`: the keys to
    * estimate, column `tok`. Returns probes ⨝ (cms_est). Counter frames
    * are ≤ 2^wBits rows and broadcast to the probe join. */
  def cmsEstimates(items: DataFrame, probes: DataFrame,
                   d: Int = 4, wBits: Int = 8): DataFrame = {
    require(d >= 1 && wBits >= 1 && wBits <= 20)
    val mask = (1L << wBits) - 1
    val withEsts = (0 until d).foldLeft(probes) { (acc, j) =>
      val counters = items
        .groupBy(hllBucketW(col("tok"), s"cms$j", mask).as(s"b$j"))
        .agg(count(lit(1)).as(s"c$j"))
      acc.join(broadcast(counters),
          hllBucketW(acc("tok"), s"cms$j", mask) === counters(s"b$j"), "left")
        .drop(s"b$j")
    }
    withEsts.withColumn("cms_est",
      least((0 until d).map(j => coalesce(col(s"c$j"), lit(0L))): _*))
      .drop((0 until d).map(j => s"c$j"): _*)
  }

  /** Masked hash for CMS rows (exposed for the oracle restatement). */
  private def hllBucketW(key: Column, salt: String, mask: Long): Column =
    hash60(key, salt).bitwiseAND(lit(mask))

  /** The d CMS row-buckets of one key as an array (index j = row j's
    * bucket under salt "cms<j>") — the projection [[cmsCountersBy]] and
    * the streaming twin explode before counting. */
  def cmsBucketArray(key: Column, d: Int = 4, wBits: Int = 8): Column = {
    require(d >= 1 && wBits >= 1 && wBits <= 20)
    val mask = (1L << wBits) - 1
    array((0 until d).map(j => hllBucketW(key, s"cms$j", mask)): _*)
  }

  /** CMS counter TABLE per group — the sketch AS DATA (the frame a
    * deployment materializes per source/day and merges by addition later),
    * and the exact batch twin of the streaming accumulation
    * ([[graft.streaming.EventTimeOps.streamingCmsCounters]], spec-pinned
    * equal): one row per (group, row j, bucket) with the occurrence SUM.
    * ≤ |groups|·d·2^wBits rows; one bucket-keyed aggregation with
    * map-side partials — the d per-row hashes ride one generator. */
  def cmsCountersBy(df: DataFrame, groupCols: Seq[String], key: Column,
                    d: Int = 4, wBits: Int = 8): DataFrame =
    df.select(groupCols.map(col) :+
        posexplode(cmsBucketArray(key, d, wBits)).as(Seq("j", "bucket")): _*)
      .groupBy((groupCols :+ "j" :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("c"))

  /** Point estimates off a materialized counter table ([[cmsCountersBy]]
    * shape, possibly unioned-and-summed across shards): for each probe row
    * (carrying `groupCols` + `keyCol`), the MIN over the d row-counters of
    * its group — absent (group, j, bucket) cells read 0 (never observed).
    * Counter frames are ≤ |groups|·d·2^wBits rows and broadcast. */
  def cmsEstimatesFromCounters(counters: DataFrame, probes: DataFrame,
                               groupCols: Seq[String], keyCol: String,
                               d: Int = 4, wBits: Int = 8): DataFrame = {
    require(d >= 1 && wBits >= 1 && wBits <= 20)
    val mask = (1L << wBits) - 1
    val withEsts = (0 until d).foldLeft(probes) { (acc, j) =>
      val cj = counters.where(col("j") === j).select(
        groupCols.map(c => col(c).as(s"_g${j}_$c")) :+
          col("bucket").as(s"_b$j") :+ col("c").as(s"c$j"): _*)
      // null-safe group equality: cmsCountersBy's groupBy keeps NULL group
      // values as their own group, so a probe with a NULL group must match
      // that group's counters (plain === would read 0 — an undercount,
      // breaking the estimate ≥ truth law)
      val cond = groupCols
        .map(c => acc(c) <=> cj(s"_g${j}_$c"))
        .foldLeft(hllBucketW(acc(keyCol), s"cms$j", mask) === cj(s"_b$j"))(_ && _)
      acc.join(broadcast(cj), cond, "left")
        .drop((groupCols.map(c => s"_g${j}_$c") :+ s"_b$j"): _*)
    }
    withEsts.withColumn("cms_est",
        least((0 until d).map(j => coalesce(col(s"c$j"), lit(0L))): _*))
      .drop((0 until d).map(j => s"c$j"): _*)
  }

  /** PORTABLE quantile sketch — the oracle-gated sibling of the
    * engine-specific `percentile_approx` row: an equi-width integer-count
    * histogram (the q_histogram bucketing law, proven cross-engine) whose
    * φ-quantile is the smallest bucket with cumulative count ≥ ⌈φ·N⌉, the
    * threshold an exact integral `(N·num + den−1) div den`. Error is
    * bounded by the bucket width; the structure is MERGEABLE (histograms
    * add) and the heavy work is one (group,bucket)-keyed count with
    * map-side partials — the cumulative window runs on the ≤
    * |groups|·nBuckets aggregated frame, never on rows.
    *
    * `phis` = (name, num, den) with 0 < num ≤ den; per group emits `n`
    * plus, per φ, `<name>_bucket` and its value upper bound `<name>_hi`
    * = (bucket+1)·width. */
  /** Distribution DRIFT between two snapshots of a numeric column — the
    * training-data monitoring question ("did the feature distribution move
    * between yesterday's corpus and today's?") as a two-sample chi-square
    * distance over equi-width histogram buckets, in EXACT integer/decimal
    * arithmetic: a PSI needs ln (IEEE ln is not engine-portable), while
    * the chi-square statistic is a pure rational function of the counts.
    * Per bucket with counts a (old) / b (new) and side totals A / B, the
    * fixed-point term is (a·B − b·A)² · 10^6 div (A·B·(a+b)) — truncating
    * integer division on DECIMAL(38,0) (HUGEINT in an external engine), so
    * the per-bucket table AND the summed statistic restate exactly.
    * Empty buckets (a+b = 0) contribute 0. Exact while side totals stay
    * ≤ ~10^8 ((A·B)²·10^6 must fit 38 digits); pre-scale counts beyond.
    *
    * Scale shape: one bucket-keyed aggregation per side (map-side
    * partials), a spine join over nBuckets rows, 1-row totals crossed in —
    * past the two histogram scans nothing grows with the data.
    * Returns (bucket, n_old, n_new, term_fp), nBuckets rows. */
  def histogramDrift(oldDf: DataFrame, newDf: DataFrame, valueCol: String,
                     width: Double, nBuckets: Int): DataFrame = {
    require(width > 0 && nBuckets > 0, s"bad histogram: $width x $nBuckets")
    val spark = oldDf.sparkSession
    def counts(df: DataFrame, out: String) = {
      val bucket = least(greatest(floor(col(valueCol) / width), lit(0)),
        lit(nBuckets - 1)).cast("int")
      // greatest() SKIPS nulls, so a null value would silently land in
      // bucket 0 and read as drift toward zero — exclude nulls instead (a
      // null-rate shift is a different monitor than a value-distribution
      // shift)
      df.where(col(valueCol).isNotNull)
        .groupBy(bucket.as("bucket")).agg(count(lit(1)).as(out))
    }
    val spine = spark.range(0, nBuckets).select(col("id").cast("int").as("bucket"))
    val joined = spine
      .join(counts(oldDf, "n_old"), Seq("bucket"), "left")
      .join(counts(newDf, "n_new"), Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    val totals = joined.agg(sum(col("n_old")).as("_ta"), sum(col("n_new")).as("_tb"))
    joined.crossJoin(totals)
      .select(col("bucket"), col("n_old"), col("n_new"),
        when(col("n_old") + col("n_new") > 0 && col("_ta") > 0 && col("_tb") > 0,
          expr("CAST((CAST(n_old AS DECIMAL(38,0)) * _tb - CAST(n_new AS DECIMAL(38,0)) * _ta) *" +
            " (CAST(n_old AS DECIMAL(38,0)) * _tb - CAST(n_new AS DECIMAL(38,0)) * _ta) * 1000000 AS DECIMAL(38,0))" +
            " div (CAST(_ta AS DECIMAL(38,0)) * _tb * (n_old + n_new))"))
          .otherwise(lit(0L)).cast("long").as("term_fp"))
      .orderBy("bucket")
  }

  /** EXACT k-th smallest of an integral column by iterative 256-ary
    * histogram refinement — the exact-selection answer at scale, where a
    * global sort is unpayable and [[histogramQuantiles]]'s one-bucket
    * bracket isn't exact: each round histograms the surviving value range
    * into ≤256 buckets (ONE filtered aggregation with map-side partials —
    * the range predicate pushes to the scan), walks the 256 counts on the
    * driver to find the bucket holding global rank k, and recurses into
    * it. Round count is ⌈log₂₅₆(range)⌉ — ≤ 5 full passes for any 40-bit
    * domain, independent of row count; driver state is 256 longs.
    * `k` is 1-based; duplicates count with multiplicity (the k-th element
    * of the sorted multiset). Nulls are excluded. Returns the value. */
  def exactKth(df: DataFrame, valueCol: String, k: Long): Long = {
    require(k >= 1, s"k must be >= 1: $k")
    val vals = df.select(col(valueCol).cast("long").as("_v"))
      .where(col("_v").isNotNull)
    val bounds = vals.agg(min(col("_v")).as("lo"), max(col("_v")).as("hi"),
      count(lit(1)).as("n")).head
    require(!bounds.isNullAt(0), "exactKth: no non-null values")
    require(k <= bounds.getLong(2),
      s"k=$k exceeds the ${bounds.getLong(2)} non-null rows")
    var lo = bounds.getLong(0)
    var hi = bounds.getLong(1)
    require(hi - lo >= 0,
      "exactKth: value range exceeds 2^63 — rescale the column first")
    var rank = k
    while (lo < hi) {
      // ceil-div width so 256 buckets always cover [lo, hi]
      val width = math.max(1L, ((hi - lo) >>> 8) + 1L)
      // DIV, not /: Spark's / on longs is DOUBLE division, which loses
      // exactness on wide ranges — the bucket id must be integral math
      val counts = vals.where(col("_v").between(lo, hi))
        .groupBy(expr(s"CAST((_v - ${lo}L) DIV ${width}L AS INT)").as("b"))
        .agg(count(lit(1)).as("c"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      var b = 0
      var cum = 0L
      while (cum + counts.getOrElse(b, 0L) < rank) {
        cum += counts.getOrElse(b, 0L); b += 1
      }
      rank -= cum
      lo = lo + b * width
      hi = math.min(hi, lo + width - 1)
    }
    lo
  }

  /** Per-GROUP exact k-th selection — [[exactKth]] generalized to one rank
    * per group in the same bounded pass count: every round histograms
    * EVERY active group's surviving value range in ONE aggregation keyed
    * on (group, bucket) — collect size and driver state are
    * O(groups · 256) per round, independent of row count, and the round
    * count is ⌈log₂₅₆(max group range)⌉. No per-group sort anywhere: this
    * is the grouped exact-median shape that survives 100 TB, next to the
    * window-sort verification row. `rankOf` maps a group's non-null count
    * to the wanted 1-based rank (e.g. lower median `n => (n + 1) / 2`).
    * Returns (groupCol, n, value) — one row per group with ≥1 non-null
    * value. Group count must be driver-bounded (state is O(groups)). */
  def exactKthBy(df: DataFrame, groupCol: String, valueCol: String,
                 rankOf: Long => Long): DataFrame = {
    val spark = df.sparkSession
    val vals = df.select(col(groupCol).cast("string").as("_g"),
        col(valueCol).cast("long").as("_v"))
      .where(col("_v").isNotNull && col("_g").isNotNull)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val bounds = vals.groupBy(col("_g"))
        .agg(min(col("_v")).as("lo"), max(col("_v")).as("hi"),
          count(lit(1)).as("n"))
        .collect()
      // state per group: surviving [lo, hi] and the rank within it
      var state: Map[String, (Long, Long, Long)] = bounds.map { r =>
        val n = r.getLong(3)
        val k = rankOf(n)
        require(k >= 1 && k <= n,
          s"rankOf($n) = $k out of [1, $n] for group ${r.getString(0)}")
        r.getString(0) -> (r.getLong(1), r.getLong(2), k)
      }.toMap
      val nOf = bounds.map(r => r.getString(0) -> r.getLong(3)).toMap
      state.foreach { case (g, (lo, hi, _)) =>
        require(hi - lo >= 0,
          s"exactKthBy: group $g value range exceeds 2^63 — rescale first")
      }
      var active = state.filter { case (_, (lo, hi, _)) => lo < hi }
      while (active.nonEmpty) {
        import spark.implicits._
        val ranges = active.toSeq.map { case (g, (lo, hi, _)) =>
          (g, lo, hi, math.max(1L, ((hi - lo) >>> 8) + 1L))
        }.toDF("_g", "_lo", "_hi", "_w")
        val counts = vals.join(broadcast(ranges), "_g")
          .where(col("_v").between(col("_lo"), col("_hi")))
          .groupBy(col("_g"),
            expr("CAST((_v - _lo) DIV _w AS INT)").as("_b"))
          .agg(count(lit(1)).as("_c"))
          .collect()
          .groupBy(_.getString(0))
          .view.mapValues(_.map(r => r.getInt(1) -> r.getLong(2)).toMap)
          .toMap
        state = state.map {
          case (g, st @ (lo, hi, rank)) if active.contains(g) =>
            val width = math.max(1L, ((hi - lo) >>> 8) + 1L)
            val cs = counts(g)
            var b = 0
            var cum = 0L
            while (cum + cs.getOrElse(b, 0L) < rank) {
              cum += cs.getOrElse(b, 0L); b += 1
            }
            val nlo = lo + b * width
            g -> (nlo, math.min(hi, nlo + width - 1), rank - cum)
          case other => other
        }
        active = state.filter { case (_, (lo, hi, _)) => lo < hi }
      }
      import spark.implicits._
      state.toSeq.map { case (g, (lo, _, _)) => (g, nOf(g), lo) }
        .toDF(groupCol, "n", "value")
    } finally vals.unpersist(false)
  }

  def histogramQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                         width: Double, nBuckets: Int,
                         phis: Seq[(String, Int, Int)]): DataFrame = {
    require(width > 0 && nBuckets > 0 && phis.nonEmpty)
    require(phis.forall { case (_, n, d) => n > 0 && n <= d },
      s"phi out of range: $phis")
    val bucket = least(floor(col(valueCol) / width), lit(nBuckets - 1))
      .cast("int")
    val counts = df
      .groupBy(col(groupCol).as("g"), bucket.as("bucket"))
      .agg(count(lit(1)).as("c"))
    val cum = counts
      .withColumn("cum", sum("c").over(
        Window.partitionBy("g").orderBy("bucket")))
      .withColumn("n", sum("c").over(Window.partitionBy("g")))
    val perPhi = phis.map { case (name, num, den) =>
      cum.where(col("cum") >= expr(s"(n * $num + ${den - 1}) div $den"))
        .groupBy("g")
        .agg(min("bucket").as(s"${name}_bucket"))
        .select(col("g"),
          col(s"${name}_bucket"),
          ((col(s"${name}_bucket") + 1) * width).as(s"${name}_hi"))
    }
    val base = cum.groupBy("g").agg(max("n").as("n"))
    perPhi.foldLeft(base)((acc, p) => acc.join(p, "g"))
  }

  /** Sketch-guided EXACT heavy hitters (frequent items): every key whose
    * count ≥ `threshold`, found WITHOUT a full-cardinality aggregation.
    *
    * Why not plain `groupBy(key).count().where(n >= T)`: map-side partial
    * aggregation keeps state per DISTINCT key seen in the partition — over
    * a 100 TB table of high-cardinality keys (URLs, user ids) that state
    * blows the hash-aggregate budget, spills, and the shuffle carries close
    * to one row per input row. The two-pass shape bounds both: pass 1 runs
    * a per-partition Misra–Gries summary with `capacity` counters (O(1)
    * state per partition, amortized O(1) per row), whose survivors are a
    * SUPERSET of every key with global count > N/(capacity+1) — pigeonhole:
    * such a key must exceed its share in at least one partition, and MG
    * never evicts a key whose partition count exceeds n_p/(capacity+1).
    * Pass 2 exactly counts ONLY the candidates (a broadcast semi-join —
    * ≤ capacity × partitions keys — then a groupBy whose state is bounded
    * by the candidate set) and applies the threshold. The sketch only
    * PRUNES; correctness comes from the exact second pass, so the result
    * equals the plain HAVING-count query bit for bit — which is exactly
    * what the oracle gate checks.
    *
    * Soundness bound: `threshold · (capacity+1) > N` is REQUIRED — below
    * it MG may evict a qualifying key and the superset property breaks.
    * N is tallied INSIDE the candidate pass (each partition emits its row
    * count next to its survivors), so the whole operator scans the data
    * exactly twice — candidates, then verify — with no third pass just to
    * count; the check still happens before any verify work runs. The
    * candidate collect is contract-bounded: ≤ capacity·partitions + 1 rows
    * per partition, the same keys the verify pass broadcasts anyway. Keys
    * are cast to long (the integral-id contract of `capPerGroupSkewSafe`);
    * null keys cannot qualify and are dropped. */
  /** One Misra–Gries update: count `k` into `m`, evicting by the
    * decrement-all rule when a new key meets a full table. Shared by the
    * batch operator below and the streaming twin
    * (`EventTimeOps.streamingHeavyHitterCandidates`) so the sketch's
    * soundness-critical inner loop cannot drift between them. */
  private[graft] def mgUpdate(m: scala.collection.mutable.HashMap[Long, Long],
                              k: Long, capacity: Int): Unit =
    m.get(k) match {
      case Some(c) => m.update(k, c + 1)
      case None if m.size < capacity => m.update(k, 1L)
      case None =>
        // a new key against a full table decrements every counter; zeros
        // evict (collect first — no mutation mid-iteration)
        val dead = m.iterator.collect { case (kk, 1L) => kk }.toArray
        m.mapValuesInPlace((_, c) => c - 1)
        dead.foreach(m.remove)
    }

  /** The integral-id contract, enforced: a fractional key would silently
    * truncate under cast('long') and merge distinct keys. */
  private[graft] def requireIntegralKey(df: DataFrame, keyCol: String,
                                        op: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val t = df.schema(keyCol).dataType
    // IntegralType is private[sql] — enumerate its members
    require(Set[org.apache.spark.sql.types.DataType](
        ByteType, ShortType, IntegerType, LongType).contains(t),
      s"$op requires an integral key column ('$keyCol' is $t) — " +
        "fractional keys would truncate and merge under the long cast")
  }

  def heavyHitters(df: DataFrame, keyCol: String, threshold: Long,
                   capacity: Int = 1024): DataFrame = {
    require(threshold >= 1, s"threshold must be positive: $threshold")
    require(capacity >= 1, s"capacity must be positive: $capacity")
    requireIntegralKey(df, keyCol, "heavyHitters")
    val keyed = df.where(col(keyCol).isNotNull)
    val spark = df.sparkSession
    import spark.implicits._
    // per partition: one (false, rowCount) tally row + (true, key) survivors
    val summary = keyed.select(col(keyCol).cast("long")).as[Long]
      .mapPartitions { it =>
        val m = new scala.collection.mutable.HashMap[Long, Long]
        var np = 0L
        while (it.hasNext) {
          np += 1
          mgUpdate(m, it.next(), capacity)
        }
        Iterator.single((false, np)) ++ m.keysIterator.map(k => (true, k))
      }
      .collect() // bounded by capacity × partitions (+1 tally each)
    val n = summary.iterator.collect { case (false, np) => np }.sum
    require(threshold * (capacity + 1L) > n,
      s"heavyHitters unsound: threshold=$threshold, capacity=$capacity " +
        s"admits misses at n=$n rows — raise capacity above ${n / threshold}")
    val candidates = summary.iterator.collect { case (true, k) => k }
      .toArray.distinct.toSeq.toDF("__hh_key")
    keyed
      .join(broadcast(candidates),
        col(keyCol).cast("long") === col("__hh_key"), "left_semi")
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= threshold)
  }
}
