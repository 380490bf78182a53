package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end batch star build with atomic publish (SURVEY §2 rows 8-10, 38;
  * §7.4 item 4).
  *
  * The reference gets atomicity from a single psycopg2 transaction over 21
  * statements with rollback-on-error
  * (`lambda_redshift/lambda_function_redishift.py:171-183`) and idempotency
  * from anti-join/MERGE on natural keys. With filesystem tables we replicate
  * both: every batch writes the NEW full table versions under
  * `<store>/_tmp_<batch>/…`, then a single atomic rename publishes all five
  * tables; a crash mid-batch leaves the published store untouched, and
  * re-running a batch is a no-op at the row level (anti-join upserts).
  *
  * Delta/staging tables (`*_dlt`, `staging`,
  * `lambda_function_redishift.py:57-69,87-91` + the 5 TRUNCATEs at
  * `:164-168`) have no persistent equivalent here — per-batch DataFrames are
  * ephemeral by construction, which is the Spark-native restatement of
  * "truncate after merge".
  */
class StarStore(spark: SparkSession, root: String) {
  import StarStore._

  private val hadoopFs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists: Boolean = hadoopFs.exists(new Path(s"$root/$Current"))

  private def readTable(name: String): DataFrame =
    spark.read.parquet(s"$root/$Current/$name")

  def dimDate: DataFrame = readTable("dim_date")
  def dimPlatform: DataFrame = readTable("dim_platform")
  def dimSite: DataFrame = readTable("dim_site")
  def dimTitle: DataFrame = readTable("dim_title")
  def fact: DataFrame = readTable("fact_videostart")

  /** Process one raw batch end-to-end and atomically publish the updated
    * star. Returns the number of fact rows appended. */
  def runBatch(raw: DataFrame, batchId: String): Long = {
    val cleaned = Transform.clean(raw)
      .withColumn("SITE", coalesce(col("SITE"), lit(Fact.NoneMember)))

    // Dim upserts: idempotent anti-join + deterministic SKEYs (SURVEY §2 row 28/31).
    val (dDate, dPlat, dSite, dTitle) =
      if (exists)
        (Dims.upsert(dimDate, cleaned, "DATETIME", "DATETIME_SKEY"),
         Dims.upsert(dimPlatform, cleaned, "PLATFORM", "PLATFORM_SKEY"),
         Dims.upsert(dimSite, cleaned, "SITE", "SITE_SKEY"),
         Dims.upsert(dimTitle, cleaned, "TITLE", "TITLE_SKEY"))
      else
        (Dims.build(cleaned, "DATETIME", "DATETIME_SKEY"),
         Dims.build(cleaned, "PLATFORM", "PLATFORM_SKEY"),
         Dims.build(cleaned, "SITE", "SITE_SKEY"),
         Dims.build(cleaned, "TITLE", "TITLE_SKEY"))

    // Dims are read multiple times (upsert + fact join) — cache the tiny frames.
    Seq(dDate, dPlat, dSite, dTitle).foreach(_.cache())

    val resolved = Fact.resolveSkeys(cleaned, dDate, dPlat, dSite, dTitle)
    val maxFactId =
      if (exists) fact.agg(coalesce(max(col("factid")), lit(0L))).head.getLong(0) else 0L
    val newFact = Fact.withFactIds(resolved, maxFactId)
    val full = if (exists) fact.unionByName(newFact) else newFact

    // Stage everything, then one atomic swap (SURVEY §7.4 item 4).
    val tmp = s"$root/_tmp_$batchId"
    dDate.write.mode("overwrite").parquet(s"$tmp/dim_date")
    dPlat.write.mode("overwrite").parquet(s"$tmp/dim_platform")
    dSite.write.mode("overwrite").parquet(s"$tmp/dim_site")
    dTitle.write.mode("overwrite").parquet(s"$tmp/dim_title")
    full.write.mode("overwrite").parquet(s"$tmp/fact_videostart")
    val appended = newFact.count()

    publish(tmp)
    Seq(dDate, dPlat, dSite, dTitle).foreach(_.unpersist())
    appended
  }

  private def publish(tmp: String): Unit = {
    val cur = new Path(s"$root/$Current")
    val old = new Path(s"$root/_old_${System.nanoTime()}")
    if (hadoopFs.exists(cur)) hadoopFs.rename(cur, old)
    require(hadoopFs.rename(new Path(tmp), cur), s"atomic publish failed: $tmp -> $cur")
    if (hadoopFs.exists(old)) hadoopFs.delete(old, true)
  }
}

object StarStore {
  val Current = "current"

  def apply(spark: SparkSession, root: String): StarStore = new StarStore(spark, root)
}
