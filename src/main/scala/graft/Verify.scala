package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional third arg: comma-separated query names for a focused dump.
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def qj(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Pre-flight schema dump: the driver regenerates the testdata between
    // rounds and physical-type drift has already voided one round (r8:
    // events.ts NANOS→MICROS). Printing what each table actually read back
    // as — into stderr AND the artifact dir — makes the NEXT drift
    // diagnosable from the round's JSON alone.
    val allTables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schemaEntries = allTables.map { tbl =>
      try {
        val ddl = spark.read.parquet(s"$sfDir/$tbl.parquet").schema.toDDL
        System.err.println(s"[verify] schema $tbl: $ddl")
        tbl -> ddl
      } catch { case e: Throwable =>
        System.err.println(s"[verify] schema $tbl: UNREADABLE ${e.getMessage}")
        tbl -> s"UNREADABLE: ${String.valueOf(e.getMessage).take(200)}"
      }
    }
    val schemaJson = schemaEntries
      .map { case (k, v) => s"${qj(k)}: ${qj(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/schemas.json"), schemaJson)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // per-query wall time into the round artifact: a query creeping
        // toward a driver timeout should be visible BEFORE it breaches it
        System.err.println(
          f"[verify] $name ok in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${qj(k)}: ${qj(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
