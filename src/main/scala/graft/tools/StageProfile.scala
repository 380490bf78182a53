package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage timing forensics for a catalog query — the measurement the
  * optimization rounds turn on when a wall-clock number alone cannot say
  * WHERE the time goes (guide §1: empirical loop; §7.1 stage view without
  * the UI). Runs the named queries once untimed (codegen/JIT warm) and then
  * `passes` timed repetitions, recording every completed stage's duration,
  * task count, and shuffle read/write bytes via a SparkListener, grouped by
  * job. Plans only change under AQE per run, so the dump is the per-stage
  * truth of exactly what the bench times.
  *
  * Usage: runMain graft.tools.StageProfile <sfDir> <q1,q2,…> [passes]
  * (cores/shuffle partitions from SPARK_GRAFT_CPUS, default 4 — run at 8
  * and 32 to diagnose anti-scaling). Output: stderr table per query.
  */
object StageProfile {
  final case class StageRow(jobId: Int, stageId: Int, name: String,
                            ms: Long, tasks: Int,
                            shufReadMB: Double, shufWriteMB: Double)

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: runMain graft.tools.StageProfile <sfDir> <q1,q2,…> [passes]")
      sys.exit(2)
    }
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val passes = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val qs = graft.SparkEntry.queries

    val rows = new java.util.concurrent.ConcurrentLinkedQueue[StageRow]()
    val execOfJob =
      new java.util.concurrent.ConcurrentHashMap[Int, String]()
    @volatile var record = false
    val listener = new SparkListener {
      private val jobOfStage =
        new java.util.concurrent.ConcurrentHashMap[Int, Int]()
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        js.stageIds.foreach(sid => jobOfStage.put(sid, js.jobId))
        execOfJob.put(js.jobId, String.valueOf(
          js.properties.getProperty("spark.sql.execution.id", "-")))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (record) {
          val si = sc.stageInfo
          val ms = (for {
            c <- si.completionTime; s <- si.submissionTime
          } yield c - s).getOrElse(-1L)
          rows.add(StageRow(
            jobOfStage.getOrDefault(si.stageId, -1), si.stageId,
            si.name.takeWhile(_ != '\n').take(90), ms, si.numTasks,
            si.taskMetrics.shuffleReadMetrics.totalBytesRead / 1e6,
            si.taskMetrics.shuffleWriteMetrics.bytesWritten / 1e6))
        }
    }
    spark.sparkContext.addSparkListener(listener)

    names.filter(qs.contains).foreach { name =>
      qs(name)(spark, sfDir).count() // warm pass, unrecorded
      spark.catalog.clearCache()
      rows.clear()
      record = true
      val t0 = System.nanoTime()
      var p = 0
      while (p < passes) {
        qs(name)(spark, sfDir).count()
        spark.catalog.clearCache()
        p += 1
      }
      val wallMs = (System.nanoTime() - t0) / 1e6
      record = false
      Thread.sleep(300) // let late stage events drain
      import scala.jdk.CollectionConverters._
      val all = rows.asScala.toSeq.sortBy(r => (r.jobId, r.stageId))
      val sumMs = all.map(_.ms).sum
      System.err.println(
        f"\n== $name: wall ${wallMs / passes}%.0f ms/pass over $passes " +
          f"passes, ${all.size} stages, stage-ms sum ${sumMs / passes}%d/pass ==")
      System.err.println(f"${"job"}%4s ${"exec"}%5s ${"stage"}%6s ${"ms"}%7s " +
        f"${"tasks"}%6s ${"shR MB"}%8s ${"shW MB"}%8s  name")
      all.foreach { r =>
        System.err.println(f"${r.jobId}%4d " +
          f"${execOfJob.getOrDefault(r.jobId, "-")}%5s ${r.stageId}%6d " +
          f"${r.ms}%7d ${r.tasks}%6d ${r.shufReadMB}%8.2f " +
          f"${r.shufWriteMB}%8.2f  ${r.name}")
      }
      // per-SQL-execution rollup: which ACTION owns the job flood
      val byExec = all.groupBy(r => execOfJob.getOrDefault(r.jobId, "-"))
        .map { case (e, rs) =>
          (e, rs.map(_.ms).sum, rs.map(_.jobId).distinct.size, rs.size) }
        .toSeq.sortBy(-_._2)
      System.err.println(f"${"exec"}%6s ${"ms"}%8s ${"jobs"}%6s ${"stages"}%7s")
      byExec.foreach { case (e, ms, jobs, stages) =>
        System.err.println(f"$e%6s $ms%8d $jobs%6d $stages%7d") }
    }
    spark.stop()
  }
}
