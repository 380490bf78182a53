package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for suites. One session per JVM (sbt forks one
  * test JVM), small shuffle-partition count so tiny-frame tests don't pay
  * 200-task overhead. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  override def afterAll(): Unit = super.afterAll()

  /** Scratch dir for a test — created under one per-JVM parent that a
    * shutdown hook deletes, so repeated sbt test runs leave nothing behind
    * in the tmp dir. */
  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(SparkSpec.scratchRoot, prefix).toString
}

object SparkSpec {
  lazy val scratchRoot: java.nio.file.Path = {
    val root = java.nio.file.Files.createTempDirectory("graft-test-scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def del(f: java.io.File): Unit = {
        val children = f.listFiles()
        if (children != null) children.foreach(del)
        f.delete(): Unit
      }
      del(root.toFile)
    }))
    root
  }

  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
