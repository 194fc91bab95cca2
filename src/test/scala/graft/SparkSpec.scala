package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One SparkSession for the whole forked test JVM. */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf: String = "/root/testdata/sf0.001"

  /** One PINNED reliable-checkpoint dir for the whole test JVM:
    * [[graft.ops.Ckpt]] pins the FIRST dir applied per SparkContext
    * (setCheckpointDir is context-global — a second dir would mix two
    * runs' files under one cleanup contract), so every durable-mode
    * test shares this dir and asserts a file-count INCREASE, not mere
    * presence. Never deleted mid-suite: a later durable test still
    * checkpoints under it. */
  lazy val ckptDir: String =
    java.nio.file.Files.createTempDirectory("graft-test-ckpt").toString

  /** Regular files under a dir (0 if the dir does not exist). */
  def ckptFiles(dir: String): Long = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.exists(p)) 0L
    else {
      val s = java.nio.file.Files.walk(p)
      try s.filter(java.nio.file.Files.isRegularFile(_)).count()
      finally s.close()
    }
  }
}

/** Base: shared session + small helpers. */
abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  def sf: String = TestSpark.sf
}
