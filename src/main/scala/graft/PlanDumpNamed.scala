package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Optimization-round tool: write `.explain("formatted")` of named
  * suite queries to `<outDir>/<name>_<tag>.txt` — the plan evidence
  * the round's OPTIMIZATION notes point at.
  *
  * Usage: sbt "runMain graft.PlanDumpNamed <tag> <outDir> q1,q2,..."
  * (sf dir via SPARK_GRAFT_SF_DIR; bench-shaped session). */
object PlanDumpNamed {
  def main(args: Array[String]): Unit = {
    val tag = if (args.nonEmpty) args(0) else "before"
    val outDir = if (args.length > 1) args(1) else "plans/r18"
    val names = if (args.length > 2)
      args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    else Seq("d1_topk_dense")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${n}_$tag.txt"), txt)
      println(s"[plandump] wrote $outDir/${n}_$tag.txt")
    }
    spark.stop()
  }
}
