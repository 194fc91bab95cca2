package graft

import org.apache.spark.sql.SparkSession

/** Count-vs-toRdd forcing audit (the r13 harness-integrity lesson,
  * kept as a tool): times each suite query under the OLD
  * `Dataset.count()` forcing — which lets Catalyst prune all columns
  * and unique-key join subtrees — against the honest
  * `queryExecution.toRdd.count()`, and reports the ratio. A ratio
  * ≳ 1.3 means the query's top is prunable: any historical exponent
  * measured under count forcing for that family is suspect and its
  * curve must be re-measured honestly (BENCH_NOTES "prunable-top
  * curves"). Env: SPARK_GRAFT_SF_DIR (default sf0.1),
  * SPARK_GRAFT_AUDIT_QUERIES (comma list; default: every suite
  * query), SPARK_GRAFT_CPUS. One JSON line on stdout. */
object ForcingAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val qsel = sys.env.get("SPARK_GRAFT_AUDIT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => qsel.forall(_.contains(n)))
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    val rows = names.flatMap { n =>
      val fn = SparkEntry.queries(n)
      try {
        // warm both paths once, untimed (JIT + codegen + file listing)
        fn(spark, sfDir).queryExecution.toRdd.count()
        fn(spark, sfDir).count()
        val tHonest = (1 to 2).map(_ =>
          time(fn(spark, sfDir).queryExecution.toRdd.count())).min
        val tCount = (1 to 2).map(_ =>
          time(fn(spark, sfDir).count())).min
        val ratio = if (tCount > 0) tHonest / tCount else Double.NaN
        System.err.println(
          s"[forcing] $n honest=${f3(tHonest)} count=${f3(tCount)} " +
            s"ratio=${f3(ratio)}")
        Some(n -> (tHonest, tCount, ratio))
      } catch { case e: Throwable =>
        System.err.println(s"[forcing] $n FAILED ${e.getClass.getSimpleName}")
        None
      }
    }
    val json = rows.map { case (n, (h, c, r)) =>
      s""""$n":{"honest":${f3(h)},"count":${f3(c)},"ratio":${f3(r)}}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"forcing_audit","sf":"$sfDir","queries":$json}""")
    spark.stop()
  }
}
