package graft

import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.index.Sink

/** Bucketed collection layout ([[Sink.writeBucketed]]): the
  * write-once-shuffle-never-again contract — co-located joins and
  * aggregations on the bucket key run with zero exchanges, and point
  * lookups prune to one bucket. */
class BucketedLayoutSpec extends SparkSpec {

  private val base = java.nio.file.Files
    .createTempDirectory("graft_bucketed").toString

  private def withNoBroadcast[A](body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try body finally spark.conf.set(key, old)
  }

  test("same-bucketed tables join and aggregate with zero exchanges; lookups prune buckets") {
    val e = t(spark, sf, "embeddings").select(col("vec_id"), col("label"))
    val d = t(spark, sf, "embeddings")
      .select(col("vec_id"), (col("vec_id") * 2).as("other"))
    Sink.writeBucketed(e, "bkt_a", s"$base/bkt_a", "vec_id", 8)
    Sink.writeBucketed(d, "bkt_b", s"$base/bkt_b", "vec_id", 8)
    try {
      withNoBroadcast {
        val joined = spark.table("bkt_a")
          .join(spark.table("bkt_b"), "vec_id")
        val jPlan = joined.queryExecution.executedPlan.toString
        assert(jPlan.contains("SortMergeJoin"), jPlan)
        assert(!jPlan.contains("Exchange hashpartitioning"),
          s"co-located join must not shuffle either side:\n$jPlan")
        assert(joined.count() === e.count())
      }
      val agg = spark.table("bkt_a").groupBy("vec_id")
        .agg(count(lit(1)).as("n"))
      val aPlan = agg.queryExecution.executedPlan.toString
      assert(!aPlan.contains("Exchange hashpartitioning"),
        s"per-id aggregation over a bucketed table must not shuffle:\n$aPlan")

      // autoBucketedScan turns bucketed reads off when no join/agg
      // benefits, which also forfeits bucket pruning — a deployment
      // serving point lookups pins it off (as here) to keep pruning
      val abKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
      val abOld = spark.conf.get(abKey)
      spark.conf.set(abKey, "false")
      try {
        val lookup = spark.table("bkt_a").filter(col("vec_id") === 42L)
        val lPlan = lookup.queryExecution.executedPlan.toString
        assert(lPlan.contains("SelectedBucketsCount: 1 out of 8"),
          s"point lookup must prune to one bucket:\n$lPlan")
        assert(lookup.count() === 1)
      } finally spark.conf.set(abKey, abOld)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("bucketed data files are per-bucket and id-sorted within each file") {
    val e = t(spark, sf, "embeddings").select(col("vec_id"), col("label"))
    Sink.writeBucketed(e, "bkt_c", s"$base/bkt_c", "vec_id", 4)
    try {
      val files = new java.io.File(s"$base/bkt_c")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 4, "one file per bucket at this volume")
      // within-file ordering: read one file raw and check monotone ids
      val one = spark.read.parquet(files.head.getAbsolutePath)
        .select("vec_id").collect().map(_.getLong(0))
      assert(one.sameElements(one.sorted),
        "sortBy(id) must leave each bucket file id-sorted (merge-ready)")
    } finally spark.sql("DROP TABLE IF EXISTS bkt_c")
  }
}
