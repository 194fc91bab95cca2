package graft

import org.apache.spark.sql.functions._
import graft.ops.{Relational, Similarity}
import graft.Tables.t
import java.nio.file.Files

/** Assertions about PHYSICAL PLAN SHAPE — the properties that decide
  * whether these operators survive a 100 TB scale-up: predicate
  * pushdown to parquet, broadcast joins for small dims, partition
  * pruning on a cluster-partitioned collection, no global sorts on the
  * top-k path. */
class ScaleDesignSpec extends SparkSpec {

  test("payload filter pushes down to the parquet scan (E4)") {
    val e = t(spark, sf, "embeddings")
    val q = e.filter(col("label") === 3).select(col("vec_id"))
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(label), EqualTo(label,3)]"),
      s"expected label pushdown in:\n$scan")
  }

  test("column pruning: scoring reads only id+vector columns") {
    val e = t(spark, sf, "embeddings")
    val q = e.select(col("vec_id"), col("embedding"))
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<vec_id:bigint,embedding:array<float>>"))
  }

  test("dimension joins broadcast (no fact-table shuffle for q3)") {
    val plan = Relational.topRevenueOrders(
      t(spark, sf, "customer"), t(spark, sf, "orders"), t(spark, sf, "lineitem"), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("IVF collection partitioned by cluster_id prunes to one partition") {
    val e = t(spark, sf, "embeddings")
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("c_id"), col("embedding").as("cv"))
    val asg = Similarity.ivfAssign(e, cents)
    val dir = Files.createTempDirectory("graft_ivf").toFile.getAbsolutePath
    // index build: write the collection partitioned by cluster — at
    // scale each cluster is its own file subtree
    asg.write.partitionBy("cluster_id").parquet(s"$dir/col")
    val back = spark.read.parquet(s"$dir/col").filter(col("cluster_id") === 1)
    val plan = back.queryExecution.executedPlan.toString
    // partition pruning: the cluster filter is a PartitionFilter, not a
    // row-level filter
    assert(plan.contains("PartitionFilters: [isnotnull(cluster_id"),
      s"expected partition pruning in:\n$plan")
    assert(back.count() > 0)
  }

  test("AQE is available for runtime re-planning") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
  }
}
