package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement main for the pair-graph kernels (r16): does a
  * power-law HUB break [[graft.ops.Dedup.pagerank]]'s per-node
  * sorted contribution fold? The fold concentrates a node's entire
  * neighbor list in one task (`sort_array(collect_list(...))` keyed
  * on the node), and near-dup pair graphs are exactly where hubs
  * live (boilerplate clusters) — so the skew exposure must be a
  * measured number, not a suspicion (the VERDICT r15 watch item).
  *
  * Mode `hub` (default): at each edge count E
  * (`SPARK_GRAFT_GRAPH_EDGES`, default "500000,2000000"), builds two
  * deterministic graphs drawn from the SAME E-row budget —
  *  - control: pseudo-random background pairs over N = E/5 nodes
  *    (Knuth-hash formulas, no rand()), average degree ~10;
  *  - hub: the same background minus E/10 rows, plus node 0
  *    connected to E/10 distinct neighbors (~10% of all edges on one
  *    node, the planted power-law head);
  * and times `pagerank` on each (the operator is eager by
  * construction — the call materializes). The hub/control ratio IS
  * the skew tax. The BUILT edge counts differ slightly (the
  * id_a != id_b self-loop filter applies to different background
  * ranges in control vs hub), so both are counted off the
  * materialized frames and reported as edges_control/edges_hub in
  * the JSON — the comparison's honesty is the measured counts, not
  * the nominal budget.
  *
  * Prints one JSON line. */
object GraphAudit {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val sizes = sys.env.getOrElse("SPARK_GRAFT_GRAPH_EDGES", "500000,2000000")
      .split(",").map(_.trim.toLong).toSeq

    // deterministic pseudo-random endpoints (Knuth multiplicative
    // hashes) — content-stable like every fixture draw in the repo
    def background(rows: Long, n: Long): DataFrame =
      spark.range(rows).select(
        pmod(col("id") * 2654435761L, lit(n)).as("id_a"),
        pmod(col("id") * 40503L + 7L, lit(n)).as("id_b"))
        .filter(col("id_a") =!= col("id_b"))

    def time(pairs: DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val out = graft.ops.Dedup.pagerank(pairs)
      val secs = (System.nanoTime() - t0) / 1e9
      (secs, out.count())
    }

    val legs = sizes.map { e =>
      val n = math.max(16L, e / 5L)
      val hubE = e / 10L
      val control = background(e, n).localCheckpoint(true)
      val hub = background(e - hubE, n)
        .unionByName(spark.range(hubE).select(
          lit(0L).as("id_a"), (pmod(col("id"), lit(n - 1L)) + 1L).as("id_b")))
        .localCheckpoint(true)
      // count the materialized frames (localCheckpointed — the count
      // is a cached-block scan, not a rebuild) so the reported edge
      // counts are the graphs pagerank actually saw
      val (ce, he) = (control.count(), hub.count())
      val (warmS, _) = time(background(10000L, 2000L)) // JIT/codegen warm
      val (cs, cn) = time(control)
      val (hs, hn) = time(hub)
      System.err.println(
        f"[graphaudit] E=$e control ${cs}%.1f s ($cn nodes, $ce edges) " +
          f"vs hub ${hs}%.1f s ($hn nodes, $he edges) - ratio " +
          f"${hs / cs}%.2f (warm $warmS%.1f)")
      s""""$e":{"control_secs":${f3(cs)},"hub_secs":${f3(hs)},""" +
        s""""ratio":${f3(hs / cs)},"nodes_control":$cn,"nodes_hub":$hn,""" +
        s""""edges_control":$ce,"edges_hub":$he}"""
    }
    spark.stop()
    println(s"""{"metric":"pagerank_hub_audit","edges":{${legs.mkString(",")}}}""")
  }
}
