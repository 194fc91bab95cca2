package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.vector.Kernels

/** Query-side operators (SURVEY.md §2 D1–D3): filtered top-k similarity
  * search over a vector table, reproducing the reference's
  * `client.query_points(collection, query=vec, limit=top_k)` call
  * (`with_vdr-2b-multi-v1/query_vdr_2b_multi_v1.py:78-83`,
  * `with_colpali_v1.3/qdrant_query_with_colpali.py:106-116`).
  *
  * Scale design: the query vector is a one-row broadcast (no shuffle);
  * scoring is a codegen'd projection over the scan; `ORDER BY score
  * DESC LIMIT k` is planned by Catalyst as TakeOrderedAndProject —
  * per-partition top-k heaps merged on the driver, so no global sort
  * and no shuffle of the scored table even at 10^9 rows. Payload
  * filters (E4) sit below the projection and push down to parquet.
  */
object TopK {

  /** The ONE Qdrant `Distance` → (score expression, ranks-ascending)
    * mapping, shared by every metric-aware operator (dense search, the
    * batch APIs, recommend, the facade) so the metric semantics cannot
    * drift between them: `cosine`/`dot` are similarities ranked DESC,
    * `euclid`/`manhattan` are distances ranked ASC. */
  private[graft] def metricFn(
      metric: String): ((Column, Column) => Column, Boolean) = metric match {
    case "cosine" => (Kernels.cosine, false)
    case "dot" => (Kernels.dot, false)
    case "euclid" => (Kernels.euclidean, true)
    case "manhattan" => (Kernels.manhattan, true)
    case other => throw new IllegalArgumentException(
      s"unknown distance metric '$other' (cosine|dot|euclid|manhattan)")
  }

  /** Dense top-k (D1): score every row of `points` against the single
    * query vector in the one-row `query` frame, return best k.
    * Deterministic total order: score DESC, id ASC tiebreak.
    *
    * `metric` selects the Qdrant Distance: `cosine` / `dot` rank
    * similarity DESC; `euclid` / `manhattan` are distances and rank
    * ASC (smaller = closer), with `scoreThreshold` flipping to a
    * ceiling — Qdrant's own threshold semantics per metric. Every
    * metric shares the same plan shape: codegen'd scoring projection
    * over the scan, TakeOrderedAndProject cut.
    */
  def dense(
      points: DataFrame,
      query: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      queryVecCol: String = "q",
      payloadFilter: Column = lit(true),
      scoreThreshold: Option[Double] = None,
      metric: String = "cosine"): DataFrame = {
    val (scoreOf, asc) = metricFn(metric)
    val scored = points
      .filter(payloadFilter)
      .crossJoin(broadcast(query))
      .select(
        col(idCol),
        round(scoreOf(col(vecCol), col(queryVecCol)), 6).as("score"))
    // Qdrant score_threshold: drop hits past the floor (similarity) /
    // ceiling (distance) BEFORE the cut — fewer than k rows may
    // return. The filter sits inside the same projection stage, so it
    // costs nothing and SHRINKS the per-partition top-k heaps.
    scoreThreshold.fold(scored)(t =>
        scored.filter(if (asc) col("score") <= t else col("score") >= t))
      .orderBy(if (asc) col("score").asc else col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Multi-vector top-k (D2): MaxSim late interaction against a one-row
    * broadcast frame holding the query token-matrix. */
  def maxSim(
      docs: DataFrame,
      query: DataFrame,
      idCol: String,
      vecsCol: String,
      k: Int,
      queryVecsCol: String = "q"): DataFrame = {
    docs
      .crossJoin(broadcast(query))
      .select(
        col(idCol),
        round(Kernels.maxsim(col(queryVecsCol), col(vecsCol)), 6).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** Result projection (D3): per-hit output with 'Unknown' defaults for
    * missing payload keys, mirroring `format_results`
    * (`with_colpali_v1.3/qdrant_query_with_colpali.py:123-138`:
    * `payload.get('filename', 'Unknown')` etc.). */
  def formatResults(
      hits: DataFrame,
      keep: Seq[String],
      payloadCols: Seq[String]): DataFrame = {
    val kept = keep.map(col)
    val projected = payloadCols.map(c =>
      coalesce(col(c).cast("string"), lit("Unknown")).as(c))
    hits.select(kept ++ projected: _*)
  }
}
