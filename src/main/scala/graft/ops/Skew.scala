package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Skew-mitigation utilities for hot keys (SURVEY.md §4 / driver
  * scale checklist: "skewed keys → salting or AQE skew-join").
  *
  * AQE's skew-join splitting covers sort-merge joins at runtime; the
  * salted two-phase aggregation below covers the case AQE does not:
  * a groupBy whose hot key overwhelms one reducer. Phase 1 aggregates
  * on (key, salt) — spreading the hot key over `saltBuckets` reducers —
  * phase 2 merges the partials per key. Results are identical to the
  * direct aggregation; only the shuffle layout changes.
  */
object Skew {

  /** Two-phase salted sum/count aggregation.
    * @param df input
    * @param key group key column name
    * @param valueCol column to aggregate
    * @param saltBuckets number of salt partitions for the hot keys
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String, saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(saltBuckets)))
    val partial = salted
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
    partial
      .groupBy(col(key))
      .agg(sum(col("_psum")).as("total"), sum(col("_pcnt")).as("n"))
  }

  /** The salted path under the oracle gate: revenue per returnflag —
    * a 3-value key over 600k rows at sf0.1, the classic hot-key
    * aggregate — via the two-phase salt, checked against the ORACLE'S
    * direct single-phase GROUP BY. Equality is the whole point:
    * salting must change the shuffle layout and nothing else. Values
    * aggregate as exact integer CENTS — partial sums re-associate
    * float addition, so the salted path is only hash-equal to the
    * direct path when the sum is order-free (the [[rollingSpend]]
    * device; at 100 TB long-sum exactness is also what makes partial
    * aggregation auditable). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_salted_agg" -> ((s, dir) =>
      saltedSumCount(
        t(s, dir, "lineitem").select(col("l_returnflag"),
          round(col("l_extendedprice") * 100).cast("long").as("cents")),
        "l_returnflag", "cents", saltBuckets = 16)
        .orderBy(col("l_returnflag"))))

  def oracles: Map[String, String] = Map(
    "x_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(sum(round(l_extendedprice * 100)::BIGINT) AS BIGINT) AS total,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
