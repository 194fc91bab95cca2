package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
