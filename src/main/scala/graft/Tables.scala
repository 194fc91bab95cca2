package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table access + derived vector fixtures (FIXTURES.md). */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events with `ts` restored to TimestampType. The fixture stores
    * TIMESTAMP(NANOS) which Spark only reads via
    * spark.sql.legacy.parquet.nanosAsLong=true (set in Verify/Bench/
    * tests); integer `div` keeps full precision (a double division
    * would lose it above 2^53 ns). DuckDB truncates ns→µs the same
    * way. */
  def events(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** ColBERT-style multi-vector fixture (FIXTURES.md §1): group the
    * dense vectors into synthetic docs, doc_id = vec_id % 50, token
    * vectors ordered by vec_id. Stands in for the reference's
    * ~1030×128d ColPali page matrices
    * (`with_colpali_v1.3/incremental_indexing_colpali_with_qdrant.py:54-55,110`).
    * One hash-shuffle on doc_id; at scale this is the natural layout
    * step for a multi-vector collection (co-locates a doc's tokens). */
  def multiVectorDocs(embeddings: DataFrame): DataFrame =
    embeddings
      .groupBy((col("vec_id") % 50).as("doc_id"))
      .agg(array_sort(collect_list(struct(col("vec_id"), col("embedding")))).as("toks"))
      .select(col("doc_id"), transform(col("toks"), s => s("embedding")).as("vecs"))

  /** DuckDB equivalent of [[multiVectorDocs]] as a CTE body. */
  val duckMultiVectorDocs: String =
    "SELECT vec_id % 50 AS doc_id, list(embedding ORDER BY vec_id) AS vecs FROM embeddings GROUP BY 1"
}
