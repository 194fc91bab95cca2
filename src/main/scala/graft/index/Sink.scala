package graft.index

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Collection DDL + sink operators (SURVEY.md §2 C1–C2).
  *
  * The reference's "collection" maps to a parquet dataset directory;
  * `ensure_collection_exists`
  * (`with_colpali_v1.3/incremental_indexing_colpali_with_qdrant.py:116-141`)
  * maps to create-if-absent; `client.upsert(wait=True)`
  * (`...py:191-202`) maps to an append write whose job completion is
  * the sync point.
  *
  * The reference's ids are fresh `uuid4()` per run, so its
  * "incremental" indexing silently duplicates re-scanned files
  * (SURVEY.md §7.6). We deviate deliberately: deterministic content
  * ids + anti-join makes re-ingest idempotent ([[incremental]]).
  */
object Sink {

  /** C1: create the collection directory with the given (empty) schema
    * if absent; true if created. First-write-wins, like the reference's
    * list-then-create. */
  def ensureCollection(spark: SparkSession, path: String, like: DataFrame): Boolean = {
    val dir = new java.io.File(path)
    if (dir.exists()) false
    else {
      like.limit(0).write.mode(SaveMode.ErrorIfExists).parquet(path)
      true
    }
  }

  /** C2: batch upsert — append semantics (reference ids are always
    * fresh). Returns the count of rows written in THIS call; the
    * reference's `processed == points_count` parity check is a
    * separate full-collection count the caller runs when wanted —
    * doing it here would make every streaming micro-batch pay an
    * O(collection) scan. */
  def append(points: DataFrame, path: String): Long = {
    val staged = points.cache()
    val written = staged.count()
    staged.write.mode(SaveMode.Append).parquet(path)
    staged.unpersist()
    written
  }

  /** Incremental re-ingest: drop rows whose id already exists in the
    * collection (left anti join — broadcast when the existing-id side
    * is small, shuffle-hash otherwise; AQE picks at runtime). */
  def incremental(incoming: DataFrame, existing: DataFrame, idCol: String): DataFrame =
    incoming.join(existing.select(idCol).distinct(), Seq(idCol), "left_anti")
}
