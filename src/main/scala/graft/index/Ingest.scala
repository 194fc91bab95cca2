package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ingest-side operators (SURVEY.md §2 A2–A6, B6, C3): the reference's
  * scan → tolerant-decode → batch → embed → point-build pipeline,
  * re-expressed as declarative DataFrame transforms.
  *
  * The fixture tables are tabular stand-ins for the reference's
  * filesystem corpus, so the path/scan operators run over synthesized
  * path strings with the same semantics as the reference's
  * `rglob` + suffix filter
  * (`with_colpali_v1.3/incremental_indexing_colpali_with_qdrant.py:143-163`,
  * `shared/get_all_folder_details.py:57-78`).
  *
  * Scale: every operator here is a pure narrow map/filter — no shuffle,
  * no driver loop — so the pipeline parallelizes per input split.
  * Failure handling is PERMISSIVE-style: corrupt rows are flagged, not
  * thrown, and counted by an aggregation (reference drops + counts:
  * A4/C3, `with_colpali_v1.3/...py:165-173,212`).
  */
object Ingest {

  /** Synthesize the image-corpus view of `documents`: one file path per
    * doc, extension cycling through png/jpg/jpeg/txt with mixed case —
    * exercises the reference's case-insensitive suffix filter. */
  def withPaths(docs: DataFrame): DataFrame = {
    val ext = element_at(
      array(lit("png"), lit("JPG"), lit("jpeg"), lit("txt"),
        lit("PNG"), lit("jpg"), lit("JPEG"), lit("gif")),
      (col("doc_id") % 8 + 1).cast("int"))
    docs.withColumn("relative_path",
        concat(col("source"), lit("/doc_"), col("doc_id"), lit("."), ext))
      .withColumn("full_path", concat(lit("/data/corpus/"), col("relative_path")))
  }

  /** A3: recursive image scan semantics — keep only supported image
    * extensions, case-insensitive (reference:
    * `image_extensions = {'.jpg','.jpeg','.png'}`,
    * `with_colpali_v1.3/...py:146,153-156`). */
  def imageScanFilter(pathed: DataFrame, pathCol: String = "relative_path"): DataFrame =
    pathed.filter(
      lower(substring_index(col(pathCol), ".", -1)).isin("jpg", "jpeg", "png"))

  /** One real on-disk corpus tree per dataset, synthesized from the
    * documents fixture with the [[withPaths]] layout
    * (`<source>/doc_<id>.<ext>`, file bytes = the UTF-8 text): the
    * target of the REAL filesystem ingestion path — Spark's binaryFile
    * source with recursive lookup, the engine's analog of the
    * reference's `rglob` scan
    * (`with_colpali_v1.3/...py:143-163`,
    * `shared/get_all_folder_details.py:57-78`). The synthesis itself is
    * a driver loop over fixture rows — test scaffolding, not the
    * operator; at scale the tree already exists, which is the point.
    *
    * The tree is persisted PER FIXTURE DIR (a content-keyed path under
    * the system temp dir, committed by atomic rename with a _SUCCESS
    * marker), not per JVM: every bench/verify JVM after the first
    * reuses it, so the driver synthesis loop never sits inside a timed
    * query again (the r8 a3_binary_scan variance suspect). Concurrent
    * builders race benignly — the loser's staging dir is discarded. */
  private val treeCache = scala.collection.mutable.Map.empty[String, String]

  def binaryTree(spark: org.apache.spark.sql.SparkSession, sfDir: String): String =
    synchronized {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      val canon = Paths.get(sfDir).toRealPath().toString
      // the MEMO KEY is path + CONTENT stamps of documents.parquet:
      // the fixture is regenerated in place between rounds, and a
      // path-only key (cross-JVM or in-JVM) would reuse a STALE tree
      // against the fresh documents — the worst failure mode of
      // persistence (silent data mismatch). Stamps are a stat walk,
      // recomputed per call, so an in-place regen mid-JVM also misses.
      val key = graft.Tables.contentStamp(s"$canon/documents.parquet")
      treeCache.getOrElseUpdate(key, {
        val base = Paths.get(System.getProperty("java.io.tmpdir"), s"graft_tree_$key")
        if (!Files.exists(base.resolve("_SUCCESS"))) {
          val stage = Files.createTempDirectory(base.getParent, s"graft_tree_${key}_stage")
          withPaths(spark.read.parquet(s"$sfDir/documents.parquet"))
            .select(col("relative_path"), col("text")).collect()
            .foreach { r =>
              val p = stage.resolve(r.getString(0))
              Files.createDirectories(p.getParent)
              Files.write(p, r.getString(1).getBytes("UTF-8"))
            }
          Files.write(stage.resolve("_SUCCESS"), Array.emptyByteArray)
          try Files.move(stage, base, StandardCopyOption.ATOMIC_MOVE)
          catch {
            // ATOMIC_MOVE surfaces a raw FileSystemException for a
            // non-empty target (not DirectoryNotEmptyException); any
            // move failure MIGHT be a lost race — drop our staging and
            // let the marker check below adjudicate
            case _: java.nio.file.FileSystemException =>
              val walk = Files.walk(stage)
              try walk.sorted(java.util.Comparator.reverseOrder())
                .forEach(p => Files.deleteIfExists(p))
              finally walk.close()
          }
          // whether built, raced, or neither: the tree must actually
          // be committed — a swallowed failure would cache a path that
          // does not exist and poison every later scan in this JVM
          require(Files.exists(base.resolve("_SUCCESS")),
            s"binaryTree commit failed: $base has no _SUCCESS marker " +
              "(move failed without a competing builder?)")
        }
        base.toString
      })
    }

  /** A3 over a REAL directory tree: binaryFile source, recursive
    * lookup — returns (relative_path, n_bytes) without reading file
    * contents (column pruning keeps the scan to file-status metadata).
    * The suffix filter is the same ANY-case `lower(suffix)` predicate
    * as [[imageScanFilter]], applied post-listing: a glob would need
    * every case variant enumerated (`*.Jpg` silently slips through)
    * and could drift from the tabular semantics the oracle encodes.
    * ZERO-LENGTH files never appear: Spark's file-source planner emits
    * no partition for an empty file — documented engine behavior the
    * oracle mirrors (a 0-byte "image" is also undecodable, so A4 would
    * drop it one stage later anyway). */
  def binaryScan(spark: org.apache.spark.sql.SparkSession, root: String): DataFrame =
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(root)
      .select(
        regexp_replace(col("path"),
          "^.*" + java.util.regex.Pattern.quote(root) + "/", "").as("relative_path"),
        col("length").as("n_bytes"))
      .filter(lower(substring_index(col("relative_path"), ".", -1))
        .isin("jpg", "jpeg", "png"))

  /** A4: fault-tolerant decode. Real image decoding is stubbed (no
    * image libs in this environment — SURVEY.md §7.3): a deterministic
    * subset plays the corrupt files (reference drops them and counts:
    * `load_image` → None, `with_colpali_v1.3/...py:165-173`). */
  def tolerantDecode(scanned: DataFrame): DataFrame =
    scanned.withColumn("decode_ok", col("doc_id") % 97 =!= 0)

  /** C3: run counters — processed/failed, exactly the reference's
    * `stats` dict (`with_colpali_v1.3/...py:113,212,272-286`). */
  def decodeStats(decoded: DataFrame): DataFrame =
    decoded
      .groupBy(when(col("decode_ok"), lit("processed")).otherwise(lit("failed")).as("status"))
      .agg(count(lit(1)).as("n"))

  /** A6: model-batch assignment — contiguous groups of `batchSize` in
    * id order, the DataLoader/slicing semantics
    * (`with_colpali_v1.3/...py:220-238`, `with_vdr-2b-multi-v1/...py:185-186`).
    * Note: a global row_number is a single-partition window — fine for
    * bounded metadata, but at 100 TB batching is done per-partition
    * inside mapPartitions (iterator.grouped), which needs no global
    * order. This operator exists to pin the *semantics* for the oracle.
    */
  def withBatchId(df: DataFrame, orderCol: String, batchSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rn = row_number().over(Window.orderBy(col(orderCol)))
    df.withColumn("batch_id", ((rn - 1) / batchSize).cast("long"))
  }

  /** B6: point construction — {id, vector, payload}, the PointStruct
    * assembly at `with_colpali_v1.3/...py:256-269`. Deterministic id =
    * portable polynomial hash of full_path (F5; the reference's uuid4
    * is nondeterministic and makes re-indexing duplicate — SURVEY.md
    * §7.6). `indexed_at` is real wall-clock (F6), excluded from
    * oracle-compared output. */
  def buildPoints(decoded: DataFrame, dim: Int = Embedder.DefaultDim): DataFrame =
    decoded
      .filter(col("decode_ok"))
      .withColumn("point_id", Embedder.stringHash64(col("full_path")))
      .withColumn("_th", Embedder.tokenHashes(col("text")))
      .withColumn("embedding", Embedder.embedRaw(col("_th"), dim))
      .withColumn("filename", element_at(split(col("relative_path"), "/"), -1))
      .withColumn("folder", col("source"))
      .withColumn("indexed_at", current_timestamp())
      .drop("_th")

  /** [[buildPoints]] with embeddings computed through the
    * [[ModelEmbedder]] inference seam instead of the columnar
    * expressions: executor-side `mapPartitions` batches (the
    * reference's DataLoader shape), one token matrix per document.
    * With the default [[FeatureHashModel]] the single-vector output is
    * bit-equal to [[buildPoints]] (EmbedderSeamSpec), so a real model
    * backend swaps in by passing a different `model` — every
    * downstream query, sink, and search is untouched. Multi-vector
    * models keep the full matrix in `mv`; `embedding` is its first
    * row (the CLS/pooled-vector convention). */
  def buildPointsWith(
      decoded: DataFrame,
      model: ModelEmbedder,
      batchSize: Int = 16): DataFrame =
    ModelEmbedder.embedWith(decoded.filter(col("decode_ok")), "text", model, batchSize)
      .withColumn("point_id", Embedder.stringHash64(col("full_path")))
      .withColumn("embedding", element_at(col("mv"), 1).cast("array<double>"))
      .withColumn("filename", element_at(split(col("relative_path"), "/"), -1))
      .withColumn("folder", col("source"))
      .withColumn("indexed_at", current_timestamp())

  /** B6 with the reference's SCHEMALESS payload: a `map<string,string>`
    * whose keys are caller-supplied and may differ per row — the
    * `**batch_meta[j]` splat of
    * `with_jina_text_v4/jina_v4_text_indexer.py:122-127`. A base
    * payload (filename/folder/source tag) is merged with a key present
    * only on some rows; consumers filter with `element_at` on map keys
    * (E4) and coalesce missing keys to 'Unknown' (D3). This closes the
    * fixed-StructType deviation of SURVEY §1.3 for payloads that
    * genuinely vary per caller. */
  def buildPointsDynamic(decoded: DataFrame, dim: Int = Embedder.DefaultDim): DataFrame =
    decoded
      .filter(col("decode_ok"))
      .withColumn("point_id", Embedder.stringHash64(col("full_path")))
      .withColumn("_th", Embedder.tokenHashes(col("text")))
      .withColumn("embedding", Embedder.embedRaw(col("_th"), dim))
      .withColumn("payload",
        map_concat(
          map(
            lit("filename"), element_at(split(col("relative_path"), "/"), -1),
            lit("folder"), col("source"),
            lit("source"), lit("document")),
          when(col("doc_id") % 2 === 0, map(lit("parity"), lit("even")))
            .otherwise(typedlit(Map.empty[String, String]))))
      .drop("_th")
}
