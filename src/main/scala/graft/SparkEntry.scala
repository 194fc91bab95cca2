package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.search.TopK
import graft.index.Embedder
import graft.Tables.t

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 gets one entry in [[queries]] and a
  * DuckDB-equivalent SQL in [[oracleSql]] (same column names, total
  * ORDER BY, scores ROUND(...,6) in double math — SURVEY.md §7.6
  * determinism rules).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's core question: top-5 most similar vectors to a
    * query vector (D1). */
  def entry(spark: SparkSession): DataFrame =
    queries("d1_topk_dense")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------
  // Shared builders
  // ---------------------------------------------------------------

  /** One-row broadcast frame holding the query vector (the reference
    * embeds the query once on the driver — B5). */
  private def queryVec(e: DataFrame, id: Long): DataFrame =
    e.filter(col("vec_id") === id).select(col("embedding").as("q"))

  /** DuckDB portable cosine over DOUBLE[] expressions. */
  private def duckCos(a: String, b: String): String =
    s"list_cosine_similarity(($a)::DOUBLE[], ($b)::DOUBLE[])"

  // ---------------------------------------------------------------
  // Queries (SURVEY.md §2 inventory keys in the name prefix)
  // ---------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    searchQueries ++ ingestQueries ++ graft.search.QueryApis.queries ++ graft.search.Formula.queries ++ graft.search.Filters.queries ++ graft.ops.Dedup.queries ++ graft.ops.Similarity.queries ++ graft.ops.Quantize.queries ++ graft.ops.TextAnalysis.queries ++ graft.ops.Relational.queries ++ graft.ops.Curation.queries ++ graft.ops.Skew.queries ++ graft.ops.Retrieval.queries ++ graft.streaming.Streams.queries ++ graft.multimodal.Multimodal.queries

  def oracleSql: Map[String, String] =
    searchOracles ++ ingestOracles ++ graft.search.QueryApis.oracles ++ graft.search.Formula.oracles ++ graft.search.Filters.oracles ++ graft.ops.Dedup.oracles ++ graft.ops.Similarity.oracles ++ graft.ops.Quantize.oracles ++ graft.ops.TextAnalysis.oracles ++ graft.ops.Relational.oracles ++ graft.ops.Curation.oracles ++ graft.ops.Skew.oracles ++ graft.ops.Retrieval.oracles ++ graft.streaming.Streams.oracles ++ graft.multimodal.Multimodal.oracles

  private def searchQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // D1: dense top-k cosine search (query = vector of point 0).
    "d1_topk_dense" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      TopK.dense(e, queryVec(e, 0), "vec_id", "embedding", 5)
    }),

    // D1 under Qdrant Distance.EUCLID: same scan→score→cut plan, but
    // distance ranks ASC (smaller = closer).
    "d1_topk_euclid" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      TopK.dense(e, queryVec(e, 0), "vec_id", "embedding", 5, metric = "euclid")
    }),

    // D1 under Qdrant Distance.MANHATTAN.
    "d1_topk_manhattan" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      TopK.dense(e, queryVec(e, 0), "vec_id", "embedding", 5, metric = "manhattan")
    }),

    // D1 under Qdrant Distance.DOT on RAW (unnormalized) vectors —
    // magnitude matters, so the ranking can differ from cosine's
    // (unlike d1_topk_prenorm, where dot IS cosine by construction).
    "d1_topk_dot" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      TopK.dense(e, queryVec(e, 0), "vec_id", "embedding", 5, metric = "dot")
    }),

    // D1 with Qdrant's score_threshold: hits below the floor drop
    // before the cut, so fewer than k rows may return.
    "d1_score_threshold" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      TopK.dense(e, queryVec(e, 0), "vec_id", "embedding", 20,
        scoreThreshold = Some(0.3))
    }),

    // E4: payload-filtered search — metadata predicate below scoring,
    // pushed down to the parquet scan.
    "e4_topk_filtered" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      TopK.dense(e, queryVec(e, 0), "vec_id", "embedding", 5,
        payloadFilter = col("label") === 3)
    }),

    // F1: cosine kernel over the full table (not just top-k path).
    "f1_cosine_scores" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      e.crossJoin(broadcast(queryVec(e, 0)))
        .select(col("vec_id"),
          round(graft.vector.Kernels.cosine(col("embedding"), col("q")), 6).as("score"))
        .orderBy(col("vec_id"))
    }),

    // F3: l2norm kernel (fixture vectors are unit-norm; verifies both
    // the kernel and the fixture property).
    "f3_l2norm" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      e.select(col("vec_id"),
          round(graft.vector.Kernels.l2norm(col("embedding")), 6).as("nrm"))
        .orderBy(col("vec_id"))
    }),

    // F7: the pure-SQL surface — the same top-k as d1, but written as
    // a spark.sql(...) string against the `cosine_sim` function that
    // GraftExtensions injects into the session. Proves the SQL entry
    // point resolves to the native codegen'd expression and is gated
    // by the same oracle as the DataFrame path.
    "f7_sql_surface" -> ((s, dir) => {
      t(s, dir, "embeddings").createOrReplaceTempView("graft_embeddings")
      s.sql(
        """SELECT e.vec_id, ROUND(cosine_sim(e.embedding, q.embedding), 6) AS score
          |FROM graft_embeddings e,
          |  (SELECT embedding FROM graft_embeddings WHERE vec_id = 0) q
          |ORDER BY score DESC, vec_id ASC LIMIT 5""".stripMargin)
    }),

    // E1 optimization path: normalize at ingest (what Qdrant does for
    // cosine collections), then search is a pure dot product — at
    // scale this halves the per-candidate FLOPs and the norm is paid
    // once per write instead of once per (query × row).
    "d1_topk_prenorm" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val norm = e.select(col("vec_id"),
        graft.vector.Kernels.normalize(col("embedding")).as("nv"))
      val q = norm.filter(col("vec_id") === 0).select(col("nv").as("qn"))
      norm.crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(graft.vector.Kernels.dot(col("nv"), col("qn")), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(5)
    }),

    // D2/F2: MaxSim late-interaction top-k over the multi-vector fixture.
    "d2_topk_maxsim" -> ((s, dir) => {
      val docs = Tables.multiVectorDocs(t(s, dir, "embeddings"))
      val q = docs.filter(col("doc_id") === 0).select(col("vecs").as("q"))
      TopK.maxSim(docs, q, "doc_id", "vecs", 5)
    }),

    // D2 + E1: MaxSim over token vectors normalized at ingest — the
    // multi-vector twin of d1_topk_prenorm. Rows are normalized BEFORE
    // grouping into matrices (one normalize per stored token, never a
    // norm recomputed inside the scoring loop), so the late-interaction
    // inner loop is a pure dot product.
    "d2_maxsim_prenorm" -> ((s, dir) => {
      val n = t(s, dir, "embeddings")
        .select((col("vec_id") % 50).as("doc_id"), col("vec_id"),
          graft.vector.Kernels.normalize(col("embedding")).as("nv"))
      val docs = n.groupBy(col("doc_id"))
        .agg(collect_list(struct(col("vec_id"), col("nv"))).as("tv"))
        .select(col("doc_id"),
          transform(array_sort(col("tv")), x => x.getField("nv")).as("vecs"))
      val q = docs.filter(col("doc_id") === 0).select(col("vecs").as("qvecs"))
      docs.crossJoin(broadcast(q))
        .select(col("doc_id"),
          round(graft.vector.Kernels.maxsimDot(col("qvecs"), col("vecs")), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(5)
    }),

    // D3: result projection with 'Unknown' defaults for absent payload
    // (reference format_results: payload.get(k,'Unknown')).
    "d3_result_format" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val d = t(s, dir, "documents")
      val hits = TopK.dense(e, queryVec(e, 0), "vec_id", "embedding", 5)
      // payload join: doc_id == vec_id (both deterministic fixture ids);
      // left join so hits without payload exercise the Unknown path.
      val payload = d.select(col("doc_id"),
        concat(col("source"), lit("/doc_"), col("doc_id"), lit(".png")).as("full_path"),
        when(col("source") =!= "src0", col("source")).as("folder"))
      val joined = hits.join(broadcast(payload), hits("vec_id") === payload("doc_id"), "left")
      TopK.formatResults(joined, Seq("vec_id", "score"), Seq("full_path", "folder"))
        .orderBy(col("score").desc, col("vec_id").asc)
    })
  )

  // ---------------------------------------------------------------
  // Ingest pipeline (SURVEY.md §2 A3–A6, B4/B6, C2–C3)
  // ---------------------------------------------------------------

  import graft.index.{Ingest, Sink}

  /** documents with synthesized corpus paths (shared CTE, DuckDB side). */
  private val duckPathed: String =
    "SELECT *, source || '/doc_' || doc_id || '.' || " +
      "(['png','JPG','jpeg','txt','PNG','jpg','JPEG','gif'])[(doc_id % 8 + 1)::INT] AS relative_path, " +
      "'/data/corpus/' || source || '/doc_' || doc_id || '.' || " +
      "(['png','JPG','jpeg','txt','PNG','jpg','JPEG','gif'])[(doc_id % 8 + 1)::INT] AS full_path " +
      "FROM documents"

  private val duckScanned: String =
    s"SELECT * FROM pathed WHERE lower(string_split(relative_path, '.')[-1]) IN ('jpg','jpeg','png')"

  private def ingestQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A3: case-insensitive suffix scan filter over synthesized paths.
    "a3_scan_filter" -> ((s, dir) => {
      Ingest.imageScanFilter(Ingest.withPaths(t(s, dir, "documents")))
        .select(col("doc_id"), col("relative_path"))
        .orderBy(col("doc_id"))
    }),

    // A3 over a REAL directory tree: synthesize the corpus as actual
    // files once per dataset, then scan with the binaryFile source
    // (recursiveFileLookup + pathGlobFilter — the reference's rglob,
    // with_colpali_v1.3/...py:143-163). Oracle recomputes the same
    // listing from the tabular fixture (size = UTF-8 byte length).
    "a3_binary_scan" -> ((s, dir) => {
      Ingest.binaryScan(s, Ingest.binaryTree(s, dir))
        .orderBy(col("relative_path"))
    }),

    // A4+C3: tolerant decode with processed/failed counters.
    "a4_decode_stats" -> ((s, dir) => {
      Ingest.decodeStats(Ingest.tolerantDecode(
        Ingest.imageScanFilter(Ingest.withPaths(t(s, dir, "documents")))))
        .orderBy(col("status"))
    }),

    // A6: model-batch assignment (contiguous id-ordered groups of 16).
    "a6_batching" -> ((s, dir) => {
      val scanned = Ingest.imageScanFilter(Ingest.withPaths(t(s, dir, "documents")))
      Ingest.withBatchId(scanned, "doc_id", 16)
        .groupBy(col("batch_id")).agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_doc"))
        .orderBy(col("batch_id"))
    }),

    // B6: point construction — deterministic id, payload fields, and
    // exact embedding scalars (raw signed-count components are exact
    // integers in double, so directly comparable).
    "b6_point_build" -> ((s, dir) => {
      val pts = Ingest.buildPoints(Ingest.tolerantDecode(
        Ingest.imageScanFilter(Ingest.withPaths(t(s, dir, "documents")))))
      pts.select(col("doc_id"), col("point_id"), col("filename"), col("folder"),
          element_at(col("embedding"), 1).as("e0"),
          round(graft.vector.Kernels.l2norm(col("embedding")), 6).as("nrm"))
        .orderBy(col("doc_id"))
    }),

    // B4+D1: the full ingest→search pipeline — embed every document
    // text with the deterministic embedder, embed the query (doc 0's
    // text), dense cosine top-5. The flagship end-to-end proof.
    "b4_embed_topk" -> ((s, dir) => {
      // spread the unsplittable single-file corpus before the
      // compute-bound embedding map (high compute-per-byte stage)
      val emb = t(s, dir, "documents")
        .repartition(col("doc_id"))
        .withColumn("_th", Embedder.tokenHashes(col("text")))
        .select(col("doc_id"), Embedder.embedRaw(col("_th")).as("v"))
      val q = emb.filter(col("doc_id") === 0).select(col("v").as("q"))
      emb.crossJoin(broadcast(q))
        .select(col("doc_id"),
          round(graft.vector.Kernels.cosine(col("v"), col("q")), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(5)
    }),

    // C2/§7.4.7: incremental re-ingest — anti-join on deterministic
    // point ids so re-indexing is idempotent (fixes the reference's
    // uuid4 duplicate-on-reindex).
    "c2_incremental" -> ((s, dir) => {
      val pts = Ingest.buildPoints(Ingest.tolerantDecode(
        Ingest.imageScanFilter(Ingest.withPaths(t(s, dir, "documents")))))
      val existing = pts.filter(col("doc_id") < 100)
      Sink.incremental(pts, existing, "point_id")
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    // E4 over a DYNAMIC payload: points carry a schemaless
    // map<string,string> payload (caller-splatted keys, present on
    // only some rows — the reference's **batch_meta dict); the search
    // filters on a map key with element_at and D3-coalesces a key
    // that's absent on odd rows.
    "e4_payload_map" -> ((s, dir) => {
      val pts = Ingest.buildPointsDynamic(Ingest.tolerantDecode(
        Ingest.imageScanFilter(Ingest.withPaths(t(s, dir, "documents")))))
      // query = doc 1 (doc 0 is the planted decode failure, %97==0)
      val q = pts.filter(col("doc_id") === 1).select(col("embedding").as("qv"))
      pts.crossJoin(broadcast(q))
        .filter(element_at(col("payload"), "folder") === "src1")
        .select(col("doc_id"),
          round(graft.vector.Kernels.cosine(col("embedding"), col("qv")), 6).as("score"),
          element_at(col("payload"), "filename").as("filename"),
          coalesce(element_at(col("payload"), "parity"), lit("Unknown")).as("parity"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(5)
    }),

    // E4 full-text payload filter (Qdrant MatchText): restrict the
    // dense search to points whose text payload contains a WORD —
    // token-exact like Qdrant's word-based full-text index, not a
    // substring LIKE. The filter sits below scoring; on a real layout
    // the token test pushes into the scan's row-group filtering.
    "e4_text_match" -> ((s, dir) => {
      val emb = t(s, dir, "documents")
        .repartition(col("doc_id"))
        .withColumn("_th", Embedder.tokenHashes(col("text")))
        .select(col("doc_id"), col("text"), Embedder.embedRaw(col("_th")).as("v"))
      val q = emb.filter(col("doc_id") === 0).select(col("v").as("q"))
      emb.filter(array_contains(split(col("text"), " "), "merge"))
        .crossJoin(broadcast(q))
        .select(col("doc_id"),
          round(graft.vector.Kernels.cosine(col("v"), col("q")), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(5)
    }),

    // C2 replace-by-key upsert: re-indexing an EDITED document (same
    // path → same point_id, new text → new embedding) must REPLACE the
    // stale point, not skip or duplicate it (Qdrant client.upsert
    // overwrites by id — with_colpali_v1.3/...py:191-202). Round-trips
    // a real collection directory: index v1, upsertReplace edited v2
    // for every 10th doc, read the final state back.
    "c2_upsert_replace" -> ((s, dir) => {
      val pts = Ingest.buildPoints(Ingest.tolerantDecode(
        Ingest.imageScanFilter(Ingest.withPaths(t(s, dir, "documents")))))
        .select(col("doc_id"), col("point_id"), col("embedding"))
      val edited = Ingest.buildPoints(Ingest.tolerantDecode(
        Ingest.imageScanFilter(Ingest.withPaths(
          t(s, dir, "documents").filter(col("doc_id") % 10 === 0)
            .withColumn("text", concat(col("text"), lit(" edited zz")))))))
        .select(col("doc_id"), col("point_id"), col("embedding"))
      val colDir = java.nio.file.Files
        .createTempDirectory("graft_upsert").toFile.getAbsolutePath + "/col"
      pts.write.parquet(colDir)
      Sink.upsertReplace(s, edited, colDir, "point_id")
      s.read.parquet(colDir)
        .select(col("doc_id"), col("point_id"),
          element_at(col("embedding"), 1).as("e0"))
        .orderBy(col("doc_id"))
    }),

    // A1: PDF→page-image conversion dataflow — one row per (pdf, page)
    // with the reference's "{pdf}_page_{i}.png" naming
    // (shared/convert_pdf_to_image.py:87-91); the poppler render is
    // stubbed (deterministic page count), the explode is real.
    "a1_pdf_pages" -> ((s, dir) => {
      val pdfs = t(s, dir, "documents")
        .select(col("doc_id"), concat(lit("doc_"), col("doc_id"), lit(".pdf")).as("pdf"),
          (col("doc_id") % 5 + 1).as("n_pages"))
      pdfs.select(col("doc_id"), col("pdf"),
          explode(sequence(lit(1), col("n_pages"))).as("page"))
        .select(col("doc_id"), col("page"),
          concat(regexp_replace(col("pdf"), "\\.pdf$", ""),
            lit("_page_"), col("page"), lit(".png")).as("page_file"))
        .orderBy(col("doc_id"), col("page"))
    }),

    // A2: subfolder discovery — distinct immediate subdirectories of
    // the corpus root (get_subfolder_paths, shared/get_all_folder_details.py:23-54).
    "a2_subfolders" -> ((s, dir) => {
      Ingest.withPaths(t(s, dir, "documents"))
        .select(substring_index(col("relative_path"), "/", 1).as("folder"))
        .distinct()
        .orderBy(col("folder"))
    }),

    // A5: JSON text source — the sample_text_data.json array of
    // {id,title,content} projected to indexable rows
    // (with_jina_text_v4/jina_v4_text_indexer.py:144-161). JSON strings
    // are constructed identically in both engines, then parsed with
    // each engine's JSON path functions.
    "a5_json_source" -> ((s, dir) => {
      val j = t(s, dir, "documents").select(col("doc_id"),
        concat(lit("{\"id\": "), col("doc_id"),
          lit(", \"title\": \"Doc "), col("doc_id"),
          lit("\", \"content_len\": "), col("n_chars"), lit("}")).as("js"))
      j.select(col("doc_id"),
          get_json_object(col("js"), "$.title").as("title"),
          get_json_object(col("js"), "$.content_len").cast("long").as("content_len"))
        .orderBy(col("doc_id"))
    }),

    // F4: path functions — filename / parent / relative-to-base /
    // suffix, the Path(...) surface of the reference (SURVEY §2 F4).
    "f4_path_functions" -> ((s, dir) => {
      Ingest.withPaths(t(s, dir, "documents"))
        .select(col("doc_id"),
          element_at(split(col("full_path"), "/"), -1).as("filename"),
          regexp_replace(col("full_path"), "/[^/]+$", "").as("parent"),
          regexp_replace(col("full_path"), "^/data/corpus/", "").as("rel_path"),
          lower(substring_index(col("full_path"), ".", -1)).as("suffix"))
        .orderBy(col("doc_id"))
    }),

    // B1/B3: multi-vector document embedding — split each text into
    // 16-token chunks, embed each chunk (the ColBERT-style page→token
    // matrix shape of with_colpali_v1.3, ~1030×128d → here k×64d),
    // score with MaxSim against doc 0's matrix.
    "b1_multivec_embed" -> ((s, dir) => {
      val chunked = t(s, dir, "documents")
        .repartition(col("doc_id"))
        .withColumn("_th", Embedder.tokenHashes(col("text")))
        .withColumn("mv",
          transform(sequence(lit(0), ((size(col("_th")) - 1) / 16).cast("int")),
            i => Embedder.embedRaw(slice(col("_th"), i * 16 + 1, lit(16)))))
        .select(col("doc_id"), col("mv"))
      val q = chunked.filter(col("doc_id") === 0).select(col("mv").as("q"))
      chunked.crossJoin(broadcast(q))
        .select(col("doc_id"),
          round(graft.vector.Kernels.maxsim(col("q"), col("mv")), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(5)
    })
  )

  private def ingestOracles: Map[String, String] = Map(
    "a3_scan_filter" ->
      s"""WITH pathed AS ($duckPathed)
         |SELECT doc_id, relative_path FROM pathed
         |WHERE lower(string_split(relative_path, '.')[-1]) IN ('jpg','jpeg','png')
         |ORDER BY doc_id""".stripMargin,

    // strlen(text) > 0 mirrors Spark's file-source planning: a
    // ZERO-LENGTH file gets no partition, so it never appears in the
    // binaryFile scan (r10 perturbed-fixture drill — an empty doc's
    // empty image file was listed by the oracle, skipped by the scan)
    "a3_binary_scan" ->
      s"""WITH pathed AS ($duckPathed)
         |SELECT relative_path, strlen(text)::BIGINT AS n_bytes FROM pathed
         |WHERE lower(string_split(relative_path, '.')[-1]) IN ('jpg','jpeg','png')
         |  AND strlen(text) > 0
         |ORDER BY relative_path""".stripMargin,

    "a4_decode_stats" ->
      s"""WITH pathed AS ($duckPathed), scanned AS ($duckScanned)
         |SELECT CASE WHEN doc_id % 97 <> 0 THEN 'processed' ELSE 'failed' END AS status,
         |  count(*) AS n
         |FROM scanned GROUP BY 1 ORDER BY status""".stripMargin,

    "a6_batching" ->
      s"""WITH pathed AS ($duckPathed), scanned AS ($duckScanned),
         |b AS (SELECT doc_id, (row_number() OVER (ORDER BY doc_id) - 1) // 16 AS batch_id FROM scanned)
         |SELECT batch_id, count(*) AS n, min(doc_id) AS first_doc
         |FROM b GROUP BY batch_id ORDER BY batch_id""".stripMargin,

    "b6_point_build" ->
      s"""WITH pathed AS ($duckPathed), scanned AS ($duckScanned),
         |decoded AS (SELECT * FROM scanned WHERE doc_id % 97 <> 0),
         |pts AS (SELECT doc_id,
         |  ${Embedder.duckStringHash64("full_path")} AS point_id,
         |  string_split(relative_path, '/')[-1] AS filename,
         |  source AS folder,
         |  ${Embedder.duckEmbedRaw(Embedder.duckTokenHashes("text"))} AS embedding
         |  FROM decoded)
         |SELECT doc_id, point_id, filename, folder, embedding[1] AS e0,
         |  ROUND(sqrt(list_reduce(list_transform(embedding, x -> x*x), (a,b) -> a+b)), 6) AS nrm
         |FROM pts ORDER BY doc_id""".stripMargin,

    "b4_embed_topk" ->
      s"""WITH emb AS (SELECT doc_id, ${Embedder.duckEmbedRaw(Embedder.duckTokenHashes("text"))} AS v FROM documents),
         |q AS (SELECT v AS qv FROM emb WHERE doc_id = 0)
         |SELECT doc_id, ROUND(${duckCos("v", "qv")}, 6) AS score
         |FROM emb, q ORDER BY score DESC, doc_id ASC LIMIT 5""".stripMargin,

    "c2_incremental" ->
      s"""WITH pathed AS ($duckPathed), scanned AS ($duckScanned),
         |decoded AS (SELECT * FROM scanned WHERE doc_id % 97 <> 0),
         |pts AS (SELECT doc_id, ${Embedder.duckStringHash64("full_path")} AS point_id FROM decoded)
         |SELECT doc_id FROM pts i
         |WHERE NOT EXISTS (SELECT 1 FROM pts e WHERE e.doc_id < 100 AND e.point_id = i.point_id)
         |ORDER BY doc_id""".stripMargin,

    "e4_payload_map" ->
      s"""WITH pathed AS ($duckPathed), scanned AS ($duckScanned),
         |decoded AS (SELECT * FROM scanned WHERE doc_id % 97 <> 0),
         |pts AS (SELECT doc_id,
         |  string_split(relative_path, '/')[-1] AS filename,
         |  source AS folder,
         |  CASE WHEN doc_id % 2 = 0 THEN 'even' END AS parity,
         |  ${Embedder.duckEmbedRaw(Embedder.duckTokenHashes("text"))} AS v
         |  FROM decoded),
         |q AS (SELECT v AS qv FROM pts WHERE doc_id = 1)
         |SELECT doc_id, ROUND(${duckCos("v", "qv")}, 6) AS score, filename,
         |  COALESCE(parity, 'Unknown') AS parity
         |FROM pts, q WHERE folder = 'src1'
         |ORDER BY score DESC, doc_id ASC LIMIT 5""".stripMargin,

    "e4_text_match" ->
      s"""WITH emb AS (SELECT doc_id, text,
         |    ${Embedder.duckEmbedRaw(Embedder.duckTokenHashes("text"))} AS v FROM documents),
         |q AS (SELECT v AS qv FROM emb WHERE doc_id = 0)
         |SELECT doc_id, ROUND(${duckCos("v", "qv")}, 6) AS score
         |FROM emb, q WHERE list_contains(string_split(text, ' '), 'merge')
         |ORDER BY score DESC, doc_id ASC LIMIT 5""".stripMargin,

    "c2_upsert_replace" ->
      s"""WITH pathed AS ($duckPathed), scanned AS ($duckScanned),
         |decoded AS (SELECT * FROM scanned WHERE doc_id % 97 <> 0),
         |final AS (SELECT doc_id,
         |  ${Embedder.duckStringHash64("full_path")} AS point_id,
         |  ${Embedder.duckEmbedRaw(Embedder.duckTokenHashes(
        "CASE WHEN doc_id % 10 = 0 THEN text || ' edited zz' ELSE text END"))} AS embedding
         |  FROM decoded)
         |SELECT doc_id, point_id, embedding[1] AS e0
         |FROM final ORDER BY doc_id""".stripMargin,

    "a1_pdf_pages" ->
      """WITH pdfs AS (SELECT doc_id, 'doc_' || doc_id || '.pdf' AS pdf, doc_id % 5 + 1 AS n_pages FROM documents),
        |pages AS (SELECT doc_id, pdf, unnest(range(1, n_pages + 1)) AS page FROM pdfs)
        |SELECT doc_id, page, regexp_replace(pdf, '\.pdf$', '') || '_page_' || page || '.png' AS page_file
        |FROM pages ORDER BY doc_id, page""".stripMargin,

    "a2_subfolders" ->
      s"""WITH pathed AS ($duckPathed)
         |SELECT DISTINCT string_split(relative_path, '/')[1] AS folder
         |FROM pathed ORDER BY folder""".stripMargin,

    "a5_json_source" ->
      """WITH j AS (SELECT doc_id,
        |  '{"id": ' || doc_id || ', "title": "Doc ' || doc_id || '", "content_len": ' || n_chars || '}' AS js
        |  FROM documents)
        |SELECT doc_id, json_extract_string(js, '$.title') AS title,
        |  json_extract_string(js, '$.content_len')::BIGINT AS content_len
        |FROM j ORDER BY doc_id""".stripMargin,

    "f4_path_functions" ->
      s"""WITH pathed AS ($duckPathed)
         |SELECT doc_id, string_split(full_path, '/')[-1] AS filename,
         |  regexp_replace(full_path, '/[^/]+$$', '') AS parent,
         |  regexp_replace(full_path, '^/data/corpus/', '') AS rel_path,
         |  lower(string_split(full_path, '.')[-1]) AS suffix
         |FROM pathed ORDER BY doc_id""".stripMargin,

    "b1_multivec_embed" -> {
      val th = Embedder.duckTokenHashes("text")
      val chunkEmbed = Embedder.duckEmbedRaw("th[(ci*16+1):(ci*16+16)]")
      val cosSafe = (a: String, b: String) =>
        s"CASE WHEN list_sum(list_transform(($a)::DOUBLE[], x -> x*x)) * " +
          s"list_sum(list_transform(($b)::DOUBLE[], x -> x*x)) = 0 THEN NULL " +
          s"ELSE list_cosine_similarity(($a)::DOUBLE[], ($b)::DOUBLE[]) END"
      s"""WITH hashed AS (SELECT doc_id, $th AS th FROM documents),
         |chunked AS (SELECT doc_id,
         |  list_transform(range(0, ((len(th) - 1) // 16) + 1), ci -> $chunkEmbed) AS mv
         |  FROM hashed),
         |q AS (SELECT mv AS qm FROM chunked WHERE doc_id = 0)
         |SELECT doc_id, ROUND(list_reduce(list_transform(qm, qv ->
         |  list_aggregate(list_transform(mv, dv -> ${cosSafe("qv", "dv")}), 'max')), (a,b) -> a+b), 6) AS score
         |FROM chunked, q ORDER BY score DESC, doc_id ASC LIMIT 5""".stripMargin
    }
  )

  private def searchOracles: Map[String, String] = Map(
    "d1_topk_dense" ->
      s"""SELECT vec_id, ROUND(${duckCos("embedding", "SELECT embedding FROM embeddings WHERE vec_id = 0")}, 6) AS score
         |FROM embeddings ORDER BY score DESC, vec_id ASC LIMIT 5""".stripMargin,

    "d1_topk_euclid" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id,
         |  ROUND(sqrt(list_sum(list_transform(range(1, 65),
         |    i -> ((e.embedding::DOUBLE[])[i] - qv[i]) * ((e.embedding::DOUBLE[])[i] - qv[i])))), 6) AS score
         |FROM embeddings e CROSS JOIN q
         |ORDER BY score ASC, vec_id ASC LIMIT 5""".stripMargin,

    "d1_topk_manhattan" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id,
         |  ROUND(list_sum(list_transform(range(1, 65),
         |    i -> abs((e.embedding::DOUBLE[])[i] - qv[i]))), 6) AS score
         |FROM embeddings e CROSS JOIN q
         |ORDER BY score ASC, vec_id ASC LIMIT 5""".stripMargin,

    "d1_topk_dot" ->
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id,
         |  ROUND(list_sum(list_transform(range(1, 65),
         |    i -> (e.embedding::DOUBLE[])[i] * qv[i])), 6) AS score
         |FROM embeddings e CROSS JOIN q
         |ORDER BY score DESC, vec_id ASC LIMIT 5""".stripMargin,

    "e4_topk_filtered" ->
      s"""SELECT vec_id, ROUND(${duckCos("embedding", "SELECT embedding FROM embeddings WHERE vec_id = 0")}, 6) AS score
         |FROM embeddings WHERE label = 3 ORDER BY score DESC, vec_id ASC LIMIT 5""".stripMargin,

    "d1_score_threshold" ->
      s"""WITH sc AS (SELECT vec_id,
         |    ROUND(${duckCos("embedding", "SELECT embedding FROM embeddings WHERE vec_id = 0")}, 6) AS score
         |  FROM embeddings)
         |SELECT vec_id, score FROM sc WHERE score >= 0.3
         |ORDER BY score DESC, vec_id ASC LIMIT 20""".stripMargin,

    "f1_cosine_scores" ->
      s"""SELECT vec_id, ROUND(${duckCos("embedding", "SELECT embedding FROM embeddings WHERE vec_id = 0")}, 6) AS score
         |FROM embeddings ORDER BY vec_id""".stripMargin,

    "f7_sql_surface" ->
      s"""SELECT vec_id, ROUND(${duckCos("embedding", "SELECT embedding FROM embeddings WHERE vec_id = 0")}, 6) AS score
         |FROM embeddings ORDER BY score DESC, vec_id ASC LIMIT 5""".stripMargin,

    "d1_topk_prenorm" ->
      s"""WITH n AS (SELECT vec_id, list_transform(embedding::DOUBLE[],
         |    x -> x / sqrt(list_reduce(list_transform(embedding::DOUBLE[], y -> y*y), (a,b) -> a+b))) AS nv
         |  FROM embeddings),
         |q AS (SELECT nv AS qn FROM n WHERE vec_id = 0)
         |SELECT vec_id, ROUND(list_inner_product(nv, qn), 6) AS score
         |FROM n, q ORDER BY score DESC, vec_id ASC LIMIT 5""".stripMargin,

    "d2_maxsim_prenorm" ->
      s"""WITH n AS (SELECT vec_id, vec_id % 50 AS doc_id,
         |    list_transform(embedding::DOUBLE[],
         |      x -> x / sqrt(list_reduce(list_transform(embedding::DOUBLE[], y -> y*y), (a,b) -> a+b))) AS nv
         |  FROM embeddings),
         |docs AS (SELECT doc_id, list(nv ORDER BY vec_id) AS vecs FROM n GROUP BY doc_id),
         |q AS (SELECT vecs AS qvecs FROM docs WHERE doc_id = 0)
         |SELECT doc_id, ROUND(list_reduce(list_transform(qvecs, qv ->
         |    list_aggregate(list_transform(vecs, dv -> list_inner_product(qv, dv)), 'max')), (a,b) -> a+b), 6) AS score
         |FROM docs, q ORDER BY score DESC, doc_id ASC LIMIT 5""".stripMargin,

    "f3_l2norm" ->
      """SELECT vec_id, ROUND(sqrt(list_reduce(list_transform(embedding::DOUBLE[], x -> x*x), (a,b) -> a+b)), 6) AS nrm
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "d2_topk_maxsim" ->
      s"""WITH docs AS (${Tables.duckMultiVectorDocs}),
         |q AS (SELECT vecs AS qvecs FROM docs WHERE doc_id = 0)
         |SELECT doc_id, ROUND(list_reduce(list_transform(qvecs, qv ->
         |  list_aggregate(list_transform(vecs, dv -> ${duckCos("qv", "dv")}), 'max')), (a,b) -> a+b), 6) AS score
         |FROM docs, q ORDER BY score DESC, doc_id ASC LIMIT 5""".stripMargin,

    "d3_result_format" ->
      s"""WITH hits AS (
         |  SELECT vec_id, ROUND(${duckCos("embedding", "SELECT embedding FROM embeddings WHERE vec_id = 0")}, 6) AS score
         |  FROM embeddings ORDER BY score DESC, vec_id ASC LIMIT 5)
         |SELECT h.vec_id, h.score,
         |  COALESCE(d.source || '/doc_' || d.doc_id || '.png', 'Unknown') AS full_path,
         |  COALESCE(CASE WHEN d.source <> 'src0' THEN d.source END, 'Unknown') AS folder
         |FROM hits h LEFT JOIN documents d ON h.vec_id = d.doc_id
         |ORDER BY h.score DESC, h.vec_id ASC""".stripMargin
  )
}
