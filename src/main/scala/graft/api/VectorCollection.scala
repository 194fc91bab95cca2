package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.search.TopK
import graft.index.Sink

/** User-facing collection API — the surface a user of the reference
  * actually programs against, mapped 1:1 from the Qdrant client calls:
  *
  *  - `VectorCollection.ensure(...)`  ↔ `ensure_collection_exists`
  *    (`with_colpali_v1.3/incremental_indexing_colpali_with_qdrant.py:116-141`)
  *  - `upsert(points)`               ↔ `client.upsert(collection, points, wait=True)`
  *    (`...py:191-202`; job completion is the wait)
  *  - `count`                        ↔ `client.get_collection().points_count` (`...py:284`)
  *  - `search(vec, k, filter)`       ↔ `client.query_points(collection, query, limit, ...)`
  *    (`with_vdr-2b-multi-v1/query_vdr_2b_multi_v1.py:78-83`) + payload filter (E4)
  *  - `searchMaxSim(vecs, k)`        ↔ same with MAX_SIM comparator
  *    (`with_colpali_v1.3/qdrant_query_with_colpali.py:106-116`)
  *
  * A collection is a parquet dataset directory with a fixed schema:
  * id column, vector column (dense `array<float>`/`array<double>` or
  * multi-vector `array<array<...>>`), payload columns. Config is
  * declared once at [[VectorCollection.ensure]] like Qdrant's
  * VectorParams and persisted in `_graft_meta.json`.
  *
  * Scale: `upsert` appends (or anti-join dedups when `incremental`);
  * partitioning the directory by a cluster/bucket column turns probes
  * into partition-pruned scans (ScaleDesignSpec shows the plan).
  */
final case class CollectionConfig(
    idCol: String,
    vectorCol: String,
    dim: Int,
    multiVector: Boolean,
    /** Qdrant custom sharding (`shard_key_selector`): when set, writes
      * partition the collection directory by this payload column and
      * shard-routed searches prune to the shard's subtree. */
    shardCol: Option[String] = None,
    /** Qdrant named vectors (`vectors_config` as a name→VectorParams
      * map): each name maps to (column, dim). The Spark-native layout
      * is ONE COLUMN PER NAME, not a map column — a search `using` one
      * name column-prunes to that vector's bytes at the scan, so a
      * point carrying five embeddings pays for one (plan-asserted in
      * VectorCollectionSpec). `vectorCol`/`dim` stay the default
      * (unnamed) vector; named vectors are additive. */
    namedVectors: Map[String, (String, Int)] = Map.empty,
    /** Qdrant `Distance` for the default vector: `cosine` (default),
      * `dot`, `euclid`, or `manhattan`. Distance metrics rank ASC and
      * flip score_threshold to a ceiling — see [[TopK.dense]]. */
    distance: String = "cosine",
    /** Qdrant sparse named vectors (`sparse_vectors_config`): name →
      * (indicesCol, valuesCol). The Spark-native layout is two
      * parallel array columns per name — `array<int>` dimension ids
      * and `array<float>` weights — so sparse bytes are scanned only
      * by sparse searches (column pruning), and a point's dense and
      * sparse representations coexist like Qdrant's named-vector map.
      * Scoring is always DOT (Qdrant fixes sparse distance to Dot). */
    sparseVectors: Map[String, (String, String)] = Map.empty)

/** Qdrant `get_collection` result: live counters + declared config. */
final case class CollectionInfo(
    pointsCount: Long,
    segmentsCount: Int,
    config: CollectionConfig)

/** Qdrant `with_payload` response selector: all payload columns, none,
  * or a named subset (unknown names rejected by name — not silently
  * dropped). Payload columns are everything in the collection schema
  * that is not the id, the default vector, or a named vector. */
sealed trait PayloadSelector
object PayloadSelector {
  /** `with_payload=True`: every payload column. */
  case object All extends PayloadSelector
  /** `with_payload=False`: ids/scores only. */
  case object NoPayload extends PayloadSelector
  /** `with_payload=["a","b"]`: the named subset, in the given order. */
  final case class Subset(cols: Seq[String]) extends PayloadSelector
}

/** One operation of a Qdrant `batch_update_points` call. */
sealed trait PointsOp
final case class UpsertOp(points: DataFrame) extends PointsOp
final case class UpsertReplaceOp(points: DataFrame) extends PointsOp
final case class DeleteOp(ids: Seq[Long]) extends PointsOp
final case class SetPayloadOp(
    filter: Column, payloadCol: String, key: String, value: String) extends PointsOp
final case class DeletePayloadOp(
    filter: Column, payloadCol: String, key: String) extends PointsOp
final case class ClearPayloadOp(filter: Column, payloadCol: String) extends PointsOp
final case class UpdateVectorsOp(vecs: Map[Long, Seq[Float]]) extends PointsOp

class VectorCollection private (
    val spark: SparkSession,
    val path: String,
    val config: CollectionConfig) {

  private[api] def table: DataFrame = spark.read.parquet(path)

  /** C2: synchronous batch upsert. Returns the number of rows written
    * by this call; the reference's `processed == points_count` parity
    * check is `count` (kept separate so per-batch writes don't pay an
    * O(collection) scan). */
  def upsert(points: DataFrame): Long =
    Sink.append(points, path, config.shardCol.toSeq)

  /** Incremental upsert: skip ids already present (fixes the
    * reference's duplicate-on-reindex; SURVEY.md §7.6). Returns rows
    * actually written (0 when everything already existed). */
  def upsertIncremental(points: DataFrame): Long = {
    val fresh = Sink.incremental(points, table, config.idCol)
    Sink.append(fresh, path, config.shardCol.toSeq)
  }

  /** True Qdrant upsert: REPLACE points whose id already exists, append
    * the rest (`client.upsert` overwrites by id — the semantics a
    * re-index-after-edit needs). File-level MERGE; see
    * [[graft.index.Sink.upsertReplace]]. */
  def upsertReplace(points: DataFrame): Long = {
    // the file-granular MERGE appends unpartitioned survivors, which
    // would corrupt a directory-partitioned shard layout — fail loudly
    // rather than quietly flatten the collection
    require(config.shardCol.isEmpty,
      "upsertReplace on a sharded collection is not supported; " +
        "delete+upsert within the shard instead")
    Sink.upsertReplace(spark, points, path, config.idCol)
  }

  /** points_count. */
  def count: Long = table.count()

  /** D1+E4: dense top-k cosine search with optional payload filter and
    * Qdrant's `score_threshold` (hits below the floor drop before the
    * cut — fewer than k rows may return). */
  def search(
      queryVec: Seq[Float], k: Int = 5, filter: Column = lit(true),
      scoreThreshold: Option[Double] = None): DataFrame = {
    require(!config.multiVector, "dense search on a multi-vector collection")
    require(queryVec.length == config.dim,
      s"query dim ${queryVec.length} != collection dim ${config.dim}")
    val q = spark.range(1).select(typedlit(queryVec).as("q"))
    TopK.dense(table, q, config.idCol, config.vectorCol, k,
      payloadFilter = filter, scoreThreshold = scoreThreshold,
      metric = config.distance)
  }

  /** D2: MaxSim late-interaction top-k for multi-vector collections. */
  def searchMaxSim(queryVecs: Seq[Seq[Float]], k: Int = 5): DataFrame = {
    require(config.multiVector, "maxsim search on a dense collection")
    val q = spark.range(1).select(typedlit(queryVecs).as("q"))
    TopK.maxSim(table, q, config.idCol, config.vectorCol, k)
  }

  /** [[searchMaxSim]] for N query matrices in ONE collection pass —
    * `query_batch_points` over a multi-vector collection. The request
    * frame (id, token matrix) broadcasts; each document's MaxSim
    * against every request evaluates in one scan, and per-request
    * ranking is the bounded heap. The per-request plan is identical to
    * [[searchMaxSim]] minus the N−1 extra corpus scans. */
  def searchMaxSimBatch(
      requests: Seq[(Long, Seq[Seq[Float]])], k: Int = 5): DataFrame = {
    require(config.multiVector, "batch maxsim search on a dense collection")
    val badDim = requests.collectFirst {
      case (qid, m) if m.exists(_.length != config.dim) => qid
    }
    require(badDim.isEmpty,
      s"request ${badDim.getOrElse(0L)} has a token vector whose dim != ${config.dim}")
    import spark.implicits._
    val reqs = requests.toDF("_g_qid", "_g_qm")
    val scored = table
      .select(col(config.idCol).as("vec_id"), col(config.vectorCol).as("_g_vecs"))
      .crossJoin(broadcast(reqs))
      .select(col("_g_qid").as("q_id"), col("vec_id"),
        round(graft.vector.Kernels.maxsim(col("_g_qm"), col("_g_vecs")), 6).as("score"))
    graft.ops.Similarity.rankHits(scored, "q_id", k)
      .withColumnRenamed("vec_id", config.idCol)
  }

  /** D1 search selecting a NAMED vector (Qdrant `query_points(...,
    * using="name")`): identical plan to [[search]] but scored against
    * the name's column — the other named vectors' bytes never leave
    * the scan (column pruning). */
  def searchUsing(
      name: String, queryVec: Seq[Float], k: Int = 5,
      filter: Column = lit(true), scoreThreshold: Option[Double] = None): DataFrame = {
    val (vecCol, dim) = config.namedVectors.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown vector name '$name'; configured: " +
          config.namedVectors.keys.toSeq.sorted.mkString(", ")))
    require(queryVec.length == dim,
      s"query dim ${queryVec.length} != '$name' vector dim $dim")
    val q = spark.range(1).select(typedlit(queryVec).as("q"))
    TopK.dense(table, q, config.idCol, vecCol, k,
      payloadFilter = filter, scoreThreshold = scoreThreshold,
      metric = config.distance)
  }

  /** Qdrant Universal Query API's by-id form
    * (`query_points(query=<point_id>)`): the k points nearest to a
    * STORED point's vector, the point itself excluded — "more like
    * this one" without re-supplying the embedding. The vector fetch is
    * a driver-side point lookup (the reference's own driver-side query
    * embedding shape); the search is the ordinary broadcast top-k. */
  def queryByPointId(
      id: Long, k: Int = 5, filter: Column = lit(true),
      scoreThreshold: Option[Double] = None): DataFrame = {
    val rows = table.filter(col(config.idCol) === id)
      .select(col(config.vectorCol)).take(1)
    require(rows.nonEmpty, s"point $id not found in the collection")
    val v = rows.head.getSeq[Number](0).map(_.floatValue).toSeq
    search(v, k + 1, filter, scoreThreshold)
      .filter(col(config.idCol) =!= id)
      .limit(k)
  }

  /** Hybrid search over a collection whose payload carries the source
    * text: dense (embedded query vs stored vectors is approximated by
    * re-embedding the text payload — same encoder both sides) fused
    * with BM25 by reciprocal rank, Qdrant's hybrid-query API shape.
    * `textCol` names the payload column holding the document text. */
  def searchHybrid(textCol: String, queryText: String, k: Int = 5, n: Int = 100): DataFrame = {
    val d = table.select(col(config.idCol).as("doc_id"), col(textCol).as("text"))
    graft.ops.Retrieval.hybridRrf(d, queryText, n, k)
      .withColumnRenamed("doc_id", config.idCol)
  }

  /** Qdrant sparse-vector search (`query_points` with
    * `using=<sparse name>` and a SparseVector query): score = dot
    * product over the intersection of query and stored dimension ids;
    * points sharing no dimension with the query are skipped before
    * scoring (`arrays_overlap` — the poor man's posting-list cut; the
    * corpus-scale inverted-postings formulation lives in
    * `ops/Retrieval.sparseTopK`). The query lands as a broadcast map
    * literal, the lookup-multiply-sum runs per row inside codegen, and
    * the cut is TakeOrderedAndProject — no shuffle. Sparse distance is
    * always DOT, as in Qdrant. */
  def searchSparse(name: String, query: Seq[(Int, Double)], k: Int = 5): DataFrame = {
    val (idxCol, valCol) = config.sparseVectors.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown sparse vector '$name' (have: ${config.sparseVectors.keys.toSeq.sorted.mkString(", ")})"))
    require(query.nonEmpty, "empty sparse query")
    require(query.map(_._1).distinct.length == query.length,
      "sparse query has duplicate dimension ids")
    val qMap = typedlit(query.toMap)
    val qDims = typedlit(query.map(_._1))
    val score = aggregate(
      zip_with(col(idxCol), col(valCol),
        (i, v) => coalesce(element_at(qMap, i), lit(0.0)) * v.cast("double")),
      lit(0.0), (a, x) => a + x)
    table
      .filter(arrays_overlap(col(idxCol), qDims))
      .select(col(config.idCol), round(score, 6).as("score"))
      .orderBy(col("score").desc, col(config.idCol).asc)
      .limit(k)
  }

  /** Qdrant's canonical hybrid query (`query_points` with
    * `prefetch=[sparse, dense]` and `FusionQuery(RRF)`): the stored
    * sparse vector and the default dense vector each produce a top-`n`
    * list, fused by reciprocal-rank — rrf = Σ 1/(60 + rank), a point
    * absent from one list contributing 0 there. Both prefetch lists
    * are TakeOrderedAndProject cuts over column-pruned scans (each
    * branch reads ONLY its vector's bytes); the rank windows and the
    * full-outer fusion join touch ≤ n rows each. */
  def queryHybrid(
      sparseName: String, sparseQuery: Seq[(Int, Double)],
      denseQuery: Seq[Float], k: Int = 5, n: Int = 20): DataFrame = {
    val sHits = searchSparse(sparseName, sparseQuery, n)
      .withColumnRenamed(config.idCol, "pid")
    val dHits = search(denseQuery, n).select(col(config.idCol).as("pid"),
      col("score"))
    // Rank direction mirrors each branch's score semantics: sparse is
    // always DOT (similarity, DESC), dense follows the collection's
    // metric — euclid/manhattan are distances whose top-n list from
    // search() is ranked ASC (smallest first); ranking it DESC here
    // would hand the WORST prefetch survivor rank 1 in the fusion.
    def ranked(hits: DataFrame, rankName: String, asc: Boolean): DataFrame = {
      val s = if (asc) col("score").asc else col("score").desc
      val w = org.apache.spark.sql.expressions.Window.orderBy(s, col("pid").asc)
      hits.withColumn(rankName, row_number().over(w).cast("long"))
        .select(col("pid"), col(rankName))
    }
    val denseAsc = VectorCollection.metricFn(config.distance)._2
    ranked(sHits, "rs", asc = false)
      .join(ranked(dHits, "rd", asc = denseAsc), Seq("pid"), "full_outer")
      .select(col("pid").as(config.idCol),
        round(coalesce(lit(1.0) / (lit(60) + col("rs")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("rd")), lit(0.0)), 6).as("rrf"))
      .orderBy(col("rrf").desc, col(config.idCol).asc)
      .limit(k)
  }

  /** query_points with a `formula` rescoring stage (Qdrant 1.14 score
    * boosting): prefetch `prefetchN` by the collection's similarity,
    * re-rank with an arithmetic formula over `$score` and payload
    * fields ([[graft.search.FormulaExpr]]), cut to `k`. `carry` names
    * payload columns the formula reads. */
  def queryFormula(queryVec: Seq[Float], formula: graft.search.FormulaExpr,
      carry: Seq[String] = Nil, prefetchN: Int = 50, k: Int = 5): DataFrame = {
    require(!config.multiVector, "formula query on a multi-vector collection")
    require(queryVec.length == config.dim,
      s"query dim ${queryVec.length} != collection dim ${config.dim}")
    val q = spark.range(1).select(typedlit(queryVec).as("qv"))
    graft.search.Formula.formulaQuery(table, q, config.idCol,
      config.vectorCol, formula, carry, prefetchN, k, config.distance)
  }

  /** points_count with a payload filter (Qdrant `client.count` with
    * `count_filter`) — the predicate pushes to the parquet scan. */
  def count(filter: Column): Long = table.filter(filter).count()

  /** `client.count` with `exact=false`: a deterministic sampled
    * estimate — the counted row set shrinks to `permille`/1000 of the
    * filtered scan; see [[graft.search.QueryApis.countApprox]]. */
  def countApprox(filter: Column = lit(true), permille: Int = 500): Long =
    graft.search.QueryApis.countApprox(table, config.idCol, filter, permille)
      .head.getLong(0)

  /** Qdrant `client.retrieve`: fetch points by id. The IN-list reaches
    * the scan as a pushed filter. */
  def retrieve(ids: Seq[Long]): DataFrame =
    table.filter(col(config.idCol).isInCollection(ids))

  /** Qdrant `client.scroll`: deterministic id-ordered page. Driven by
    * an exclusive start id (not a row offset), so each page is an
    * indexable range scan — O(page), not O(offset), at any collection
    * size. Returns `limit` rows with id > `afterId`; chain pages by
    * passing the previous page's max id. */
  def scroll(afterId: Long, limit: Int): DataFrame =
    table.filter(col(config.idCol) > afterId)
      .orderBy(col(config.idCol)).limit(limit)

  /** The file-granular rewrite operators (delete, payload mutation)
    * re-read touched files by leaf path, which loses a shard layout's
    * directory-encoded partition column — refuse rather than fail
    * mid-rewrite or flatten the layout (same stance as
    * [[upsertReplace]]). */
  private def requireUnsharded(op: String): Unit =
    require(config.shardCol.isEmpty,
      s"$op on a sharded collection is not supported; operate per shard")

  /** Qdrant `client.delete` with a points selector: delete by id set.
    * File-granular rewrite; see [[graft.index.Sink.deleteMatching]]. */
  def delete(ids: Seq[Long]): Long = {
    requireUnsharded("delete")
    Sink.deleteMatching(spark, path, col(config.idCol).isInCollection(ids))
  }

  /** Qdrant `client.delete` with a payload filter. */
  def deleteByFilter(filter: Column): Long = {
    requireUnsharded("deleteByFilter")
    Sink.deleteMatching(spark, path, filter)
  }

  /** Collection rows under the (vec_id, embedding) names the query-API
    * operators use, payload columns untouched. */
  private def asPoints: DataFrame = {
    val others = table.columns
      .filterNot(c => c == config.idCol || c == config.vectorCol)
    // the rename would collide with a payload column already holding
    // the operator-internal name — fail with the cause, not a later
    // AMBIGUOUS_REFERENCE deep inside the query
    val clash = others.filter(c => c == "vec_id" || c == "embedding")
    require(clash.isEmpty,
      s"payload column(s) ${clash.mkString(", ")} collide with the internal " +
        s"(vec_id, embedding) names; rename them or use them as idCol/vectorCol")
    table.select(Seq(col(config.idCol).as("vec_id"),
      col(config.vectorCol).as("embedding")) ++ others.map(col).toSeq: _*)
  }

  /** Qdrant `client.recommend` (average_vector strategy): search by
    * 2·avg(positives) − avg(negatives), example points excluded.
    * Metric-aware — the strategy only builds a query vector; scoring
    * and ranking follow the collection's configured Distance
    * (euclid/manhattan rank ASC), exactly like [[search]]. */
  def recommend(posIds: Seq[Long], negIds: Seq[Long] = Nil, k: Int = 5): DataFrame =
    graft.search.QueryApis.recommend(asPoints, posIds, negIds, k, config.distance)
      .withColumnRenamed("vec_id", config.idCol)

  /** Qdrant `client.recommend` with `strategy=sum_scores`: score =
    * Σ_pos sim − Σ_neg sim, examples excluded — the third strategy
    * beside average_vector ([[recommend]]) and best_score.
    * Metric-aware: distances enter the fold negated (similarity
    * space), and the formula score ranks DESC on every metric — it is
    * not the metric's distance (Qdrant's own caveat). */
  def recommendSum(posIds: Seq[Long], negIds: Seq[Long] = Nil, k: Int = 5): DataFrame =
    graft.search.QueryApis.recommendSumScores(
        asPoints, posIds, negIds, k, config.distance)
      .withColumnRenamed("vec_id", config.idCol)

  /** Qdrant `client.recommend` with `strategy=best_score`: a
    * candidate scores its best positive similarity unless its best
    * negative beats it, in which case the best negative returns sign-
    * flipped — points nearer a negative than any positive sink below
    * every in-context point. Metric-aware: "best" is max over
    * similarities = MIN over distances (distances enter negated), and
    * the formula score ranks DESC on every metric. */
  def recommendBest(posIds: Seq[Long], negIds: Seq[Long] = Nil, k: Int = 5): DataFrame =
    graft.search.QueryApis.recommendBestScore(
        asPoints, posIds, negIds, k, config.distance)
      .withColumnRenamed("vec_id", config.idCol)

  /** Qdrant `client.recommend` with `lookup_from`: the example ids
    * resolve in `lookup` (another collection of the same vector
    * dimensionality) and the search runs over THIS collection; no
    * example exclusion — the id spaces differ. */
  def recommendFrom(
      lookup: VectorCollection,
      posIds: Seq[Long], negIds: Seq[Long] = Nil, k: Int = 5): DataFrame = {
    // validate the cross-collection contract up front — a mismatch
    // would otherwise surface as an opaque kernel error mid-execution
    require(lookup.config.dim == config.dim,
      s"lookup collection dim ${lookup.config.dim} != this collection's dim ${config.dim}")
    require(!lookup.config.multiVector && !config.multiVector,
      "recommend with lookup_from needs dense (single-vector) collections on both sides")
    // metric-aware like [[recommend]] — THIS collection's Distance
    // drives the ranking (the lookup side only supplies the examples)
    graft.search.QueryApis.recommendLookup(
      asPoints, lookup.asPoints, posIds, negIds, k, config.distance)
      .withColumnRenamed("vec_id", config.idCol)
  }

  /** Qdrant `recommend_batch`: N recommend requests, one collection
    * pass (broadcast request frame + bounded-heap per-request
    * ranking). Metric-aware like [[recommend]]. */
  def recommendBatch(
      requests: Seq[(Long, Seq[Long], Seq[Long])], k: Int = 5): DataFrame =
    graft.search.QueryApis.recommendBatch(asPoints, requests, k, config.distance)
      .withColumnRenamed("vec_id", config.idCol)

  /** Qdrant discovery search: rank by satisfied (positive, negative)
    * context pairs, then similarity to the target point. Metric-aware:
    * a pair satisfies when the candidate is at least as CLOSE to the
    * positive (d_pos ≤ d_neg on distance metrics), `sim` stays in the
    * metric's own space and its tiebreak ordering flips with it. */
  def discover(targetId: Long, contextPairs: Seq[(Long, Long)], k: Int = 5): DataFrame =
    graft.search.QueryApis.discover(
        asPoints, targetId, contextPairs, k, config.distance)
      .withColumnRenamed("vec_id", config.idCol)

  /** Qdrant `search_groups`: top `limit` groups by best hit, each with
    * its top `groupSize` hits. Metric-aware: a group's best is MIN
    * distance on euclid/manhattan, and group order + hit ranking flip
    * with the metric, matching [[search]]. */
  def searchGroups(
      queryVec: Seq[Float], groupCol: String,
      groupSize: Int = 3, limit: Int = 5): DataFrame =
    graft.search.QueryApis.searchGroups(
        asPoints, queryVec.map(_.toDouble), groupCol, groupSize, limit,
        config.distance)
      .withColumnRenamed("vec_id", config.idCol)

  /** Qdrant `discover_batch`: N discovery requests, one collection
    * pass (broadcast request frame, bounded-heap ranking on the
    * composite (ctx_hits, sim) key). Metric-aware like [[discover]]. */
  def discoverBatch(
      requests: Seq[(Long, Long, Seq[(Long, Long)])], k: Int = 5): DataFrame =
    graft.search.QueryApis.discoverBatch(asPoints, requests, k, config.distance)
      .withColumnRenamed("vec_id", config.idCol)

  /** Qdrant `query_batch_points`: a HETEROGENEOUS batch of universal
    * queries — [[graft.search.NearestBatchQuery]] (plain vector),
    * [[graft.search.ByIdBatchQuery]] (nearest to a stored point, self
    * excluded), [[graft.search.RecommendBatchQuery]] (average_vector
    * recommend, examples excluded) — answered in ONE collection pass:
    * all referenced point ids resolve with a single pushed IN-list
    * scan, the request frame broadcasts, ranking is the bounded-heap
    * aggregate keyed by request. Spec-asserted equal per kind to
    * [[search]]/[[queryByPointId]]/[[recommend]]. Metric-aware: every
    * kind resolves to (query vector, exclusions) then ranks with plain
    * TopK semantics under the collection's Distance. */
  def queryBatch(requests: Seq[graft.search.BatchQuery], k: Int = 5): DataFrame = {
    require(!config.multiVector, "batch query on a multi-vector collection")
    graft.search.QueryApis.queryBatch(asPoints, requests, k, config.distance)
      .withColumnRenamed("vec_id", config.idCol)
  }

  /** Qdrant `recommend_groups`: recommendation scoring with grouped
    * results, example points excluded. */
  def recommendGroups(
      posIds: Seq[Long], negIds: Seq[Long], groupCol: String,
      groupSize: Int = 3, limit: Int = 5): DataFrame =
    graft.search.QueryApis.recommendGroups(
        asPoints, posIds, negIds, groupCol, groupSize, limit, config.distance)
      .withColumnRenamed("vec_id", config.idCol)

  /** Qdrant `search_groups` with `with_lookup`: each group carries the
    * matching record of `lookup` (another collection), joined on group
    * key = lookup id, `lk_`-prefixed. See
    * [[graft.search.QueryApis.searchGroupsWithLookup]] for the
    * two-broadcast plan. */
  def searchGroupsWithLookup(
      queryVec: Seq[Float], groupCol: String,
      lookup: VectorCollection, lookupCols: Seq[String],
      groupSize: Int = 3, limit: Int = 5): DataFrame =
    graft.search.QueryApis.searchGroupsWithLookup(
        asPoints, queryVec.map(_.toDouble), groupCol, groupSize, limit,
        lookup.table, lookup.config.idCol, lookupCols, config.distance)
      .withColumnRenamed("vec_id", config.idCol)

  /** Qdrant facet API: value counts for a payload key under a filter.
    * `exact=false` estimates each value's count with a HyperLogLog++
    * sketch over the point id (column `n_approx` instead of `n`) —
    * fixed-size commutative aggregation state per value, the Qdrant
    * speed-over-precision trade; see [[graft.search.QueryApis.facetApprox]]. */
  def facet(key: String, filter: Column = lit(true), limit: Int = 10,
      exact: Boolean = true): DataFrame =
    if (exact) graft.search.QueryApis.facet(table, key, filter, limit)
    else graft.search.QueryApis.facetApprox(table, key, config.idCol, filter, limit)

  /** Qdrant `search_batch`: N query vectors scored in ONE pass over
    * the collection (broadcast query side, bounded-heap topk_hits
    * ranking — map-side partial, O(k) per query through the shuffle)
    * — per-query top-k without per-query scans. */
  def searchBatch(queries: Seq[(Long, Seq[Float])], k: Int = 5): DataFrame = {
    require(!config.multiVector, "batch search on a multi-vector collection")
    val badDim = queries.collectFirst {
      case (qid, v) if v.length != config.dim => (qid, v.length)
    }
    require(badDim.isEmpty,
      s"query ${badDim.map(_._1).getOrElse(0L)} dim ${badDim.map(_._2).getOrElse(0)} " +
        s"!= collection dim ${config.dim}")
    import spark.implicits._
    val q = queries.toDF("q_id", "qv")
    graft.ops.Similarity.knnJoin(asPoints, q, k)
      .withColumnRenamed("vec_id", config.idCol)
  }

  /** [[searchBatch]] with PER-REQUEST payload filters — Qdrant's
    * `search_batch` takes a full SearchRequest per entry, filter
    * included. Each request optionally pins `filterCol` to a value
    * (None = unfiltered); all requests still share ONE collection
    * pass: the broadcast request frame carries the filter value, the
    * predicate evaluates inside the same codegen'd scoring stage, and
    * ranking stays the bounded-heap aggregate. Filtering BEFORE the
    * heap shrinks per-request candidate streams — a filtered request
    * costs less, not more. Scoring honors the collection's configured
    * Distance (cosine/dot DESC; euclid/manhattan ASC), matching
    * [[search]] exactly. Internal names are `_g`-prefixed and the scan
    * is pruned to (id, vector, filterCol), so payload column names can
    * never collide with the request frame. */
  def searchBatchFiltered(
      requests: Seq[(Long, Seq[Float], Option[Long])],
      filterCol: String,
      k: Int = 5): DataFrame = {
    require(!config.multiVector, "batch search on a multi-vector collection")
    val badDim = requests.collectFirst {
      case (qid, v, _) if v.length != config.dim => (qid, v.length)
    }
    require(badDim.isEmpty,
      s"query ${badDim.map(_._1).getOrElse(0L)} dim ${badDim.map(_._2).getOrElse(0)} " +
        s"!= collection dim ${config.dim}")
    graft.search.QueryApis.searchBatchFiltered(
        asPoints,
        requests.map { case (id, v, f) => (id, v.map(_.toDouble), f) },
        filterCol, k, config.distance)
      .withColumnRenamed("vec_id", config.idCol)
  }

  /** [[searchBatchFiltered]] with a FULL per-request
    * [[graft.search.Filter]] — Qdrant's actual SearchRequest shape:
    * every request carries its own must/should/must_not clause lists,
    * compiled by the one E4 DSL, all through the same single
    * collection pass. Use [[graft.search.Filter]]`()` (empty) for an
    * unfiltered request. */
  def searchBatchFiltered(
      requests: Seq[(Long, Seq[Float], graft.search.Filter)],
      k: Int): DataFrame = {
    require(!config.multiVector, "batch search on a multi-vector collection")
    val badDim = requests.collectFirst {
      case (qid, v, _) if v.length != config.dim => (qid, v.length)
    }
    require(badDim.isEmpty,
      s"query ${badDim.map(_._1).getOrElse(0L)} dim ${badDim.map(_._2).getOrElse(0)} " +
        s"!= collection dim ${config.dim}")
    graft.search.QueryApis.searchBatchFiltered(
        asPoints,
        requests.map { case (id, v, f) => (id, v.map(_.toDouble), f) },
        k, config.distance)
      .withColumnRenamed("vec_id", config.idCol)
  }

  /** D1 search routed to one shard (Qdrant `shard_key_selector`): on a
    * sharded collection the shard predicate is a directory-partition
    * filter, so the scan reads only the selected shard's subtree —
    * per-shard latency independent of collection size (asserted in
    * VectorCollectionSpec). */
  def searchShard(
      queryVec: Seq[Float], shardKey: Any, k: Int = 5,
      filter: Column = lit(true)): DataFrame = {
    require(config.shardCol.nonEmpty,
      "searchShard on a collection without a configured shardCol")
    search(queryVec, k, col(config.shardCol.get) === lit(shardKey) && filter)
  }

  /** Qdrant MMR diversity search (`query` with an mmr object): top-k
    * balancing similarity against redundancy with the already-picked
    * set. `fetchN` bounds the candidate pool (Qdrant's
    * `candidates_limit`). Metric-aware (r16): non-cosine metrics
    * enter the tradeoff through the discoverBatch monotone squash —
    * see [[graft.search.QueryApis.mmr]]; `score` stays the raw
    * collection-metric value. */
  def searchMmr(
      queryVec: Seq[Float], k: Int = 5,
      lambda: Double = 0.5, fetchN: Int = 20): DataFrame = {
    require(!config.multiVector, "mmr search on a multi-vector collection")
    require(queryVec.length == config.dim,
      s"query dim ${queryVec.length} != collection dim ${config.dim}")
    graft.search.QueryApis.mmr(
        asPoints, queryVec.map(_.toDouble), fetchN, k, lambda,
        config.distance)
      .withColumnRenamed("vec_id", config.idCol)
  }

  /** Qdrant distance-matrix API (`search_matrix_pairs`) over a
    * deterministic `sample`-point draw (Qdrant's absolute-count
    * `sample` parameter — broadcast-safe by construction).
    * Metric-aware (r16): scores and neighbor order follow the
    * collection's configured Distance. */
  def matrixPairs(sample: Int, k: Int = 3): DataFrame =
    graft.search.QueryApis.matrixPairs(asPoints, sample, k, config.distance)

  /** Qdrant random sampling (`query=sample(random)`): reproducible
    * hash-ordered draw of `k` point ids. */
  def randomSample(k: Int): DataFrame =
    graft.search.QueryApis.randomSample(asPoints, k)
      .withColumnRenamed("vec_id", config.idCol)

  /** D1+E4 with the composed [[graft.search.Filter]] DSL (Qdrant
    * models.Filter: must / should / must_not clause lists). */
  def search(queryVec: Seq[Float], k: Int, filter: graft.search.Filter): DataFrame =
    search(queryVec, k, filter.toColumn)

  private def ivfPath = path + "_ivf"
  private def centroidsPath = s"$ivfPath/_graft_centroids.txt"

  /** Build (or rebuild) a persisted IVF index for this collection —
    * the engine-side analog of Qdrant's background ANN indexing past
    * `indexing_threshold`. Seeds are drawn by content-stable hash
    * (reproducible, uncorrelated with ingest order), refined with
    * `lloydIters` rounds of Lloyd's algorithm, then every point is
    * assigned by a narrow per-row argmax (no shuffle) and written
    * `partitionBy(cluster_id)` beside the collection; payload columns
    * ride into the index so filtered probes need no join. Centroids
    * persist in a sidecar so [[searchAnn]] works after reopen.
    * Returns the index path. */
  def buildIvfIndex(nClusters: Int, lloydIters: Int = 2): String = Sink.withPathLock(ivfPath) {
    require(!config.multiVector, "IVF index on a multi-vector collection")
    val pts = asPoints
    require(nClusters > 0, s"buildIvfIndex needs nClusters > 0, got $nClusters")
    val seeds = pts
      .select(col("vec_id"), col("embedding"),
        graft.index.Embedder.stringHash64(
          concat(lit("ivf:"), col("vec_id"))).as("_h"))
      .orderBy(col("_h").asc, col("vec_id").asc)
      .limit(nClusters)
      .collect().zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Float](1).toArray) }
      .toSeq
    // the empty-aggregate class: zero seeds would fail deep inside the
    // centroid argmax with an opaque error instead of naming the cause
    require(seeds.nonEmpty,
      "buildIvfIndex on an empty collection — no vectors to seed " +
        "centroids from; upsert points first")
    val trained = graft.ops.Similarity.ivfRefineCentroids(pts, seeds, lloydIters)
    val centCols = trained.map { case (id, v) => (id, typedlit(v.toSeq): Column) }
    val idx = pts.select(col("*"),
      graft.ops.Similarity.ivfClusterId(col("embedding"), centCols).as("cluster_id"))
    // range-cluster before the partitioned write (the fixture-index
    // rationale, ops/Similarity.ivfIndexPath): a bare partitionBy
    // fragments each cluster into one file per input task, and probes
    // pay listing+open per fragment; one build-time range shuffle
    // yields ≤ shuffle.partitions sized files, cluster-contiguous
    idx.repartitionByRange(col("cluster_id"), col("vec_id"))
      .write.mode("overwrite").partitionBy("cluster_id").parquet(ivfPath)
    val sidecar = trained
      .map { case (id, v) => s"$id,${v.mkString(",")}" }
      .mkString("\n")
    Sink.writeSidecar(centroidsPath, sidecar)
    ivfPath
  }

  private def loadCentroids(): Seq[(Long, Array[Float])] = {
    require(Sink.sidecarExists(centroidsPath),
      s"no IVF index for $path — call buildIvfIndex first")
    Sink.readSidecar(centroidsPath).split("\n").toSeq
      .filter(_.nonEmpty)
      .map { line =>
        val parts = line.split(",")
        (parts.head.toLong, parts.tail.map(_.toFloat))
      }
  }

  /** ANN top-k through the persisted IVF index: centroids rank
    * driver-side (an index-time constant, like the reference's
    * driver-side query embedding), the read prunes to the best
    * `nprobe` cluster partitions, and scoring + top-k run only over
    * the probed subtrees. `filter` composes like exact [[search]] —
    * payload rides in the index. Approximate by construction; raise
    * `nprobe` to trade latency for recall (the x_ann_recall query
    * measures this curve on the fixture index). */
  def searchAnn(
      queryVec: Seq[Float], k: Int = 5, nprobe: Int = 1,
      filter: Column = lit(true)): DataFrame = {
    require(!config.multiVector, "ANN search on a multi-vector collection")
    require(queryVec.length == config.dim,
      s"query dim ${queryVec.length} != collection dim ${config.dim}")
    // Probe selection AND candidate scoring follow the collection's
    // metric, so ANN results rank consistently with exact search()
    // (they previously hard-coded cosine — a euclid collection got
    // cosine-ranked ANN answers). Clustering stays cosine-trained; for
    // distance metrics that is the approximation-quality knob IVF
    // already is, and the recall gate (x_ann_recall) is the measure.
    val probes = graft.ops.Similarity
      .rankCentroids(loadCentroids(), queryVec.toArray, config.distance)
      .take(nprobe)
    val (scoreOf, asc) = VectorCollection.metricFn(config.distance)
    // restore the configured id name BEFORE the payload filter so a
    // filter written against exact search's schema (col(idCol) …)
    // works unchanged here; the rename is a projection, filters still
    // push through it to the scan
    spark.read.parquet(ivfPath)
      .withColumnRenamed("vec_id", config.idCol)
      .filter(col("cluster_id").isInCollection(probes) && filter)
      .select(col(config.idCol),
        round(scoreOf(col("embedding"),
          typedlit(queryVec.map(_.toDouble))), 6).as("score"))
      .orderBy(if (asc) col("score").asc else col("score").desc,
        col(config.idCol).asc)
      .limit(k)
  }

  /** Append new points into the persisted IVF index WITHOUT a rebuild:
    * anti-join out ids the index already holds (idempotent re-delivery,
    * the streaming exactly-once contract), assign clusters with the
    * same narrow argmax as the build, append into the cluster
    * partition subtrees. This is the foreachBatch sink of a LIVE ANN
    * index — Qdrant's background indexing of fresh upserts. Centroids
    * stay fixed between [[buildIvfIndex]] rebuilds (drift is a
    * periodic-maintenance concern, like Qdrant's optimizer runs); at
    * scale the anti-join's id side is the index's id column only
    * (column-pruned scan), or a bloom filter. Returns rows added. */
  def upsertAnnIndex(points: DataFrame): Long = Sink.withPathLock(ivfPath) {
    // same per-path write mutex as the Sink surface: two streaming
    // micro-batch sinks (or a rebuild racing a live append) would
    // otherwise interleave their anti-join reads and appends and
    // double-insert the same fresh ids
    val cents = loadCentroids()
    val centCols = cents.map { case (id, v) => (id, typedlit(v.toSeq): Column) }
    val others = points.columns
      .filterNot(c => c == config.idCol || c == config.vectorCol)
    val pts = points.select(Seq(col(config.idCol).as("vec_id"),
      col(config.vectorCol).as("embedding")) ++ others.map(col).toSeq: _*)
    val existingIds = spark.read.parquet(ivfPath).select(col("vec_id"))
    val fresh = pts.join(existingIds, Seq("vec_id"), "left_anti")
      .select(pts.columns.map(col).toSeq: _*)
      .cache()
    val n = fresh.count()
    if (n > 0) {
      fresh
        .select(col("*"),
          graft.ops.Similarity.ivfClusterId(col("embedding"), centCols).as("cluster_id"))
        .write.mode("append").partitionBy("cluster_id").parquet(ivfPath)
    }
    fresh.unpersist()
    n
  }

  /** Qdrant `set_payload`: set one key on every point matching the
    * filter (map-typed payload column). File-granular rewrite. A NULL
    * stored payload coalesces to an empty map first — Qdrant creates
    * the payload on set; without the coalesce map_concat(NULL, …)
    * would silently no-op while still reporting the row as updated. */
  def setPayload(filter: Column, payloadCol: String, key: String, value: String): Long = {
    requireUnsharded("setPayload")
    Sink.updatePayload(spark, path, filter, payloadCol,
      p => map_concat(
        map_filter(coalesce(p, map().cast("map<string,string>")), (k, _) => k =!= key),
        map(lit(key), lit(value))))
  }

  /** Qdrant `delete_payload`: drop one key from matching points. */
  def deletePayloadKey(filter: Column, payloadCol: String, key: String): Long = {
    requireUnsharded("deletePayloadKey")
    Sink.updatePayload(spark, path, filter, payloadCol,
      p => map_filter(coalesce(p, map().cast("map<string,string>")), (k, _) => k =!= key))
  }

  /** Qdrant `clear_payload`: empty the payload of matching points. */
  def clearPayload(filter: Column, payloadCol: String): Long = {
    requireUnsharded("clearPayload")
    Sink.updatePayload(spark, path, filter, payloadCol,
      _ => map().cast("map<string,string>"))
  }

  /** Qdrant `update_vectors`: replace the stored vector of each named
    * point (payload and ids untouched) — the re-embed-in-place call a
    * model upgrade uses when only SOME points change (full re-index is
    * [[upsertReplace]]). Rides the same staged file-granular rewrite
    * as payload mutation: only parquet files containing an updated id
    * are rewritten, crash-safe behind the commit marker, O(touched
    * files) not O(collection). Returns points updated. */
  def updateVectors(newVecs: Map[Long, Seq[Float]]): Long = {
    requireUnsharded("updateVectors")
    require(newVecs.nonEmpty, "update_vectors needs at least one point")
    newVecs.foreach { case (id, v) =>
      require(v.length == config.dim,
        s"vector for point $id has dim ${v.length}, collection is ${config.dim}")
    }
    val ids = newVecs.keys.toSeq
    // cast to the COLUMN'S stored type (float or double layout), not an
    // assumed one — a mismatched cast would drift the schema of the
    // rewritten files away from the untouched ones
    val dt = table.schema(config.vectorCol).dataType.catalogString
    // ONE flat map literal probed per row, not a when/otherwise per
    // point: a nested when-chain grows the Catalyst tree linearly with
    // the batch and stalls analysis/codegen on large re-embed batches.
    // try_element_at (NULL on miss, even under ANSI) + coalesce keeps
    // unmatched rows' stored vectors. The literal still ships with the
    // plan, so corpus-scale re-embeds belong to upsertReplace — bound
    // it loudly rather than let the task binary bloat quietly.
    require(newVecs.size <= 65536,
      s"update_vectors with ${newVecs.size} points exceeds the 65536 " +
        "plan-literal bound; use upsertReplace for corpus-scale re-embeds")
    val lookup = typedlit(newVecs)
    val replacement = coalesce(
      try_element_at(lookup, col(config.idCol)).cast(dt),
      col(config.vectorCol))
    Sink.updatePayload(spark, path, col(config.idCol).isInCollection(ids),
      config.vectorCol, _ => replacement)
  }

  /** Qdrant `get_collection`: declared config + live counters. Cheap
    * on a columnar store: points_count is a metadata-only parquet
    * count, segments_count is the file count (a parquet file is the
    * closest analog of a Qdrant segment — the unit compaction and
    * payload indexing rewrite). */
  def info: CollectionInfo = {
    // Hadoop FileSystem, not java.io.File — the same API every other
    // maintenance op (compact/snapshot/updatePayload) goes through, so
    // segments_count works on HDFS/S3 paths too instead of silently
    // reporting 0 off an empty local-disk lookup
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    def parquetFiles(p: org.apache.hadoop.fs.Path): Int =
      fs.listStatus(p).count(st =>
        st.isFile && st.getPath.getName.endsWith(".parquet"))
    val segs =
      if (config.shardCol.isDefined)
        // sharded layout: parquet files live under shard=… subtrees
        fs.listStatus(root).filter(_.isDirectory)
          .map(d => parquetFiles(d.getPath)).sum
      else parquetFiles(root)
    CollectionInfo(count, segs, config)
  }

  /** Qdrant `delete_vectors`: clear ONE NAMED vector from the given
    * points — payload, id, and every other vector stay (deleting the
    * point is [[delete]]). Same file-granular crash-safe rewrite as
    * payload mutation: only files containing a named id are touched.
    * Returns points updated. */
  def deleteVectors(name: String, ids: Seq[Long]): Long = {
    requireUnsharded("deleteVectors")
    val (vecCol, _) = config.namedVectors.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown vector name '$name'; configured: " +
          config.namedVectors.keys.toSeq.sorted.mkString(", ")))
    require(ids.nonEmpty, "delete_vectors needs at least one point id")
    // null in the COLUMN'S stored type — see the updateVectors note
    val dt = table.schema(vecCol).dataType.catalogString
    Sink.updatePayload(spark, path, col(config.idCol).isInCollection(ids),
      vecCol, _ => lit(null).cast(dt))
  }

  /** Qdrant `batch_update_points`: a SEQUENCE of mutations applied in
    * order (upserts, deletes, payload ops) — one client call, ordered
    * visibility. Returns one count per operation, in order. Each step
    * is individually crash-safe (they ride the staged single-op
    * writers); the batch itself is not transactional across steps,
    * matching Qdrant's per-operation acknowledgement. */
  def batchUpdate(ops: Seq[PointsOp]): Seq[Long] = ops.map {
    case UpsertOp(points) => upsert(points)
    case UpsertReplaceOp(points) => upsertReplace(points)
    case DeleteOp(ids) => delete(ids)
    case SetPayloadOp(filter, payloadCol, key, value) =>
      setPayload(filter, payloadCol, key, value)
    case DeletePayloadOp(filter, payloadCol, key) =>
      deletePayloadKey(filter, payloadCol, key)
    case ClearPayloadOp(filter, payloadCol) => clearPayload(filter, payloadCol)
    case UpdateVectorsOp(vecs) => updateVectors(vecs)
  }

  /** Qdrant `create_payload_index(field)`: make filtered searches on
    * `field` cheap. Here that is a LAYOUT property, not a tree —
    * the collection's files are rewritten range-clustered + sorted on
    * the field, so parquet min/max footer stats prune every file a
    * pushed filter cannot match (see [[Sink.indexPayload]]; per-file
    * range disjointness spec-asserted). Returns files written. */
  def createPayloadIndex(field: String, targetRowsPerFile: Long = 1L << 20): Int = {
    requireUnsharded("createPayloadIndex")
    Sink.indexPayload(spark, path, field, targetRowsPerFile)
  }

  /** `create_payload_index` over TWO fields: Z-order (Morton) layout so
    * selective filters on EITHER field skip files; see
    * [[graft.index.Sink.indexPayloadZ]]. */
  def createPayloadIndexZ(
      fieldA: String, fieldB: String,
      targetRowsPerFile: Long = 1L << 20): Int =
    Sink.indexPayloadZ(spark, path, fieldA, fieldB, targetRowsPerFile)

  /** Maintenance: compact accumulated small part files into
    * `targetRowsPerFile`-sized ones (Qdrant's segment optimizer).
    * Unsharded collections rewrite the whole directory; sharded ones
    * compact each shard subtree independently, preserving the
    * directory-encoded shard column and its routed-search pruning. */
  def compact(targetRowsPerFile: Long = 1L << 20): Int =
    if (config.shardCol.isDefined) Sink.compactShards(spark, path, targetRowsPerFile)
    else Sink.compact(spark, path, targetRowsPerFile)

  /** Qdrant `create_snapshot`: point-in-time file-level copy. Returns
    * files copied. */
  def snapshot(snapPath: String): Int = Sink.snapshot(spark, path, snapPath)

  /** Qdrant `recover_snapshot`: replace contents from a snapshot
    * (crash-safe rename-aside swap). */
  def restoreSnapshot(snapPath: String): Unit =
    Sink.restoreSnapshot(spark, snapPath, path)

  /** D3: hit projection with 'Unknown' defaults. */
  def formatResults(hits: DataFrame, payloadCols: Seq[String]): DataFrame =
    TopK.formatResults(hits, Seq(config.idCol, "score"), payloadCols)

  /** Payload columns: the schema minus id, default vector, and named
    * vectors. */
  private def payloadColumns: Seq[String] = {
    val vecCols = config.namedVectors.values.map(_._1).toSet + config.vectorCol
    table.columns.toSeq.filterNot(c => c == config.idCol || vecCols(c))
  }

  private def resolvePayload(sel: PayloadSelector): Seq[String] = sel match {
    case PayloadSelector.All => payloadColumns
    case PayloadSelector.NoPayload => Nil
    case PayloadSelector.Subset(cols) =>
      val known = payloadColumns.toSet
      val unknown = cols.filterNot(known)
      require(unknown.isEmpty,
        s"unknown payload column(s): ${unknown.mkString(", ")}; " +
          s"payload columns: ${payloadColumns.sorted.mkString(", ")}")
      cols
  }

  /** Qdrant `with_payload` / `with_vectors` response shaping over a hit
    * frame holding (idCol, score): attach the selected payload columns
    * and optionally the stored vector. The k-row hit list BROADCASTS
    * back onto the collection scan (the search_groups with_lookup
    * shape), so the fetch is one column-pruned pass that reads only the
    * selected columns' bytes — the token matrices / unselected payload
    * never leave the scan. Hit order (score per the collection metric,
    * id tiebreak) is restored after the join. */
  def shapeResponse(
      hits: DataFrame,
      withPayload: PayloadSelector,
      withVectors: Boolean): DataFrame = {
    val distanceAsc =
      config.distance == "euclid" || config.distance == "manhattan"
    attachSelected(hits, withPayload, withVectors,
      Seq(if (distanceAsc) col("score").asc else col("score").desc,
        col(config.idCol).asc))
  }

  /** The general form of [[shapeResponse]]: attach the selected
    * payload/vector columns to ANY bounded hit frame carrying the id
    * column — grouped hits keep their group columns, batch hits their
    * request key — and restore `order` (a broadcast join returns rows
    * in scan order). Same plan as [[shapeResponse]]: the hit list
    * broadcasts back onto a column-pruned collection scan, so only the
    * selected columns' bytes are read. */
  private def attachSelected(
      hits: DataFrame,
      withPayload: PayloadSelector,
      withVectors: Boolean,
      order: Seq[Column]): DataFrame = {
    val extra = resolvePayload(withPayload) ++
      (if (withVectors) Seq(config.vectorCol) else Nil)
    val clash = extra.filter(hits.columns.contains)
    require(clash.isEmpty,
      s"hit frame already carries column(s) ${clash.mkString(", ")}; " +
        "select a payload subset that does not collide")
    if (extra.isEmpty) hits
    else table.select((config.idCol +: extra).map(col): _*)
      .join(broadcast(hits), Seq(config.idCol))
      .select((hits.columns.toSeq ++ extra).map(col): _*)
      .orderBy(order: _*)
  }

  /** [[recommend]] with Qdrant response-shaping flags. */
  def recommend(
      posIds: Seq[Long], negIds: Seq[Long], k: Int,
      withPayload: PayloadSelector, withVectors: Boolean): DataFrame =
    shapeResponse(recommend(posIds, negIds, k), withPayload, withVectors)

  /** [[discover]] with Qdrant response-shaping flags. */
  def discover(
      targetId: Long, contextPairs: Seq[(Long, Long)], k: Int,
      withPayload: PayloadSelector, withVectors: Boolean): DataFrame =
    attachSelected(discover(targetId, contextPairs, k),
      withPayload, withVectors,
      // discovery ranks by (context pairs satisfied, then similarity)
      Seq(col("ctx_hits").desc, col("sim").desc, col(config.idCol).asc))

  /** [[queryByPointId]] (`query_points(query=<id>)`) with Qdrant
    * response-shaping flags. */
  def queryByPointId(
      id: Long, k: Int, filter: Column,
      scoreThreshold: Option[Double],
      withPayload: PayloadSelector, withVectors: Boolean): DataFrame =
    shapeResponse(queryByPointId(id, k, filter, scoreThreshold),
      withPayload, withVectors)

  /** [[searchGroups]] with Qdrant response-shaping flags: every hit row
    * keeps its (grp_rank, grp, best, hit_rank) group context and the
    * group-then-hit-rank order. */
  def searchGroups(
      queryVec: Seq[Float], groupCol: String, groupSize: Int, limit: Int,
      withPayload: PayloadSelector, withVectors: Boolean): DataFrame =
    attachSelected(searchGroups(queryVec, groupCol, groupSize, limit),
      withPayload, withVectors,
      Seq(col("grp_rank").asc, col("hit_rank").asc))

  /** [[search]] with Qdrant response-shaping flags. */
  def search(
      queryVec: Seq[Float], k: Int, filter: Column,
      scoreThreshold: Option[Double],
      withPayload: PayloadSelector,
      withVectors: Boolean): DataFrame =
    shapeResponse(search(queryVec, k, filter, scoreThreshold),
      withPayload, withVectors)

  /** [[scroll]] with Qdrant response-shaping flags (`with_payload` /
    * `with_vectors` on `client.scroll`). The projection happens BEFORE
    * the page cut, so unselected columns — above all the vector — are
    * pruned at the scan, not carried through the sort. */
  def scroll(
      afterId: Long, limit: Int,
      withPayload: PayloadSelector,
      withVectors: Boolean): DataFrame = {
    val cols = Seq(config.idCol) ++ resolvePayload(withPayload) ++
      (if (withVectors) Seq(config.vectorCol) else Nil)
    table.select(cols.map(col): _*)
      .filter(col(config.idCol) > afterId)
      .orderBy(col(config.idCol)).limit(limit)
  }
}

object VectorCollection {

  /** (score expression, ranks-ascending) for a configured Distance —
    * the ONE mapping in [[graft.search.TopK.metricFn]]. */
  private[api] def metricFn(distance: String): ((Column, Column) => Column, Boolean) =
    TopK.metricFn(distance)

  private def metaPath(path: String) = s"$path/_graft_meta.json"

  /** C1: create-if-absent with declared vector config (the Qdrant
    * VectorParams + MultiVectorComparator declaration), then open. */
  def ensure(
      spark: SparkSession,
      path: String,
      like: DataFrame,
      config: CollectionConfig): VectorCollection = {
    // The flat meta format borrows ';' ':' '=' as delimiters and '"'
    // as the JSON quote — a name or column containing one would write
    // a sidecar that open() mis-parses. Refuse BEFORE creating the
    // collection directory, so a rejected config leaves nothing behind.
    // ',' '{' '}' are open()'s field terminators (split("[,}]")) —
    // a name containing one parses truncated even though the JSON
    // itself would be well-formed
    val metaDelims = Seq(';', ':', '=', '"', '\\', ',', '{', '}')
    def checkName(what: String, s: String): Unit =
      require(!s.exists(metaDelims.contains),
        s"$what '$s' contains a meta-delimiter character " +
          s"(${metaDelims.mkString(" ")}) and cannot be serialized")
    (Seq("idCol" -> config.idCol, "vectorCol" -> config.vectorCol) ++
      config.shardCol.map("shardCol" -> _) ++
      config.namedVectors.flatMap { case (n, (c, _)) =>
        Seq("named vector" -> n, "named vector column" -> c) } ++
      config.sparseVectors.flatMap { case (n, (ic, vc)) =>
        Seq("sparse vector" -> n, "sparse index column" -> ic,
          "sparse value column" -> vc) })
      .foreach { case (what, s) => checkName(what, s) }
    val created = Sink.ensureCollection(spark, path, like)
    if (created) {
      val shard = config.shardCol
        .map(c => s""","shardCol":"$c"""").getOrElse("")
      // named vectors serialize as "n1=col1:dim1;n2=col2:dim2" — flat
      // enough for the split-based reader in [[open]]
      val named =
        if (config.namedVectors.isEmpty) ""
        else config.namedVectors.toSeq.sortBy(_._1)
          .map { case (n, (c, d)) => s"$n=$c:$d" }
          .mkString(""","namedVectors":"""", ";", "\"")
      val dist =
        if (config.distance == "cosine") ""
        else s""","distance":"${config.distance}""""
      // sparse vectors serialize like named ones: "n=idxCol:valCol;…"
      val sparse =
        if (config.sparseVectors.isEmpty) ""
        else config.sparseVectors.toSeq.sortBy(_._1)
          .map { case (n, (ic, vc)) => s"$n=$ic:$vc" }
          .mkString(""","sparseVectors":"""", ";", "\"")
      val json =
        s"""{"idCol":"${config.idCol}","vectorCol":"${config.vectorCol}",""" +
          s""""dim":${config.dim},"multiVector":${config.multiVector}$shard$named$dist$sparse}"""
      // Hadoop-FS sidecar IO, matching ensureCollection/exists — a
      // java.nio write would crash on the hdfs://-s3a:// paths the
      // rest of the surface supports
      Sink.writeSidecar(metaPath(path), json)
    }
    new VectorCollection(spark, path, config)
  }

  /** Open a collection through an alias (Qdrant reads via alias names
    * transparently): resolve the pointer, then [[open]] the target. */
  def openAlias(spark: SparkSession, root: String, alias: String): VectorCollection =
    open(spark, Sink.resolveAlias(spark, root, alias))

  /** Qdrant `collection_exists` / the `get_collections()` membership
    * probe the reference runs before every create
    * (`with_jina_text_v4/jina_v4_text_indexer.py:58-66`): a collection
    * exists where its meta sidecar does. */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(metaPath(path))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Qdrant `get_collections`: the collection names under a root — any
    * child directory carrying the meta sidecar (alias pointers and
    * index sidecars are not collections and are skipped). One
    * file-status listing; no data files are opened. */
  def listCollections(spark: SparkSession, root: String): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val r = new org.apache.hadoop.fs.Path(root)
    val fs = r.getFileSystem(conf)
    if (!fs.exists(r)) Nil
    else fs.globStatus(new org.apache.hadoop.fs.Path(r, "*/_graft_meta.json"))
      .toSeq.map(_.getPath.getParent.getName).sorted
  }

  /** Qdrant `delete_collection`: remove the collection directory and
    * EVERY derived sidecar — the IVF index plus all maintenance
    * staging/retired dirs. Deleting the sidecars is a correctness
    * requirement, not tidiness: a shard stranded under
    * `_compact_retired` by a crashed compaction would otherwise be
    * resurrected by compactShards' self-heal into a NEW collection
    * later created at the same path, bringing deleted points back from
    * the dead. Does NOT touch alias pointers — Qdrant aliases dangle
    * too, and [[openAlias]] of a dangling alias fails loudly at open,
    * not silently at query. */
  def drop(spark: SparkSession, path: String): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val existed = fs.exists(p)
    // sidecars FIRST, root LAST: a crash mid-drop must never leave a
    // _compact_retired shard behind with the root already gone — a new
    // collection at the same path would have the dead shard healed
    // back in by compactShards' recovery. Root-last means a partial
    // drop is just an undropped collection. Keep the suffix list in
    // sync with Sink's staging-dir names.
    Seq("_ivf", "_compact_retired", "_compact_staging", "_compacting",
        "_indexing", "_restoring", "_retired")
      .foreach(s => fs.delete(new org.apache.hadoop.fs.Path(path + s), true))
    fs.delete(p, true)
    existed
  }

  /** Open an existing collection with its persisted config. */
  def open(spark: SparkSession, path: String): VectorCollection = {
    val json = Sink.readSidecar(metaPath(path))
    def field(k: String): String =
      json.split(s""""$k":""")(1).split("[,}]")(0).replaceAll("\"", "")
    val shard =
      if (json.contains("\"shardCol\":")) Some(field("shardCol")) else None
    val named =
      if (!json.contains("\"namedVectors\":")) Map.empty[String, (String, Int)]
      else field("namedVectors").split(";").map { ent =>
        val Array(n, cd) = ent.split("=", 2)
        val Array(c, d) = cd.split(":", 2)
        n -> (c, d.toInt)
      }.toMap
    val dist =
      if (json.contains("\"distance\":")) field("distance") else "cosine"
    val sparse =
      if (!json.contains("\"sparseVectors\":")) Map.empty[String, (String, String)]
      else field("sparseVectors").split(";").map { ent =>
        val Array(n, cd) = ent.split("=", 2)
        val Array(ic, vc) = cd.split(":", 2)
        n -> (ic, vc)
      }.toMap
    val cfg = CollectionConfig(field("idCol"), field("vectorCol"),
      field("dim").toInt, field("multiVector").toBoolean, shard, named, dist,
      sparse)
    new VectorCollection(spark, path, cfg)
  }
}
