package graft.vector

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector-similarity kernels as Catalyst higher-order-function column
  * builders (SURVEY.md §2 F1–F3). These reproduce the scoring semantics
  * the reference delegates to Qdrant: COSINE distance on dense
  * collections (reference `with_colpali_v1.3/incremental_indexing_colpali_with_qdrant.py:127`,
  * `with_vdr-2b-multi-v1/incremental_indexing_vdr_2b_multi_v1.py:82`) and
  * the MAX_SIM late-interaction comparator on multi-vector collections
  * (`with_colpali_v1.3/...py:128-130`, rationale comment
  * `with_jina_embeddings_v4/jina_v4_image_indexer.py:83-88`).
  *
  * Everything here is built from `org.apache.spark.sql.functions` HOFs
  * (`zip_with`/`aggregate`/`transform`) so the whole scoring pipeline
  * stays inside whole-stage codegen — no UDF serialization, no row
  * boundary crossings. Math is done in DoubleType (cast up from the
  * stored float32 vectors) with a sequential left-fold accumulation so
  * scores are reproducible across engines (SURVEY.md §7.6).
  */
object Kernels {

  /** Column from a native catalyst Expression. */
  private[graft] def ofExpr(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.GraftColumnBridge.column(e)

  /** Catalyst Expression behind a Column. */
  private[graft] def exprOf(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.GraftColumnBridge.expression(c)

  /** Cast a float vector column up to array<double> for stable math. */
  def toDouble(a: Column): Column = a.cast("array<double>")

  /** Column form of the [[TopKHits]] bounded-heap aggregate: best `k`
    * (score, id) pairs per group, score DESC / id ASC — bit-equal to a
    * row_number window cut but with O(k) state that pre-reduces
    * map-side (ObjectHashAggregate partial mode) instead of shuffling
    * and sorting every candidate per group. The ranking primitive for
    * every broadcast-query batch operator. */
  def topKHits(score: Column, id: Column, k: Int): Column =
    // numeric widening here; the expression validates (double, long) at
    // analysis, so a structurally wrong child (array, struct, map) fails
    // before the job runs. A STRING child still passes analysis — the
    // cast is legal — and dies as an ANSI cast error in the job; that is
    // the cast's standard contract, and better than the bare
    // ClassCastException inside update() this wrapper replaces.
    ofExpr(TopKHits(exprOf(score.cast("double")), exprOf(id.cast("long")), k)
      .toAggregateExpression())

  /** Sequential-fold dot product: Σ a_i * b_i (native; HOF twin below
    * for oracle documentation + cross-checks). */
  def dot(a: Column, b: Column): Column =
    ofExpr(DotProduct(exprOf(a), exprOf(b)))

  /** HOF twin of [[dot]]. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0),
      (s, x) => s + x)

  /** Squared L2 norm: Σ a_i². */
  def l2normSq(a: Column): Column =
    aggregate(transform(toDouble(a), x => x * x), lit(0.0), (s, x) => s + x)

  /** L2 norm ‖a‖. */
  def l2norm(a: Column): Column = sqrt(l2normSq(a))

  /** Cosine similarity dot(a,b)/(‖a‖‖b‖), null on zero vectors — the
    * explicit guard keeps ANSI mode (Spark 4 default) enabled without
    * a lone zero vector failing a whole job at scale. Native
    * expression; [[cosineHof]] is the HOF twin. Portability note:
    * DuckDB's `list_cosine_similarity` returns −1.0 for a zero vector
    * (not NULL), so a compared query scoring a zero vector would
    * diverge LOUDLY at the gate — zero vectors are unreachable in the
    * fixtures (audited r10) and a cosine collection normalizes at
    * ingest; guard the oracle with `CASE WHEN` if one ever appears. */
  def cosine(a: Column, b: Column): Column =
    ofExpr(CosineSim(exprOf(a), exprOf(b)))

  /** HOF twin of [[cosine]] (identical fold order and zero guard). */
  def cosineHof(a: Column, b: Column): Column = {
    val denom = l2norm(a) * l2norm(b)
    when(denom =!= 0.0, dotHof(a, b) / denom)
  }

  /** Euclidean (L2) distance — Qdrant `Distance.EUCLID`; smaller =
    * closer, so top-k over it ranks ASC. Native expression;
    * [[euclideanHof]] is the oracle-semantics twin. */
  def euclidean(a: Column, b: Column): Column =
    ofExpr(EuclideanDist(exprOf(a), exprOf(b)))

  /** HOF twin of [[euclidean]] (same left-to-right squared-diff fold). */
  def euclideanHof(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(toDouble(a), toDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (s, x) => s + x))

  /** Manhattan (L1) distance — Qdrant `Distance.MANHATTAN`; ranks ASC
    * like Euclid. Native expression; [[manhattanHof]] is the twin. */
  def manhattan(a: Column, b: Column): Column =
    ofExpr(ManhattanDist(exprOf(a), exprOf(b)))

  /** HOF twin of [[manhattan]]. */
  def manhattanHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(toDouble(a), toDouble(b), (x, y) => abs(x - y)),
      lit(0.0),
      (s, x) => s + x)

  /** L2-normalize: a / ‖a‖ (Qdrant normalizes cosine collections at
    * upload — SURVEY.md §2 E1). Zero vectors map to null. Native
    * expression; the HOF twin re-evaluates the norm aggregate per
    * element (the quadratic-lambda trap), so it exists only as oracle
    * documentation + parity check. */
  def normalize(a: Column): Column = ofExpr(L2Normalize(exprOf(a)))

  /** HOF twin of [[normalize]]. */
  def normalizeHof(a: Column): Column = {
    val n = l2norm(a)
    when(n =!= 0.0, transform(toDouble(a), x => x / n))
  }

  /** ColBERT-style late interaction (SURVEY.md §2 F2): for multi-vector
    * query Q and document D (both array<array<float>>),
    * maxsim(Q, D) = Σ_{q∈Q} max_{d∈D} cosine(q, d).
    * Declared as the collection comparator at reference
    * `with_colpali_v1.3/...py:128-130`. Nested HOFs keep it codegen'd.
    */
  def maxsim(q: Column, d: Column): Column =
    ofExpr(MaxSim(exprOf(q), exprOf(d)))

  /** HOF twin of [[maxsim]]. */
  def maxsimHof(q: Column, d: Column): Column =
    aggregate(
      q,
      lit(0.0),
      (s, qv) => s + array_max(transform(d, dv => cosineHof(qv, dv))))

  /** Element-wise mean of a token matrix (`array<array<float>>` →
    * `array<double>`): ColBERT-style mean pooling, the dense
    * `prefetch` representation for multi-vector points. ONE zip_with
    * fold in row order — never an aggregate inside a per-element
    * lambda (the quadratic re-evaluation trap) — and the same
    * left-to-right sum the DuckDB oracle writes, so 6dp rounds agree.
    * Null on an empty matrix (guarded division, ANSI-safe). */
  def meanPool(vecs: Column, dim: Int): Column =
    when(size(vecs) > 0,
      transform(
        aggregate(vecs, array_repeat(lit(0.0), dim),
          (acc, v) => zip_with(acc, toDouble(v), (a, b) => a + b)),
        x => x / size(vecs)))

  /** MaxSim over pre-normalized token vectors (cosine == dot): cheaper
    * inner loop for the hot path when ingest normalized (E1). */
  def maxsimDot(q: Column, d: Column): Column =
    aggregate(
      q,
      lit(0.0),
      (s, qv) => s + array_max(transform(d, dv => dot(qv, dv))))
}
