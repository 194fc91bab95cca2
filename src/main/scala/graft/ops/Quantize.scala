package graft.ops

import org.apache.spark.sql.{Column, SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.vector.Kernels

/** Int8 scalar quantization for dense vectors — the Spark analog of
  * Qdrant's scalar-quantization search mode (quantize at ingest, score
  * the compressed vectors, rescore the survivors against the
  * originals). The reference's collections are raw float32
  * (`with_vdr-2b-multi-v1/incremental_indexing_vdr_2b_multi_v1.py:80-88`
  * declares only size+distance), but at 100 TB the 4× smaller int8
  * column is the difference between a scan that fits page cache and
  * one that doesn't: the stored layout is `(codes array<tinyint>,
  * scale float)` per vector, column pruning reads ONLY those for the
  * candidate pass, and the full-precision column is fetched for the
  * top-N rerank alone.
  *
  * Quantization is symmetric per-vector: scale = max|x|/127,
  * code_i = round(x_i/scale) ∈ [−127,127]. Dequantized scoring
  * (code·scale) keeps the math in double so the DuckDB oracle
  * reproduces it bit-for-bit.
  */
object Quantize {

  /** Per-vector symmetric int8 scale: max|x| / 127 (double). */
  def int8Scale(v: Column): Column =
    array_max(transform(v, x => abs(x.cast("double")))) / 127.0

  /** Int8 codes for `v` against `scale` (|code| ≤ 127 by construction
    * of the scale; zero-vector guard lives in the caller). */
  def int8Codes(v: Column, scale: Column): Column =
    transform(v, x => round(x.cast("double") / scale, 0).cast("int"))

  /** Dequantized vector — what the compressed scan scores against. */
  def dequant(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast("double") * scale)

  /** embedding → (embedding, dq) with the zero-vector guard: a zero
    * vector quantizes to zeros instead of dividing by a zero scale. */
  def withDequant(e: DataFrame): DataFrame = e
    .select(col("vec_id"), col("embedding"), int8Scale(col("embedding")).as("qs"))
    .select(col("vec_id"), col("embedding"),
      when(col("qs") > 0, dequant(int8Codes(col("embedding"), col("qs")), col("qs")))
        .otherwise(transform(col("embedding"), _ => lit(0.0))).as("dq"))

  // -- binary quantization -----------------------------------------

  /** 32 sign bits of dims `start+1 .. start+32` packed into one
    * BIGINT (bit j set iff component > 0) — Qdrant's binary
    * quantization layout, 32× smaller than float32. Two halves per
    * 64-d vector keep every bit below 2^32 so the packed value can
    * never overflow a BIGINT in either engine. The 2^j term uses the
    * floor(pow) construction both engines evaluate identically
    * (same device as [[Dedup.simhashHof]]). */
  def bqBits(v: Column, start: Int): Column =
    Kernels.ofExpr(graft.vector.SignBitsPack(Kernels.exprOf(v), start, 32))

  /** HOF twin of [[bqBits]] (NativeParitySpec cross-checks). */
  def bqBitsHof(v: Column, start: Int): Column =
    aggregate(
      zip_with(slice(v, start + 1, 32), sequence(lit(0L), lit(31L)),
        (x, j) => when(x > 0f,
          floor(pow(lit(2.0), j.cast("double"))).cast("long")).otherwise(lit(0L))),
      lit(0L), (a, b) => a + b)

  /** Driver-side twin of [[bqBits]] for the query vector (same SQL
    * NaN-above-zero comparison semantics as the column paths). */
  def bqBitsLocal(v: Array[Float], start: Int): Long =
    (0 until 32).map { j =>
      val x = v(start + j)
      if (x > 0f || x.isNaN) 1L << j else 0L
    }.sum

  def duckBqBits(vecExpr: String, start: Int): String =
    s"list_sum(list_transform(range(0, 32), j -> CASE WHEN $vecExpr[j + ${start + 1}] > 0 " +
      "THEN floor(2.0 ** j)::BIGINT ELSE 0 END))::BIGINT"

  // -- product quantization ----------------------------------------

  /** PQ codes: the vector is split into `m` subvectors of `subDim`
    * dims; each subvector is replaced by the index (1-based) of its
    * nearest codebook centroid in that subspace (squared-L2,
    * first-min tie-break via array_position). 64 floats (256 B)
    * become 8 small ints — with 16 centroids, 4 bits each, a 64×
    * compression, the layout IVF+PQ engines (Jégou et al., "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011) scan at
    * billion-vector scale. The codebook is an index-build-time
    * constant (here: fixture vectors 1–16, the same deterministic
    * device as [[graft.ops.Similarity.fixturePlanes]]; production
    * k-means trains it once on a sample). Narrow map, no shuffle:
    * m×k×subDim multiplies per row. */
  def pqCodes(v: Column, cb: Seq[Seq[Float]], m: Int, subDim: Int): Column =
    Kernels.ofExpr(graft.vector.PqEncode(
      Kernels.exprOf(v), cb.map(_.toArray).toArray, m, subDim))

  /** HOF twin of [[pqCodes]] (NativeParitySpec cross-checks): per
    * subspace, array_position(array_min) over the per-centroid
    * squared-L2 fold — same order, same first-min tie-break. */
  def pqCodesHof(v: Column, cb: Seq[Seq[Float]], m: Int, subDim: Int): Column = {
    val cbLit = typedlit(cb)
    array((0 until m).map { s =>
      val dists = transform(cbLit, cent =>
        aggregate(
          zip_with(slice(v, s * subDim + 1, subDim), slice(cent, s * subDim + 1, subDim),
            (x, y) => (x.cast("double") - y.cast("double")) *
              (x.cast("double") - y.cast("double"))),
          lit(0.0), (a, x) => a + x))
      array_position(dists, array_min(dists)).cast("int")
    }: _*)
  }

  /** PQ reconstruction: concatenate the coded centroids' subvectors.
    * Scoring the reconstruction against a query is exactly ADC
    * (asymmetric distance computation) — a production scan replaces
    * the materialized reconstruction with a per-query m×k lookup
    * table of subspace dot products; the scores are identical. */
  def pqDecode(codes: Column, cb: Seq[Seq[Float]], m: Int, subDim: Int): Column =
    Kernels.ofExpr(graft.vector.PqDecode(
      Kernels.exprOf(codes), cb.map(_.toArray).toArray, m, subDim))

  /** HOF twin of [[pqDecode]]. */
  def pqDecodeHof(codes: Column, cb: Seq[Seq[Float]], m: Int, subDim: Int): Column = {
    val cbLit = typedlit(cb)
    flatten(array((0 until m).map { s =>
      slice(element_at(cbLit, element_at(codes, s + 1)), s * subDim + 1, subDim)
    }: _*))
  }

  /** Lloyd refinement of the PQ codebook: `iters` rounds of
    * (encode → per-(subspace, code, dim) mean). Encoding is the narrow
    * native expression; the means aggregate returns m×k×subDim scalars
    * to the driver — codebook-sized, an index-build-time constant like
    * the IVF centroids ([[Similarity.ivfRefineCentroids]]). A codebook
    * entry's slice is only updated in subspaces where it was assigned;
    * empty (subspace, code) cells keep their seed. The fixture query
    * keeps the untrained seed codebook so the DuckDB oracle stays
    * expressible; the improvement is the spec-gated Lloyd guarantee
    * (reconstruction error never increases). */
  def pqTrain(
      data: DataFrame,
      cb0: Seq[Seq[Float]],
      m: Int, subDim: Int, iters: Int): Seq[Seq[Float]] = {
    var cur = cb0
    for (_ <- 0 until iters) {
      val means = data
        .select(col("embedding"),
          posexplode(pqCodes(col("embedding"), cur, m, subDim)).as(Seq("s", "code")))
        .select(col("s"), col("code"),
          posexplode(slice(col("embedding"), col("s") * subDim + 1, lit(subDim)))
            .as(Seq("i", "x")))
        .groupBy(col("s"), col("code"), col("i"))
        .agg(avg(col("x")).as("mean"))
        .collect()
      val next = cur.map(_.toArray).toArray
      means.foreach { r =>
        next(r.getInt(1) - 1)(r.getInt(0) * subDim + r.getInt(2)) =
          r.getDouble(3).toFloat
      }
      cur = next.map(_.toSeq).toSeq
    }
    cur
  }

  /** Mean squared reconstruction error — the objective [[pqTrain]]
    * minimizes (per-subspace k-means inertia, summed). */
  def pqInertia(data: DataFrame, cb: Seq[Seq[Float]], m: Int, subDim: Int): Double = {
    val row = data.select(
        aggregate(
          zip_with(col("embedding"),
            pqDecode(pqCodes(col("embedding"), cb, m, subDim), cb, m, subDim),
            (x, y) => (x.cast("double") - y.cast("double")) *
              (x.cast("double") - y.cast("double"))),
          lit(0.0), (a, x) => a + x).as("e"))
      .agg(avg(col("e"))).head
    require(!row.isNullAt(0),
      "pqInertia over an empty corpus — the reconstruction objective is " +
        "undefined on zero vectors (was an NPE)")
    row.getDouble(0)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Quantized search + full-precision rerank: top-20 candidates by
    // int8-dequantized cosine, then the final top-5 rescored against
    // the raw vectors — Qdrant's `quantization.rescore=true` flow.
    // Emitting BOTH scores makes the compression error a graded
    // output (qscore vs score), not an invisible approximation.
    "x_quant_rerank" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val qRow = e.filter(col("vec_id") === 0).head
      val qv = typedlit(qRow.getSeq[Float](qRow.fieldIndex("embedding")))
      val cand = withDequant(e)
        .select(col("vec_id"), col("embedding"),
          round(Kernels.cosine(col("dq"), qv), 6).as("qscore"))
        .orderBy(col("qscore").desc, col("vec_id").asc).limit(20)
      cand.select(col("vec_id"), col("qscore"),
          round(Kernels.cosine(col("embedding"), qv), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id").asc).limit(5)
    }),

    // Binary-quantized search + full-precision rerank: candidates by
    // Hamming distance over 64 packed sign bits (two BIGINT halves,
    // xor + popcount — Qdrant's binary quantization with
    // rescore=true), final top-5 rescored against the raw floats.
    // The candidate scan reads 16 bytes/vector instead of 256.
    "x_bq_rerank" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val qRow = e.filter(col("vec_id") === 0).head
      val q = qRow.getSeq[Float](qRow.fieldIndex("embedding")).toArray
      val (qlo, qhi) = (bqBitsLocal(q, 0), bqBitsLocal(q, 32))
      val cand = e
        .select(col("vec_id"), col("embedding"),
          (bit_count(bqBits(col("embedding"), 0).bitwiseXOR(lit(qlo))) +
            bit_count(bqBits(col("embedding"), 32).bitwiseXOR(lit(qhi))))
            .cast("long").as("hamming"))
        .orderBy(col("hamming").asc, col("vec_id").asc).limit(20)
      cand.select(col("vec_id"), col("hamming"),
          round(Kernels.cosine(col("embedding"), typedlit(q.toSeq)), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id").asc).limit(5)
    }),

    // Qdrant's NESTED-prefetch pattern (`query_points` with
    // `prefetch: {prefetch: {query: bq}, query: int8}, query: full`):
    // a 3-stage funnel — Hamming over 16-byte sign signatures prunes
    // the corpus to 100, int8-dequantized cosine prunes to 20, full
    // floats score 5. Each stage reads strictly cheaper bytes than the
    // one after it; all three cuts are TakeOrderedAndProject and the
    // whole chain is shuffle-free. At 100 TB the stage-1 scan touches
    // 1/16 of the vector bytes and later stages touch ~nothing.
    "x_multistage_rescore" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val qRow = e.filter(col("vec_id") === 0).head
      val q = qRow.getSeq[Float](qRow.fieldIndex("embedding")).toArray
      val (qlo, qhi) = (bqBitsLocal(q, 0), bqBitsLocal(q, 32))
      val qv = typedlit(q.toSeq)
      val s1 = e.select(col("vec_id"), col("embedding"),
          (bit_count(bqBits(col("embedding"), 0).bitwiseXOR(lit(qlo))) +
            bit_count(bqBits(col("embedding"), 32).bitwiseXOR(lit(qhi))))
            .cast("long").as("hamming"))
        .orderBy(col("hamming").asc, col("vec_id").asc).limit(100)
      // one collapsible projection: naming `qs` in its own select
      // blocks CollapseProject (it is referenced three times), which
      // breaks stage 1's Limit(Sort) pattern and re-plans it as a
      // corpus-wide range-partition sort — the shuffle this funnel
      // exists to avoid. Recomputing the scale inline costs O(d) on
      // 100 survivor rows; the shuffle would cost the corpus.
      val qsC = int8Scale(col("embedding"))
      val dqC = when(qsC > 0, dequant(int8Codes(col("embedding"), qsC), qsC))
        .otherwise(transform(col("embedding"), _ => lit(0.0)))
      val s2 = s1
        .select(col("vec_id"), col("embedding"), col("hamming"),
          round(Kernels.cosine(dqC, qv), 6).as("qscore"))
        .orderBy(col("qscore").desc, col("vec_id").asc).limit(20)
      s2.select(col("vec_id"), col("hamming"), col("qscore"),
          round(Kernels.cosine(col("embedding"), qv), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id").asc).limit(5)
    }),

    // PQ candidate scan + full-precision rerank: top-20 by
    // reconstructed-vector (ADC) cosine, final top-5 rescored raw.
    // Both scores emitted so the PQ approximation error is graded.
    "x_pq_rerank" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val cb = e.filter(col("vec_id") >= 1 && col("vec_id") <= 16)
        .orderBy(col("vec_id")).collect()
        .map(r => r.getSeq[Float](r.fieldIndex("embedding")).toSeq).toSeq
      val qRow = e.filter(col("vec_id") === 0).head
      val qv = typedlit(qRow.getSeq[Float](qRow.fieldIndex("embedding")))
      val dq = pqDecode(pqCodes(col("embedding"), cb, 8, 8), cb, 8, 8)
      val cand = e
        .select(col("vec_id"), col("embedding"),
          round(Kernels.cosine(dq, qv), 6).as("qscore"))
        .orderBy(col("qscore").desc, col("vec_id").asc).limit(20)
      cand.select(col("vec_id"), col("qscore"),
          round(Kernels.cosine(col("embedding"), qv), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id").asc).limit(5)
    })
  )

  def oracles: Map[String, String] = Map(
    "x_quant_rerank" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |s1 AS (SELECT vec_id, embedding,
         |    list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0 AS qs
         |  FROM embeddings),
         |d AS (SELECT vec_id, embedding, CASE WHEN qs > 0
         |    THEN list_transform(embedding::DOUBLE[], x -> (round(x / qs, 0)::INTEGER)::DOUBLE * qs)
         |    ELSE list_transform(embedding::DOUBLE[], x -> 0.0) END AS dq FROM s1),
         |cand AS (SELECT vec_id, embedding,
         |    ROUND(list_cosine_similarity(dq, (SELECT qv FROM q)::DOUBLE[]), 6) AS qscore
         |  FROM d ORDER BY qscore DESC, vec_id ASC LIMIT 20)
         |SELECT vec_id, qscore,
         |  ROUND(list_cosine_similarity(embedding::DOUBLE[], (SELECT qv FROM q)::DOUBLE[]), 6) AS score
         |FROM cand ORDER BY score DESC, vec_id ASC LIMIT 5""".stripMargin,

    "x_bq_rerank" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |qb AS (SELECT ${duckBqBits("qv", 0)} AS qlo, ${duckBqBits("qv", 32)} AS qhi FROM q),
         |b AS (SELECT vec_id, embedding,
         |    ${duckBqBits("embedding", 0)} AS lo, ${duckBqBits("embedding", 32)} AS hi
         |  FROM embeddings),
         |cand AS (SELECT vec_id, embedding,
         |    (bit_count(xor(lo, qlo)) + bit_count(xor(hi, qhi)))::BIGINT AS hamming
         |  FROM b, qb ORDER BY hamming ASC, vec_id ASC LIMIT 20)
         |SELECT vec_id, hamming,
         |  ROUND(list_cosine_similarity(embedding::DOUBLE[], (SELECT qv FROM q)::DOUBLE[]), 6) AS score
         |FROM cand ORDER BY score DESC, vec_id ASC LIMIT 5""".stripMargin,

    "x_multistage_rescore" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |qb AS (SELECT ${duckBqBits("qv", 0)} AS qlo, ${duckBqBits("qv", 32)} AS qhi FROM q),
         |b AS (SELECT vec_id, embedding,
         |    ${duckBqBits("embedding", 0)} AS lo, ${duckBqBits("embedding", 32)} AS hi
         |  FROM embeddings),
         |s1 AS (SELECT vec_id, embedding,
         |    (bit_count(xor(lo, qlo)) + bit_count(xor(hi, qhi)))::BIGINT AS hamming
         |  FROM b, qb ORDER BY hamming ASC, vec_id ASC LIMIT 100),
         |sc AS (SELECT vec_id, embedding, hamming,
         |    list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0 AS qs
         |  FROM s1),
         |dq AS (SELECT vec_id, embedding, hamming, CASE WHEN qs > 0
         |    THEN list_transform(embedding::DOUBLE[], x -> (round(x / qs, 0)::INTEGER)::DOUBLE * qs)
         |    ELSE list_transform(embedding::DOUBLE[], x -> 0.0) END AS dqv FROM sc),
         |s2 AS (SELECT vec_id, embedding, hamming,
         |    ROUND(list_cosine_similarity(dqv, (SELECT qv FROM q)::DOUBLE[]), 6) AS qscore
         |  FROM dq ORDER BY qscore DESC, vec_id ASC LIMIT 20)
         |SELECT vec_id, hamming, qscore,
         |  ROUND(list_cosine_similarity(embedding::DOUBLE[], (SELECT qv FROM q)::DOUBLE[]), 6) AS score
         |FROM s2 ORDER BY score DESC, vec_id ASC LIMIT 5""".stripMargin,

    "x_pq_rerank" ->
      s"""WITH cb AS (SELECT vec_id AS cid, embedding FROM embeddings
         |  WHERE vec_id BETWEEN 1 AND 16),
         |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         |d AS (SELECT e.vec_id, s.s, c.cid,
         |    list_reduce(list_transform(range(1, 9), i ->
         |      (e.embedding[s.s*8 + i]::DOUBLE - c.embedding[s.s*8 + i]::DOUBLE)
         |      * (e.embedding[s.s*8 + i]::DOUBLE - c.embedding[s.s*8 + i]::DOUBLE)),
         |      (a, b) -> a + b) AS dist
         |  FROM embeddings e, (SELECT unnest(range(0, 8)) AS s) s, cb c),
         |best AS (SELECT vec_id, s, cid FROM (
         |    SELECT vec_id, s, cid,
         |      row_number() OVER (PARTITION BY vec_id, s ORDER BY dist ASC, cid ASC) AS rn
         |    FROM d) z WHERE rn = 1),
         |recon AS (SELECT b.vec_id,
         |    flatten(list(c.embedding[b.s*8 + 1 : b.s*8 + 8] ORDER BY b.s)) AS dq
         |  FROM best b JOIN cb c ON c.cid = b.cid GROUP BY b.vec_id),
         |cand AS (SELECT r.vec_id, e.embedding,
         |    ROUND(list_cosine_similarity(r.dq::DOUBLE[], (SELECT qv FROM q)::DOUBLE[]), 6) AS qscore
         |  FROM recon r JOIN embeddings e USING (vec_id)
         |  ORDER BY qscore DESC, vec_id ASC LIMIT 20)
         |SELECT vec_id, qscore,
         |  ROUND(list_cosine_similarity(embedding::DOUBLE[], (SELECT qv FROM q)::DOUBLE[]), 6) AS score
         |FROM cand ORDER BY score DESC, vec_id ASC LIMIT 5""".stripMargin
  )
}
