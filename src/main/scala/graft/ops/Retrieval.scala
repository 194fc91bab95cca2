package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.t
import graft.index.Embedder
import graft.vector.Kernels

/** Lexical (BM25) retrieval and hybrid lexical+vector fusion — the
  * retrieval stack around the reference's vector-only search (Qdrant
  * ships the same combination as its hybrid-search API; the reference
  * uses only the dense side, `with_vdr-2b-multi-v1/query_vdr_2b_multi_v1.py:78-83`).
  *
  * Scale design: term statistics are two corpus aggregations (tf
  * filtered to the query's terms BEFORE the shuffle, so the exploded
  * token stream never materializes for non-query terms; df derived
  * from the tf rows — no second pass over the corpus). Fusion ranks
  * only each retriever's top-N candidate set — global row_number over
  * a corpus is a single-partition sort at scale, so both rankings are
  * `ORDER BY … LIMIT n` (TakeOrderedAndProject) first and a window
  * over the ≤n survivors after.
  *
  * Determinism (oracle rules): integral tf/df/doclen, avgdl from an
  * exact integral sum, per-term partial scores summed in a FIXED
  * written order (one conditional aggregate per term — never a
  * float-sum whose order the shuffle picks), ROUND(...,6), doc_id
  * tiebreaks everywhere.
  */
object Retrieval {

  val K1 = 1.2
  val B = 0.75
  /** Reciprocal-rank-fusion smoothing constant (the standard 60). */
  val RrfK = 60

  /** Per-document BM25 score for `terms` (docs containing none score
    * no row): Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)),
    * idf = ln(1 + (N−df+0.5)/(df+0.5)). */
  def bm25(docs: DataFrame, terms: Seq[String]): DataFrame = {
    val base = docs.select(col("doc_id"),
      TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("double").as("dl"))
    val stats = base.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val tf = base.select(col("doc_id"), col("dl"), explode(col("toks")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("tok"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).cast("double").as("df"))
    val scored = tf.join(df, Seq("tok")).crossJoin(broadcast(stats))
      .select(col("doc_id"), col("tok"),
        (log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") * (K1 + 1.0)) /
          (col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / col("avgdl")))).as("s"))
    // one conditional agg per term, summed in term order: the float
    // sum's association is written down, not left to shuffle order
    val parts = terms.zipWithIndex.map { case (term, i) =>
      sum(when(col("tok") === term, col("s"))).as(s"s$i")
    }
    val total = terms.indices
      .map(i => coalesce(col(s"s$i"), lit(0.0)))
      .reduce(_ + _)
    scored.groupBy(col("doc_id")).agg(parts.head, parts.tail: _*)
      .select(col("doc_id"), round(total, 6).as("bm25"))
  }

  /** Top-`n` candidates of a scored frame as (doc_id, rank): the cut
    * is TakeOrderedAndProject; the rank window runs over ≤n rows. */
  private def rankTop(scored: DataFrame, scoreCol: String, n: Int, rankName: String): DataFrame = {
    val cut = scored.orderBy(col(scoreCol).desc, col("doc_id").asc).limit(n)
    val w = Window.orderBy(col(scoreCol).desc, col("doc_id").asc)
    cut.withColumn(rankName, row_number().over(w).cast("long"))
      .select(col("doc_id"), col(rankName))
  }

  /** Dense scores for the embedded corpus against an embedded text
    * query (the B5/B4 path reused by the fusion). */
  def denseScores(docs: DataFrame, queryText: String): DataFrame = {
    val emb = docs
      .withColumn("_th", Embedder.tokenHashes(col("text")))
      .select(col("doc_id"), Embedder.embedRaw(col("_th")).as("v"))
    val q = emb.sparkSession.range(1)
      .select(Embedder.embedRaw(Embedder.tokenHashes(lit(queryText))).as("qv"))
    emb.crossJoin(broadcast(q))
      .select(col("doc_id"),
        round(Kernels.cosine(col("v"), col("qv")), 6).as("score"))
  }

  /** Reciprocal rank fusion of the two retrievers' top-`n` lists:
    * rrf(d) = Σ_lists 1/(60 + rank_list(d)), absent list contributes 0. */
  def hybridRrf(docs: DataFrame, queryText: String, n: Int, k: Int): DataFrame = {
    val terms = queryText.split(" ").filter(_.nonEmpty).toSeq
    val vecRanks = rankTop(denseScores(docs, queryText), "score", n, "rv")
    val bmRanks = rankTop(bm25(docs, terms), "bm25", n, "rb")
    vecRanks.join(bmRanks, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        round(
          coalesce(lit(1.0) / (lit(RrfK) + col("rv")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(RrfK) + col("rb")), lit(0.0)),
          6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Qdrant's second fusion mode, DBSF (distribution-based score
    * fusion): each retriever's top-`n` scores are min-max normalized to
    * the list's μ±3σ band — (s − (μ−3σ)) / (6σ) — then summed across
    * lists (absent list contributes 0). Unlike RRF it keeps score
    * *magnitudes*, so a runaway best hit stays ahead of a pack of
    * near-ties.
    *
    * Scale: both lists are `ORDER BY … LIMIT n` cuts
    * (TakeOrderedAndProject); μ/σ are one-row aggregates of a ≤n-row
    * list, broadcast back. Determinism: the μ/σ folds run over the list
    * sorted by doc_id (sequential association written down, not left to
    * shuffle order — same pin as the BM25 term sums), σ=0 lists
    * contribute 0 (guarded division, ANSI-safe). */
  def hybridDbsf(docs: DataFrame, queryText: String, n: Int, k: Int): DataFrame = {
    val terms = queryText.split(" ").filter(_.nonEmpty).toSeq
    val vcut = denseScores(docs, queryText)
      .orderBy(col("score").desc, col("doc_id").asc).limit(n)
    val bcut = bm25(docs, terms)
      .orderBy(col("bm25").desc, col("doc_id").asc).limit(n)
    // ONE evaluation of the cut: collect it into a single row, derive
    // μ/σ beside the list, explode back out normalized. The naive
    // cut-crossJoin-aggregate(cut) shape re-executes the whole
    // retriever subplan (corpus scan + scoring) for the one-row μ/σ —
    // top-k cuts get no exchange reuse. The single-row stage is safe
    // at any scale because the cut is ≤n rows by construction.
    def normalized(cut: DataFrame, c: String, outName: String): DataFrame =
      cut.agg(sort_array(collect_list(struct(col("doc_id"), col(c).as("s")))).as("l"))
        .select(col("l"),
          aggregate(col("l"), lit(0.0), (a, x) => a + x.getField("s")).as("sm"),
          aggregate(col("l"), lit(0.0),
            (a, x) => a + x.getField("s") * x.getField("s")).as("sq"),
          size(col("l")).cast("double").as("cnt"))
        .select(col("l"), (col("sm") / col("cnt")).as("mu"),
          sqrt(greatest(
            col("sq") / col("cnt") - (col("sm") / col("cnt")) * (col("sm") / col("cnt")),
            lit(0.0))).as("sg"))
        .select(explode(col("l")).as("e"), col("mu"), col("sg"))
        .select(col("e.doc_id").as("doc_id"),
          when(col("sg") > 0.0,
            (col("e.s") - (col("mu") - lit(3.0) * col("sg"))) / (lit(6.0) * col("sg")))
            .otherwise(lit(0.0)).as(outName))
    normalized(vcut, "score", "nv")
      .join(normalized(bcut, "bm25", "nb"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        round(coalesce(col("nv"), lit(0.0)) + coalesce(col("nb"), lit(0.0)), 6)
          .as("dbsf"))
      .orderBy(col("dbsf").desc, col("doc_id").asc)
      .limit(k)
  }

  // -- sparse vectors ----------------------------------------------

  /** Sparse term-frequency vectors in inverted (postings) layout —
    * Qdrant's sparse-vector points (SPLADE/BM25-style: few non-zero
    * dims out of a large hash space), stored as (doc_id, dim, weight)
    * rows instead of padded arrays. Building the postings table is one
    * explode + map-side-combinable count; `sdim` is the token
    * poly-hash folded into `dim` buckets, so both engines derive
    * identical sparse ids with no vocabulary file. */
  def sparsePostings(docs: DataFrame, dim: Int): DataFrame =
    docs.select(col("doc_id"),
        explode(Embedder.tokenHashes(col("text"))).as("h"))
      .select(col("doc_id"), pmod(col("h"), lit(dim.toLong)).as("sdim"))
      .groupBy(col("doc_id"), col("sdim"))
      .agg(count(lit(1)).as("w"))

  /** Sparse dot-product top-k — the inverted-index query plan: the
    * query's few dims filter the postings scan (predicate pushdown =
    * reading only the query's posting lists, which is exactly what a
    * sparse engine does), the tiny query-weight table broadcasts, and
    * one map-side-combinable aggregate sums per-doc partial products.
    * Weights are integral term frequencies, so the dot product is
    * exact integer math — no float-sum ordering to pin. */
  def sparseSearch(docs: DataFrame, queryText: String, dim: Int, k: Int): DataFrame = {
    val spark = docs.sparkSession
    val qw = spark.range(1)
      .select(explode(Embedder.tokenHashes(lit(queryText))).as("h"))
      .select(pmod(col("h"), lit(dim.toLong)).as("sdim"))
      .groupBy(col("sdim")).agg(count(lit(1)).as("qw"))
    // the query's dim list is a driver-side constant (B5 semantics,
    // like the reference's driver-side query embedding); the IN-list
    // pushes below the postings aggregate to the scan, so a persisted
    // postings index reads only the query's posting lists
    val qdims = qw.select(col("sdim")).collect().map(_.getLong(0)).toSeq
    sparsePostings(docs, dim)
      .filter(col("sdim").isInCollection(qdims))
      .join(broadcast(qw), Seq("sdim"))
      .groupBy(col("doc_id"))
      .agg(sum(col("w") * col("qw")).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Sparse top-k under Qdrant's `Modifier.IDF` (sparse-vector
    * collections configured with `modifier=idf` rescale every QUERY
    * weight by idf(dim) = ln(1 + (N − df + 0.5)/(df + 0.5)) at search
    * time — document weights stay raw tf, which is how Qdrant turns a
    * plain tf sparse index into BM15-style scoring without rewriting
    * the stored vectors).
    *
    * Scale: identical plan shape to [[sparseSearch]] — the query's
    * IN-list still prunes the postings scan — plus one tiny df
    * aggregate over the ALREADY-pruned posting rows (≤|query dims|
    * result rows, broadcast back; no second corpus pass) and the
    * one-row corpus count N. Determinism: w/qw/df/N are integral; the
    * per-doc float sum folds over the dim-sorted partial products
    * (association written down — the BM25/unigram pin). */
  def sparseSearchIdf(docs: DataFrame, queryText: String, dim: Int, k: Int): DataFrame = {
    val spark = docs.sparkSession
    val qw = spark.range(1)
      .select(explode(Embedder.tokenHashes(lit(queryText))).as("h"))
      .select(pmod(col("h"), lit(dim.toLong)).as("sdim"))
      .groupBy(col("sdim")).agg(count(lit(1)).as("qw"))
    val qdims = qw.select(col("sdim")).collect().map(_.getLong(0)).toSeq
    val post = sparsePostings(docs, dim)
      .filter(col("sdim").isInCollection(qdims))
    // N counts EVERY collection point (docs with none of the query's
    // dims included — Qdrant's idf is collection-global), one scalar
    val nDocs = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val df = post.groupBy(col("sdim"))
      .agg(count(lit(1)).cast("double").as("df"))
    val qidf = qw.join(df, Seq("sdim")).crossJoin(broadcast(nDocs))
      .select(col("sdim"),
        (col("qw").cast("double") *
          log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
          .as("qi"))
    post.join(broadcast(qidf), Seq("sdim"))
      .select(col("doc_id"), col("sdim"), (col("w").cast("double") * col("qi")).as("p"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("sdim"), col("p")))).as("l"))
      .select(col("doc_id"),
        round(aggregate(col("l"), lit(0.0), (a, x) => a + x.getField("p")), 6)
          .as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  // -- query/oracle registry ---------------------------------------

  private val QueryText = "hash join merge"
  private val Terms = Seq("hash", "join", "merge")
  private val SparseDim = 1024

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_bm25_topk" -> ((s, dir) =>
      bm25(t(s, dir, "documents"), Terms)
        .orderBy(col("bm25").desc, col("doc_id").asc)
        .limit(10)),
    "x_hybrid_rrf" -> ((s, dir) =>
      hybridRrf(t(s, dir, "documents"), QueryText, n = 100, k = 10)),
    "x_hybrid_dbsf" -> ((s, dir) =>
      hybridDbsf(t(s, dir, "documents"), QueryText, n = 100, k = 10)),
    "x_sparse_topk" -> ((s, dir) =>
      sparseSearch(t(s, dir, "documents"), QueryText, SparseDim, 10)),
    "x_sparse_idf" -> ((s, dir) =>
      sparseSearchIdf(t(s, dir, "documents"), QueryText, SparseDim, 10))
  )

  private def duckBm25Ctes: String = {
    val toks = TextAnalysis.duckToksPublic("text")
    val termList = Terms.map(t => s"'$t'").mkString(", ")
    val partCols = Terms.zipWithIndex.map { case (t, i) =>
      s"sum(CASE WHEN tok = '$t' THEN s END) AS s$i"
    }.mkString(", ")
    val totalExpr = Terms.indices.map(i => s"coalesce(s$i, 0)").mkString(" + ")
    s"""base AS (SELECT doc_id, len($toks)::DOUBLE AS dl, $toks AS toks FROM documents),
       |stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM base),
       |tf AS (SELECT doc_id, dl, tok, count(*)::DOUBLE AS tf FROM (
       |    SELECT doc_id, dl, unnest(toks) AS tok FROM base) z
       |  WHERE tok IN ($termList) GROUP BY doc_id, dl, tok),
       |dfq AS (SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok),
       |sc AS (SELECT doc_id, tok,
       |    ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * (tf * ${K1 + 1.0}) /
       |      (tf + $K1 * (${1.0 - B} + $B * dl / avgdl)) AS s
       |  FROM tf JOIN dfq USING (tok), stats),
       |bm AS (SELECT doc_id, ROUND($totalExpr, 6) AS bm25 FROM (
       |  SELECT doc_id, $partCols FROM sc GROUP BY doc_id) p)""".stripMargin
  }

  def oracles: Map[String, String] = Map(
    "x_bm25_topk" ->
      s"""WITH $duckBm25Ctes
         |SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id ASC LIMIT 10""".stripMargin,

    "x_sparse_topk" ->
      s"""WITH post AS (SELECT doc_id, h % $SparseDim AS sdim, count(*) AS w FROM (
         |    SELECT doc_id, unnest(${Embedder.duckTokenHashes("text")}) AS h FROM documents) z
         |  GROUP BY doc_id, h % $SparseDim),
         |qp AS (SELECT h % $SparseDim AS sdim, count(*) AS qw FROM (
         |    SELECT unnest(${Embedder.duckTokenHashes(s"'$QueryText'")}) AS h) z
         |  GROUP BY h % $SparseDim)
         |SELECT doc_id, sum(w * qw)::BIGINT AS score
         |FROM post JOIN qp USING (sdim)
         |GROUP BY doc_id ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin,

    "x_sparse_idf" ->
      s"""WITH post AS (SELECT doc_id, h % $SparseDim AS sdim, count(*) AS w FROM (
         |    SELECT doc_id, unnest(${Embedder.duckTokenHashes("text")}) AS h FROM documents) z
         |  GROUP BY doc_id, h % $SparseDim),
         |qp AS (SELECT h % $SparseDim AS sdim, count(*) AS qw FROM (
         |    SELECT unnest(${Embedder.duckTokenHashes(s"'$QueryText'")}) AS h) z
         |  GROUP BY h % $SparseDim),
         |pruned AS (SELECT * FROM post WHERE sdim IN (SELECT sdim FROM qp)),
         |nd AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
         |dfq AS (SELECT sdim, count(*)::DOUBLE AS df FROM pruned GROUP BY sdim),
         |qidf AS (SELECT sdim,
         |    qw::DOUBLE * ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) AS qi
         |  FROM qp JOIN dfq USING (sdim), nd),
         |parts AS (SELECT doc_id,
         |    list(w::DOUBLE * qi ORDER BY sdim) AS l
         |  FROM pruned JOIN qidf USING (sdim) GROUP BY doc_id)
         |SELECT doc_id,
         |  ROUND(list_reduce(list_prepend(0.0, l), (a, b) -> a + b), 6) AS score
         |FROM parts ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin,

    "x_hybrid_dbsf" -> {
      val embed = Embedder.duckEmbedRaw(Embedder.duckTokenHashes("text"))
      val qEmbed = Embedder.duckEmbedRaw(Embedder.duckTokenHashes(s"'$QueryText'"))
      // per-list CTE triple: ordered-fold sums → μ/σ → normalized
      def band(cut: String, scoreCol: String, outName: String, p: String): String =
        s"""${p}l AS (SELECT list($scoreCol ORDER BY doc_id) AS l FROM $cut),
           |${p}st AS (SELECT list_reduce(l, (a,b) -> a+b) AS sm,
           |    list_reduce(list_transform(l, x -> x*x), (a,b) -> a+b) AS sq,
           |    len(l)::DOUBLE AS cnt FROM ${p}l),
           |${p}ms AS (SELECT sm/cnt AS mu,
           |    sqrt(greatest(sq/cnt - (sm/cnt)*(sm/cnt), 0.0)) AS sg FROM ${p}st),
           |${p}n AS (SELECT doc_id,
           |    CASE WHEN sg > 0.0 THEN ($scoreCol - (mu - 3.0*sg)) / (6.0*sg)
           |      ELSE 0.0 END AS $outName
           |  FROM $cut, ${p}ms)""".stripMargin
      s"""WITH $duckBm25Ctes,
         |emb AS (SELECT doc_id, $embed AS v FROM documents),
         |qv AS (SELECT $qEmbed AS q),
         |vcut AS (SELECT doc_id,
         |    ROUND(list_cosine_similarity(v::DOUBLE[], (SELECT q FROM qv)::DOUBLE[]), 6) AS score
         |  FROM emb ORDER BY score DESC, doc_id ASC LIMIT 100),
         |bcut AS (SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id ASC LIMIT 100),
         |${band("vcut", "score", "nv", "v")},
         |${band("bcut", "bm25", "nb", "b")}
         |SELECT doc_id, ROUND(coalesce(nv, 0.0) + coalesce(nb, 0.0), 6) AS dbsf
         |FROM vn FULL JOIN bn USING (doc_id)
         |ORDER BY dbsf DESC, doc_id ASC LIMIT 10""".stripMargin
    },

    "x_hybrid_rrf" -> {
      val embed = Embedder.duckEmbedRaw(Embedder.duckTokenHashes("text"))
      val qEmbed = Embedder.duckEmbedRaw(Embedder.duckTokenHashes(s"'$QueryText'"))
      s"""WITH $duckBm25Ctes,
         |emb AS (SELECT doc_id, $embed AS v FROM documents),
         |qv AS (SELECT $qEmbed AS q),
         |vcut AS (SELECT doc_id,
         |    ROUND(list_cosine_similarity(v::DOUBLE[], (SELECT q FROM qv)::DOUBLE[]), 6) AS score
         |  FROM emb ORDER BY score DESC, doc_id ASC LIMIT 100),
         |vr AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rv FROM vcut),
         |bcut AS (SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id ASC LIMIT 100),
         |br AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rb FROM bcut)
         |SELECT doc_id,
         |  ROUND(coalesce(1.0 / ($RrfK + rv), 0.0) + coalesce(1.0 / ($RrfK + rb), 0.0), 6) AS rrf
         |FROM vr FULL JOIN br USING (doc_id)
         |ORDER BY rrf DESC, doc_id ASC LIMIT 10""".stripMargin
    }
  )
}
