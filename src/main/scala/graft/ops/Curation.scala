package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.t
import graft.index.Embedder

/** Corpus-curation operators a training-data pipeline runs after
  * dedup/quality scoring (extension per SURVEY.md §2 G — the reference
  * stops at indexing; curation is what the indexed corpus is FOR):
  *
  *  - deterministic train/valid/test splits keyed on a content-stable
  *    hash, so growing the corpus never moves an existing document
  *    between splits (the leakage property random splits lack), and
  *  - per-domain caps (keep the k best-quality documents per source)
  *    to stop a single crawl domain from dominating the mixture.
  *
  * Scale: the split is a pure narrow map (a hash and two comparisons
  * per row — no shuffle, no state); the cap is the standard
  * top-k-per-group window, one shuffle keyed on the domain.
  */
object Curation {

  /** Split assignment from the 60-bit md5 id hash, mod 100:
    * <90 train, <95 valid, else test. */
  def withSplit(docs: DataFrame): DataFrame = {
    val b = pmod(Embedder.stringHash64(col("doc_id").cast("string")), lit(100L))
    docs.withColumn("split",
      when(b < 90, "train").when(b < 95, "valid").otherwise("test"))
  }

  /** Keep the `k` best-quality documents per source domain
    * (quality-desc, doc_id-asc tiebreak on the rounded score so the
    * cut is reproducible across engines). */
  def domainCap(docs: DataFrame, k: Int): DataFrame = {
    val q = TextAnalysis.qualityScore(docs).select(col("doc_id"), col("quality"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality").desc, col("doc_id").asc)
    docs.select(col("doc_id"), col("source")).join(q, Seq("doc_id"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("source"), col("doc_id"), col("quality"), col("rnk"))
  }

  /** Token-budget sequence packing, contiguous-fill: within each shard
    * (language here), documents are laid end-to-end in id order and a
    * document's bin is the budget-block its START token falls in —
    * the deterministic streaming-friendly packing a pretraining loader
    * uses. Pure integer math (window running sum, integer division):
    * no float ever enters, so the oracle match is exact by
    * construction. The running-sum window is PARTITIONED by the shard
    * key — the global-window single-partition trap does not apply. */
  def packSequences(docs: DataFrame, budget: Long): DataFrame = {
    val tc = docs.select(col("doc_id"), col("lang"),
      size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tok"))
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tc.withColumn("cum", sum(col("n_tok")).over(w))
      .select(col("doc_id"), col("lang"), col("n_tok"),
        floor((col("cum") - col("n_tok")) / lit(budget)).cast("long").as("bin"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_split_train_test" -> ((s, dir) =>
      withSplit(t(s, dir, "documents"))
        .groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("split"), col("lang"))),
    "x_domain_cap" -> ((s, dir) =>
      domainCap(t(s, dir, "documents"), 3)
        .orderBy(col("source"), col("rnk"))),
    "x_pack_sequences" -> ((s, dir) =>
      packSequences(t(s, dir, "documents"), budget = 200L)
        .orderBy(col("lang"), col("doc_id")))
  )

  def oracles: Map[String, String] = Map(
    "x_split_train_test" ->
      s"""WITH s AS (SELECT lang, n_chars,
         |    ${Embedder.duckStringHash64("doc_id::VARCHAR")} % 100 AS b FROM documents)
         |SELECT CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'valid' ELSE 'test' END AS split,
         |  lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars
         |FROM s GROUP BY 1, 2 ORDER BY split, lang""".stripMargin,

    "x_pack_sequences" ->
      s"""WITH tc AS (SELECT doc_id, lang,
         |    len(${TextAnalysis.duckToksPublic("text")})::BIGINT AS n_tok FROM documents),
         |c AS (SELECT *, sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
         |    ROWS UNBOUNDED PRECEDING)::BIGINT AS cum FROM tc)
         |SELECT doc_id, lang, n_tok, ((cum - n_tok) // 200)::BIGINT AS bin
         |FROM c ORDER BY lang, doc_id""".stripMargin,

    "x_domain_cap" ->
      s"""WITH ${TextAnalysis.duckQualityCtes},
         |r AS (SELECT d.source, d.doc_id, q.quality,
         |    row_number() OVER (PARTITION BY d.source ORDER BY q.quality DESC, d.doc_id ASC) AS rnk
         |  FROM documents d JOIN q USING (doc_id))
         |SELECT source, doc_id, quality, rnk FROM r WHERE rnk <= 3
         |ORDER BY source, rnk""".stripMargin
  )
}
