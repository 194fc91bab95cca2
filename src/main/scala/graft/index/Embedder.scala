package graft.index

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.vector.Kernels

/** Deterministic feature-hashing text embedder (SURVEY.md §7.3).
  *
  * Stands in for the reference's GPU embedding models (B1–B5:
  * `with_jina_text_v4/jina_v4_text_indexer.py:104-114`,
  * `with_vdr-2b-multi-v1/...py:194-198`) with the same operator
  * signature — text → fixed-dim float vector — but a reproducible,
  * engine-portable definition so the DuckDB oracle can verify the whole
  * ingest→search pipeline end to end:
  *
  *   1. tokenize on single spaces, drop empties;
  *   2. per token, polynomial rolling hash over unicode code points:
  *      h = fold(h*31 + codepoint) mod 1000003 (left fold, init 0 —
  *      identical to DuckDB's `list_reduce`, whose implicit first-element
  *      init equals our first fold step since 0*31 + c = c);
  *   3. feature-hash into `dim` buckets with a ±1 sign bit taken from
  *      the hash bits above the bucket: bucket = h mod dim,
  *      sign = 1 - 2*((h div dim) mod 2);
  *   4. embedding[i] = Σ signs of tokens landing in bucket i, then
  *      L2-normalize (Qdrant normalizes cosine collections — E1).
  *
  * Everything is Catalyst HOFs over an intermediate token-hash array
  * column, so embedding stays inside whole-stage codegen with zero
  * shuffles — at 100 TB this is a pure map stage that scales linearly
  * with input splits. All arithmetic stays < 2^53 so double math is
  * exact and matches any engine's integer semantics.
  */
object Embedder {
  val Prime = 1000003L
  val DefaultDim = 64

  /** Polynomial hash of one string, spaces included (portable: exact
    * integer arithmetic, no engine-specific hash function). Native
    * zero-allocation loop; [[tokenHashHof]] is the HOF twin
    * (NativeParitySpec). */
  def tokenHash(tok: Column): Column =
    graft.vector.Kernels.ofExpr(
      graft.vector.PolyStringHash(graft.vector.Kernels.exprOf(tok), 31L, Prime))

  /** HOF twin of [[tokenHash]] — documents the fold the DuckDB oracle
    * mirrors (`duckStringHash`). Iterates CODE POINTS via
    * substring/ascii (both code-point-based in Spark), matching the
    * native loop and DuckDB's string_split(s, '') — a split("")-based
    * twin would fold UTF-16 surrogate halves separately and diverge on
    * any non-BMP character. */
  def tokenHashHof(tok: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(tok)),
        i => ascii(tok.substr(i, lit(1)))),
      lit(0L),
      (a, c) => (a * lit(31L) + c) % lit(Prime))

  /** array<long> of token hashes for a text column (native one-pass
    * tokenizer+hasher; [[tokenHashesHof]] is the HOF twin). */
  def tokenHashes(text: Column): Column =
    graft.vector.Kernels.ofExpr(
      graft.vector.PolyTokenHashes(graft.vector.Kernels.exprOf(text), 31L, Prime))

  /** HOF twin of [[tokenHashes]]. */
  def tokenHashesHof(text: Column): Column =
    transform(
      filter(split(text, " "), t => length(t) > 0),
      t => tokenHash(t))

  /** Signed-count feature-hash embedding from a precomputed token-hash
    * array (`tokenHashes`). Returns array<double> of length `dim`,
    * NOT normalized. Native expression; [[embedRawHof]] is the twin. */
  def embedRaw(hashes: Column, dim: Int = DefaultDim): Column =
    graft.vector.Kernels.ofExpr(
      graft.vector.FeatureHashEmbed(graft.vector.Kernels.exprOf(hashes), dim))

  /** HOF twin of [[embedRaw]] — documents the semantics the DuckDB
    * oracle mirrors. */
  def embedRawHof(hashes: Column, dim: Int = DefaultDim): Column =
    transform(
      sequence(lit(0L), lit(dim.toLong - 1)),
      i =>
        aggregate(
          filter(hashes, h => h % lit(dim.toLong) === i),
          lit(0.0),
          (s, h) =>
            s + (lit(1.0) - lit(2.0) *
              (floor(h.cast("double") / lit(dim.toDouble)).cast("long") % lit(2L))
                .cast("double"))))

  /** L2-normalized embedding. Zero vectors (no tokens / perfect sign
    * cancellation) normalize to null elements, matching SQL division. */
  def embed(hashes: Column, dim: Int = DefaultDim): Column =
    Kernels.normalize(embedRaw(hashes, dim))

  /** Wide (60-bit) portable content id: first 15 hex chars of md5,
    * parsed as a long. The poly hash (mod ~2^20) is fine for feature
    * buckets but far too narrow for point identity — at ~1.2k docs a
    * collision is even odds, and a collision makes incremental ingest
    * silently drop a genuinely new document. */
  def stringHash64(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** DuckDB equivalent of [[stringHash64]]. */
  def duckStringHash64(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 15))::BIGINT"

  /** Deterministic per-mille draw on the stable content hash of an id —
    * THE shared sampling primitive (stratified sampling, sampled facet,
    * approximate count). A pure function of (prefix, id): both engines
    * compute the same draw, so sampled estimates are hash-exact across
    * Spark and DuckDB, and `prefix` decorrelates the draws of different
    * operators over the same ids. Returns a value in [0, 1000). */
  def permilleDraw(prefix: String, id: Column): Column =
    pmod(stringHash64(concat(lit(prefix), id.cast("string"))), lit(1000L))

  /** DuckDB twin of [[permilleDraw]] — kept beside it so the two
    * definitions evolve together. */
  def duckPermilleDraw(prefix: String, idExpr: String): String =
    s"${duckStringHash64(s"'$prefix' || $idExpr::VARCHAR")} % 1000"

  /** DuckDB expression equivalent to `tokenHash(expr)` for an arbitrary
    * string (spaces included). */
  def duckStringHash(expr: String): String =
    s"list_reduce(list_transform(string_split($expr, ''), c -> ascii(c)::BIGINT), " +
      "(a, c) -> (a * 31 + c) % 1000003)"

  /** DuckDB expression equivalent to `tokenHashes(text)` — kept next to
    * the Scala so the two definitions evolve together. */
  def duckTokenHashes(textExpr: String): String =
    s"list_transform(list_filter(string_split($textExpr, ' '), tok -> len(tok) > 0), " +
      "tok -> list_reduce(list_transform(string_split(tok, ''), c -> ascii(c)::BIGINT), " +
      "(a, c) -> (a * 31 + c) % 1000003))"

  /** DuckDB expression equivalent to `embedRaw(hashes, dim)`. */
  def duckEmbedRaw(hashesExpr: String, dim: Int = DefaultDim): String =
    s"list_transform(range(0, $dim), i -> coalesce(list_sum(" +
      s"list_transform(list_filter($hashesExpr, h -> h % $dim = i), " +
      s"h -> (1.0 - 2.0 * (floor(h / $dim.0)::BIGINT % 2))::DOUBLE)), 0.0)::DOUBLE)"
}
