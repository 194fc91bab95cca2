package graft

import org.apache.spark.sql.functions._
import graft.ops.Retrieval
import graft.Tables.t

class RetrievalSpec extends SparkSpec {

  private def docs = t(spark, sf, "documents")

  test("bm25: higher tf ranks higher at equal length; absent terms score no row") {
    import spark.implicits._
    val d = Seq(
      (1L, "hash hash join scan table"),
      (2L, "hash join scan table value"),
      (3L, "row column filter sort group"))
      .toDF("doc_id", "text")
    val s = Retrieval.bm25(d, Seq("hash", "join"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!s.contains(3L)) // no query term -> no candidate row
    assert(s(1L) > s(2L)) // tf(hash)=2 beats tf(hash)=1, same dl
  }

  test("bm25: rarer term contributes more than a common one (idf)") {
    import spark.implicits._
    // 'join' in every doc, 'vector' in one: same tf/dl, rarer term wins
    val d = Seq(
      (1L, "join a a a"), (2L, "join b b b"), (3L, "join c c c"),
      (4L, "vector d d d"))
      .toDF("doc_id", "text")
    val s = Retrieval.bm25(d, Seq("join", "vector"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(4L) > s(1L))
  }

  test("hybrid rrf: fuses both retrievers, bounded scores, fixture sanity") {
    val hits = Retrieval.hybridRrf(docs, "hash join merge", n = 100, k = 10).collect()
    assert(hits.length === 10)
    // max possible: rank 1 in both lists
    val cap = 2.0 / (Retrieval.RrfK + 1)
    assert(hits.forall(r => r.getDouble(1) > 0.0 && r.getDouble(1) <= cap + 1e-9))
    // descending with doc_id tiebreak
    val scores = hits.map(_.getDouble(1)).toSeq
    assert(scores === scores.sorted.reverse)
  }

  test("hybrid rrf: a doc ranked top by both retrievers outranks single-list docs") {
    import spark.implicits._
    val d = Seq(
      (1L, "hash join merge hash join merge"), // lexical + embedding magnet
      (2L, "hash a b c d e f g h"),
      (3L, "q w e r t y u i o"))
      .toDF("doc_id", "text")
    val top = Retrieval.hybridRrf(d, "hash join merge", n = 10, k = 3).head
    assert(top.getLong(0) === 1L)
  }

  test("sparse search: integer dot product ranks term overlap, more repeats score higher") {
    import spark.implicits._
    val d = Seq(
      (1L, "hash join merge hash join merge"), // tf 2 per query term
      (2L, "hash join merge other words here"), // tf 1 per query term
      (3L, "no overlap at all whatsoever"))
      .toDF("doc_id", "text")
    val hits = Retrieval.sparseSearch(d, "hash join merge", 1024, 10).collect()
    val byId = hits.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(1L) === 6L) // 3 terms × tf 2 × qw 1
    assert(byId(2L) === 3L)
    assert(!byId.contains(3L)) // no shared posting list → no row at all
    assert(hits.head.getLong(0) === 1L)
  }

  test("sparse postings: one row per (doc, dim), weights are term frequencies") {
    import spark.implicits._
    val d = Seq((1L, "a a b")).toDF("doc_id", "text")
    val p = Retrieval.sparsePostings(d, 1024).collect()
    assert(p.length === 2)
    assert(p.map(_.getLong(2)).sorted.toSeq === Seq(1L, 2L))
  }

  test("sparse IDF modifier: a rare query term outranks a common one at equal tf") {
    import spark.implicits._
    val d = Seq(
      (1L, "rare alpha beta"), // the only 'rare' holder
      (2L, "common alpha beta"), // 'common' appears in 3 docs
      (3L, "common gamma delta"),
      (4L, "common epsilon zeta"))
      .toDF("doc_id", "text")
    // plain tf dot: all four docs tie at score 1 on query 'rare common'
    val plain = Retrieval.sparseSearch(d, "rare common", 1024, 10).collect()
    assert(plain.map(_.getLong(1)).distinct.toSeq === Seq(1L))
    // idf reweighting: doc 1 scores ln(1+3.5/1.5)·1, docs 2-4
    // ln(1+1.5/3.5)·1 — the rare term dominates
    val idf = Retrieval.sparseSearchIdf(d, "rare common", 1024, 10).collect()
    val byId = idf.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(idf.head.getLong(0) === 1L, "rare-term doc must rank first")
    assert(math.abs(byId(1L) - math.log(1.0 + 3.5 / 1.5)) < 1e-6)
    assert(math.abs(byId(2L) - math.log(1.0 + 1.5 / 3.5)) < 1e-6)
    assert(byId(2L) === byId(3L) && byId(3L) === byId(4L))
  }
}
