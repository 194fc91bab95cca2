package graft

import org.apache.spark.sql.functions._
import graft.search.TopK
import graft.Tables.t

class TopKSpec extends SparkSpec {

  private def e = t(spark, sf, "embeddings")
  private def q = e.filter(col("vec_id") === 0).select(col("embedding").as("q"))

  test("self-match ranks first with score 1 (Qdrant includes self)") {
    val top = TopK.dense(e, q, "vec_id", "embedding", 5).collect()
    assert(top.head.getLong(0) === 0L)
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-6)
  }

  test("scores are descending and k rows returned") {
    val s = TopK.dense(e, q, "vec_id", "embedding", 5)
      .collect().map(_.getDouble(1))
    assert(s.length === 5)
    assert(s.sameElements(s.sorted.reverse))
  }

  test("top-k is a prefix of top-(k+1)") {
    val k5 = TopK.dense(e, q, "vec_id", "embedding", 5).collect().map(_.getLong(0))
    val k6 = TopK.dense(e, q, "vec_id", "embedding", 6).collect().map(_.getLong(0))
    assert(k6.take(5).sameElements(k5))
  }

  test("payload filter restricts candidates") {
    val filtered = TopK.dense(e, q, "vec_id", "embedding", 1000,
      payloadFilter = col("label") === 3)
    val labels = filtered.join(e, "vec_id").select("label")
      .distinct().collect().map(_.getInt(0))
    assert(labels.toSeq === Seq(3))
  }

  test("maxsim top-k: query doc ranks itself first") {
    val docs = Tables.multiVectorDocs(e)
    val qq = docs.filter(col("doc_id") === 0).select(col("vecs").as("q"))
    val top = TopK.maxSim(docs, qq, "doc_id", "vecs", 3).collect()
    assert(top.head.getLong(0) === 0L)
  }

  test("physical plan: dense top-k is TakeOrderedAndProject (no global sort)") {
    val plan = TopK.dense(e, q, "vec_id", "embedding", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
    assert(!plan.contains("SortExec"))
  }

  test("score threshold: floor drops tail hits BEFORE the cut, never reorders") {
    import graft.Tables.t
    val e = t(spark, sf, "embeddings")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q"))
    val plain = TopK.dense(e, q, "vec_id", "embedding", 20)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val floored = TopK.dense(e, q, "vec_id", "embedding", 20,
      scoreThreshold = Some(0.3))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    // the floored result is exactly the plain prefix that clears 0.3
    assert(floored.toSeq === plain.takeWhile(_._2 >= 0.3).toSeq)
    assert(floored.nonEmpty && floored.length < plain.length,
      "the fixture threshold must actually bite (non-vacuous)")
    assert(floored.forall(_._2 >= 0.3))
  }

  test("formatResults: null payload becomes 'Unknown'") {
    import spark.implicits._
    val hits = Seq((1L, 0.5, null.asInstanceOf[String]), (2L, 0.4, "f"))
      .toDF("id", "score", "filename")
    val got = TopK.formatResults(hits, Seq("id", "score"), Seq("filename"))
      .collect().map(_.getString(2)).toSeq
    assert(got === Seq("Unknown", "f"))
  }
}
