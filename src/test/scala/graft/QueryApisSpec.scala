package graft

import org.apache.spark.sql.functions._
import graft.search.QueryApis
import graft.ops.{Quantize, TextAnalysis}
import graft.Tables.t

/** Semantics of the extended Qdrant query-API surface: recommendation,
  * discovery, grouped search, facet, order-by scroll — plus the binary
  * quantization packing and the Gopher rule filter. */
class QueryApisSpec extends SparkSpec {

  private def emb = t(spark, sf, "embeddings")
  private def docs = t(spark, sf, "documents")

  private def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def vecsById(ids: Seq[Long]): Map[Long, Array[Double]] =
    emb.filter(col("vec_id").isInCollection(ids)).collect()
      .map(r => r.getLong(r.fieldIndex("vec_id")) ->
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray)
      .toMap

  test("recommend excludes examples and matches the brute-force 2*avgPos - avgNeg ranking") {
    val hits = QueryApis.recommend(emb, Seq(1L, 2L), Seq(3L), 10).collect()
    assert(hits.length === 10)
    val ids = hits.map(_.getLong(0)).toSet
    assert(!ids.contains(1L) && !ids.contains(2L) && !ids.contains(3L))
    // brute-force ground truth on the driver
    val ex = vecsById(Seq(1L, 2L, 3L))
    val q = Array.tabulate(64)(i => (ex(1L)(i) + ex(2L)(i)) / 2.0 * 2.0 - ex(3L)(i))
    val all = emb.select(col("vec_id"), col("embedding")).collect()
      .filter(r => !Set(1L, 2L, 3L).contains(r.getLong(0)))
      .map(r => (r.getLong(0),
        math.rint(cosine(r.getSeq[Float](1).map(_.toDouble).toArray, q) * 1e6) / 1e6))
      .sortBy { case (id, s) => (-s, id) }.take(10)
    assert(hits.map(_.getLong(0)).toSeq === all.map(_._1).toSeq)
  }

  test("recommend with no negatives searches by avg(positives)") {
    val hits = QueryApis.recommend(emb, Seq(1L, 2L), Nil, 5).collect()
    assert(hits.length === 5)
    assert(!hits.map(_.getLong(0)).toSet.exists(Set(1L, 2L).contains))
  }

  test("discover counts satisfied context pairs and ranks by (hits, target sim)") {
    val hits = QueryApis.discover(emb, 0L, Seq((1L, 2L), (3L, 4L)), 10).collect()
    assert(hits.length === 10)
    // ctx_hits in [0, 2], non-increasing down the result
    val ctx = hits.map(_.getLong(1))
    assert(ctx.forall(h => h >= 0 && h <= 2))
    assert(ctx.zip(ctx.tail).forall { case (a, b) => a >= b })
    // spot-check the top hit against driver math
    val ex = vecsById(Seq(0L, 1L, 2L, 3L, 4L))
    val top = hits.head
    val v = vecsById(Seq(top.getLong(0)))(top.getLong(0))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val expHits = Seq((1L, 2L), (3L, 4L)).count { case (p, n) =>
      r6(cosine(v, ex(p))) >= r6(cosine(v, ex(n))) }
    assert(top.getLong(1) === expHits.toLong)
  }

  test("searchGroups returns top groups each capped at groupSize, ranked by best hit") {
    val q = vecsById(Seq(0L))(0L)
    val res = QueryApis.searchGroups(emb, q.toSeq, "label", groupSize = 2, limit = 5)
      .orderBy(col("grp_rank"), col("hit_rank")).collect()
    val byGroup = res.groupBy(_.getLong(1))
    assert(byGroup.size === 5)
    assert(byGroup.values.forall(_.length <= 2))
    // group order follows each group's best score
    val bests = res.filter(_.getLong(5) === 1L).sortBy(_.getLong(0)).map(_.getDouble(2))
    assert(bests.zip(bests.tail).forall { case (a, b) => a >= b })
    // every group's best equals its rank-1 hit's score
    assert(res.filter(_.getLong(5) === 1L).forall(r => r.getDouble(2) === r.getDouble(4)))
  }

  test("facet counts match a direct groupBy under the same filter") {
    val res = QueryApis.facet(docs, "lang", col("n_chars") >= 300, 10).collect()
    val direct = docs.filter(col("n_chars") >= 300)
      .groupBy(col("lang")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(res.map(r => r.getString(0) -> r.getLong(1)).toMap === direct)
    // ordered by count desc, value asc
    val ns = res.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("scrollSorted pages are disjoint, ordered, and chain by (value, id) cursor") {
    val p1 = QueryApis.scrollSorted(docs, "n_chars", "doc_id", 0L, -1L, 20).collect()
    assert(p1.length === 20)
    val (lastV, lastId) = (p1.last.getLong(1), p1.last.getLong(0))
    val p2 = QueryApis.scrollSorted(docs, "n_chars", "doc_id", lastV, lastId, 20).collect()
    assert(p2.length === 20)
    val ids1 = p1.map(_.getLong(0)).toSet
    assert(p2.forall(r => !ids1.contains(r.getLong(0))))
    // keyset ordering holds across the page boundary
    assert(p2.head.getLong(1) > lastV ||
      (p2.head.getLong(1) == lastV && p2.head.getLong(0) > lastId))
    // concatenation equals one 40-row page
    val p40 = QueryApis.scrollSorted(docs, "n_chars", "doc_id", 0L, -1L, 40).collect()
    assert((p1 ++ p2).map(_.getLong(0)).toSeq === p40.map(_.getLong(0)).toSeq)
  }

  test("bqBits column twin agrees with the driver-side packing") {
    val rows = emb.limit(50)
      .select(col("vec_id"), col("embedding"),
        Quantize.bqBits(col("embedding"), 0).as("lo"),
        Quantize.bqBits(col("embedding"), 32).as("hi"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1).toArray
      assert(r.getLong(2) === Quantize.bqBitsLocal(v, 0))
      assert(r.getLong(3) === Quantize.bqBitsLocal(v, 32))
    }
    // every bit stays below 2^32: no overflow half
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) < (1L << 32)))
  }

  test("bq hamming of a vector with itself is 0 and rerank keeps exact top-1") {
    val qRow = emb.filter(col("vec_id") === 0).head
    val q = qRow.getSeq[Float](qRow.fieldIndex("embedding")).toArray
    val (qlo, qhi) = (Quantize.bqBitsLocal(q, 0), Quantize.bqBitsLocal(q, 32))
    val self = emb.filter(col("vec_id") === 0)
      .select((bit_count(Quantize.bqBits(col("embedding"), 0).bitwiseXOR(lit(qlo))) +
        bit_count(Quantize.bqBits(col("embedding"), 32).bitwiseXOR(lit(qhi)))).as("h"))
      .head.getInt(0)
    assert(self === 0)
  }

  test("gopherRules emits consistent signals and verdicts") {
    val res = TextAnalysis.gopherRules(docs).collect()
    assert(res.length === docs.count())
    res.foreach { r =>
      val (n, ml, af, keep) =
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
      assert(af >= 0.0 && af <= 1.0)
      val expect = n >= 20 && n <= 90 && ml >= 3.0 && ml <= 10.0 && af >= 0.8
      // rounded signals can sit at the boundary; recompute on rounded
      // values only when clearly inside/outside
      if (ml > 3.000001 && ml < 9.999999)
        assert(keep === (if (expect) 1L else 0L))
    }
    // the rule actually splits the corpus
    val keeps = res.map(_.getLong(4)).toSet
    assert(keeps.contains(1L) && keeps.contains(0L))
  }

  test("searchBatch scores every query in one pass and matches single searches") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_batch").toFile.getAbsolutePath + "/col"
    val pts = emb.select(col("vec_id"), col("embedding"))
    val c = graft.api.VectorCollection.ensure(spark, dir, pts,
      graft.api.CollectionConfig("vec_id", "embedding", 64, multiVector = false))
    c.upsert(pts)
    val vs = vecsById(Seq(5L, 6L))
    val batch = c.searchBatch(
      Seq(5L -> vs(5L).map(_.toFloat).toSeq, 6L -> vs(6L).map(_.toFloat).toSeq), k = 3)
      .collect()
    assert(batch.length === 6)
    // per-query results equal the single-query search call
    for (qid <- Seq(5L, 6L)) {
      val single = c.search(vs(qid).map(_.toFloat).toSeq, k = 3)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val part = batch.filter(_.getLong(0) === qid).sortBy(_.getLong(3))
        .map(r => (r.getLong(1), r.getDouble(2))).toSeq
      assert(part === single)
    }
  }

  test("snapshot then restore recovers deleted points and the collection config") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft_snap").toFile.getAbsolutePath
    val dir = s"$base/col"
    val pts = emb.select(col("vec_id"), col("embedding"), col("label"))
    val c = graft.api.VectorCollection.ensure(spark, dir, pts,
      graft.api.CollectionConfig("vec_id", "embedding", 64, multiVector = false))
    c.upsert(pts)
    val n0 = c.count
    val nFiles = c.snapshot(s"$base/snap1")
    assert(nFiles > 0)
    val deleted = c.deleteByFilter(col("label") === 3)
    assert(deleted > 0 && c.count === n0 - deleted)
    c.restoreSnapshot(s"$base/snap1")
    assert(c.count === n0)
    // config sidecar survived the round-trip: collection reopens
    val reopened = graft.api.VectorCollection.open(spark, dir)
    assert(reopened.config.dim === 64)
    // snapshotting onto an existing path is refused
    intercept[IllegalArgumentException](c.snapshot(s"$base/snap1"))
  }

  test("snapshot/restore round-trips a PARTITIONED collection (subdirectory copy)") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft_snapp").toFile.getAbsolutePath
    val dir = s"$base/col"
    emb.select(col("vec_id"), col("embedding"), col("label"))
      .write.partitionBy("label").parquet(dir)
    val n0 = spark.read.parquet(dir).count()
    graft.index.Sink.snapshot(spark, dir, s"$base/snap")
    // restore into a fresh location: both copy directions must carry
    // the partition SUBDIRECTORIES, not just top-level files
    graft.index.Sink.restoreSnapshot(spark, s"$base/snap", s"$base/col2")
    val restored = spark.read.parquet(s"$base/col2")
    assert(restored.count() === n0,
      "partition subdirectories must survive the snapshot/restore round-trip")
    assert(restored.columns.contains("label"),
      "directory-encoded partition column must survive")
  }

  test("boilerplate mining surfaces the planted footer with the right document frequency") {
    import graft.ops.TextAnalysis
    val planted = docs.withColumn("text",
      when(col("doc_id") % 9 === 0,
        concat(col("text"), lit(" foot0 foot1 foot2 foot3 foot4 foot5 foot6 foot7")))
        .otherwise(col("text")))
    val res = TextAnalysis.boilerplateNgrams(planted, 8, 2L, 20).collect()
    val footer = "foot0 foot1 foot2 foot3 foot4 foot5 foot6 foot7"
    val hit = res.find(_.getString(0) === footer)
    assert(hit.isDefined, "planted footer 8-gram must be mined")
    val expected = docs.filter(col("doc_id") % 9 === 0).count()
    assert(hit.get.getLong(1) === expected)
  }

  test("VectorCollection facade: recommend/discover/searchGroups/facet run end-to-end") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_qapi").toFile.getAbsolutePath + "/col"
    val pts = emb.select(col("vec_id").as("pid"), col("embedding").as("v"), col("label"))
    val c = graft.api.VectorCollection.ensure(spark, dir, pts,
      graft.api.CollectionConfig("pid", "v", 64, multiVector = false))
    c.upsert(pts)
    val rec = c.recommend(Seq(1L, 2L), Seq(3L), 5).collect()
    assert(rec.length === 5 && rec.head.schema.fieldNames.contains("pid"))
    val disc = c.discover(0L, Seq((1L, 2L)), 5).collect()
    assert(disc.length === 5)
    val grp = c.searchGroups(vecsById(Seq(0L))(0L).map(_.toFloat).toSeq, "label",
      groupSize = 1, limit = 3).collect()
    assert(grp.length === 3)
    val fc = c.facet("label").collect()
    assert(fc.nonEmpty)
  }
}
