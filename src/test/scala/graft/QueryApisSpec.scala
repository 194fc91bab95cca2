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

  test("recommend average_vector is metric-aware: every Distance ranks like dense search") {
    import graft.search.TopK
    val ex = vecsById(Seq(1L, 2L, 3L))
    // the strategy's ONE job is building this vector; everything after
    // must be exactly TopK.dense under the chosen metric
    val qv = Array.tabulate(64)(i => (ex(1L)(i) + ex(2L)(i)) / 2.0 * 2.0 - ex(3L)(i))
    for (metric <- Seq("cosine", "dot", "euclid", "manhattan")) {
      val hits = QueryApis.recommend(emb, Seq(1L, 2L), Seq(3L), 10, metric).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val q = spark.range(1).select(typedlit(qv.toSeq).as("q"))
      val expected = TopK.dense(
          emb.filter(!col("vec_id").isInCollection(Seq(1L, 2L, 3L))),
          q, "vec_id", "embedding", 10, metric = metric).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(hits === expected, s"recommend/$metric must equal dense search")
      val scores = hits.map(_._2)
      if (metric == "euclid" || metric == "manhattan")
        assert(scores === scores.sorted, s"$metric is a distance — ranks ASC")
      else
        assert(scores === scores.sorted.reverse, s"$metric ranks DESC")
    }
  }

  test("recommend sum_scores: per-example pulls sum, matches brute-force ranking") {
    val hits = QueryApis.recommendSumScores(emb, Seq(1L, 2L), Seq(3L), 10).collect()
    assert(hits.length === 10)
    val ids = hits.map(_.getLong(0)).toSet
    assert(!ids.contains(1L) && !ids.contains(2L) && !ids.contains(3L))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val ex = vecsById(Seq(1L, 2L, 3L))
    val all = emb.select(col("vec_id"), col("embedding")).collect()
      .filter(r => !Set(1L, 2L, 3L).contains(r.getLong(0)))
      .map { r =>
        val v = r.getSeq[Float](1).map(_.toDouble).toArray
        (r.getLong(0),
          r6(r6(cosine(v, ex(1L))) + r6(cosine(v, ex(2L))) - r6(cosine(v, ex(3L)))))
      }
      .sortBy { case (id, s) => (-s, id) }.take(10)
    assert(hits.map(r => (r.getLong(0), r.getDouble(1))).toSeq === all.toSeq)
    // sum_scores differs from best_score by construction: a candidate
    // near one positive only cannot beat one near both under sum
    val best = QueryApis.recommendBestScore(emb, Seq(1L, 2L), Seq(3L), 10)
      .collect().map(_.getLong(0)).toSeq
    assert(best.nonEmpty) // strategies coexist; rankings may differ
  }

  test("recommendLookup: examples resolve in the lookup collection, no exclusion") {
    // lookup_from pointed at the collection itself must score every
    // non-example point exactly like plain recommend — and, unlike
    // recommend, keep the example points in the candidate set
    val pos = Seq(1L, 2L); val neg = Seq(3L)
    val all = emb.count().toInt + 1 // k past the collection: no cut
    val viaLookup = QueryApis.recommendLookup(emb, emb, pos, neg, all).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val plain = QueryApis.recommend(emb, pos, neg, all).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    plain.foreach { case (id, s) =>
      assert(viaLookup(id) === s, s"score mismatch for $id")
    }
    (pos ++ neg).foreach { id =>
      assert(!plain.contains(id), "recommend excludes its examples")
      assert(viaLookup.contains(id),
        "lookup_from ids live in another id space — no exclusion")
    }
  }

  test("recommend with no negatives searches by avg(positives)") {
    val hits = QueryApis.recommend(emb, Seq(1L, 2L), Nil, 5).collect()
    assert(hits.length === 5)
    assert(!hits.map(_.getLong(0)).toSet.exists(Set(1L, 2L).contains))
  }

  test("recommendBestScore matches brute-force max-over-examples semantics") {
    val pos = Seq(1L, 2L); val neg = Seq(3L)
    val hits = QueryApis.recommendBestScore(emb, pos, neg, 10).collect()
    assert(hits.length === 10)
    assert(!hits.map(_.getLong(0)).toSet.exists(Set(1L, 2L, 3L).contains))
    val ex = vecsById(pos ++ neg)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val truth = emb.select(col("vec_id"), col("embedding")).collect()
      .filter(r => !Set(1L, 2L, 3L).contains(r.getLong(0)))
      .map { r =>
        val v = r.getSeq[Float](1).map(_.toDouble).toArray
        val bp = pos.map(id => r6(cosine(v, ex(id)))).max
        val bn = neg.map(id => r6(cosine(v, ex(id)))).max
        (r.getLong(0), r6(if (bp > bn) bp else -bn))
      }
      .sortBy { case (id, s) => (-s, id) }.take(10)
    assert(hits.map(r => (r.getLong(0), r.getDouble(1))).toSeq === truth.toSeq)
    // a point nearer its negative than any positive must carry a
    // NEGATIVE score — the strategy's defining behavior
    assert(truth.map(_._2).forall(s => s >= -1.0 && s <= 1.0))
  }

  test("contextSearch: in-context points score 0, violations subtract their margin") {
    val pairs = Seq((1L, 2L), (3L, 4L))
    val hits = QueryApis.contextSearch(emb, pairs, 10).collect()
    assert(hits.length === 10)
    assert(!hits.map(_.getLong(0)).toSet.exists(Set(1L, 2L, 3L, 4L).contains))
    // scores are Σ min(0, ·) — never positive, best-first
    val scores = hits.map(_.getDouble(1)).toSeq
    assert(scores.forall(_ <= 0.0))
    assert(scores === scores.sorted.reverse)
    // census: the fixture genuinely has in-context points (score 0) —
    // the assertion is not vacuous
    val ex = vecsById(pairs.flatMap(p => Seq(p._1, p._2)))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val nInside = emb.select(col("vec_id"), col("embedding")).collect()
      .filter(r => !Set(1L, 2L, 3L, 4L).contains(r.getLong(0)))
      .count { r =>
        val v = r.getSeq[Float](1).map(_.toDouble).toArray
        pairs.forall { case (p, n) => r6(cosine(v, ex(p))) >= r6(cosine(v, ex(n))) }
      }
    if (nInside >= 10) assert(scores.forall(_ === 0.0))
    else assert(scores.take(nInside).forall(_ === 0.0))
  }

  test("recommendBatch equals per-request recommend in one pass") {
    val reqs = Seq(
      (100L, Seq(1L, 2L), Seq(3L)),
      (200L, Seq(5L), Seq.empty[Long]),
      (300L, Seq(7L, 8L, 9L), Seq(10L, 11L)))
    val batch = QueryApis.recommendBatch(emb, reqs, 5).collect()
      .groupBy(_.getLong(0))
    reqs.foreach { case (rid, pos, neg) =>
      val single = QueryApis.recommend(emb, pos, neg, 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val fromBatch = batch(rid).sortBy(_.getLong(3))
        .map(r => (r.getLong(1), r.getDouble(2))).toSeq
      assert(fromBatch === single, s"request $rid must match single-request recommend")
    }
  }

  test("queryBatch: heterogeneous universal-query batch matches each singleton API") {
    import graft.search.{ByIdBatchQuery, NearestBatchQuery, RecommendBatchQuery}
    import graft.vector.Kernels
    val qv = vecsById(Seq(4L))(4L)
    val reqs = Seq(
      NearestBatchQuery(100L, qv.toSeq),
      ByIdBatchQuery(200L, 6L),
      RecommendBatchQuery(300L, Seq(1L, 2L), Seq(3L)))
    val batch = QueryApis.queryBatch(emb, reqs, 5).collect().groupBy(_.getLong(0))
    assert(batch.keySet === Set(100L, 200L, 300L))
    def fromBatch(rid: Long): Seq[(Long, Double)] =
      batch(rid).sortBy(_.getLong(3)).map(r => (r.getLong(1), r.getDouble(2))).toSeq
    // nearest: plain round-6 cosine ranking, nothing excluded
    val nearest = emb.select(col("vec_id"),
        round(Kernels.cosine(col("embedding"), typedlit(qv.toSeq)), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc).limit(5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromBatch(100L) === nearest)
    // by-id: the stored point's own row is excluded, rest ranks the same
    val v6 = vecsById(Seq(6L))(6L)
    val byId = emb.filter(col("vec_id") =!= 6L).select(col("vec_id"),
        round(Kernels.cosine(col("embedding"), typedlit(v6.toSeq)), 6).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc).limit(5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromBatch(200L) === byId)
    assert(!fromBatch(200L).exists(_._1 === 6L), "self must be excluded")
    // recommend: equal to the singleton average_vector API
    val rec = QueryApis.recommend(emb, Seq(1L, 2L), Seq(3L), 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(fromBatch(300L) === rec)
    // construction errors are loud, not silent empties
    assertThrows[IllegalArgumentException](
      QueryApis.queryBatch(emb, Seq(RecommendBatchQuery(1L, Nil)), 5))
    assertThrows[IllegalArgumentException](
      QueryApis.queryBatch(emb,
        Seq(NearestBatchQuery(1L, qv.toSeq), ByIdBatchQuery(1L, 2L)), 5))
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

  test("discoverBatch equals per-request discover in one pass") {
    import graft.search.QueryApis
    val requests = Seq(
      (1L, 0L, Seq((1L, 2L), (3L, 4L))),
      (2L, 5L, Seq((6L, 7L))))
    val out = QueryApis.discoverBatch(emb, requests, k = 8).cache()
    assert(out.groupBy("req_id").count().collect().forall(_.getLong(1) === 8L))
    requests.foreach { case (rid, target, pairs) =>
      val standalone = QueryApis.discover(emb, target, pairs, 8)
        .collect().map(_.getLong(0)).toSeq
      val batch = out.filter(col("req_id") === rid).orderBy(col("rnk"))
        .collect().map(_.getLong(1)).toSeq
      assert(batch === standalone,
        s"request $rid: batch ranking diverges from per-request discover")
    }
    // composite key recovers the discover criteria: 4*ctx_hits + sim
    val one = out.filter(col("req_id") === 1L && col("rnk") === 1L).head
    val direct = QueryApis.discover(emb, 0L, Seq((1L, 2L), (3L, 4L)), 1).head
    assert(math.abs(one.getDouble(2) -
      (4.0 * direct.getLong(1) + direct.getDouble(2))) < 1e-9)
    out.unpersist()
  }

  test("discoverBatch on euclid equals per-request discover (monotone squash key)") {
    // the composite heap key needs a tiebreak BOUNDED in (−1, 1];
    // euclid distances are unbounded, so they enter via the strictly
    // monotone −d/(1+d) squash — rank parity with per-request discover
    // must be EXACT, including the flipped d_pos ≤ d_neg satisfaction
    val requests = Seq(
      (1L, 0L, Seq((1L, 2L), (3L, 4L))),
      (2L, 5L, Seq((6L, 7L))))
    val out = QueryApis.discoverBatch(emb, requests, k = 8, metric = "euclid").cache()
    requests.foreach { case (rid, target, pairs) =>
      val standalone = QueryApis.discover(emb, target, pairs, 8, metric = "euclid")
        .collect().map(_.getLong(0)).toSeq
      val batch = out.filter(col("req_id") === rid).orderBy(col("rnk"))
        .collect().map(_.getLong(1)).toSeq
      assert(batch === standalone,
        s"request $rid: euclid batch ranking diverges from per-request discover")
    }
    out.unpersist()
  }

  test("discoverBatch on dot with norms > 2 equals per-request discover (squash key)") {
    // raw dot is unbounded: on unit-norm fixtures the old raw-keySim
    // composite passed by accident, so this spec scales each vector by
    // (id % 7 + 1) — dot spreads then exceed the 4·ctx_hits step and
    // ONLY the monotone squash s/(1+|s|) keeps batch == per-request
    val scale = (col("vec_id") % 7 + 1).cast("double")
    val scaled = emb.select(col("vec_id"),
      transform(col("embedding"), x => x * scale).as("embedding")).cache()
    val requests = Seq(
      (1L, 0L, Seq((1L, 2L), (3L, 4L))),
      (2L, 5L, Seq((6L, 7L))))
    // non-vacuous guard: the scaled corpus's dot-to-target spread must
    // exceed 4, or the raw key could never have swamped ctx_hits
    val tv = scaled.filter(col("vec_id") === 0L).head.getSeq[Double](1).toArray
    val spread = scaled.collect().map { r =>
      val v = r.getSeq[Double](1).toArray
      v.zip(tv).map { case (a, b) => a * b }.sum
    }
    assert(spread.max - spread.min > 4.0,
      "fixture must produce a dot spread > 4 or the spec is vacuous")
    val out = QueryApis.discoverBatch(scaled, requests, k = 8, metric = "dot").cache()
    requests.foreach { case (rid, target, pairs) =>
      val standalone = QueryApis.discover(scaled, target, pairs, 8, metric = "dot")
        .collect().map(_.getLong(0)).toSeq
      val batch = out.filter(col("req_id") === rid).orderBy(col("rnk"))
        .collect().map(_.getLong(1)).toSeq
      assert(batch === standalone,
        s"request $rid: dot batch ranking diverges from per-request discover")
    }
    out.unpersist(); scaled.unpersist()
  }

  test("recommendBestScore on euclid: penalized candidates sink below every rewarded one") {
    val pos = Seq(1L, 2L); val neg = Seq(3L)
    // rank the WHOLE collection: the penalized zone sits strictly below
    // every rewarded candidate, so a small k would never surface it
    val kAll = emb.count().toInt
    val hits = QueryApis.recommendBestScore(emb, pos, neg, kAll, metric = "euclid")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(hits.length === kAll - 3)
    // driver-side truth in the engine's own rounding discipline: the
    // metric value rounds at 6dp BEFORE negation
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    def dist(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val ex = vecsById(pos ++ neg)
    val truth = emb.select(col("vec_id"), col("embedding")).collect()
      .filter(r => !Set(1L, 2L, 3L).contains(r.getLong(0)))
      .map { r =>
        val v = r.getSeq[Float](1).map(_.toDouble).toArray
        val bestPos = pos.map(id => -r6(dist(v, ex(id)))).max
        val bestNeg = neg.map(id => -r6(dist(v, ex(id)))).max
        val key =
          if (bestPos > bestNeg) bestPos / (1.0 - bestPos)
          else -2.0 + (-bestNeg) / (1.0 + (-bestNeg))
        (r.getLong(0), r6(key), bestPos > bestNeg)
      }
    val want = truth.sortBy { case (id, s, _) => (-s, id) }
    assert(hits.map(_._1).toSeq === want.map(_._1).toSeq,
      "euclid best_score ranking diverges from the two-zone key")
    // the defining contract, literally: every rewarded candidate ranks
    // above every penalized one — rewarded keys live in (−1, 0],
    // penalized in [−2, −1)
    val zones = truth.map { case (id, _, rewarded) => id -> rewarded }.toMap
    val zoneSeq = hits.map { case (id, _) => zones(id) }
    assert(zoneSeq.contains(true) && zoneSeq.contains(false),
      "fixture must surface BOTH zones or the spec is vacuous")
    assert(zoneSeq.dropWhile(identity).forall(!_),
      "a penalized candidate ranked above a rewarded one")
    // within the penalized zone, farther-from-negative ranks first
    val penalized = hits.filter { case (id, _) => !zones(id) }.map(_._2)
    assert(penalized.forall(s => s >= -2.0 && s < -1.0))
    assert(penalized.zip(penalized.tail).forall { case (a, b) => a >= b })
    // euclid with NO negatives is untouched: score = −distance, as the
    // r11 metric-aware pins established
    val noNeg = QueryApis.recommendBestScore(emb, pos, Nil, 5, metric = "euclid")
      .collect().map(_.getDouble(1))
    assert(noNeg.forall(_ <= 0.0))
  }

  test("searchBatchFiltered: full per-request Filter DSL matches standalone filtered search") {
    import graft.search._
    import spark.implicits._
    val vs = vecsById(Seq(0L, 5L))
    // two requests with DIFFERENT multi-clause filters: one range+label
    // must list, one must_not with a should list
    val f1 = Filter(
      must = Seq(RangeCond("vec_id", gte = Some(10L), lt = Some(400L)),
        MatchAnyOf("label", Seq(1, 3, 5))))
    val f2 = Filter(
      should = Seq(MatchValue("label", 2), MatchValue("label", 7)),
      mustNot = Seq(MatchAnyOf("vec_id", Seq(120L, 230L))))
    val reqs = Seq((1L, vs(0L).toSeq, f1), (2L, vs(5L).toSeq, f2))
    val out = QueryApis.searchBatchFiltered(emb, reqs, k = 5, metric = "cosine").cache()
    for ((qid, qv, f) <- reqs) {
      val standalone = graft.search.TopK.dense(
          emb.filter(f.toColumn), Seq(qv).toDF("q"), "vec_id", "embedding", 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val batch = out.filter(col("q_id") === qid).orderBy(col("rnk"))
        .collect().map(r => (r.getLong(1), r.getDouble(2))).toSeq
      assert(batch === standalone,
        s"request $qid: batched Filter diverges from standalone filtered search")
      assert(batch.nonEmpty, s"request $qid must keep candidates (vacuity guard)")
    }
    // both requests' results honor their own clauses, not each other's
    val labels = emb.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val r1 = out.filter(col("q_id") === 1L).collect().map(_.getLong(1))
    assert(r1.forall(id => id >= 10L && id < 400L && Set(1, 3, 5)(labels(id))))
    val r2 = out.filter(col("q_id") === 2L).collect().map(_.getLong(1))
    assert(r2.forall(id => Set(2, 7)(labels(id)) && id != 120L && id != 230L))
    out.unpersist()
  }

  test("searchBatchFiltered: per-request filters shrink candidates in one shared pass") {
    import spark.implicits._
    val vs = vecsById(Seq(0L, 5L))
    val reqs = Seq(
      (1L, vs(0L).toSeq, Some(3L)),
      (2L, vs(5L).toSeq, None))
    val out = QueryApis.searchBatchFiltered(emb, reqs, "label", k = 4).cache()
    // the filtered request only ever sees its label; ids pin to a
    // driver-side brute force under the same (score DESC, id ASC) order
    val labels = emb.select(col("vec_id"), col("label").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val all = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    for ((qid, qv, flt) <- reqs) {
      val want = all
        .filter { case (id, _) => flt.forall(_ == labels(id)) }
        .map { case (id, v) => (id, math.rint(cosine(v, qv.toArray) * 1e6) / 1e6) }
        .sortBy { case (id, s) => (-s, id) }.take(4).map(_._1).toSeq
      val got = out.filter(col("q_id") === qid).orderBy(col("rnk"))
        .collect().map(_.getLong(1)).toSeq
      assert(got === want, s"request $qid diverges from brute force (filter=$flt)")
      assert(flt.isEmpty || got.forall(labels(_) == flt.get))
    }
    // the unfiltered request through the batch equals the plain
    // search_batch path (knnJoin's bounded-heap ranking)
    val q2 = Seq((2L, vs(5L).toSeq)).toDF("q_id", "qv")
    val plain = graft.ops.Similarity.knnJoin(emb, q2, 4)
      .orderBy(col("rnk")).collect().map(_.getLong(1)).toSeq
    assert(out.filter(col("q_id") === 2L).orderBy(col("rnk"))
      .collect().map(_.getLong(1)).toSeq === plain)
    out.unpersist()
    // euclid flips the ranking through the same pass: the stored query
    // point is its own nearest neighbor at distance 0
    val eu = QueryApis.searchBatchFiltered(
      emb, Seq((1L, vs(5L).toSeq, None)), "label", k = 3, metric = "euclid")
      .orderBy(col("rnk")).collect()
    assert(eu.head.getLong(1) === 5L && eu.head.getDouble(2) === 0.0,
      "euclid filtered batch must surface the self-match at d=0 first")
    assert(eu.map(_.getDouble(2)).toSeq === eu.map(_.getDouble(2)).toSeq.sorted)
  }

  test("recommendGroups: groups rank by recommend score, examples never appear") {
    import graft.search.QueryApis
    val pos = Seq(1L, 2L); val neg = Seq(3L)
    val out = QueryApis.recommendGroups(emb, pos, neg, "label",
      groupSize = 2, limit = 5).cache()
    // examples excluded from every group's hits
    assert(out.filter(col("vec_id").isin(pos ++ neg: _*)).count() === 0L)
    // hit scores equal plain recommend's scores for the same ids
    val recScores = QueryApis.recommend(emb, pos, neg, Int.MaxValue - 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out.collect().foreach { r =>
      assert(r.getDouble(4) === recScores(r.getLong(3)),
        s"group hit ${r.getLong(3)} diverges from recommend scoring")
    }
    // group order follows each group's best hit
    val bests = out.filter(col("hit_rank") === 1L)
      .orderBy(col("grp_rank")).collect().map(_.getDouble(2))
    assert(bests.zip(bests.tail).forall { case (a, b) => a >= b })
    out.unpersist()
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

  test("facetSampled: deterministic draw, exact scale-up, observed error in sigma range") {
    val filter = col("n_chars") >= 300
    val est = QueryApis.facetSampled(docs, "lang", "doc_id", filter, 10, permille = 500)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = docs.filter(filter)
      .groupBy(col("lang")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // deterministic: same result twice (no rand() anywhere in the draw)
    val again = QueryApis.facetSampled(docs, "lang", "doc_id", filter, 10, permille = 500)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === again, "the sample draw must be a pure function of ids")
    // every estimate is an even multiple of the scale factor
    assert(est.values.forall(_ % 2 === 0))
    // estimator error: |est - n| within ~4 sigma of the binomial draw
    // (sigma = sqrt(n) at permille=500) — deterministic per fixture, the
    // bound documents HOW approximate the operator is allowed to be
    exact.foreach { case (lang, n) =>
      val e = est.getOrElse(lang, 0L)
      val tol = math.max(8.0, 4.0 * math.sqrt(n.toDouble))
      assert(math.abs(e - n) <= tol,
        s"$lang: estimate $e vs exact $n drifts past 4 sigma ($tol)")
    }
    // work boundedness: the aggregate's input is the sampled subset
    val sampledRows = docs.filter(filter)
      .filter(pmod(graft.index.Embedder.stringHash64(
        concat(lit("facet:"), col("doc_id").cast("string"))), lit(1000L)) < 500)
      .count()
    val totalRows = docs.filter(filter).count()
    assert(sampledRows < totalRows * 6 / 10,
      s"sample must shrink aggregate input (got $sampledRows of $totalRows)")
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

  test("scrollSorted descending: value comparison flips, id tiebreak stays, pages chain") {
    val top = docs.agg(org.apache.spark.sql.functions.max(col("n_chars")))
      .head.getLong(0)
    val p1 = QueryApis.scrollSorted(docs, "n_chars", "doc_id",
      top + 1, -1L, 20, descending = true).collect()
    assert(p1.length === 20)
    val ns1 = p1.map(_.getLong(1))
    assert(ns1.zip(ns1.tail).forall { case (a, b) => a >= b }, "value DESC")
    // equal values order id ASC (the pinned tiebreak, same as asc mode)
    p1.toSeq.groupBy(_.getLong(1)).values.foreach { g =>
      val ids = g.map(_.getLong(0))
      assert(ids === ids.sorted)
    }
    val (lastV, lastId) = (p1.last.getLong(1), p1.last.getLong(0))
    val p2 = QueryApis.scrollSorted(docs, "n_chars", "doc_id",
      lastV, lastId, 20, descending = true).collect()
    assert(p2.length === 20)
    assert(p2.forall(r => !p1.map(_.getLong(0)).toSet.contains(r.getLong(0))))
    val p40 = QueryApis.scrollSorted(docs, "n_chars", "doc_id",
      top + 1, -1L, 40, descending = true).collect()
    assert((p1 ++ p2).map(_.getLong(0)).toSeq === p40.map(_.getLong(0)).toSeq,
      "desc pages chain by (value, id) cursor")
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

  test("mmr with lambda=1 degenerates to plain similarity order") {
    val q = vecsById(Seq(0L))(0L)
    val plain = emb.select(col("vec_id"),
        round(graft.vector.Kernels.cosine(col("embedding"), typedlit(q.toSeq)), 6).as("s"))
      .orderBy(col("s").desc, col("vec_id").asc).limit(5)
      .collect().map(_.getLong(0)).toSeq
    val picked = QueryApis.mmr(emb, q.toSeq, fetchN = 20, k = 5, lambda = 1.0)
      .collect().map(_.getLong(1)).toSeq
    assert(picked === plain,
      "lambda=1 removes the diversity penalty entirely")
  }

  test("mmr with lambda=0 never re-picks near-duplicates of a selection") {
    // plant: vec 1's embedding duplicated onto a fresh id — with pure
    // diversity weighting the duplicate must not follow its twin
    val dup = emb.filter(col("vec_id") === 1)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val planted = emb.select(col("vec_id"), col("embedding")).union(dup)
    val q = vecsById(Seq(1L))(1L)
    val picked = QueryApis.mmr(planted, q.toSeq, fetchN = 10, k = 3, lambda = 0.0)
      .collect().map(_.getLong(1)).toSeq
    assert(picked.head === 1L, "first pick is still the most similar")
    assert(!picked.tail.contains(100001L),
      "the exact duplicate of pick #1 has penalty 1.0 and must lose every later round")
  }

  test("mmr ranks carry the original similarity and the mmr objective") {
    val q = vecsById(Seq(0L))(0L)
    val rows = QueryApis.mmr(emb, q.toSeq, fetchN = 10, k = 4, lambda = 0.5).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(rows.head.getDouble(2) === rows.head.getDouble(3),
      "first pick's mmr equals its similarity")
    // every later pick's mmr ≤ its own 0.5-weighted score (penalty ≥ 0
    // against unit-norm fixture vectors is not guaranteed, but mmr can
    // never exceed λ·score + (1−λ)·1)
    assert(rows.tail.forall(r => r.getDouble(3) <= 0.5 * r.getDouble(2) + 0.5 + 1e-9))
  }

  test("matrixPairs emits k nearest sampled neighbors per sampled point") {
    val res = QueryApis.matrixPairs(emb, sample = 50, k = 3).collect()
    // Qdrant's absolute-count sample: exactly 50 points draw (the
    // fixture has more), each with its 3 nearest within the sample
    assert(res.length === 50 * 3)
    val byA = res.groupBy(_.getLong(0))
    assert(byA.keySet.size === 50)
    assert(byA.values.forall(_.length === 3))
    // no self pairs; ranks are 1..3
    assert(res.forall(r => r.getLong(0) !== r.getLong(1)))
    assert(byA.values.forall(_.map(_.getLong(3)).sorted.toSeq === Seq(1L, 2L, 3L)))
    // the draw is content-stable: same sample every run, and the id_b
    // side never leaves the sampled id set
    val res2 = QueryApis.matrixPairs(emb, sample = 50, k = 3).collect()
    assert(res.map(_.toSeq).toSeq === res2.map(_.toSeq).toSeq)
    assert(res.map(_.getLong(1)).toSet.subsetOf(byA.keySet))
  }

  test("mmr on euclid matches a driver-side brute-force reference; exact duplicate repelled") {
    // metric-aware MMR (r16): distances enter the tradeoff through
    // the strictly monotone squash −d/(1+d) ∈ (−1, 0] — closer ⇒
    // larger, both terms on one bounded scale. Reference is an
    // independent greedy written from the formula.
    val q = vecsById(Seq(0L))(0L)
    def round6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def euclid(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum)
    def term(d: Double): Double = -d / (1.0 + d)
    val fetchN = 10; val k = 4; val lambda = 0.5
    val cand = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .map { case (id, v) => (id, v, round6(euclid(v, q))) }
      .sortBy { case (id, _, d) => (d, id) }.take(fetchN)
    val expect = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Double)]
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])]
    while (expect.length < k) {
      val best = cand.filterNot(c => picked.exists(_._1 == c._1)).map { case (id, v, d) =>
        val m =
          if (picked.isEmpty) round6(term(d))
          else round6(lambda * round6(term(d)) - (1 - lambda) *
            picked.map(s => round6(term(round6(euclid(v, s._2))))).max)
        (id, v, d, m)
      }.minBy { case (id, _, _, m) => (-m, id) }
      expect += ((best._1, best._3, best._4)); picked += ((best._1, best._2))
    }
    val got = QueryApis.mmr(emb, q.toSeq, fetchN, k, lambda, metric = "euclid")
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got === expect.toSeq,
      s"euclid MMR must match the brute-force greedy:\ngot=$got\nexp=${expect.toSeq}")
    // pure-diversity sanity: an exact duplicate of pick #1 (pairwise
    // d=0, the maximal redundancy term) must never be re-picked
    val dup = emb.filter(col("vec_id") === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val planted = emb.select(col("vec_id"), col("embedding")).union(dup)
    val divPicks = QueryApis.mmr(planted, q.toSeq, fetchN = 10, k = 3,
      lambda = 0.0, metric = "euclid").collect().map(_.getLong(1)).toSeq
    assert(divPicks.head === 0L && !divPicks.tail.contains(100000L),
      "the exact euclid duplicate of pick #1 must lose every later round")
  }

  test("matrixPairs on euclid ranks each sampled point's neighbors distance ASC, brute-force checked") {
    val res = QueryApis.matrixPairs(emb, sample = 50, k = 3, metric = "euclid").collect()
    assert(res.length === 50 * 3)
    val sampleIds = res.map(_.getLong(0)).toSet
    assert(sampleIds.size === 50)
    val vecs = vecsById(sampleIds.toSeq)
    def euclid(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum)
    res.groupBy(_.getLong(0)).foreach { case (ida, g) =>
      val got = g.sortBy(_.getLong(3)).map(_.getLong(1)).toSeq
      val expect = (sampleIds - ida).toSeq
        .map(idb => (idb, math.rint(euclid(vecs(ida), vecs(idb)) * 1e6) / 1e6))
        .sortBy { case (id, d) => (d, id) }.take(3).map(_._1)
      assert(got === expect, s"point $ida: euclid neighbor order diverges")
    }
    // cosine path unchanged by the metric parameter's default
    val cosDefault = QueryApis.matrixPairs(emb, sample = 20, k = 2).collect()
    val cosNamed = QueryApis.matrixPairs(emb, sample = 20, k = 2, metric = "cosine").collect()
    assert(cosDefault.map(_.toSeq).toSeq === cosNamed.map(_.toSeq).toSeq)
  }

  test("randomSample is reproducible and uncorrelated with id order") {
    val a = QueryApis.randomSample(emb, 20).collect().map(_.getLong(0)).toSeq
    val b = QueryApis.randomSample(emb, 20).collect().map(_.getLong(0)).toSeq
    assert(a === b, "content-stable hash order: same draw every run")
    assert(a.toSet.size === 20)
    assert(a !== a.sorted, "hash order must not degenerate to id order")
  }

  test("hybridDbsf fuses both retrievers and keeps score magnitude information") {
    import graft.ops.Retrieval
    val fused = Retrieval.hybridDbsf(docs, "hash join merge", n = 100, k = 10).collect()
    assert(fused.length === 10)
    val scores = fused.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // a doc on both lists outranks a doc appearing on neither
    val dense = Retrieval.denseScores(docs, "hash join merge")
      .orderBy(col("score").desc, col("doc_id").asc).limit(100)
      .collect().map(_.getLong(0)).toSet
    val lex = Retrieval.bm25(docs, Seq("hash", "join", "merge"))
      .orderBy(col("bm25").desc, col("doc_id").asc).limit(100)
      .collect().map(_.getLong(0)).toSet
    val top = fused.head.getLong(0)
    assert(dense.contains(top) || lex.contains(top))
  }

  test("filter DSL compiles Qdrant must/should/mustNot semantics") {
    import graft.search._
    val f = Filter(
      must = Seq(RangeCond("vec_id", gte = Some(10), lt = Some(50))),
      should = Seq(MatchAnyOf("label", Seq(1, 2)), MatchValue("label", 5)),
      mustNot = Seq(MatchAnyOf("vec_id", Seq(11L))))
    val got = emb.filter(f.toColumn).select(col("vec_id"), col("label"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.nonEmpty)
    assert(got.forall { case (id, l) =>
      id >= 10 && id < 50 && (Set(1, 2).contains(l) || l == 5) && id != 11L
    })
    // empty should-list is vacuously true; empty filter keeps all rows
    assert(emb.filter(Filter().toColumn).count() === emb.count())
    val mustOnly = Filter(must = Seq(MatchValue("label", 3)))
    assert(emb.filter(mustOnly.toColumn).count() ===
      emb.filter(col("label") === 3).count())
    // mustNot on a NULL key KEEPS the row (Qdrant: a missing key fails
    // the forbidden condition) — three-valued NOT would drop it
    import spark.implicits._
    val withNulls = Seq((1L, Some(1)), (2L, None), (3L, Some(2)))
      .toDF("id", "tag")
    val kept = withNulls
      .filter(Filter(mustNot = Seq(MatchAnyOf("tag", Seq(1)))).toColumn)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 3L),
      "null-tag row must survive must_not; only the matching row drops")
  }

  test("geo/datetime conditions: haversine accuracy, radius membership, antimeridian box") {
    import graft.search._
    import spark.implicits._
    // Paris (48.8566, 2.3522) → London (51.5074, -0.1278): ~343.5 km
    val pts = Seq(
      (1L, 51.5074, -0.1278),   // London
      (2L, 40.7128, -74.0060),  // New York
      (3L, 179.0, 0.0),         // impossible lat, exercises no-crash
      (4L, -36.8485, 174.7633), // Auckland (near the antimeridian, east)
      (5L, -17.0, -179.5)       // Fiji-ish (west side of the antimeridian)
    ).toDF("id", "lat", "lon")
    val d = pts.filter(col("id") === 1).select(
      GeoRadius.haversineMeters(col("lat"), col("lon"), 48.8566, 2.3522).as("m"))
      .head.getDouble(0)
    assert(math.abs(d - 343500) < 2000, s"Paris→London haversine off: $d")
    // 400 km around Paris keeps London, drops New York
    val near = pts.filter(
      GeoRadius("lat", "lon", 48.8566, 2.3522, 400000.0).toColumn)
      .collect().map(_.getLong(0)).toSet
    assert(near === Set(1L))
    // an antimeridian-crossing box (west 170° → east -170°) keeps both
    // sides of the line and nothing else
    val box = GeoBoundingBox("lat", "lon", topLeft = (0.0, 170.0), bottomRight = (-40.0, -170.0))
    assert(pts.filter(box.toColumn).collect().map(_.getLong(0)).toSet === Set(4L, 5L))
    // EXACT antipode: float rounding can push the asin argument an ulp
    // past 1, where DuckDB hard-errors and Spark NaNs — the clamp must
    // yield the half-circumference (π·R), finite, not NaN
    val anti = Seq((9L, -48.8566, 2.3522 - 180.0)).toDF("id", "lat", "lon")
      .select(GeoRadius.haversineMeters(col("lat"), col("lon"), 48.8566, 2.3522).as("m"))
      .head.getDouble(0)
    assert(!anti.isNaN && math.abs(anti - math.Pi * GeoRadius.EarthR) < 1000,
      s"antipodal haversine must clamp to pi*R, got $anti")
    // datetime range: half-open, string bounds, natural timestamp type
    val evs = Seq((1L, "1996-02-15 00:00:00"), (2L, "1996-03-01 00:00:00"),
      (3L, "1996-05-31 23:59:59"), (4L, "1996-06-01 00:00:00"))
      .toDF("id", "s").select(col("id"), col("s").cast("timestamp").as("t"))
    val in = evs.filter(
      DatetimeRange("t", gte = Some("1996-03-01"), lt = Some("1996-06-01")).toColumn)
      .collect().map(_.getLong(0)).toSet
    assert(in === Set(2L, 3L))
  }

  test("unigram logprob: common-token docs score higher than rare-token docs") {
    import graft.ops.TextAnalysis
    import spark.implicits._
    val tiny = Seq(
      (1L, "the the the the"),     // only common tokens
      (2L, "the zzqy"),            // one rare token
      (3L, "zzqy qqzx")            // only rare tokens
    ).toDF("doc_id", "text")
    val res = TextAnalysis.unigramLogprob(tiny).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(res(1L) > res(2L) && res(2L) > res(3L))
    assert(res.values.forall(_ <= 0.0), "log probabilities are non-positive")
  }

  test("response shaping flows through recommend/discover/queryByPointId/searchGroups") {
    import java.nio.file.Files
    import graft.api.PayloadSelector
    val dir = Files.createTempDirectory("graft_shape").toFile.getAbsolutePath + "/col"
    val pts = emb.select(col("vec_id").as("pid"), col("embedding").as("v"), col("label"))
    val c = graft.api.VectorCollection.ensure(spark, dir, pts,
      graft.api.CollectionConfig("pid", "v", 64, multiVector = false))
    c.upsert(pts)
    val want = PayloadSelector.Subset(Seq("label"))

    val rec = c.recommend(Seq(1L, 2L), Seq(3L), 5, want, withVectors = true)
    assert(rec.columns.toSeq === Seq("pid", "score", "label", "v"))
    assert(rec.count() === 5)
    // shaping must not change WHICH points are hit, nor their order
    val bare = c.recommend(Seq(1L, 2L), Seq(3L), 5).collect().map(_.getLong(0)).toSeq
    assert(rec.collect().map(_.getLong(0)).toSeq === bare)

    val disc = c.discover(0L, Seq((1L, 2L)), 5, want, withVectors = false)
    assert(disc.columns.toSeq === Seq("pid", "ctx_hits", "sim", "label"))
    assert(disc.collect().map(_.getLong(0)).toSeq ===
      c.discover(0L, Seq((1L, 2L)), 5).collect().map(_.getLong(0)).toSeq)

    val qp = c.queryByPointId(0L, 5, lit(true), None, PayloadSelector.All,
      withVectors = false)
    assert(qp.columns.toSeq === Seq("pid", "score", "label"))
    assert(qp.filter(col("pid") === 0L).count() === 0L, "query point stays excluded")

    val qf = vecsById(Seq(0L))(0L).map(_.toFloat).toSeq
    val grp = c.searchGroups(qf, "label", 2, 3, PayloadSelector.NoPayload,
      withVectors = true).collect()
    assert(grp.head.schema.fieldNames.toSeq ===
      Seq("grp_rank", "grp", "best", "pid", "score", "hit_rank", "v"))
    // group context survives shaping: ranks still (grp_rank, hit_rank)-ordered
    val ranks = grp.map(r => (r.getLong(0), r.getLong(5))).toSeq
    assert(ranks === ranks.sorted)
    // attaching the grouping payload column round-trips: label == grp
    val withLabel = c.searchGroups(qf, "label", 2, 3, want, withVectors = false)
    assert(withLabel.filter(col("label") =!= col("grp")).count() === 0L)
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
    val qf = vecsById(Seq(0L))(0L).map(_.toFloat).toSeq
    val mmrHits = c.searchMmr(qf, k = 3).collect()
    assert(mmrHits.length === 3 && mmrHits.head.schema.fieldNames.contains("pid"))
    assert(c.matrixPairs(sample = 20, k = 2).collect().nonEmpty)
    assert(c.randomSample(5).count() === 5)
    val filtered = c.search(qf, 5,
      graft.search.Filter(must = Seq(graft.search.MatchValue("label", 3))))
    assert(filtered.count() === 5)
  }

  test("collection aliases switch atomically between collection versions") {
    import java.nio.file.Files
    import graft.index.Sink
    val root = Files.createTempDirectory("graft_alias").toFile.getAbsolutePath
    val pts = emb.select(col("vec_id").as("pid"), col("embedding").as("v"))
    val v1 = pts.filter(col("pid") < 100)
    val v2 = pts
    graft.api.VectorCollection.ensure(spark, s"$root/col_v1", v1,
      graft.api.CollectionConfig("pid", "v", 64, multiVector = false)).upsert(v1)
    graft.api.VectorCollection.ensure(spark, s"$root/col_v2", v2,
      graft.api.CollectionConfig("pid", "v", 64, multiVector = false)).upsert(v2)
    Sink.setAlias(spark, root, "prod", s"$root/col_v1")
    val viaAlias = graft.api.VectorCollection.openAlias(spark, root, "prod")
    assert(viaAlias.count === v1.count())
    // blue/green switch: repoint, reopen, see v2 — v1 untouched
    Sink.setAlias(spark, root, "prod", s"$root/col_v2")
    assert(graft.api.VectorCollection.openAlias(spark, root, "prod").count === v2.count())
    assert(Sink.resolveAlias(spark, root, "prod") === s"$root/col_v2")
    assert(Sink.deleteAlias(spark, root, "prod"))
    intercept[IllegalArgumentException] {
      Sink.resolveAlias(spark, root, "prod")
    }
  }
}
