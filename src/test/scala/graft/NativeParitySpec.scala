package graft

import org.apache.spark.sql.functions._
import graft.vector.Kernels
import graft.index.Embedder
import graft.ops.Dedup
import graft.Tables.t

/** The native catalyst expressions must be bit-identical to their HOF
  * twins (same fold order, same guards) on real fixture data — this is
  * what keeps the DuckDB oracles valid after the perf promotion. */
class NativeParitySpec extends SparkSpec {

  private def docs = t(spark, sf, "documents")
  private def emb = t(spark, sf, "embeddings")

  test("cosine: native == HOF on all fixture pairs vs vector 0") {
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q"))
    val d = emb.crossJoin(broadcast(q))
      .select(
        Kernels.cosine(col("embedding"), col("q")).as("a"),
        Kernels.cosineHof(col("embedding"), col("q")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(d.count() === 0L)
  }

  test("dot: native == HOF") {
    val q = emb.filter(col("vec_id") === 1).select(col("embedding").as("q"))
    val d = emb.crossJoin(broadcast(q))
      .select(Kernels.dot(col("embedding"), col("q")).as("a"),
        Kernels.dotHof(col("embedding"), col("q")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(d.count() === 0L)
  }

  test("maxsim: native == HOF on multi-vector fixture") {
    val mv = Tables.multiVectorDocs(emb)
    val q = mv.filter(col("doc_id") === 0).select(col("vecs").as("q"))
    val d = mv.crossJoin(broadcast(q))
      .select(Kernels.maxsim(col("q"), col("vecs")).as("a"),
        Kernels.maxsimHof(col("q"), col("vecs")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(d.count() === 0L)
  }

  test("normalize: native == HOF on all fixture vectors") {
    val d = emb
      .select(Kernels.normalize(col("embedding")).as("a"),
        Kernels.normalizeHof(col("embedding")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(d.count() === 0L)
  }

  test("banded sign-LSH buckets: native == HOF on all fixture vectors") {
    import graft.ops.Similarity
    val d = emb
      .select(Similarity.bandedBuckets(col("embedding"), 10, 5).as("a"),
        Similarity.bandedBucketsHof(col("embedding"), 10, 5).as("b"))
      .filter(col("a") =!= col("b"))
    assert(d.count() === 0L)
  }

  test("pq encode/decode: native == HOF on all fixture vectors") {
    import graft.ops.Quantize
    val cb = emb.filter(col("vec_id") >= 1 && col("vec_id") <= 16)
      .orderBy(col("vec_id")).collect()
      .map(r => r.getSeq[Float](r.fieldIndex("embedding")).toSeq).toSeq
    val codes = emb
      .select(Quantize.pqCodes(col("embedding"), cb, 8, 8).as("a"),
        Quantize.pqCodesHof(col("embedding"), cb, 8, 8).as("b"))
    assert(codes.filter(col("a") =!= col("b")).count() === 0L)
    val dq = emb
      .select(Quantize.pqDecode(Quantize.pqCodes(col("embedding"), cb, 8, 8), cb, 8, 8).as("a"),
        Quantize.pqDecodeHof(Quantize.pqCodesHof(col("embedding"), cb, 8, 8), cb, 8, 8).as("b"))
    assert(dq.filter(col("a") =!= col("b")).count() === 0L)
  }

  test("sign-bit packing: native == HOF on all fixture vectors, both halves") {
    import graft.ops.Quantize
    val d = emb.select(
      Quantize.bqBits(col("embedding"), 0).as("a0"),
      Quantize.bqBitsHof(col("embedding"), 0).as("b0"),
      Quantize.bqBits(col("embedding"), 32).as("a1"),
      Quantize.bqBitsHof(col("embedding"), 32).as("b1"))
      .filter(col("a0") =!= col("b0") || col("a1") =!= col("b1"))
    assert(d.count() === 0L)
  }

  test("sign-bit packing: NaN components agree between native and HOF (SQL NaN-above-zero)") {
    import graft.ops.Quantize
    val v = Array.fill(64)(-1.0f)
    v(3) = Float.NaN; v(40) = Float.NaN; v(5) = 2.0f
    val row = spark.range(1).select(typedlit(v.toSeq).as("embedding"))
    val r = row.select(
      Quantize.bqBits(col("embedding"), 0).as("a0"),
      Quantize.bqBitsHof(col("embedding"), 0).as("b0"),
      Quantize.bqBits(col("embedding"), 32).as("a1"),
      Quantize.bqBitsHof(col("embedding"), 32).as("b1")).head
    assert(r.getLong(0) === r.getLong(1))
    assert(r.getLong(2) === r.getLong(3))
    assert((r.getLong(0) & (1L << 3)) !== 0L, "NaN bit set (SQL semantics)")
    assert(r.getLong(0) === Quantize.bqBitsLocal(v, 0))
    assert(r.getLong(2) === Quantize.bqBitsLocal(v, 32))
  }

  test("tokenHashes + embedRaw: native == HOF on documents") {
    val d = docs
      .withColumn("h1", Embedder.tokenHashes(col("text")))
      .withColumn("h2", Embedder.tokenHashesHof(col("text")))
      .withColumn("e1", Embedder.embedRaw(col("h1")))
      .withColumn("e2", Embedder.embedRawHof(col("h2")))
      .filter(col("h1") =!= col("h2") || col("e1") =!= col("e2"))
    assert(d.count() === 0L)
  }

  test("rolling window hashes: native == HOF on documents and length edges") {
    val d = docs
      .withColumn("th", Embedder.tokenHashes(col("text")))
      .select(Dedup.windowHashes(col("th"), 20).as("a"),
        Dedup.windowHashesHof(col("th"), 20).as("b"))
      .filter(col("a") =!= col("b"))
    assert(d.count() === 0L)
    import spark.implicits._
    // docs shorter than, exactly at, and one over the window length
    val edges = Seq(
      (1L, Seq.fill(19)("w").mkString(" ")),
      (2L, Seq.fill(20)("w").mkString(" ")),
      (3L, (0 until 21).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("th", Embedder.tokenHashes(col("text")))
      .select(col("doc_id"), Dedup.windowHashes(col("th"), 20).as("a"),
        Dedup.windowHashesHof(col("th"), 20).as("b"))
      .collect()
    edges.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"doc ${r.getLong(0)}")
    }
    assert(edges.find(_.getLong(0) == 1L).get.getSeq[Long](1).isEmpty)
    assert(edges.find(_.getLong(0) == 2L).get.getSeq[Long](1).length === 1)
    assert(edges.find(_.getLong(0) == 3L).get.getSeq[Long](1).length === 2)
  }

  test("tokenHash (whole-string poly hash): native == HOF on documents and edge strings") {
    val d = docs
      .select(Embedder.tokenHash(col("text")).as("a"),
        Embedder.tokenHashHof(col("text")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(d.count() === 0L)
    import spark.implicits._
    // includes a non-BMP char: the fold must walk CODE POINTS (like
    // DuckDB string_split(s, '')), not UTF-16 surrogate halves
    val edges = Seq("", " ", "a", "multi word line", "a  b", " lead trail ", "a😀b")
      .toDF("s")
      .select(Embedder.tokenHash(col("s")).as("a"),
        Embedder.tokenHashHof(col("s")).as("b"))
      .collect()
    edges.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("simhash: native == HOF on documents") {
    val d = docs
      .select(Dedup.simhash(col("text")).as("a"), Dedup.simhashHof(col("text")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(d.count() === 0L)
  }

  test("shingle hashes: native == HOF on documents (incl. dup corpus)") {
    val c = Dedup.corpusWithDups(docs)
    val d = c.select(Dedup.shingleHashes(col("text")).as("a"),
        Dedup.shingleHashesHof(col("text")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(d.count() === 0L)
  }

  test("tokenizer parity on edge-case strings (whitespace runs, unicode)") {
    import spark.implicits._
    val weird = Seq("a  b", " lead", "trail ", " ", "héllo wörld zz",
      "a\tb c", "one", "x y z w", "ä ö ü ß ä ö ü")
    val d = weird.toDF("text")
      .withColumn("h1", Embedder.tokenHashes(col("text")))
      .withColumn("h2", Embedder.tokenHashesHof(col("text")))
      .withColumn("s1", Dedup.shingleHashes(col("text")))
      .withColumn("s2", Dedup.shingleHashesHof(col("text")))
      .filter(col("h1") =!= col("h2") || col("s1") =!= col("s2"))
    assert(d.count() === 0L)
  }

  test("cosine handles int/long element types in both eval and codegen") {
    import spark.implicits._
    val d = Seq((Seq(1L, 2L, 2L), Seq(1, 2, 2), Seq(1.0f, 2.0f, 2.0f)))
      .toDF("l", "i", "f")
      .select(Kernels.cosine(col("l"), col("f")).as("lf"),
        Kernels.cosine(col("i"), col("f")).as("if"))
      .head
    assert(math.abs(d.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(d.getDouble(1) - 1.0) < 1e-12)
  }

  test("jaccard sorted-merge == set-op formulation") {
    import spark.implicits._
    val rows = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),
      (Seq(1L), Seq(9L)),
      (Seq(5L, 7L, 9L, 11L), Seq(5L, 7L, 9L, 11L)))
    val d = rows.toDF("a", "b").select(
        Kernels.ofExpr(graft.vector.JaccardSorted(
          Kernels.exprOf(col("a")), Kernels.exprOf(col("b")))).as("x"),
        (size(array_intersect(col("a"), col("b"))).cast("double") /
          size(array_union(col("a"), col("b"))).cast("double")).as("y"))
      .filter(col("x") =!= col("y"))
    assert(d.count() === 0L)
  }

  test("minhash signature: native == HOF on shingle hashes") {
    val hs = docs.select(col("doc_id"),
      array_distinct(transform(Dedup.shingles(col("text")),
        s => Embedder.tokenHash(s))).as("hs"))
    val d = hs.select(Dedup.minhashSig(col("hs"), 8).as("a"),
        Dedup.minhashSigHof(col("hs"), 8).as("b"))
      .filter(col("a") =!= col("b"))
    assert(d.count() === 0L)
  }

  test("wide minhash signature (xor-seed): native == HOF on 60-bit shingle hashes") {
    val hs = docs.select(col("doc_id"),
      Dedup.shingleHashes64(col("text")).as("hs"))
    val d = hs.select(Dedup.minhashSigXor(col("hs"), 12).as("a"),
        Dedup.minhashSigXorHof(col("hs"), 12).as("b"))
      .filter(col("a") =!= col("b"))
    assert(d.count() === 0L)
  }

  test("euclidean: native == HOF on all fixture pairs vs vector 0") {
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q"))
    val d = emb.crossJoin(broadcast(q))
      .select(Kernels.euclidean(col("embedding"), col("q")).as("a"),
        Kernels.euclideanHof(col("embedding"), col("q")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(d.count() === 0L)
  }

  test("manhattan: native == HOF on all fixture pairs vs vector 0") {
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q"))
    val d = emb.crossJoin(broadcast(q))
      .select(Kernels.manhattan(col("embedding"), col("q")).as("a"),
        Kernels.manhattanHof(col("embedding"), col("q")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(d.count() === 0L)
  }

  test("topk_hits heap aggregate == row_number window on tied scores") {
    import graft.ops.Similarity
    import org.apache.spark.sql.expressions.Window
    val qs = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    // 1dp rounding collapses thousands of candidates onto shared score
    // values, so the id-ASC tie-break path is genuinely exercised
    val scored = emb.crossJoin(broadcast(qs))
      .select(col("q_id"), col("vec_id"),
        round(Kernels.cosine(col("embedding"), col("qv")), 1).as("score"))
    val ties = scored.groupBy("q_id", "score").count()
      .filter(col("count") > 1).count()
    assert(ties > 0, "fixture must contain tied scores for this test to bite")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    val win = scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 7)
    val agg = scored.groupBy(col("q_id"))
      .agg(Similarity.topKHits(col("score"), col("vec_id"), 7).as("hits"))
      .select(col("q_id"), posexplode(col("hits")))
      .select(col("q_id"), col("col.vec_id").as("vec_id"),
        col("col.score").as("score"), (col("pos") + 1).cast("long").as("rnk"))
    assert(win.exceptAll(agg).count() === 0L)
    assert(agg.exceptAll(win).count() === 0L)
  }

  test("topk_hits declares input types: numeric children coerce, strings fail at analysis") {
    import spark.implicits._
    val df = Seq((1, 0.5f), (1, 0.9f), (2, 0.1f)).toDF("id", "s")
    // float score + int id: implicit cast to (double, long) at analysis
    val hits = df.groupBy(col("id"))
      .agg(graft.vector.Kernels.topKHits(col("s"), col("id").cast("long"), 1).as("h"))
      .select(col("id"), posexplode(col("h")))
      .select(col("id"), col("col.score").as("score"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(math.abs(hits(1) - 0.9) < 1e-6 && math.abs(hits(2) - 0.1) < 1e-6)
    // an int score child also coerces (was a mid-job ClassCastException)
    val intScore = df.groupBy(col("id"))
      .agg(graft.vector.Kernels.topKHits(lit(3), col("id").cast("long"), 1).as("h"))
    assert(intScore.count() === 2)
    // a non-numeric score on the RAW expression (bypassing the
    // wrapper's cast) fails AT ANALYSIS, not inside update() mid-job
    val raw = graft.vector.Kernels.ofExpr(
      graft.vector.TopKHits(
        graft.vector.Kernels.exprOf(lit("oops")),
        graft.vector.Kernels.exprOf(col("id").cast("long")),
        1).toAggregateExpression())
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy(col("id")).agg(raw.as("h")).collect()
    }
    assert(e.getMessage.contains("topk_hits expects"),
      s"expected the declared type-check message, got: ${e.getMessage.take(200)}")
  }

  test("winnow select: native == HOF sel on documents, planted texts, and length edges") {
    import spark.implicits._
    val ta = graft.ops.TextAnalysis
    val planted = graft.Tables.t(spark, sf, "documents")
      .withColumn("text",
        when(col("doc_id") % 25 === 0,
          concat(col("text"), lit(" " + ta.WinnowMarker))).otherwise(col("text")))
    val both = ta.winnowSelected(planted, 4)
      .select(col("doc_id"), col("sel"),
        ta.winnowSelectNative(col("text")).as("ns"))
      .filter(not(col("sel") === col("ns")))
    assert(both.count() === 0L, "native and HOF fingerprint sets must be identical")
    // length edges: 5..8 tokens give 1..4 grams (the G<4 single-window arm)
    val edges = Seq("a b c d e", "a b c d e f", "a b c d e f g",
      "a b c d e f g h", "x  y   z    w     v").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val e = ta.winnowSelected(edges, 4)
      .select(col("sel"), ta.winnowSelectNative(col("text")).as("ns"))
      .collect()
    assert(e.length === 5)
    assert(e.forall(r => r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  /** Randomized unicode corpus: alphabets that stress the codepoint
    * fold — ascii, accents, CJK, and ASTRAL characters (surrogate
    * pairs: codePointAt+charCount vs a per-char fold diverges exactly
    * here) — with ragged 1–3-space separators and leading spaces. */
  private def randomTexts(n: Int): Seq[(Long, String)] = {
    import org.scalacheck.{Gen, rng}
    val alpha = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString),
      Gen.oneOf("é", "ß", "ñ"),
      Gen.oneOf("水", "火", "語"),
      Gen.oneOf("𝔘", "😀", "𐐷"))
    val token = Gen.choose(1, 6).flatMap(k =>
      Gen.listOfN(k, alpha).map(_.mkString))
    val text = for {
      m <- Gen.choose(0, 40)
      toks <- Gen.listOfN(m, token)
      seps <- Gen.listOfN(math.max(m - 1, 0), Gen.choose(1, 3).map(" " * _))
      lead <- Gen.choose(0, 2).map(" " * _)
    } yield lead + toks.zipAll(seps, "", "").map { case (t, s) => t + s }.mkString
    (0 until n).flatMap(i =>
      text.apply(Gen.Parameters.default, rng.Seed(i.toLong)))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
  }

  test("text natives == HOF twins on randomized unicode texts") {
    import spark.implicits._
    val df = randomTexts(150).toDF("doc_id", "text").cache()
    // every (native, twin) column pair must agree row-for-row
    val pairs: Seq[(String, org.apache.spark.sql.Column, org.apache.spark.sql.Column)] = Seq(
      ("tokenHashes", Embedder.tokenHashes(col("text")),
        Embedder.tokenHashesHof(col("text"))),
      ("tokenHash", Embedder.tokenHash(col("text")),
        Embedder.tokenHashHof(col("text"))),
      ("shingleHashes", Dedup.shingleHashes(col("text")),
        Dedup.shingleHashesHof(col("text"))),
      ("simhash", Dedup.simhash(col("text")), Dedup.simhashHof(col("text"))))
    pairs.foreach { case (name, a, b) =>
      val bad = df.select(col("doc_id"), a.as("a"), b.as("b"))
        .filter(not(col("a") <=> col("b"))).collect()
      assert(bad.isEmpty,
        s"$name diverged on ${bad.length} random texts, first: " +
          bad.headOption.map(_.toString).getOrElse(""))
    }
    val wh = df.withColumn("th", Embedder.tokenHashes(col("text")))
      .select(Dedup.windowHashes(col("th"), 5).as("a"),
        Dedup.windowHashesHof(col("th"), 5).as("b"))
      .filter(not(col("a") <=> col("b")))
    assert(wh.count() === 0L, "windowHashes diverged on random texts")
    df.unpersist()
  }

  test("winnow select: native == HOF on randomized texts (surrogates, ragged spacing)") {
    import spark.implicits._
    val ta = graft.ops.TextAnalysis
    val texts = randomTexts(150)
    val df = texts.toDF("doc_id", "text")
    val diff = ta.winnowSelected(df, 4)
      .select(col("doc_id"), col("sel"),
        ta.winnowSelectNative(col("text")).as("ns"))
      .filter(not(col("sel") === col("ns")))
      .collect()
    assert(diff.isEmpty,
      s"native/HOF winnow diverged on ${diff.length} random texts, first: " +
        diff.headOption.map(_.toString).getOrElse(""))
    // and the short-text arm: native returns [] below 5 tokens, the
    // HOF path filters those rows out entirely — check the native
    // directly on every generated text
    val shortOnes = texts.filter(_._2.trim.split(" +").count(_.nonEmpty) < 5)
    if (shortOnes.nonEmpty) {
      val ns = shortOnes.toDF("doc_id", "text")
        .select(ta.winnowSelectNative(col("text")).as("ns")).collect()
      assert(ns.forall(_.getSeq[Long](0).isEmpty),
        "native winnow must return empty below 5 tokens")
    }
  }
}
