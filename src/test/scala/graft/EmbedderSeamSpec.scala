package graft

import org.apache.spark.sql.functions._
import graft.index.{Embedder, FeatureHashModel, Ingest, ModelEmbedder, SessionEmbedder}

/** The model-inference seam (ModelEmbedder): the default feature-hash
  * implementation must be bit-equal to the columnar expression path,
  * and a mock session-backed model must flow through
  * buildPointsWith → search with no query or plan changes. */
class EmbedderSeamSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
  private def decoded = Ingest.tolerantDecode(
    Ingest.imageScanFilter(Ingest.withPaths(docs)))

  test("FeatureHashModel single-vector is bit-equal to the columnar embedder") {
    val texts = docs.orderBy(col("doc_id")).limit(25)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val model = FeatureHashModel()
    val fromModel = model.embedBatch(texts.map(_._2).toSeq)
    val columnar = docs.orderBy(col("doc_id")).limit(25)
      .select(col("doc_id"),
        Embedder.embedRaw(Embedder.tokenHashes(col("text"))).as("e"))
      .collect().map(_.getSeq[Double](1))
    texts.indices.foreach { i =>
      val m = fromModel(i)
      assert(m.length === 1, "single-vector model returns 1-row matrices")
      assert(m.head.map(_.toDouble).toSeq === columnar(i).toSeq,
        s"doc ${texts(i)._1}: model/columnar embeddings diverge")
    }
  }

  test("FeatureHashModel chunked matches the b1 multi-vector slice semantics") {
    val model = FeatureHashModel(chunkTokens = Some(16))
    val row = docs.filter(col("doc_id") === 0)
      .select(col("text"),
        transform(sequence(lit(0),
            ((size(Embedder.tokenHashes(col("text"))) - 1) / 16).cast("int")),
          i => Embedder.embedRaw(
            slice(Embedder.tokenHashes(col("text")), i * 16 + 1, lit(16)))).as("mv"))
      .head
    val expected = row.getSeq[scala.collection.Seq[Double]](1).map(_.toSeq)
    val got = model.embedBatch(Seq(row.getString(0))).head
      .map(_.map(_.toDouble).toSeq).toSeq
    assert(got === expected)
  }

  test("mock session model flows through buildPointsWith -> dense search") {
    val batchSize = 16
    val pts = Ingest.buildPointsWith(decoded,
      new EmbedderSeamSpec.MockSessionModel("/models/m.onnx", 64),
      batchSize).cache()
    // every decoded row embedded exactly once, schema matches buildPoints
    val viaDefault = Ingest.buildPoints(decoded)
    assert(pts.count() === viaDefault.count())
    assert(pts.select("point_id").distinct().count() === pts.count())
    // same element type (array<double>); containsNull may differ
    // between a cast and a native expression — search accepts both
    (pts.schema("embedding").dataType, viaDefault.schema("embedding").dataType) match {
      case (org.apache.spark.sql.types.ArrayType(a, _),
            org.apache.spark.sql.types.ArrayType(b, _)) => assert(a === b)
      case other => fail(s"embedding not an array on both paths: $other")
    }
    // DataLoader contract: no model call ever saw more than batchSize
    val batchSizes = pts
      .select(element_at(col("embedding"), 1).as("b")).distinct()
      .collect().map(_.getDouble(0))
    assert(batchSizes.forall(b => b >= 1.0 && b <= batchSize),
      s"model batch sizes out of contract: ${batchSizes.toSeq}")
    // the session was loaded and used (slot 1 = len * path-derived scale)
    assert(pts.filter(element_at(col("embedding"), 2) =!= 0.0).count() > 0)
    // and the points are searchable through the UNTOUCHED search path
    val q = pts.limit(1).select(col("embedding").as("q"))
    val hits = graft.search.TopK.dense(pts, q, "point_id", "embedding", 5)
    assert(hits.count() === 5)
  }

  test("a model dropping inputs fails loudly instead of truncating the batch") {
    import spark.implicits._
    val df = (0L until 20L).map(i => (i, s"t$i")).toDF("id", "text")
    val e = intercept[Exception] {
      ModelEmbedder.embedWith(df, "text", EmbedderSeamSpec.DroppingModel, batchSize = 8)
        .count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("one matrix per input")),
      s"expected the loud length-mismatch error, got: ${messages(e).take(3)}")
  }

  test("embedWith batches stream per-partition without reordering rows") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, s"tok$i")).toDF("id", "text")
      .repartition(3)
    val out = ModelEmbedder.embedWith(df, "text", FeatureHashModel(), batchSize = 7)
    assert(out.count() === 100)
    assert(out.schema.fieldNames.toSeq === Seq("id", "text", "mv"))
    // ids survive beside their own text's embedding
    val one = out.filter(col("id") === 42).head
    val direct = FeatureHashModel().embedBatch(Seq("tok42")).head.head
    assert(one.getSeq[scala.collection.Seq[Float]](2).head.toSeq === direct.toSeq)
  }
}

object EmbedderSeamSpec {
  /** ONNX-shaped mock (top-level: must not capture the suite): ships
    * only a "path", loads its "session" lazily on the executor, embeds
    * deterministically, and tags vector slot 0 with the model-batch
    * size so the DataLoader contract is visible in the DATA
    * (assertable without executor-side spies). */
  /** Misbehaving backend: silently skips the last input of every
    * batch — the truncation embedWith must refuse. */
  private[graft] object DroppingModel extends ModelEmbedder {
    val name = "dropper"; val dim = 4
    def embedBatch(texts: Seq[String]): Seq[Array[Array[Float]]] =
      texts.dropRight(1).map(_ => Array(new Array[Float](dim)))
  }

  private[graft] class MockSession(val scale: Float) extends Serializable
  private[graft] class MockSessionModel(path: String, val dim: Int)
    extends SessionEmbedder[MockSession](path) {
    val name = "mock-onnx"
    protected def loadSession(p: String) = new MockSession(p.length.toFloat)
    protected def run(s: MockSession, texts: Seq[String]) =
      texts.map { t =>
        val v = new Array[Float](dim)
        v(0) = texts.size.toFloat // batch size this text arrived in
        v(1) = t.length * s.scale // session actually loaded and used
        Array(v)
      }
  }
}
