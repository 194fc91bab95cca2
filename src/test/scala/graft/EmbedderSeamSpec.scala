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
    // a backend emitting an EMPTY matrix for a row must fail at the
    // seam with the model named — not later as an opaque ANSI
    // INVALID_ARRAY_INDEX when element_at(mv, 1) reads the pooled row
    val e2 = intercept[Exception] {
      ModelEmbedder.embedWith(df, "text", EmbedderSeamSpec.EmptyMatrixModel,
        batchSize = 8).count()
    }
    assert(messages(e2).exists(_.contains("EMPTY token matrix")),
      s"expected the loud empty-matrix error, got: ${messages(e2).take(3)}")
  }

  test("session lifecycle: one load per JVM across tasks, idempotent close, reload") {
    import spark.implicits._
    import EmbedderSeamSpec.{LoopbackCounters => C}
    // a REAL model file on disk: the backend must load its weights
    // executor-side from the path, like an ONNX session would
    val modelFile = java.nio.file.Files.createTempFile("graft_model", ".txt")
    java.nio.file.Files.writeString(modelFile, "2.5")
    val model = new EmbedderSeamSpec.LoopbackEmbedder(modelFile.toString, 8)
    C.reset()
    val df = (0L until 60L).map(i => (i, s"w$i")).toDF("id", "text").repartition(4)
    assert(ModelEmbedder.embedWith(df, "text", model, batchSize = 7).count() === 60)
    // 4 tasks each deserialize their own copy of `model`, but the JVM
    // registry hands every copy the SAME session: exactly one load
    assert(C.loads.get() === 1,
      s"expected one session load per JVM, got ${C.loads.get()}")
    assert(C.batches.get() >= 8, s"batching not exercised: ${C.batches.get()}")
    assert(C.closes.get() === 0)
    // close frees native resources exactly once
    model.close(); model.close()
    assert(C.closes.get() === 1, "close must be idempotent")
    // a post-close batch reloads a fresh session (ONNX semantics:
    // closed sessions are gone; the registry entry was removed)
    assert(model.embedBatch(Seq("again")).head.length === 1)
    assert(C.loads.get() === 2, "embedBatch after close must reload")
    model.close()
    assert(C.closes.get() === 2)
  }

  test("loopback session backend flows buildPointsWith -> search unchanged") {
    import EmbedderSeamSpec.{LoopbackCounters => C}
    val modelFile = java.nio.file.Files.createTempFile("graft_model2", ".txt")
    java.nio.file.Files.writeString(modelFile, "1.5")
    val model = new EmbedderSeamSpec.LoopbackEmbedder(modelFile.toString, 8)
    C.reset()
    val pts = Ingest.buildPointsWith(decoded, model, batchSize = 16).cache()
    assert(pts.count() === Ingest.buildPoints(decoded).count())
    // the weights CAME FROM the model file: slot 0 carries the loaded
    // scale, so a wrong/missing load cannot silently embed zeros
    assert(pts.filter(element_at(col("embedding"), 1) === 1.5 * 31).count() > 0 ||
      pts.filter(element_at(col("embedding"), 1) =!= 0.0).count() > 0)
    // searchable through the untouched dense top-k path
    val q = pts.limit(1).select(col("embedding").as("q"))
    assert(graft.search.TopK.dense(pts, q, "point_id", "embedding", 5).count() === 5)
    model.close()
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

  /** Misbehaving backend: emits a ZERO-TOKEN matrix for every input —
    * the empty-matrix contract violation embedWith must refuse. */
  private[graft] object EmptyMatrixModel extends ModelEmbedder {
    val name = "emptier"; val dim = 4
    def embedBatch(texts: Seq[String]): Seq[Array[Array[Float]]] =
      texts.map(_ => Array.empty[Array[Float]])
  }

  /** Lifecycle spies: local-mode executors share the test JVM, so
    * executor-side loads/closes are visible to the suite directly. */
  private[graft] object LoopbackCounters {
    val loads = new java.util.concurrent.atomic.AtomicInteger(0)
    val closes = new java.util.concurrent.atomic.AtomicInteger(0)
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    def reset(): Unit = { loads.set(0); closes.set(0); batches.set(0) }
  }

  /** A session with real state read from the model FILE (the weight a
    * run provably uses) and a real closed flag (a post-close run is a
    * hard error, like a freed ONNX session). */
  private[graft] class LoopbackSession(val scale: Float) extends Serializable {
    @volatile var closed = false
  }

  /** Loopback [[SessionEmbedder]] backend: everything a runtime-backed
    * model does — load weights from a path, batch inference on the
    * live session, free it on close — without the runtime. Proves the
    * load/run/close lifecycle end-to-end where the sandbox has no
    * ONNX runtime or model weights. */
  private[graft] class LoopbackEmbedder(path: String, val dim: Int)
      extends SessionEmbedder[LoopbackSession](path) {
    val name = "loopback"
    protected def loadSession(p: String): LoopbackSession = {
      LoopbackCounters.loads.incrementAndGet()
      new LoopbackSession(java.nio.file.Files.readString(
        java.nio.file.Paths.get(p)).trim.toFloat)
    }
    override protected def closeSession(s: LoopbackSession): Unit = {
      s.closed = true
      LoopbackCounters.closes.incrementAndGet()
    }
    protected def run(s: LoopbackSession, texts: Seq[String]) = {
      if (s.closed) throw new IllegalStateException("session is closed")
      LoopbackCounters.batches.incrementAndGet()
      texts.map { t =>
        val v = new Array[Float](dim)
        v(0) = s.scale * math.max(t.length, 1)
        var i = 0
        while (i < t.length) { v(1 + t.charAt(i) % (dim - 1)) += s.scale; i += 1 }
        Array(v)
      }
    }
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
