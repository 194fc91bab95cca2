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
    // a NULL text row NPE'd inside the backend (the columnar twin
    // null-propagates) — the seam must refuse by name instead
    val withNull = (0L until 5L).map(i => (i, if (i == 3) null else s"t$i"))
      .toDF("id", "text")
    val e3 = intercept[Exception] {
      ModelEmbedder.embedWith(withNull, "text", FeatureHashModel(),
        batchSize = 8).count()
    }
    assert(messages(e3).exists(_.contains("NULL text")),
      s"expected the loud null-text error, got: ${messages(e3).take(3)}")
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

  test("learned-projection backend: weights-load -> index -> search with driver/executor parity") {
    import EmbedderSeamSpec.{ProjectionCounters => P}
    // REAL fixed weights on disk (the r12 verdict #6 drill: a
    // non-loopback model through the seam): dim x 32 floats, values a
    // deterministic ramp so any row/column transposition or partial
    // load changes the output
    val dim = 8
    val w = Array.tabulate(dim, 32)((i, j) => (((i * 31 + j * 7) % 13) - 6) / 10.0f)
    val modelFile = java.nio.file.Files.createTempFile("graft_proj", ".csv")
    java.nio.file.Files.writeString(modelFile,
      w.map(_.mkString(",")).mkString("\n"))
    val model = new EmbedderSeamSpec.LearnedProjectionEmbedder(modelFile.toString, dim)
    P.reset()
    val batchSize = 16
    val pts = Ingest.buildPointsWith(decoded, model, batchSize).cache()
    val n = pts.count()
    // batch-contract round-trip: every row embedded exactly once, no
    // model call over the DataLoader batch size, one weight load per JVM
    assert(n === Ingest.buildPoints(decoded).count())
    assert(P.texts.get() >= n, s"model saw ${P.texts.get()} texts for $n rows")
    assert(P.maxBatch.get() <= batchSize,
      s"batch contract violated: ${P.maxBatch.get()} > $batchSize")
    assert(P.loads.get() === 1, s"expected one weights load, got ${P.loads.get()}")
    // executor-side embeddings equal DRIVER-side embedBatch of the same
    // text bit-for-bit — the parity a swapped runtime must preserve
    val sample = pts.select(col("text"), col("embedding")).limit(5).collect()
    sample.foreach { r =>
      val driverSide = model.embedBatch(Seq(r.getString(0))).head.head
        .map(_.toDouble).toSeq
      assert(r.getSeq[Double](1) === driverSide,
        s"driver/executor embedding diverge for '${r.getString(0).take(30)}...'")
    }
    // index -> search: append to a real collection, query with a
    // driver-embedded vector; the identical-text point must surface at
    // cosine 1 through the untouched dense top-k path
    val dir = java.nio.file.Files.createTempDirectory("graft_proj_col")
    val path = s"$dir/col"
    graft.index.Sink.append(pts.drop("mv"), path)
    val stored = spark.read.parquet(path)
    val probe = pts.orderBy(col("point_id")).limit(1)
      .select(col("point_id"), col("text")).head
    val qv = model.embedBatch(Seq(probe.getString(1))).head.head.map(_.toDouble).toSeq
    import spark.implicits._
    val hits = graft.search.TopK.dense(
      stored, Seq(qv).toDF("q"), "point_id", "embedding", 3).collect()
    assert(hits.nonEmpty)
    val self = hits.find(_.getLong(0) == probe.getLong(0))
    assert(self.isDefined, "the probe's own point must be in its top-3")
    assert(self.get.getDouble(1) >= 0.999999,
      s"self-similarity must be ~1.0, got ${self.get.getDouble(1)}")
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

  private[graft] object ProjectionCounters {
    val loads = new java.util.concurrent.atomic.AtomicInteger(0)
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    val texts = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxBatch = new java.util.concurrent.atomic.AtomicInteger(0)
    def reset(): Unit = { loads.set(0); batches.set(0); texts.set(0); maxBatch.set(0) }
  }

  /** A NON-loopback session backend: a learned linear projection with
    * real fixed weights — the session is a dim×32 weight matrix
    * parsed from the model file (plain arrays, the shape a distilled
    * linear probing head ships in), inference is feature-extraction
    * (char-class histogram) followed by a real matrix multiply. This
    * is the exact computation an ONNX linear layer would run, minus
    * the runtime — it proves the seam carries a model whose OUTPUT
    * depends on loaded weights in a nontrivial way (not a tagged echo
    * of its input like the loopback drill). */
  private[graft] class LearnedProjectionEmbedder(path: String, val dim: Int)
      extends SessionEmbedder[Array[Array[Float]]](path) {
    val name = "learned-projection"
    protected def loadSession(p: String): Array[Array[Float]] = {
      ProjectionCounters.loads.incrementAndGet()
      val rows = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(p))
      val w = new Array[Array[Float]](rows.size())
      var i = 0
      while (i < rows.size()) {
        w(i) = rows.get(i).split(",").map(_.toFloat); i += 1
      }
      require(w.length == dim && w.forall(_.length == 32),
        s"weight matrix must be ${dim}x32, got ${w.length}x${w.headOption.fold(0)(_.length)}")
      w
    }
    /** 32-dim input features: letter histogram (26) + digit count,
      * space count, other count, length, distinct-char count, bias. */
    private def features(t: String): Array[Float] = {
      val f = new Array[Float](32)
      var i = 0
      while (i < t.length) {
        val c = t.charAt(i)
        if (c >= 'a' && c <= 'z') f(c - 'a') += 1f
        else if (c >= 'A' && c <= 'Z') f(c - 'A') += 1f
        else if (c >= '0' && c <= '9') f(26) += 1f
        else if (c == ' ') f(27) += 1f
        else f(28) += 1f
        i += 1
      }
      f(29) = t.length.toFloat
      f(30) = t.toSet.size.toFloat
      f(31) = 1f // bias
      f
    }
    protected def run(w: Array[Array[Float]], texts: Seq[String]) = {
      ProjectionCounters.batches.incrementAndGet()
      ProjectionCounters.texts.addAndGet(texts.size)
      ProjectionCounters.maxBatch.getAndUpdate(m => math.max(m, texts.size))
      texts.map { t =>
        val x = features(t)
        val v = new Array[Float](dim)
        var i = 0
        while (i < dim) {
          var s = 0f; var j = 0
          while (j < 32) { s += w(i)(j) * x(j); j += 1 }
          v(i) = s; i += 1
        }
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
