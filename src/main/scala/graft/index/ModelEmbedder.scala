package graft.index

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Model-inference seam: the reference embeds with GPU models batch by
  * batch — `model(**batch)` returns one token matrix per input (ColPali
  * page matrices, ~1030×128d:
  * `with_colpali_v1.3/incremental_indexing_colpali_with_qdrant.py:245-254`;
  * single-vector text models are the 1-row case:
  * `with_jina_text_v4/jina_v4_text_indexer.py:104-114`). This trait pins
  * that exact I/O shape so a real inference backend drops in without
  * touching any query, oracle, or plan: implement `embedBatch`, hand the
  * instance to [[Ingest.buildPointsWith]].
  *
  * Implementations must be Serializable — instances ship to executors
  * inside `mapPartitions` closures — and deterministic per input if
  * incremental ingest's replace-by-id semantics are to stay idempotent
  * (F5: the reference's uuid4 non-determinism is the documented
  * deviation we do NOT copy).
  */
trait ModelEmbedder extends Serializable {
  def name: String
  /** Width of every returned vector. */
  def dim: Int
  /** One token matrix per input text, in input order; a single-vector
    * model returns 1×dim matrices. Called with at most the configured
    * batch size of inputs — the DataLoader contract
    * (`with_colpali_v1.3/...py:220-238`). */
  def embedBatch(texts: Seq[String]): Seq[Array[Array[Float]]]
}

/** Skeleton for a real inference-backed [[ModelEmbedder]] (ONNX
  * Runtime, JNI, a local inference server...): the closure ships only
  * the model PATH; the heavyweight session is `@transient lazy`, so
  * each executor JVM loads it once on its first batch and it is never
  * serialized. This is the integration point a production deployment
  * fills in — everything Spark-side (batching, schema, point assembly,
  * search) is identical between this and the deterministic default.
  *
  * {{{
  * class OnnxColPali(path: String) extends SessionEmbedder[OrtSession](path) {
  *   val name = "colpali-onnx"; val dim = 128
  *   protected def loadSession(p: String) = makeOrtSession(p)
  *   protected def run(s: OrtSession, texts: Seq[String]) = s.run(tokenize(texts))
  * }
  * }}}
  */
abstract class SessionEmbedder[S](val modelPath: String) extends ModelEmbedder {

  /** Executor-side: build the runtime session (an ONNX OrtSession, a
    * JNI handle, an inference-server connection...). Called at most
    * once per JVM per (backend class, model path) — Spark deserializes
    * a fresh copy of this object into EVERY task closure, so a plain
    * per-instance lazy val would re-load the model once per task; the
    * JVM-wide registry in [[SessionEmbedder.acquire]] is what makes
    * the once-per-executor contract real. */
  protected def loadSession(path: String): S
  /** Release the session's native resources. Idempotence is handled by
    * the holder — this is called exactly once per loaded session, from
    * [[close]] or the JVM shutdown hook. */
  protected def closeSession(session: S): Unit = ()
  /** Run one model batch on the live session. */
  protected def run(session: S, texts: Seq[String]): Seq[Array[Array[Float]]]

  private def registryKey: String = s"${getClass.getName}@$modelPath"

  final override def embedBatch(texts: Seq[String]): Seq[Array[Array[Float]]] =
    run(SessionEmbedder.acquire(registryKey,
      () => loadSession(modelPath),
      (s: S) => closeSession(s)), texts)

  /** Close this backend's session in THIS JVM, if one was loaded:
    * native resources are freed exactly once (further [[close]] calls
    * are no-ops) and a later [[embedBatch]] re-loads a fresh session.
    * Executors that never see an explicit close free their session in
    * the registry's JVM shutdown hook — the lifecycle a real
    * runtime-backed session (e.g. ONNX `OrtSession.close`) needs. */
  final def close(): Unit = SessionEmbedder.release(registryKey)
}

object SessionEmbedder {
  /** One live session per (backend class, model path) per JVM. */
  private final class Holder(val session: AnyRef, closeFn: AnyRef => Unit) {
    private val closed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def close(): Unit = if (closed.compareAndSet(false, true)) closeFn(session)
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, Holder]()

  locally {
    java.lang.Runtime.getRuntime.addShutdownHook(new Thread(() => {
      registry.values().forEach(_.close())
      registry.clear()
    }, "graft-session-embedder-close"))
  }

  private def acquire[S](key: String, load: () => S, closeFn: S => Unit): S =
    registry.computeIfAbsent(key, _ =>
      new Holder(load().asInstanceOf[AnyRef],
        (s: AnyRef) => closeFn(s.asInstanceOf[S])))
      .session.asInstanceOf[S]

  private def release(key: String): Unit = {
    val h = registry.remove(key)
    if (h != null) h.close()
  }
}

/** The deterministic default: a plain-Scala twin of the columnar
  * feature-hash embedder ([[Embedder]]), chunking text into
  * `chunkTokens`-token slices and embedding each slice — `chunkTokens =
  * None` is the single-vector model (whole text → 1×dim). Bit-equal to
  * the Catalyst-expression path (asserted in EmbedderSeamSpec), so
  * swapping execution styles can never change search results. */
final case class FeatureHashModel(
    dim: Int = Embedder.DefaultDim,
    chunkTokens: Option[Int] = None) extends ModelEmbedder {
  val name: String = "feature-hash"

  private def tokenHashes(text: String): Array[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    // identical to PolyTokenHashes: split on single spaces, drop
    // empties, fold code points h*31+cp mod P
    text.split(" ", -1).foreach { tok =>
      if (tok.nonEmpty) {
        var h = 0L
        var i = 0
        while (i < tok.length) {
          val cp = tok.codePointAt(i)
          h = (h * 31L + cp) % Embedder.Prime
          i += Character.charCount(cp)
        }
        out += h
      }
    }
    out.toArray
  }

  private def embedRaw(hashes: Array[Long]): Array[Float] = {
    val v = new Array[Float](dim)
    hashes.foreach { h =>
      val b = (h % dim).toInt
      val sign = 1.0f - 2.0f * ((h / dim) % 2L)
      v(b) += sign
    }
    v
  }

  override def embedBatch(texts: Seq[String]): Seq[Array[Array[Float]]] =
    texts.map { t =>
      val hs = tokenHashes(t)
      chunkTokens match {
        case None => Array(embedRaw(hs))
        case Some(c) =>
          // ceil(n/c) chunks, ALWAYS at least one (an empty text embeds
          // to one zero chunk) — the b1_multivec_embed slice semantics
          val n = math.max(1, (hs.length + c - 1) / c)
          Array.tabulate(n)(i => embedRaw(hs.slice(i * c, i * c + c)))
      }
    }
}

object ModelEmbedder {
  /** Executor-side batched embedding of `textCol`: `mapPartitions` +
    * `iterator.grouped(batchSize)` — the reference's DataLoader shape,
    * streaming (never materializes a partition), shuffle-free. Adds a
    * `mv array<array<float>>` token-matrix column. At 100 TB this is a
    * pure map stage scaling with input splits; batchSize trades
    * per-call model efficiency against executor memory, exactly the
    * knob the reference exposes. */
  def embedWith(
      df: DataFrame,
      textCol: String,
      model: ModelEmbedder,
      batchSize: Int = 16): DataFrame = {
    require(batchSize > 0, "model batch size must be positive")
    val outSchema = df.schema.add("mv",
      ArrayType(ArrayType(FloatType, containsNull = false), containsNull = false))
    val textIdx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // a NULL text NPEs inside the backend (the columnar twin
        // null-propagates to a NULL embedding instead) — refuse by
        // name at the seam rather than crash a task mid-batch
        val texts = batch.map { r =>
          val t = r.getString(textIdx)
          require(t != null,
            s"embedWith: NULL $textCol — the model seam cannot embed " +
              "null text; filter or coalesce nulls upstream")
          t
        }
        val mats = model.embedBatch(texts)
        // loud, not truncating: a backend that drops an un-tokenizable
        // input would otherwise silently zip away the batch's tail —
        // rows missing from the index with no error
        require(mats.size == batch.size,
          s"${model.name}.embedBatch returned ${mats.size} matrices for " +
            s"${batch.size} inputs — a model must emit one matrix per input")
        // and one ROW per matrix: downstream point assembly reads the
        // pooled vector as element_at(mv, 1), which under ANSI mode
        // dies as an opaque INVALID_ARRAY_INDEX mid-job if a backend
        // emits a zero-token matrix — fail at the seam, with the model
        // named (FeatureHashModel embeds empty text as one zero chunk;
        // real backends must do the equivalent)
        require(mats.forall(_.nonEmpty),
          s"${model.name}.embedBatch returned an EMPTY token matrix — " +
            "every input must embed to at least one vector (pool or " +
            "zero-pad un-tokenizable inputs)")
        batch.iterator.zip(mats.iterator).map { case (r, m) =>
          Row.fromSeq(r.toSeq :+ m.map(_.toSeq).toSeq)
        }
      }
    }(Encoders.row(outSchema))
  }
}
