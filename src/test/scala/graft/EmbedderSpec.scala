package graft

import org.apache.spark.sql.functions._
import graft.index.Embedder
import graft.vector.Kernels

class EmbedderSpec extends SparkSpec {
  import spark.implicits._

  private def embedOf(text: String): Seq[Double] =
    Seq(text).toDF("text")
      .select(Embedder.embedRaw(Embedder.tokenHashes(col("text"))).as("v"))
      .head.getSeq[Double](0)

  test("deterministic: same text → same vector") {
    assert(embedOf("spark scan merge") === embedOf("spark scan merge"))
  }

  test("dimension is 64 and components are signed counts") {
    val v = embedOf("a b a")
    assert(v.length === 64)
    assert(v.map(math.abs).sum >= 1.0)
    assert(v.forall(x => x == math.rint(x)))
  }

  test("token order does not matter, multiplicity does") {
    assert(embedOf("a b") === embedOf("b a"))
    assert(embedOf("a a b") !== embedOf("a b"))
  }

  test("empty/whitespace text → zero vector") {
    assert(embedOf(" ").forall(_ == 0.0))
  }

  test("tokenHash matches a reference implementation") {
    def ref(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % Embedder.Prime)
    val got = Seq("spark", "zz", "a").toDF("t")
      .select(Embedder.tokenHash(col("t")).as("h")).collect().map(_.getLong(0))
    assert(got.toSeq === Seq(ref("spark"), ref("zz"), ref("a")))
  }

  test("embed (normalized) has unit norm for non-degenerate text") {
    val n = Seq("the quick brown fox").toDF("text")
      .select(Kernels.l2norm(
        Embedder.embed(Embedder.tokenHashes(col("text")))).as("n"))
      .head.getDouble(0)
    assert(math.abs(n - 1.0) < 1e-12)
  }
}
