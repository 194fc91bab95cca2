package graft

import org.apache.spark.sql.functions._
import graft.vector.Kernels

/** Unit + property coverage for the scoring kernels (SURVEY.md §5.2-3):
  * hand-computed small vectors, edge cases, and algebraic invariants. */
class KernelsSpec extends SparkSpec {
  import spark.implicits._

  private def one(colv: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(colv.as("v")).head.getDouble(0)

  private def vec(xs: Double*) = typedlit(xs.map(_.toFloat))

  test("dot: hand-computed") {
    assert(one(Kernels.dot(vec(1, 2, 3), vec(4, 5, 6))) === 32.0)
  }

  test("l2norm: 3-4-5 triangle") {
    assert(one(Kernels.l2norm(vec(3, 4))) === 5.0)
  }

  test("cosine: orthogonal is 0, parallel is 1, opposite is -1") {
    assert(math.abs(one(Kernels.cosine(vec(1, 0), vec(0, 1)))) < 1e-12)
    assert(math.abs(one(Kernels.cosine(vec(2, 1), vec(4, 2))) - 1.0) < 1e-12)
    assert(math.abs(one(Kernels.cosine(vec(1, 1), vec(-1, -1))) + 1.0) < 1e-12)
  }

  test("cosine: zero vector yields null (guarded; ANSI mode stays on)") {
    val r = Seq(1).toDF("x")
      .select(Kernels.cosine(vec(0, 0), vec(1, 1)).as("v")).head
    assert(r.isNullAt(0))
  }

  test("cosine: scale invariance cosine(a, λb) == cosine(a, b), λ>0") {
    val a = vec(0.3, -1.2, 2.2)
    assert(math.abs(
      one(Kernels.cosine(a, vec(1, 2, -0.5))) -
        one(Kernels.cosine(a, vec(3, 6, -1.5)))) < 1e-12)
  }

  test("normalize: unit norm afterwards") {
    val n = one(Kernels.l2norm(Kernels.normalize(vec(3, 4, 12))))
    assert(math.abs(n - 1.0) < 1e-12)
  }

  test("maxsim: single-token query picks the best doc token") {
    // Q = [(1,0)], D = [(0,1),(1,0)] → max cosine = 1
    val q = typedlit(Seq(Seq(1f, 0f)))
    val d = typedlit(Seq(Seq(0f, 1f), Seq(1f, 0f)))
    assert(math.abs(one(Kernels.maxsim(q, d)) - 1.0) < 1e-12)
  }

  test("maxsim: sums over query tokens") {
    val q = typedlit(Seq(Seq(1f, 0f), Seq(0f, 1f)))
    val d = typedlit(Seq(Seq(1f, 0f), Seq(0f, 1f)))
    assert(math.abs(one(Kernels.maxsim(q, d)) - 2.0) < 1e-12)
  }

  test("maxsim: monotone in added doc tokens") {
    val q = typedlit(Seq(Seq(1f, 0f), Seq(0.5f, 0.5f)))
    val d1 = typedlit(Seq(Seq(0f, 1f)))
    val d2 = typedlit(Seq(Seq(0f, 1f), Seq(1f, 0f)))
    assert(one(Kernels.maxsim(q, d2)) >= one(Kernels.maxsim(q, d1)))
  }

  test("maxsimDot on normalized tokens agrees with maxsim on raw tokens") {
    val q = typedlit(Seq(Seq(3f, 4f), Seq(0f, 2f)))
    val d = typedlit(Seq(Seq(5f, 0f), Seq(1f, 1f)))
    def norm(c: org.apache.spark.sql.Column) =
      transform(c, v => Kernels.normalize(v))
    val r = spark.range(1).select(
      Kernels.maxsim(q, d).as("a"),
      Kernels.maxsimDot(norm(q), norm(d)).as("b")).head
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12)
  }

  test("fixture embeddings are unit-norm (kernel + fixture property)") {
    val bad = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(Kernels.l2norm(col("embedding")).as("n"))
      .filter(abs(col("n") - 1.0) > 1e-4)
      .count()
    assert(bad === 0L)
  }
}
