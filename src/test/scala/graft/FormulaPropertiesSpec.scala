package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.search._

/** Property parity for the Formula AST: random formula trees evaluated
  * through the compiled Catalyst Column must agree with a straight
  * Scala reference evaluator on random (score, label) inputs. Guards
  * (div-by-zero default, sqrt clamp, log1p clamp) are part of the
  * contract, so the reference implements them identically. Fixed
  * ScalaCheck seeds keep CI deterministic; all cases evaluate in ONE
  * DataFrame pass per tree. */
class FormulaPropertiesSpec extends SparkSpec {
  import spark.implicits._

  /** Reference semantics of [[FormulaExpr]] — pure Scala. */
  private def evalRef(f: FormulaExpr, score: Double, label: Double): Double =
    f match {
      case FScore => score
      case FKey("label") => label
      case FKey(other) => fail(s"generator only emits label, got $other")
      case FConst(v) => v
      case FCond(_, _) => if (label == 3.0) 1.0 else 0.0
      case FSum(ts) => ts.map(evalRef(_, score, label)).sum
      case FMult(fs) => fs.map(evalRef(_, score, label)).product
      case FDiv(n, d, dz) =>
        val dv = evalRef(d, score, label)
        if (dv == 0.0) dz else evalRef(n, score, label) / dv
      case FNeg(x) => -evalRef(x, score, label)
      case FAbs(x) => math.abs(evalRef(x, score, label))
      case FSqrt(x) => math.sqrt(math.max(evalRef(x, score, label), 0.0))
      case FPow(b, e) => math.pow(evalRef(b, score, label), e)
      case FExp(x) => math.exp(evalRef(x, score, label))
      case FLog1p(x) => math.log1p(math.max(evalRef(x, score, label), 0.0))
      case FGaussDecay(x, t, s, m) =>
        val d = evalRef(x, score, label) - t
        math.exp(math.log(m) / (s * s) * d * d)
      case FExpDecay(x, t, s, m) =>
        math.exp(math.log(m) / s * math.abs(evalRef(x, score, label) - t))
      case FLinDecay(x, t, s, m) =>
        math.max(0.0, (m - 1.0) / s * math.abs(evalRef(x, score, label) - t) + 1.0)
    }

  private val leafGen: Gen[FormulaExpr] = Gen.oneOf(
    Gen.const(FScore),
    Gen.const(FKey("label")),
    Gen.choose(-3.0, 3.0).map(FConst.apply),
    Gen.const(FCond(MatchValue("label", 3.0), "label = 3")))

  private def treeGen(depth: Int): Gen[FormulaExpr] =
    if (depth <= 0) leafGen
    else Gen.frequency(
      2 -> leafGen,
      2 -> Gen.listOfN(2, treeGen(depth - 1)).map(FSum.apply),
      2 -> Gen.listOfN(2, treeGen(depth - 1)).map(FMult.apply),
      1 -> (for {
        n <- treeGen(depth - 1); d <- treeGen(depth - 1)
        dz <- Gen.choose(-1.0, 1.0)
      } yield FDiv(n, d, dz)),
      1 -> treeGen(depth - 1).map(FNeg.apply),
      1 -> treeGen(depth - 1).map(FAbs.apply),
      1 -> treeGen(depth - 1).map(FSqrt.apply),
      1 -> treeGen(depth - 1).map(FLog1p.apply),
      1 -> (for {
        x <- treeGen(depth - 1)
        t <- Gen.choose(-2.0, 2.0); s <- Gen.choose(0.5, 3.0)
        m <- Gen.choose(0.1, 0.9)
        d <- Gen.oneOf[(FormulaExpr, Double, Double, Double) => FormulaExpr](
          FGaussDecay(_, _, _, _), FExpDecay(_, _, _, _), FLinDecay(_, _, _, _))
      } yield d(x, t, s, m)))

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n * 6).iterator
      .flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
      .take(n).toSeq

  test("random formula trees: Catalyst compilation matches the reference evaluator") {
    val trees = samples(treeGen(3), 40)
    val inputs = samples(
      for {
        s <- Gen.choose(-1.0, 1.0)
        l <- Gen.oneOf(Gen.choose(-5.0, 5.0), Gen.const(3.0))
      } yield (s, l), 25)
    val in = inputs.toDF("score", "label")
    for (tree <- trees) {
      val got = in.select(col("score"), col("label"),
          tree.toColumn(col("score")).as("v")).collect()
      for (r <- got) {
        val expect = evalRef(tree, r.getDouble(0), r.getDouble(1))
        val v = r.getDouble(2)
        val ok =
          (expect.isNaN && v.isNaN) || (expect.isInfinite && v == expect) ||
            math.abs(v - expect) <= 1e-9 * math.max(1.0, math.abs(expect))
        assert(ok, s"tree $tree at (score=${r.getDouble(0)}, " +
          s"label=${r.getDouble(1)}): catalyst $v vs reference $expect")
      }
    }
  }
}
