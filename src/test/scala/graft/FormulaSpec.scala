package graft

import org.apache.spark.sql.functions._
import graft.search._

/** Formula rescoring (Qdrant 1.14 score boosting): decay closed forms,
  * guard semantics, and the two-stage plan shape. */
class FormulaSpec extends SparkSpec {
  import spark.implicits._

  /** Evaluate a formula over a tiny one-column frame; `score` = 0.5. */
  private def eval(f: FormulaExpr, label: Double): Double =
    Seq(label).toDF("label")
      .select(f.toColumn(lit(0.5d)).as("v"))
      .head.getDouble(0)

  test("decays are 1 at target and midpoint at scale distance") {
    val cases: Seq[FDecay] = Seq(
      FGaussDecay(FKey("label"), target = 5, scale = 2, midpoint = 0.3),
      FExpDecay(FKey("label"), target = 5, scale = 2, midpoint = 0.3),
      FLinDecay(FKey("label"), target = 5, scale = 2, midpoint = 0.3))
    for (d <- cases) {
      assert(math.abs(eval(d, 5.0) - 1.0) < 1e-12, s"$d at target")
      assert(math.abs(eval(d, 7.0) - 0.3) < 1e-12, s"$d at +scale")
      assert(math.abs(eval(d, 3.0) - 0.3) < 1e-12, s"$d at -scale")
    }
  }

  test("lin decay clamps to 0 beyond its zero crossing; gauss/exp stay positive") {
    val lin = FLinDecay(FKey("label"), target = 0, scale = 1, midpoint = 0.5)
    assert(eval(lin, 2.0) === 0.0) // zero crossing at |x|=s/(1-m)=2
    assert(eval(lin, 50.0) === 0.0)
    // past lin's zero crossing the smooth kernels are still positive
    // (50σ would underflow double — that IS zero, not a kernel bug)
    assert(eval(FGaussDecay(FKey("label"), 0, 1), 3.0) > 0.0)
    assert(eval(FExpDecay(FKey("label"), 0, 1), 3.0) > 0.0)
  }

  test("condition is 1/0; division by zero takes the default; guards are total") {
    val cond = FCond(MatchValue("label", 3.0), "label = 3")
    assert(eval(cond, 3.0) === 1.0)
    assert(eval(cond, 4.0) === 0.0)
    val div = FDiv(FConst(1.0), FKey("label"), byZeroDefault = 9.0)
    assert(eval(div, 0.0) === 9.0)
    assert(eval(div, 4.0) === 0.25)
    assert(eval(FSqrt(FConst(-4.0)), 0.0) === 0.0) // clamped, not NaN
    assert(math.abs(eval(FLog1p(FConst(math.E - 1.0)), 0.0) - 1.0) < 1e-12)
  }

  test("boost formula reranks: a label-3 candidate overtakes a near-tie") {
    // score 0.5 + 0.25 boost - 0.02 penalty beats plain 0.6
    val b = Seq(3).toDF("label")
      .select(Formula.boostFormula.toColumn(lit(0.5d)).as("v")).head.getDouble(0)
    val p = Seq(7).toDF("label")
      .select(Formula.boostFormula.toColumn(lit(0.6d)).as("v")).head.getDouble(0)
    assert(b > p, s"boosted $b must outrank plain $p")
  }

  test("geo distance node: zero at the query point, decay kernel reads it as meters") {
    import spark.implicits._
    val d = Seq((40.7, -74.0), (40.7, -73.0)).toDF("lat", "lon")
    val g = FGeoDist("lat", "lon", 40.7, -74.0)
    val got = d.select(g.toColumn(lit(0.0)).as("m")).collect().map(_.getDouble(0))
    assert(got(0) === 0.0)
    assert(math.abs(got(1) - 84000) < 2000, s"~84 km per lon degree at 40.7N, got ${got(1)}")
    val dec = d.select(FGaussDecay(g, 0.0, 2000000.0).toColumn(lit(0.0)).as("v"))
      .collect().map(_.getDouble(0))
    assert(dec(0) === 1.0 && dec(1) < 1.0 && dec(1) > 0.99,
      "84 km against a 2000 km scale barely decays")
  }

  test("formula queries return k rows with prefetch and final scores") {
    for (name <- Seq("q_formula_boost", "q_formula_decay", "q_formula_geo")) {
      val rows = Formula.queries(name)(spark, sf).collect()
      assert(rows.length === 10, name)
      assert(rows.map(_.getDouble(2)).toSeq ===
        rows.map(_.getDouble(2)).sortBy(-_).toSeq, s"$name sorted by score")
    }
  }

  test("plan: both cuts are TakeOrderedAndProject; formula stays codegen arithmetic") {
    val q = Formula.queries("q_formula_decay")(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.split("TakeOrderedAndProject").length >= 3,
      s"prefetch cut AND formula cut must both be TakeOrderedAndProject:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"formula rescore must not shuffle — it touches N candidates only:\n$plan")
  }
}
