package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis}
import graft.Tables.t

/** Count-min sketch (bounded-state heavy hitters) and the LSH
  * band/row parameter solver. */
class CmsSpec extends SparkSpec {

  private def docs = t(spark, sf, "documents")

  test("cms estimates dominate true counts and pin within 5% at honest width") {
    val exact = TextAnalysis.heavyHitters(docs, 20).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val cms = TextAnalysis.tokenCms(docs, width = 1024, depth = 3).cache()
    assert(cms.count() <= 3 * 1024, "sketch state is bounded by depth*width")
    import spark.implicits._
    val cand = exact.keys.toSeq.toDF("tok")
    val est = TextAnalysis.cmsEstimate(cms, cand, 1024, 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((tok, n) <- exact) {
      assert(est(tok) >= n, s"$tok: CMS must never undercount")
      assert(est(tok) <= (n * 1.05).toLong + 1,
        s"$tok: est ${est(tok)} vs true $n — width 1024 must pin within 5%")
    }
    cms.unpersist()
  }

  test("cms at starved width still never undercounts (collisions only inflate)") {
    val exact = TextAnalysis.heavyHitters(docs, 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val cms = TextAnalysis.tokenCms(docs, width = 4, depth = 2)
    import spark.implicits._
    val est = TextAnalysis.cmsEstimate(cms, exact.keys.toSeq.toDF("tok"), 4, 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.forall { case (tok, n) => est(tok) >= n })
    assert(exact.exists { case (tok, n) => est(tok) > n },
      "width 4 over a ~30-word vocabulary must collide somewhere")
  }

  test("cms probe plan: sketch side broadcasts; no corpus-sized shuffle on the probe") {
    val cms = TextAnalysis.tokenCms(docs, width = 1024, depth = 3)
    import spark.implicits._
    val probe = TextAnalysis.cmsEstimate(cms, Seq("scan", "merge").toDF("tok"), 1024, 3)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the bounded sketch must broadcast under the probe:\n$plan")
  }

  test("lsh solver: b*r = n, higher thresholds get more rows per band, probs match") {
    for (n <- Seq(8, 64, 128); tRaw <- Seq(0.5, 0.8, 0.9)) {
      val (b, r) = Dedup.lshParams(n, tRaw)
      assert(b * r === n)
    }
    val (bLo, rLo) = Dedup.lshParams(128, 0.5)
    val (bHi, rHi) = Dedup.lshParams(128, 0.9)
    assert(rHi > rLo && bHi < bLo,
      s"stricter threshold must shift hashes from bands to rows: ($bLo,$rLo) vs ($bHi,$rHi)")
    // implied threshold of the chosen pair brackets the target better
    // than its divisor neighbors
    val (b, r) = Dedup.lshParams(128, 0.8)
    val implied = math.pow(1.0 / b, 1.0 / r)
    assert(math.abs(implied - 0.8) < 0.15, s"implied $implied for ($b,$r)")
    // collision S-curve: ~0 well below threshold, ~1 well above
    assert(Dedup.lshCollisionProb(b, r, 0.2) < 0.05)
    assert(Dedup.lshCollisionProb(b, r, 0.97) > 0.95)
    // the fixture pinning (k=8, bands of 2) corresponds to ~0.5 —
    // the solver recovers it
    assert(Dedup.lshParams(8, 0.5) === ((4, 2)))
  }
}
