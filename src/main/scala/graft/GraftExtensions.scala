package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.vector._

/** SQL surface for the graft kernels, registered through
  * `SparkSessionExtensions` (enable with
  * `spark.sql.extensions=graft.GraftExtensions`): a pure-SQL user gets
  * the same native expressions the DataFrame API uses — the codegen'd
  * scoring path, not a UDF shim. The reference exposes its capability
  * only through Python client calls; a Spark-native engine's idiomatic
  * equivalent is `spark.sql("SELECT cosine_sim(embedding, q) ...")`
  * working anywhere SQL runs (thriftserver, notebooks, `spark.sql`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def litInt(e: Expression, arg: String, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  /** Wrap a builder with an arity gate so a wrong argument count
    * surfaces as "`name` expects N arguments, got M" instead of a raw
    * IndexOutOfBoundsException from inside the builder. */
  private def fd(name: String, arity: Int, clazz: Class[_],
      builder: Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name),
      (args: Seq[Expression]) => {
        if (args.length != arity) throw new IllegalArgumentException(
          s"$name expects $arity arguments, got ${args.length}")
        builder(args)
      })

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fd("cosine_sim", 2, classOf[CosineSim],
      args => CosineSim(args(0), args(1))))
    ext.injectFunction(fd("dot_product", 2, classOf[DotProduct],
      args => DotProduct(args(0), args(1))))
    ext.injectFunction(fd("max_sim", 2, classOf[MaxSim],
      args => MaxSim(args(0), args(1))))
    ext.injectFunction(fd("token_hashes", 1, classOf[PolyTokenHashes],
      args => PolyTokenHashes(args(0), 31L, 1000003L)))
    ext.injectFunction(fd("feature_hash_embed", 2, classOf[FeatureHashEmbed],
      args => FeatureHashEmbed(args(0),
        litInt(args(1), "dim", "feature_hash_embed"))))
    ext.injectFunction(fd("banded_sign_buckets", 3, classOf[BandedSignBuckets],
      args => BandedSignBuckets(args(0),
        litInt(args(1), "bands", "banded_sign_buckets"),
        litInt(args(2), "planes_per_band", "banded_sign_buckets"), 64)))
    ext.injectFunction(fd("sign_bits", 3, classOf[SignBitsPack],
      args => SignBitsPack(args(0),
        litInt(args(1), "start", "sign_bits"),
        litInt(args(2), "n_bits", "sign_bits"))))
    ext.injectFunction(fd("l2_normalize", 1, classOf[L2Normalize],
      args => L2Normalize(args(0))))
    ext.injectOptimizerRule(_ => NormalizedCosineToDot)
  }
}

/** Optimizer rule: `cosine_sim(l2_normalize(x), l2_normalize(y))` →
  * `dot_product(l2_normalize(x), l2_normalize(y))`.
  *
  * Exact in REAL arithmetic (unit denominators), but l2_normalize
  * emits finite-precision doubles whose norm is ~1, not exactly 1, so
  * skipping the denominator fold can change low-order result bits —
  * enough to flip a ROUND(x, 6) boundary or reorder a tied top-k in
  * arbitrary user SQL. Since the rule is injected session-wide, it is
  * gated on `spark.graft.rewrite.normalizedCosineToDot` (default true)
  * so a user who needs bit-stable cosine output can opt out per
  * session or per statement (`SET spark.graft.rewrite.…=false`). On
  * the Qdrant storage layout (vectors normalized once at ingest — E1)
  * the rewrite removes 2/3 of the scoring FLOPs for every query that
  * writes the idiomatic `cosine_sim` call. Null behavior is preserved:
  * l2_normalize maps the zero vector to null, and both CosineSim and
  * DotProduct are null-propagating, so no zero-denominator case
  * survives to differ. Result equality on the fixture, plan shape, and
  * both sides of the config gate are pinned in SqlSurfaceSpec. */
object NormalizedCosineToDot
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  val confKey = "spark.graft.rewrite.normalizedCosineToDot"
  override def apply(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    if (!conf.getConfString(confKey, "true").toBoolean) plan
    else plan.transformAllExpressions {
      case CosineSim(a @ L2Normalize(_), b @ L2Normalize(_)) =>
        DotProduct(a, b)
    }
}
