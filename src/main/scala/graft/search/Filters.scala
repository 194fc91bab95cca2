package graft.search

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t
import graft.vector.Kernels

/** Qdrant's composable payload-filter model (`models.Filter` with
  * `must` / `should` / `must_not` clause lists over `FieldCondition`s)
  * compiled to one Catalyst [[Column]] predicate. The reference stores
  * filterable payload but passes no filter (SURVEY.md §2 E4); this is
  * the client surface a reference user writes the day they need one.
  *
  * Compilation semantics (Qdrant's documented boolean model):
  *   - every `must` condition holds (AND),
  *   - at least one `should` condition holds (OR; vacuously true when
  *     the list is empty),
  *   - no `mustNot` condition holds.
  *
  * Because the result is an ordinary boolean Column, Catalyst pushes
  * the compiled predicate into the parquet scan like any hand-written
  * filter — the DSL costs nothing at execution time (asserted in
  * FiltersSpec alongside the truth-table cases).
  */
sealed trait Cond {
  def toColumn: Column
}

/** `key == value` (Qdrant MatchValue). */
case class MatchValue(key: String, value: Any) extends Cond {
  def toColumn: Column = col(key) === lit(value)
}

/** `key ∈ values` (Qdrant MatchAny). */
case class MatchAnyOf(key: String, values: Seq[Any]) extends Cond {
  def toColumn: Column = col(key).isInCollection(values)
}

/** `key ∉ values` (Qdrant MatchExcept). Null payload never matches —
  * same as Qdrant, where a missing key fails every field condition. */
case class MatchExcept(key: String, values: Seq[Any]) extends Cond {
  def toColumn: Column = col(key).isNotNull && !col(key).isInCollection(values)
}

/** Numeric range with optional open/closed bounds (Qdrant Range:
  * gt/gte/lt/lte, each independently optional). Bounds keep their
  * natural type (Int/Long/Double): a Double bound against an integral
  * column would make Spark cast the COLUMN up, and a cast-wrapped
  * column never reaches PushedFilters — the range would silently
  * evaluate post-scan at 100 TB (asserted in ScaleDesignSpec). */
case class RangeCond(
    key: String,
    gte: Option[Any] = None,
    gt: Option[Any] = None,
    lte: Option[Any] = None,
    lt: Option[Any] = None) extends Cond {
  def toColumn: Column =
    Seq(
      gte.map(v => col(key) >= lit(v)),
      gt.map(v => col(key) > lit(v)),
      lte.map(v => col(key) <= lit(v)),
      lt.map(v => col(key) < lit(v))
    ).flatten.reduceOption(_ && _).getOrElse(lit(true))
}

/** Key absent / null payload value (Qdrant IsNull). */
case class IsNullCond(key: String) extends Cond {
  def toColumn: Column = col(key).isNull
}

/** The filter root: three clause lists, all optional. */
case class Filter(
    must: Seq[Cond] = Nil,
    should: Seq[Cond] = Nil,
    mustNot: Seq[Cond] = Nil) {
  def toColumn: Column = {
    val m = must.map(_.toColumn)
    val s =
      if (should.isEmpty) Nil
      else Seq(should.map(_.toColumn).reduce(_ || _))
    // NOT under three-valued logic would DROP rows whose key is NULL
    // (NOT(NULL) = NULL); Qdrant keeps them — a missing key fails the
    // forbidden condition, which is exactly what must_not wants. The
    // coalesce pins "condition did not match" for NULLs.
    val n = mustNot.map(c => !coalesce(c.toColumn, lit(false)))
    (m ++ s ++ n).reduceOption(_ && _).getOrElse(lit(true))
  }
}

object Filters {

  /** The e4_filter_dsl fixture filter: a three-clause Qdrant filter —
    * must: id range [50, 400); should: label ∈ {1,3,5} OR label = 7;
    * must_not: id ∈ {120, 230}. */
  val FixtureFilter: Filter = Filter(
    must = Seq(RangeCond("vec_id", gte = Some(50), lt = Some(400))),
    should = Seq(MatchAnyOf("label", Seq(1, 3, 5)), MatchValue("label", 7)),
    mustNot = Seq(MatchAnyOf("vec_id", Seq(120L, 230L))))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E4 via the composed filter DSL: dense top-k under the compiled
    // three-clause predicate (pushed to the scan like any literal
    // filter — the DSL is free at execution time).
    "e4_filter_dsl" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      e.filter(FixtureFilter.toColumn)
        .crossJoin(broadcast(q))
        .select(col("vec_id"),
          round(Kernels.cosine(col("embedding"), col("qv")), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(5)
    })
  )

  def oracles: Map[String, String] = Map(
    "e4_filter_dsl" ->
      s"""SELECT vec_id,
         |  ROUND(list_cosine_similarity(embedding::DOUBLE[],
         |    (SELECT embedding FROM embeddings WHERE vec_id = 0)::DOUBLE[]), 6) AS score
         |FROM embeddings
         |WHERE vec_id >= 50 AND vec_id < 400
         |  AND (label IN (1, 3, 5) OR label = 7)
         |  AND NOT (vec_id IS NOT NULL AND vec_id IN (120, 230))
         |ORDER BY score DESC, vec_id ASC LIMIT 5""".stripMargin
  )
}
