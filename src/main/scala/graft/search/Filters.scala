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

/** Array payload key missing, null, or `[]` (Qdrant IsEmpty — matches
  * points that "don't have a value" for the key). */
case class IsEmptyCond(key: String) extends Cond {
  def toColumn: Column = col(key).isNull || size(col(key)) === 0
}

/** Point-id membership (Qdrant HasId — the one condition that targets
  * ids, not payload; `idKey` names the collection's id column). */
case class HasIdCond(idKey: String, ids: Seq[Long]) extends Cond {
  def toColumn: Column = col(idKey).isInCollection(ids)
}

/** Point has a value for a NAMED vector (Qdrant HasVectorCondition,
  * `has_vector`): on this engine's one-column-per-name layout a
  * missing named vector is a null cell, so the condition compiles to
  * a null check — which reaches PushedFilters as IsNotNull, making
  * "only points that already carry the late-added embedding" a
  * scan-pruned predicate (the common query while a model-upgrade
  * backfill is in flight). */
case class HasVectorCond(vectorCol: String) extends Cond {
  def toColumn: Column = col(vectorCol).isNotNull
}

/** Bounds on the NUMBER of values under an array payload key (Qdrant
  * ValuesCount: gt/gte/lt/lte, each optional). A missing key has no
  * count and fails every bound — `size(NULL)` is NULL under ANSI mode
  * and the comparison stays NULL → filtered, exactly Qdrant. */
case class ValuesCountCond(
    key: String,
    gte: Option[Int] = None,
    gt: Option[Int] = None,
    lte: Option[Int] = None,
    lt: Option[Int] = None) extends Cond {
  def toColumn: Column = {
    val n = size(col(key))
    Seq(
      gte.map(v => n >= lit(v)),
      gt.map(v => n > lit(v)),
      lte.map(v => n <= lit(v)),
      lt.map(v => n < lit(v))
    ).flatten.reduceOption(_ && _).getOrElse(lit(true))
  }
}

/** Token-exact full-text match (Qdrant MatchText under the word
  * tokenizer): the payload string contains `token` as a whole
  * whitespace token — not a substring LIKE, which would match inside
  * longer words. */
case class MatchTextCond(key: String, token: String) extends Cond {
  def toColumn: Column = array_contains(split(col(key), " "), token)
}

/** Consecutive-token phrase match (Qdrant MatchPhrase): the payload
  * string contains the words of `phrase` ADJACENT and in order.
  * Compiled as padded-substring containment on the space-delimited
  * text — ' w1 w2 ' can only occur where the tokens are consecutive. */
case class MatchPhraseCond(key: String, phrase: String) extends Cond {
  def toColumn: Column =
    concat(lit(" "), col(key), lit(" ")).contains(lit(s" $phrase "))
}

/** Condition on ONE element of a nested array-of-objects payload —
  * the inner clause language of [[NestedCond]]. */
sealed trait ElemCond {
  def on(el: Column): Column
}

/** `element.field == value` inside a nested payload. */
case class ElemMatch(field: String, value: Any) extends ElemCond {
  def on(el: Column): Column = el.getField(field) === lit(value)
}

/** Numeric range on `element.field` inside a nested payload; bounds
  * keep their natural type (the [[RangeCond]] rule). */
case class ElemRange(
    field: String,
    gte: Option[Any] = None,
    gt: Option[Any] = None,
    lte: Option[Any] = None,
    lt: Option[Any] = None) extends ElemCond {
  def on(el: Column): Column =
    Seq(
      gte.map(v => el.getField(field) >= lit(v)),
      gt.map(v => el.getField(field) > lit(v)),
      lte.map(v => el.getField(field) <= lit(v)),
      lt.map(v => el.getField(field) < lit(v))
    ).flatten.reduceOption(_ && _).getOrElse(lit(true))
}

/** Nested object filter (Qdrant NestedCondition): the array payload
  * under `key` holds objects, and AT LEAST ONE element satisfies ALL
  * the inner conditions — the "same element" semantics that separate
  * `nested` from a conjunction of independent per-field conditions
  * (which could match on DIFFERENT elements). Compiles to a single
  * `exists` higher-order function: per-row, no explode, no join, stays
  * inside whole-stage codegen. */
case class NestedCond(key: String, must: Seq[ElemCond]) extends Cond {
  require(must.nonEmpty, "nested condition needs at least one inner clause")
  def toColumn: Column =
    exists(col(key), el => must.map(_.on(el)).reduce(_ && _))
}

/** Datetime range (Qdrant DatetimeRange): bounds are date / datetime
  * strings ('1996-01-01' or '1996-01-01 12:30:00') compiled to
  * TIMESTAMP literals via a foldable cast — Catalyst folds the bound
  * to a constant before pushdown, so the comparison reaches
  * PushedFilters against the column's natural timestamp type
  * (plan-asserted in ScaleDesignSpec, same rule as [[RangeCond]]). */
case class DatetimeRange(
    key: String,
    gte: Option[String] = None,
    gt: Option[String] = None,
    lte: Option[String] = None,
    lt: Option[String] = None) extends Cond {
  private def ts(v: String): Column = lit(v).cast("timestamp")
  def toColumn: Column =
    Seq(
      gte.map(v => col(key) >= ts(v)),
      gt.map(v => col(key) > ts(v)),
      lte.map(v => col(key) <= ts(v)),
      lt.map(v => col(key) < ts(v))
    ).flatten.reduceOption(_ && _).getOrElse(lit(true))
}

/** Geo bounding box (Qdrant GeoBoundingBox): `topLeft` carries the
  * box's max latitude and min (west) longitude, `bottomRight` the min
  * latitude and max (east) longitude, degrees. A box whose west
  * longitude exceeds its east longitude crosses the antimeridian and
  * compiles to the OR of the two half-ranges, exactly Qdrant's
  * semantics. Every comparison is column-vs-double-literal, so the
  * whole box reaches PushedFilters on a double lat/lon layout. */
case class GeoBoundingBox(
    latKey: String,
    lonKey: String,
    topLeft: (Double, Double),
    bottomRight: (Double, Double)) extends Cond {
  def toColumn: Column = {
    val latC = col(latKey) <= lit(topLeft._1) && col(latKey) >= lit(bottomRight._1)
    val lonC =
      if (topLeft._2 <= bottomRight._2)
        col(lonKey) >= lit(topLeft._2) && col(lonKey) <= lit(bottomRight._2)
      else // antimeridian-crossing box
        col(lonKey) >= lit(topLeft._2) || col(lonKey) <= lit(bottomRight._2)
    latC && lonC
  }
}

/** Geo radius (Qdrant GeoRadius): points within `radiusMeters` of
  * (`lat`, `lon`) on the R=6371 km sphere (haversine). Compiles to the
  * standard spatial-index plan: a PUSHDOWN-able bounding-box prefilter
  * derived driver-side from center+radius (the cheap rectangle the
  * scan can prune on) AND the exact haversine residual — at 100 TB the
  * scan skips row groups outside the rectangle and the trig runs only
  * on survivors. Near the poles or for radii spanning >180° of
  * longitude the lon prefilter drops out (correctly, conservatively);
  * the exact test always stands. */
case class GeoRadius(
    latKey: String,
    lonKey: String,
    lat: Double,
    lon: Double,
    radiusMeters: Double) extends Cond {
  import GeoRadius._

  /** Driver-computed rectangle around the cap: (top, bottom) latitude
    * band, plus the (west, east) longitude span when the band stays
    * clear of the poles and the radius spans under 180° of longitude —
    * the widest parallel inside the band decides the span, so the
    * rectangle always CONTAINS the circle. */
  private lazy val rect: (Double, Double, Option[(Double, Double)]) = {
    val latDelta = math.toDegrees(radiusMeters / EarthR)
    val top = math.min(90.0, lat + latDelta)
    val bottom = math.max(-90.0, lat - latDelta)
    val maxAbsLat = math.max(math.abs(top), math.abs(bottom))
    val lonSpan =
      if (maxAbsLat >= 89.9) None
      else {
        val lonDelta = math.toDegrees(
          radiusMeters / (EarthR * math.cos(math.toRadians(maxAbsLat))))
        if (lonDelta >= 180.0) None
        else Some((wrapLon(lon - lonDelta), wrapLon(lon + lonDelta)))
      }
    (top, bottom, lonSpan)
  }

  private def prefilter: Column = {
    val (top, bottom, lonSpan) = rect
    val latC = col(latKey) <= lit(top) && col(latKey) >= lit(bottom)
    lonSpan match {
      case Some((west, east)) =>
        latC && GeoBoundingBox(latKey, lonKey, (top, west), (bottom, east)).toColumn
      case None => latC
    }
  }

  def toColumn: Column =
    prefilter && haversineMeters(col(latKey), col(lonKey), lat, lon) <= lit(radiusMeters)

  /** DuckDB twin of [[toColumn]] — replicates the prefilter with the
    * SAME driver-computed bounds plus the exact haversine, so oracle
    * and engine apply identical predicates even where the rectangle is
    * conservative. */
  def duckSql: String = {
    val (top, bottom, lonSpan) = rect
    val lonC = lonSpan match {
      case Some((west, east)) if west <= east =>
        s" AND $lonKey >= $west AND $lonKey <= $east"
      case Some((west, east)) =>
        s" AND ($lonKey >= $west OR $lonKey <= $east)"
      case None => ""
    }
    s"($latKey <= $top AND $latKey >= $bottom$lonC AND " +
      s"${duckHaversineMeters(latKey, lonKey, lat, lon)} <= $radiusMeters)"
  }
}

object GeoRadius {
  val EarthR = 6371000.0

  private def wrapLon(l: Double): Double =
    if (l < -180.0) l + 360.0 else if (l > 180.0) l - 360.0 else l

  /** Haversine distance in meters — multiplication form (sin·sin, not
    * pow) so the DuckDB twin [[duckHaversineMeters]] is the same IEEE
    * op sequence. The asin argument clamps at 1.0 (the standard
    * haversine guard): mathematically a ≤ 1, but float rounding can
    * push it an ulp past 1 near antipodal points — where DuckDB's asin
    * HARD-ERRORS (domain check) while Spark's returns NaN, so an
    * unclamped near-antipode would crash the oracle and silently
    * NaN-poison the engine. least(a, 1.0) is a no-op for every a ≤ 1,
    * identical on both engines. */
  def haversineMeters(latC: Column, lonC: Column, lat: Double, lon: Double): Column = {
    val dLat = (radians(latC) - lit(math.toRadians(lat))) / 2
    val dLon = (radians(lonC) - lit(math.toRadians(lon))) / 2
    val a = sin(dLat) * sin(dLat) +
      lit(math.cos(math.toRadians(lat))) * cos(radians(latC)) * sin(dLon) * sin(dLon)
    lit(2 * EarthR) * asin(sqrt(least(a, lit(1.0))))
  }

  /** DuckDB twin of [[haversineMeters]]. */
  def duckHaversineMeters(latExpr: String, lonExpr: String, lat: Double, lon: Double): String = {
    val latR = math.toRadians(lat)
    val cosLat = math.cos(latR)
    s"(2 * $EarthR) * asin(sqrt(least(" +
      s"sin((radians($latExpr) - $latR) / 2) * sin((radians($latExpr) - $latR) / 2) + " +
      s"$cosLat * cos(radians($latExpr)) * " +
      s"sin((radians($lonExpr) - ${math.toRadians(lon)}) / 2) * " +
      s"sin((radians($lonExpr) - ${math.toRadians(lon)}) / 2), 1.0)))"
  }
}

/** Geo polygon (Qdrant GeoPolygon): the point lies inside the
  * `exterior` ring and outside every `interiors` ring (holes).
  * Vertices are (lon, lat) degree pairs, Qdrant's GeoPoint order; an
  * explicitly closed ring (first == last vertex, which Qdrant
  * requires) is accepted and unclosed implicitly.
  *
  * Point-in-ring is the classic even-odd ray cast (PNPOLY, Franklin):
  * count edges that straddle the point's latitude and cross to its
  * east; odd = inside. The ring is a driver-side constant, so the test
  * unrolls to a literal sum of per-edge CASE terms — pure column-vs-
  * constant arithmetic inside whole-stage codegen, no UDF, no join.
  * Horizontal edges never straddle and are dropped driver-side (their
  * slope term would divide by zero under ANSI mode). [[duckSql]]
  * replicates the exact IEEE op sequence (sub/mul/div/add on the same
  * folded constants) so both engines agree even on borderline points.
  *
  * Like [[GeoRadius]], the unrolled test cannot reach PushedFilters,
  * so the compiled predicate leads with the ring's driver-computed
  * bounding box — the rectangle the scan prunes row groups on — and
  * the ray cast runs only on survivors. */
case class GeoPolygon(
    latKey: String,
    lonKey: String,
    exterior: Seq[(Double, Double)],
    interiors: Seq[Seq[(Double, Double)]] = Nil) extends Cond {
  require(exterior.size >= 3, "polygon exterior needs at least 3 vertices")

  private def open(ring: Seq[(Double, Double)]): Seq[(Double, Double)] =
    if (ring.size > 1 && ring.head == ring.last) ring.dropRight(1) else ring

  private def edges(ring: Seq[(Double, Double)]): Seq[((Double, Double), (Double, Double))] = {
    val r = open(ring)
    r.indices.map(i => (r(i), r((i + 1) % r.size))).filter { case ((_, yi), (_, yj)) => yi != yj }
  }

  private def inRing(ring: Seq[(Double, Double)]): Column = {
    val crossings = edges(ring).map { case ((xi, yi), (xj, yj)) =>
      val straddle = (lit(yi) > col(latKey)) =!= (lit(yj) > col(latKey))
      val east = col(lonKey) < lit(xj - xi) * (col(latKey) - lit(yi)) / lit(yj - yi) + lit(xi)
      when(straddle && east, 1).otherwise(0)
    }.reduce(_ + _)
    crossings % 2 === 1
  }

  private lazy val bbox: (Double, Double, Double, Double) = {
    val r = open(exterior)
    (r.map(_._2).min, r.map(_._2).max, r.map(_._1).min, r.map(_._1).max)
  }

  def toColumn: Column = {
    val (latMin, latMax, lonMin, lonMax) = bbox
    val pre = col(latKey) >= lit(latMin) && col(latKey) <= lit(latMax) &&
      col(lonKey) >= lit(lonMin) && col(lonKey) <= lit(lonMax)
    (pre +: inRing(exterior) +: interiors.map(r => !inRing(r))).reduce(_ && _)
  }

  private def duckRing(ring: Seq[(Double, Double)]): String = {
    val terms = edges(ring).map { case ((xi, yi), (xj, yj)) =>
      s"(CASE WHEN ($yi > $latKey) != ($yj > $latKey) AND " +
        s"$lonKey < ${xj - xi} * ($latKey - $yi) / ${yj - yi} + $xi THEN 1 ELSE 0 END)"
    }
    s"((${terms.mkString(" + ")}) % 2 = 1)"
  }

  /** DuckDB twin of [[toColumn]] — same bounding-box prefilter, same
    * unrolled ray cast on the same folded constants. */
  def duckSql: String = {
    val (latMin, latMax, lonMin, lonMax) = bbox
    val pre = s"$latKey >= $latMin AND $latKey <= $latMax AND " +
      s"$lonKey >= $lonMin AND $lonKey <= $lonMax"
    (Seq(pre, duckRing(exterior)) ++ interiors.map(r => s"NOT ${duckRing(r)}"))
      .mkString("(", " AND ", ")")
  }
}

/** `min_should` clause (Qdrant MinShould): at least `minCount` of the
  * conditions hold. Compiles to a literal sum of per-condition
  * indicator CASEs — a NULL verdict (missing payload key) counts as
  * not-matched, same as every other clause. `should` is the
  * minCount=1 special case; Qdrant exposes both, so both exist here. */
case class MinShould(conditions: Seq[Cond], minCount: Int) {
  require(minCount >= 1 && minCount <= conditions.size,
    s"min_count $minCount out of range for ${conditions.size} conditions")
  def toColumn: Column =
    conditions
      .map(c => when(coalesce(c.toColumn, lit(false)), 1).otherwise(0))
      .reduce(_ + _) >= lit(minCount)
}

/** The filter root: three clause lists plus `min_should`, all
  * optional. */
case class Filter(
    must: Seq[Cond] = Nil,
    should: Seq[Cond] = Nil,
    mustNot: Seq[Cond] = Nil,
    minShould: Option[MinShould] = None) {
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
    val ms = minShould.map(_.toColumn).toSeq
    (m ++ s ++ n ++ ms).reduceOption(_ && _).getOrElse(lit(true))
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

  /** The e4_geo_filter fixture: a rectangle over mid-latitudes plus a
    * 5000 km radius around (10°N, 20°E), on deterministic integer-math
    * coordinates derived from c_custkey — both engines build identical
    * doubles. */
  val GeoFixtureRadius: GeoRadius = GeoRadius("lat", "lon", 10.0, 20.0, 5000000.0)
  val GeoFixtureBox: GeoBoundingBox =
    GeoBoundingBox("lat", "lon", topLeft = (70.0, -150.0), bottomRight = (-70.0, 150.0))

  /** The e4_geo_polygon fixture: a diamond spanning the mid-latitudes
    * with a rectangular hole over the equator — at sf0.01 the diamond
    * holds 458 customer points and the hole carves 34 back out, so
    * both the ring test and the interior-ring subtraction are
    * non-vacuous. Vertices sit at .005 offsets, off the fixture's
    * 0.01° coordinate grid. */
  val GeoFixturePolygon: GeoPolygon = GeoPolygon("lat", "lon",
    exterior = Seq((-120.005, 0.005), (0.005, 70.005), (120.005, 0.005), (0.005, -70.005)),
    interiors = Seq(Seq(
      (-30.005, -20.005), (30.005, -20.005), (30.005, 20.005), (-30.005, 20.005))))

  /** Deterministic customer lat/lon used by the geo fixtures: integer
    * math on c_custkey, so both engines build bit-identical doubles. */
  private def customerGeo(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_custkey"),
      ((col("c_custkey") * 3571 % 17000) / 100.0 - 85.0).as("lat"),
      ((col("c_custkey") * 6763 % 35000) / 100.0 - 175.0).as("lon"))

  private val duckCustomerGeo: String =
    """SELECT c_custkey,
      |    (c_custkey * 3571 % 17000) / 100.0 - 85.0 AS lat,
      |    (c_custkey * 6763 % 35000) / 100.0 - 175.0 AS lon
      |  FROM customer""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Qdrant DatetimeRange in the DSL: timestamp bounds push to the
    // scan with the column's natural type, composed with a numeric
    // range and a must_not — all three clause kinds over orders.
    "e4_datetime_filter" -> ((s, dir) => {
      val f = Filter(
        must = Seq(
          DatetimeRange("o_orderdate", gte = Some("1996-03-01"), lt = Some("1996-06-01")),
          RangeCond("o_totalprice", gte = Some(50000.0))),
        mustNot = Seq(MatchValue("o_orderstatus", "F")))
      t(s, dir, "orders").filter(f.toColumn)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // Qdrant GeoBoundingBox + GeoRadius: box prefilter pushes to the
    // scan, exact haversine runs as the residual. Coordinates derive
    // from c_custkey by integer math so both engines see bit-identical
    // doubles.
    "e4_geo_filter" -> ((s, dir) => {
      val f = Filter(must = Seq(GeoFixtureBox, GeoFixtureRadius))
      customerGeo(s, dir).filter(f.toColumn)
        .select(col("c_custkey"),
          round(col("lat"), 6).as("lat"), round(col("lon"), 6).as("lon"))
        .orderBy(col("c_custkey"))
    }),

    // Qdrant GeoPolygon: even-odd ray cast against a diamond exterior
    // with a rectangular hole, unrolled to literal arithmetic behind a
    // pushed bounding-box prefilter. The hole excludes 34 of the 458
    // diamond points at sf0.01 — the interiors list is doing real work.
    "e4_geo_polygon" -> ((s, dir) => {
      val f = Filter(must = Seq(GeoFixturePolygon))
      customerGeo(s, dir).filter(f.toColumn)
        .select(col("c_custkey"),
          round(col("lat"), 6).as("lat"), round(col("lon"), 6).as("lon"))
        .orderBy(col("c_custkey"))
    }),

    // Qdrant MinShould: at least 3 of 4 heterogeneous conditions
    // (match, range, match, datetime) — the threshold semantics OR
    // can't express (min_count=1 IS should; 3-of-4 needs the
    // indicator sum).
    "e4_min_should" -> ((s, dir) => {
      val f = Filter(minShould = Some(MinShould(Seq(
        MatchValue("o_orderpriority", "1-URGENT"),
        RangeCond("o_totalprice", gte = Some(250000.0)),
        MatchValue("o_orderstatus", "F"),
        DatetimeRange("o_orderdate", gte = Some("1997-06-01"))), minCount = 3)))
      t(s, dir, "orders").filter(f.toColumn)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // Qdrant NestedCondition + ValuesCount + IsEmpty + HasId — the
    // array-of-objects payload family. Points are orders carrying
    // their lineitems as a nested `items` array (the shape a Qdrant
    // user stores variants/reviews/diffs in); the filter wants an
    // order with ≥6 items, at least one item that is BOTH returned
    // AND high-quantity (same element — the nested semantics a plain
    // field-condition pair can't express), where high-quantity items
    // are either absent or come in pairs, minus two pinned ids.
    "e4_nested_filter" -> ((s, dir) => {
      // Spread before the collect_list (guide §2.5): the struct-build
      // + partial collect_list otherwise runs inside the scan stage at
      // the input's SPLIT count — 782 ms on 3 tasks over 600k rows at
      // sf0.1 (r19 QueryProf), the single dominant stage of this
      // query. The explicit exchange moves the same bytes the partial
      // buffers moved and the aggregate runs at the session width.
      val items = graft.ops.Spread.byKey(
          t(s, dir, "lineitem").select(col("l_orderkey"),
            col("l_linenumber"), col("l_returnflag"), col("l_quantity")),
          col("l_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(collect_list(struct(
          col("l_linenumber"), col("l_returnflag"), col("l_quantity"))).as("items"))
      val pts = t(s, dir, "orders")
        .join(items, col("o_orderkey") === col("l_orderkey"))
        .withColumn("items_hi",
          filter(col("items"), x => x.getField("l_quantity") >= lit(49.0)))
      val f = Filter(
        must = Seq(
          NestedCond("items", Seq(
            ElemMatch("l_returnflag", "R"),
            ElemRange("l_quantity", gte = Some(45.0)))),
          ValuesCountCond("items", gte = Some(6))),
        should = Seq(
          IsEmptyCond("items_hi"),
          ValuesCountCond("items_hi", gte = Some(2))),
        mustNot = Seq(HasIdCond("o_orderkey", Seq(41L, 157L))))
      pts.filter(f.toColumn)
        .select(col("o_orderkey"), size(col("items")).cast("long").as("n_items"))
        .orderBy(col("o_orderkey"))
    }),

    // Qdrant MatchText (word tokenizer) + MatchPhrase inside the DSL:
    // token-exact containment AND a consecutive-token phrase — the
    // phrase cuts 393 token matches to 28, so adjacency is doing real
    // work (a bag-of-words AND would not).
    "e4_text_dsl" -> ((s, dir) => {
      val f = Filter(
        must = Seq(
          MatchTextCond("text", "merge"),
          MatchPhraseCond("text", "table value")),
        mustNot = Seq(MatchValue("lang", "de")))
      t(s, dir, "documents").filter(f.toColumn)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    }),

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
    "e4_nested_filter" ->
      """WITH li AS (SELECT l_orderkey, count(*)::BIGINT AS n_items,
        |    bool_or(l_returnflag = 'R' AND l_quantity >= 45.0) AS hit,
        |    sum(CASE WHEN l_quantity >= 49.0 THEN 1 ELSE 0 END) AS n_hi
        |  FROM lineitem GROUP BY 1)
        |SELECT o_orderkey, n_items
        |FROM orders JOIN li ON o_orderkey = l_orderkey
        |WHERE hit AND n_items >= 6 AND (n_hi = 0 OR n_hi >= 2)
        |  AND NOT coalesce(o_orderkey IN (41, 157), false)
        |ORDER BY o_orderkey""".stripMargin,

    "e4_text_dsl" ->
      """SELECT doc_id, lang FROM documents
        |WHERE list_contains(string_split(text, ' '), 'merge')
        |  AND contains(' ' || text || ' ', ' table value ')
        |  AND NOT coalesce(lang = 'de', false)
        |ORDER BY doc_id""".stripMargin,

    "e4_datetime_filter" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-03-01'
        |  AND o_orderdate < TIMESTAMP '1996-06-01'
        |  AND o_totalprice >= 50000.0
        |  AND NOT coalesce(o_orderstatus = 'F', false)
        |ORDER BY o_orderkey""".stripMargin,

    "e4_geo_filter" ->
      s"""WITH c AS ($duckCustomerGeo)
         |SELECT c_custkey, ROUND(lat, 6) AS lat, ROUND(lon, 6) AS lon
         |FROM c
         |WHERE lat <= 70.0 AND lat >= -70.0 AND lon >= -150.0 AND lon <= 150.0
         |  AND ${GeoFixtureRadius.duckSql}
         |ORDER BY c_custkey""".stripMargin,

    "e4_geo_polygon" ->
      s"""WITH c AS ($duckCustomerGeo)
         |SELECT c_custkey, ROUND(lat, 6) AS lat, ROUND(lon, 6) AS lon
         |FROM c
         |WHERE ${GeoFixturePolygon.duckSql}
         |ORDER BY c_custkey""".stripMargin,

    "e4_min_should" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE (CASE WHEN coalesce(o_orderpriority = '1-URGENT', false) THEN 1 ELSE 0 END
        |     + CASE WHEN coalesce(o_totalprice >= 250000.0, false) THEN 1 ELSE 0 END
        |     + CASE WHEN coalesce(o_orderstatus = 'F', false) THEN 1 ELSE 0 END
        |     + CASE WHEN coalesce(o_orderdate >= TIMESTAMP '1997-06-01', false) THEN 1 ELSE 0 END) >= 3
        |ORDER BY o_orderkey""".stripMargin,

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
