package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.vector.Kernels

/** Property-based kernel invariants (SURVEY.md §5.3), driven by
  * ScalaCheck generators with fixed seeds (deterministic CI) and
  * evaluated through the actual Catalyst expressions in one batched
  * DataFrame per property — not one Spark job per case. */
class KernelPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val vecGen: Gen[Seq[Float]] =
    Gen.choose(2, 16).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-10.0f, 10.0f)).map(_.toSeq))
      // keep vectors comfortably non-zero (zero-vector edge is covered
      // by a dedicated unit test)
      .map(v => if (v.exists(x => math.abs(x) > 1e-3f)) v else v.updated(0, 1.0f))

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n * 4).iterator
      .flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
      .take(n).toSeq

  private val cases: Seq[Seq[Float]] = samples(vecGen, 60)

  test("cosine(a, a) ≈ 1 for non-zero vectors") {
    val bad = cases.toDF("a")
      .select(abs(Kernels.cosine(col("a"), col("a")) - 1.0).as("d"))
      .filter(col("d") > 1e-9).count()
    assert(bad === 0L)
  }

  test("cosine symmetric and bounded in [-1, 1]") {
    val pairs = cases.zip(cases.reverse).filter { case (a, b) => a.length == b.length }
    val df = pairs.toDF("a", "b").select(
      Kernels.cosine(col("a"), col("b")).as("x"),
      Kernels.cosine(col("b"), col("a")).as("y"))
    assert(df.filter(abs(col("x") - col("y")) > 1e-12).count() === 0L)
    assert(df.filter(abs(col("x")) > 1.0 + 1e-9).count() === 0L)
  }

  test("cosine scale-invariant under λ>0") {
    val lambdas = samples(Gen.choose(0.1f, 100.0f), 60)
    val rows = cases.zip(lambdas).map { case (a, l) => (a, a.map(x => x * 0.5f + 1.0f), l) }
    val df = rows.toDF("a", "b", "l").select(
      Kernels.cosine(col("a"), col("b")).as("x"),
      Kernels.cosine(col("a"), transform(col("b"), e => e * col("l"))).as("y"))
    assert(df.filter(abs(col("x") - col("y")) > 1e-6).count() === 0L)
  }

  test("normalize yields unit vectors") {
    val bad = cases.toDF("a")
      .select(abs(Kernels.l2norm(Kernels.normalize(col("a"))) - 1.0).as("d"))
      .filter(col("d") > 1e-9).count()
    assert(bad === 0L)
  }

  test("maxsim monotone in doc tokens and bounded by |Q|") {
    val fix = (v: Seq[Float]) => v.take(4).padTo(4, 1.0f)
    val mvGen = Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, vecGen.map(fix)))
    val qs = samples(mvGen, 40)
    val ds = samples(mvGen, 40).reverse
    val extras = samples(vecGen.map(fix), 40)
    val rows = qs.lazyZip(ds).lazyZip(extras).map { (q, d, e) => (q, d, d :+ e) }
    val df = rows.toDF("q", "d", "d2").select(
      size(col("q")).as("nq"),
      Kernels.maxsim(col("q"), col("d")).as("base"),
      Kernels.maxsim(col("q"), col("d2")).as("more"))
    assert(df.filter(col("more") < col("base") - 1e-12).count() === 0L)
    assert(df.filter(col("base") > col("nq") + 1e-9).count() === 0L)
  }

  test("int8 quantization: codes bounded, dequantized cosine close to exact") {
    import graft.ops.Quantize
    val pairs = cases.zip(cases.reverse).filter { case (a, b) => a.length == b.length }
    val df = pairs.toDF("a", "b")
      .select(col("a"), col("b"), Quantize.int8Scale(col("a")).as("qs"))
      .select(col("a"), col("b"), col("qs"),
        Quantize.int8Codes(col("a"), col("qs")).as("codes"))
    // every code within the symmetric int8 range
    assert(df.select(explode(col("codes")).as("c"))
      .filter(abs(col("c")) > 127).count() === 0L)
    // dequantized-vs-exact cosine error bounded: per-element quant
    // error ≤ scale/2 = max|x|/254, so similarity drifts by O(1/127)
    val err = df.select(
      abs(Kernels.cosine(Quantize.dequant(col("codes"), col("qs")), col("b")) -
        Kernels.cosine(col("a"), col("b"))).as("e"))
    assert(err.filter(col("e") > 0.05).count() === 0L)
  }

  test("sign-bit packing: range-bounded, self-hamming zero, single-flip flips one bit") {
    import graft.ops.Quantize
    // 64-d generator (the BQ layout packs two 32-bit halves); avoid
    // exact zeros so the flip below always crosses the sign boundary
    val vec64 = samples(
      Gen.listOfN(64, Gen.oneOf(Gen.choose(0.01f, 10.0f), Gen.choose(-10.0f, -0.01f)))
        .map(_.toSeq), 60)
    val flipIdx = samples(Gen.choose(0, 63), 60)
    val rows = vec64.zip(flipIdx).map { case (v, i) =>
      (v, v.updated(i, -v(i)), i)
    }
    val df = rows.toDF("a", "b", "i").select(
      Quantize.bqBits(col("a"), 0).as("alo"), Quantize.bqBits(col("a"), 32).as("ahi"),
      Quantize.bqBits(col("b"), 0).as("blo"), Quantize.bqBits(col("b"), 32).as("bhi"))
    // both halves stay inside an unsigned 32-bit word (no sign-bit overflow)
    assert(df.filter(col("alo") < 0 || col("alo") >= (1L << 32) ||
      col("ahi") < 0 || col("ahi") >= (1L << 32)).count() === 0L)
    // hamming(v, v) = 0 and hamming(v, flip-one(v)) = 1, exactly
    val ham = df.select(
      (bit_count(col("alo").bitwiseXOR(col("alo"))) +
        bit_count(col("ahi").bitwiseXOR(col("ahi")))).as("self"),
      (bit_count(col("alo").bitwiseXOR(col("blo"))) +
        bit_count(col("ahi").bitwiseXOR(col("bhi")))).as("one"))
    assert(ham.filter(col("self") =!= 0).count() === 0L)
    assert(ham.filter(col("one") =!= 1).count() === 0L)
  }

  test("string poly hash: native == HOF == reference fold, range-bounded, on random strings") {
    // printable-ASCII strings plus spaces (the fixture's alphabet) —
    // code-point parity on non-BMP chars has its own NativeParitySpec
    // edge case
    val strGen: Gen[String] = Gen.choose(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.frequency(
        5 -> Gen.alphaNumChar, 1 -> Gen.const(' '), 1 -> Gen.choose('!', '~')))
        .map(_.mkString))
    val strs = samples(strGen, 80)
    def refHash(s: String): Long =
      s.foldLeft(0L)((a, c) => (a * 31 + c.toLong) % 1000003L)
    val rows = strs.toDF("s").select(col("s"),
        graft.index.Embedder.tokenHash(col("s")).as("nat"),
        graft.index.Embedder.tokenHashHof(col("s")).as("hof"))
      .collect()
    rows.foreach { r =>
      val expected = refHash(r.getString(0))
      assert(r.getLong(1) === expected, s"native diverges on '${r.getString(0)}'")
      assert(r.getLong(2) === expected, s"HOF diverges on '${r.getString(0)}'")
      assert(r.getLong(1) >= 0 && r.getLong(1) < 1000003L)
    }
  }

  test("filter DSL compiles to the documented boolean semantics on random filters") {
    import graft.search._
    val rows = (0 until 120).map { i =>
      (i.toLong, if (i % 11 == 0) null else java.lang.Integer.valueOf(i % 7))
    }
    val df = rows.toDF("id", "tag")
    val condGen: Gen[Cond] = Gen.oneOf(
      Gen.choose(0, 6).map(v => MatchValue("tag", v)),
      Gen.listOfN(2, Gen.choose(0, 6)).map(vs => MatchAnyOf("tag", vs.distinct)),
      Gen.listOfN(2, Gen.choose(0, 6)).map(vs => MatchExcept("tag", vs.distinct)),
      for { lo <- Gen.choose(0L, 60L); hi <- Gen.choose(60L, 120L) }
        yield RangeCond("id", gte = Some(lo), lt = Some(hi)),
      Gen.const(IsNullCond("tag")))
    val filterGen: Gen[Filter] = for {
      m <- Gen.listOfN(1, condGen); s <- Gen.choose(0, 2).flatMap(Gen.listOfN(_, condGen))
      n <- Gen.choose(0, 1).flatMap(Gen.listOfN(_, condGen))
    } yield Filter(m, s, n)
    // reference evaluation: Qdrant's documented boolean model over the
    // raw rows, with "missing key fails every field condition"
    def evalCond(c: Cond, id: Long, tag: Option[Int]): Boolean = c match {
      case MatchValue(_, v) => tag.contains(v)
      case MatchAnyOf(_, vs) => tag.exists(t => vs.contains(t))
      case MatchExcept(_, vs) => tag.exists(t => !vs.contains(t))
      case RangeCond(_, gte, gt, lte, lt) =>
        gte.forall(v => id >= v.asInstanceOf[Long]) &&
          gt.forall(v => id > v.asInstanceOf[Long]) &&
          lte.forall(v => id <= v.asInstanceOf[Long]) &&
          lt.forall(v => id < v.asInstanceOf[Long])
      case IsNullCond(_) => tag.isEmpty
    }
    samples(filterGen, 40).foreach { f =>
      val expected = rows.collect {
        case (id, tag) if {
          val t = Option(tag).map(_.intValue)
          f.must.forall(evalCond(_, id, t)) &&
            (f.should.isEmpty || f.should.exists(evalCond(_, id, t))) &&
            !f.mustNot.exists(evalCond(_, id, t))
        } => id
      }.toSet
      val got = df.filter(f.toColumn).collect().map(_.getLong(0)).toSet
      assert(got === expected, s"filter $f compiled wrong")
    }
  }

  test("geo radius: box prefilter is CONSERVATIVE — compiled filter == bare haversine") {
    import graft.search.GeoRadius
    // random centers (poles and antimeridian included), random radii
    // up to ~5000 km, random points: the compiled condition (pushdown
    // prefilter AND exact residual) must select EXACTLY the points the
    // bare haversine test selects — a prefilter that clips the circle
    // would silently drop true hits at the box edge
    val rnd = new scala.util.Random(11)
    val pts = (0 until 400).map { i =>
      (i.toLong, rnd.nextDouble() * 180 - 90, rnd.nextDouble() * 360 - 180)
    }
    val df = pts.toDF("id", "lat", "lon").cache()
    (0 until 12).foreach { _ =>
      val c = (rnd.nextDouble() * 180 - 90, rnd.nextDouble() * 360 - 180)
      val r = (rnd.nextDouble() * 4900 + 100) * 1000
      val g = GeoRadius("lat", "lon", c._1, c._2, r)
      val got = df.filter(g.toColumn).collect().map(_.getLong(0)).toSet
      val want = df.filter(
        GeoRadius.haversineMeters(col("lat"), col("lon"), c._1, c._2) <= lit(r))
        .collect().map(_.getLong(0)).toSet
      assert(got === want,
        s"center=$c r=${r}m: prefilter dropped ${want -- got}, added ${got -- want}")
    }
    df.unpersist()
  }

  test("geo polygon: compiled ray cast == reference PNPOLY; holes subtract; closed rings accepted") {
    import graft.search.GeoPolygon
    val rnd = new scala.util.Random(7)
    val pts = (0 until 500).map { i =>
      (i.toLong, rnd.nextDouble() * 60 - 30, rnd.nextDouble() * 60 - 30)
    }
    val df = pts.toDF("id", "lat", "lon").cache()
    // driver-side reference: the classic even-odd ray cast on (lon, lat)
    def inRing(ring: Seq[(Double, Double)], x: Double, y: Double): Boolean = {
      var inside = false
      var j = ring.size - 1
      for (i <- ring.indices) {
        val (xi, yi) = ring(i); val (xj, yj) = ring(j)
        if (((yi > y) != (yj > y)) && (x < (xj - xi) * (y - yi) / (yj - yi) + xi))
          inside = !inside
        j = i
      }
      inside
    }
    // CONCAVE exterior (notch at the top) with a square hole: concavity
    // exercises the multi-crossing parity a convex-only test would not
    val ext = Seq((-25.0, -25.0), (25.0, -25.0), (25.0, 25.0), (0.0, 5.0), (-25.0, 25.0))
    val hole = Seq((-10.0, -10.0), (10.0, -10.0), (10.0, 8.0), (-10.0, 8.0))
    val want = pts.collect {
      case (id, lat, lon) if inRing(ext, lon, lat) && !inRing(hole, lon, lat) => id
    }.toSet
    // non-vacuous: some points in the ring, some carved out by the hole
    assert(want.nonEmpty)
    assert(pts.exists { case (_, lat, lon) => inRing(ext, lon, lat) && inRing(hole, lon, lat) })
    val g = GeoPolygon("lat", "lon", ext, Seq(hole))
    val got = df.filter(g.toColumn).collect().map(_.getLong(0)).toSet
    assert(got === want, "compiled polygon disagrees with reference ray cast")
    // Qdrant sends rings CLOSED (first == last); the condition must
    // unclose them, not double-count the seam edge
    val closed = GeoPolygon("lat", "lon", ext :+ ext.head, Seq(hole :+ hole.head))
    assert(df.filter(closed.toColumn).collect().map(_.getLong(0)).toSet === want)
    df.unpersist()
  }

  test("min_should: threshold count semantics through the Filter root") {
    import graft.search._
    val df = Seq(
      (1L, 10, "a"), (2L, 60, "a"), (3L, 60, "a"), (4L, 5, null: String), (5L, 70, "b")
    ).toDF("id", "v", "tag")
    val conds = Seq(
      MatchValue("tag", "a"),
      RangeCond("v", gte = Some(50)),
      RangeCond("id", lte = Some(2L)))
    def ids(f: Filter): Set[Long] =
      df.filter(f.toColumn).collect().map(_.getLong(0)).toSet
    // per-row satisfied counts: 1→2, 2→3, 3→2, 4→0 (null tag fails), 5→1
    assert(ids(Filter(minShould = Some(MinShould(conds, 2)))) === Set(1L, 2L, 3L))
    assert(ids(Filter(minShould = Some(MinShould(conds, 3)))) === Set(2L))
    // min_count=1 degenerates to should — same rows either way
    assert(ids(Filter(minShould = Some(MinShould(conds, 1)))) ===
      ids(Filter(should = conds)))
    // composes with must under AND
    assert(ids(Filter(
      must = Seq(RangeCond("v", gte = Some(20))),
      minShould = Some(MinShould(conds, 2)))) === Set(2L, 3L))
    // out-of-range thresholds are construction errors, not silent trues
    assertThrows[IllegalArgumentException](MinShould(conds, 0))
    assertThrows[IllegalArgumentException](MinShould(conds, 4))
  }

  test("nested / values-count / is-empty / has-id / text / phrase conditions") {
    import graft.search._
    def ids(c: Cond, df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.filter(c.toColumn).collect().map(_.getLong(0)).toSet
    val df = Seq(
      NfPoint(1L, Seq(NfItem("R", 50.0), NfItem("N", 10.0)), "alpha beta gamma"),
      // flag matches on one element, qty on ANOTHER — the case that
      // separates NestedCond from two independent field conditions
      NfPoint(2L, Seq(NfItem("R", 10.0), NfItem("N", 50.0)), "beta alpha"),
      NfPoint(3L, Seq.empty, "alpha"),
      NfPoint(4L, Seq(NfItem("R", 45.0)), "gamma beta alpha"),
      NfPoint(5L, null, "delta alphabet")
    ).toDF()

    val nested = NestedCond("items",
      Seq(ElemMatch("flag", "R"), ElemRange("qty", gte = Some(45.0))))
    assert(ids(nested, df) === Set(1L, 4L), "same-element semantics")
    assert(ids(ValuesCountCond("items", gte = Some(2)), df) === Set(1L, 2L))
    assert(ids(ValuesCountCond("items", gte = Some(1), lt = Some(2)), df) === Set(4L))
    assert(ids(IsEmptyCond("items"), df) === Set(3L, 5L), "empty OR null array")
    assert(ids(HasIdCond("id", Seq(1L, 4L)), df) === Set(1L, 4L))
    // has_vector: null cell = vector absent; an EMPTY array is still a
    // stored value (distinct from IsEmpty's semantics)
    assert(ids(HasVectorCond("items"), df) === Set(1L, 2L, 3L, 4L))
    assert(ids(MatchTextCond("text", "alpha"), df) === Set(1L, 2L, 3L, 4L),
      "token-exact: 'alphabet' must not match 'alpha'")
    assert(ids(MatchPhraseCond("text", "alpha beta"), df) === Set(1L),
      "phrase needs ADJACENT tokens in order")
    assert(ids(MatchPhraseCond("text", "beta alpha"), df) === Set(2L, 4L))
    // composed through the Filter root, mustNot NULL-safety included
    val f = Filter(
      must = Seq(ValuesCountCond("items", gte = Some(1))),
      mustNot = Seq(NestedCond("items", Seq(ElemRange("qty", gt = Some(45.0))))))
    // rows 1 and 2 both hold a qty>45 element → excluded; row 4's 45.0
    // fails the strict bound → kept; rows 3/5 fail the must count
    assert(df.filter(f.toColumn).collect().map(_.getLong(0)).toSet === Set(4L))
  }
}

/** Public top-level row shapes for the nested-filter truth table
  * (Dataset encoders need public case classes). */
case class NfItem(flag: String, qty: Double)
case class NfPoint(id: Long, items: Seq[NfItem], text: String)
