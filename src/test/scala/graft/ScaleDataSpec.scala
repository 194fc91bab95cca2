package graft

import org.apache.spark.sql.functions._

/** Invariants of the scale-corpus synthesizer — the measurement
  * infrastructure every BENCH_NOTES growth exponent rests on. A broken
  * perturbation silently measures the wrong distribution (K exact
  * copies band together and every LSH self-join goes quadratic for
  * data reasons, not algorithmic ones), so the properties are pinned.
  */
class ScaleDataSpec extends SparkSpec {

  private def docs = Tables.t(spark, sf, "documents").limit(50).cache()
  private def emb = Tables.t(spark, sf, "embeddings").limit(50).cache()

  test("copy 0 is the identity on every table") {
    assert(ScaleData.docsCopy(docs, 0).collect().map(_.toSeq).toSeq ===
      docs.collect().map(_.toSeq).toSeq)
    assert(ScaleData.embCopy(emb, 0).collect().map(_.toSeq).toSeq ===
      emb.collect().map(_.toSeq).toSeq)
  }

  test("text copies are pairwise distinct content, same lengths, disjoint ids") {
    // permutation-perturbed copies must not collide even past the
    // 26-rotation horizon (the property rotations lack); lengths and
    // token structure are preserved so corpus statistics carry over
    val texts = (0 until 40).map(c =>
      c -> ScaleData.docsCopy(docs.limit(5), c).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap)
    for (Seq((c1, m1), (c2, m2)) <- texts.combinations(2)) {
      val base1 = m1.keys.map(_ % 10000000L).toSet
      m1.foreach { case (id, t1) =>
        val t2 = m2(id % 10000000L + c2 * 10000000L)
        assert(t1.length === t2.length, s"copies $c1/$c2 changed length")
        if (t1.exists(_.isLetter))
          assert(t1 !== t2, s"copies $c1/$c2 collide on doc $id")
      }
      assert(base1 === m2.keys.map(_ % 10000000L).toSet)
    }
  }

  test("embedding copies preserve norms and spread directions") {
    val base = emb.limit(10).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def norm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    for (c <- Seq(1, 7, 63, 64, 99)) {
      val copied = ScaleData.embCopy(emb.limit(10), c).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      copied.foreach { case (id, v) =>
        val orig = base(id - c * 10000000L)
        assert(math.abs(norm(v) - norm(orig)) < 1e-5,
          s"copy $c changed a norm")
        val cos = v.zip(orig).map { case (a, b) => a * b }.sum /
          (norm(v) * norm(orig))
        assert(cos < 0.9, s"copy $c left vector $id a near-duplicate (cos=$cos)")
      }
    }
  }

  test("embedding transforms stay distinct past the rotation period") {
    // rotation alone repeats with period dim/gcd(7,dim)·(reversal 2) —
    // copy 128 was an EXACT content dup of copy 0 at dim 64 (r12
    // advisor); the sign-flip composition must keep every copy pair
    // distinct while staying rigid (norms checked in the test above)
    def vecs(c: Int) = ScaleData.embCopy(emb.limit(10), c).collect()
      .map(r => (r.getLong(0) - c * 10000000L,
        r.getSeq[Float](1).map(_.toDouble).toSeq)).toMap
    val base = vecs(0)
    for (c <- Seq(64, 128, 192, 256)) {
      val copied = vecs(c)
      val collisions = base.keys.count(id => copied(id) == base(id))
      assert(collisions === 0,
        s"copy $c duplicates copy 0 on $collisions of ${base.size} vectors")
    }
    // and distinct from EACH OTHER in the same rotation class
    assert(vecs(128).values.toSeq !== vecs(256).values.toSeq)
  }

  test("events and TPC-H copies shift keys only; ts and measures untouched") {
    val ev = Tables.t(spark, sf, "events").limit(20)
    val evC = ScaleData.eventsCopy(0L)(ev, 3).collect()
    val evB = ev.collect()
    evC.zip(evB).foreach { case (c, b) =>
      assert(c.getLong(0) === b.getLong(0) + 300000000L)
      assert(c.get(1) === b.get(1), "raw ts must pass through unchanged")
      assert(c.getDouble(4) === b.getDouble(4))
    }
    // time-extension mode: copy c shifts by exactly c·span in epoch
    // µs THROUGH THE CODEC (never an inlined encoding assumption)
    val codec = Tables.tsCodec(ev.schema)
    val spanUs = 7L * 86400L * 1000000L
    val us0 = ev.select(codec.toMicros.as("us")).collect().map(_.getLong(0))
    val usC = ScaleData.eventsCopy(spanUs)(ev, 3)
      .select(codec.toMicros.as("us")).collect().map(_.getLong(0))
    usC.zip(us0).foreach { case (c, b) => assert(c === b + 3L * spanUs) }
    // copy 0 is the identity in extension mode too
    assert(ScaleData.eventsCopy(spanUs)(ev, 0).collect().map(_.get(1)).toSeq
      === evB.map(_.get(1)).toSeq)
    val li = Tables.t(spark, sf, "lineitem").limit(20)
    val liC = ScaleData.tpchCopy(Seq("l_orderkey", "l_partkey", "l_suppkey"))(li, 2)
      .collect()
    liC.zip(li.collect()).foreach { case (c, b) =>
      assert(c.getLong(0) === b.getLong(0) + 20000000L)
      assert(c.getLong(1) === b.getLong(1) + 20000000L)
      assert(c.getDouble(4) === b.getDouble(4), "measures untouched")
    }
  }
}
