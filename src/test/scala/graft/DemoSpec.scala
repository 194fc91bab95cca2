package graft

/** The end-to-end walkthrough ([[Demo.run]]) is a product artifact —
  * the first thing a new user runs — so its lifecycle invariants are
  * pinned like any operator: the r16 verdict's "one reference-shaped
  * demo path" item. Runs the REAL pipeline (scan → tolerant decode →
  * seam embed → ensure/incremental upsert → filtered MaxSim top-5 →
  * 'Unknown'-defaulted projection) on sf0.001. */
class DemoSpec extends SparkSpec {

  test("the reference lifecycle runs end to end and its invariants hold") {
    val s = Demo.run(spark, sf)
    // scan: 6 of 8 extension slots are images (png/JPG/jpeg/PNG/jpg/
    // JPEG; txt and gif filtered), 500 docs at sf0.001
    assert(s.listed === 500L && s.scanned === 375L)
    // tolerant decode: doc_id % 97 == 0 plays the corrupt files —
    // flagged and counted, never thrown
    assert(s.processed === 370L && s.failed === 5L)
    assert(s.processed + s.failed === s.scanned)
    // incremental index: first upsert writes every decoded point, the
    // re-index writes ZERO (the reference's duplicate-on-reindex, fixed)
    assert(s.wrote === 370L && s.reWrote === 0L)
    // search: both queries return full top-5s through the payload
    // filter, scores are (-1, 1] cosines, descending
    assert(s.results.size === 2)
    s.results.foreach { case (q, hits) =>
      assert(hits.size === 5, s"query '$q' must return 5 hits")
      assert(hits.map(_._2) === hits.map(_._2).sorted.reverse,
        "hits must rank score DESC")
      assert(hits.forall(h => h._2 <= 1.0 + 1e-9))
    }
    // the corpus-derived query retrieves its OWN document first: the
    // first indexed doc is doc_id 1 (doc 0 is a planted decode
    // failure), and MaxSim on its own leading tokens must win
    val (selfQ, selfHits) = s.results.head
    assert(selfQ.nonEmpty)
    assert(selfHits.head._1 === "doc_1.JPG",
      s"the self-query must retrieve its own page first: $selfHits")
  }
}
