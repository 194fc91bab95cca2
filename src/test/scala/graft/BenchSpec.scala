package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bench harness honesty: a failing query must be counted loudly and
  * must never flatter the total (round 7: 11 broken queries "ran" in
  * 0.1 s each and silently shaved ~9 s off the reported number). */
class BenchSpec extends SparkSpec {

  private val good: (SparkSession, String) => DataFrame =
    (s, _) => s.range(10).toDF("id")
  private val broken: (SparkSession, String) => DataFrame =
    (s, _) => s.range(1)
      .select(org.apache.spark.sql.functions.col("no_such_column"))

  test("timeQueries counts failures per query and times the rest") {
    val (timed, errors, errMsgs) = Bench.timeQueries(spark,
      Seq("g", "b"), Map("g" -> good, "b" -> broken), sf, _ => 2)
    assert(errors === Map("b" -> 2), "every failing pass must be counted")
    // r17: the FIRST failure message is kept for the detail file —
    // the adjudication lesson (7 transient one-rep errors, no trace)
    assert(errMsgs.keySet === Set("b"))
    assert(errMsgs("b").contains("no_such_column"),
      s"the message must carry the cause: ${errMsgs("b")}")
    val byName = timed.map(t => t._1 -> t).toMap
    assert(byName("g")._2 > 0.0, "successful query reports its min time")
    // the all-failed query reports its MAX elapsed — the cost actually
    // paid — not a near-zero min that would shrink the total
    assert(byName("b")._2 === byName("b")._3)
    assert(byName("b")._2 > 0.0)
  }

  test("all-green run returns an empty error map") {
    val (timed, errors, errMsgs) = Bench.timeQueries(spark,
      Seq("g"), Map("g" -> good), sf, _ => 2)
    assert(errors.isEmpty && errMsgs.isEmpty)
    assert(timed.head._2 <= timed.head._3, "min over passes <= max")
  }

  test("JsonOut.jsonStr: every control character escapes — the forensics field stays parseable") {
    // r17 review: three divergent inline escape chains each missed a
    // control-char class (an ANSI-colored error message would have
    // made BENCH_DETAIL.json unparseable). The shared escaper must
    // leave NO raw char < 0x20 inside the literal.
    val s = JsonOut.jsonStr("a\u001b[31m\"x\\\n\t\u0000 b")
    assert(s.head == '"' && s.last == '"')
    assert(!s.drop(1).dropRight(1).exists(_ < 0x20), s"raw control char in $s")
    assert(s.contains("\\u001b") && s.contains("\\\"") &&
      s.contains("\\\\") && s.contains("\\n") && s.contains("\\t") &&
      s.contains("\\u0000"), s)
  }

  test("per-query reps: a high-spread query runs its extra passes, the rest stay cheap") {
    val counts = scala.collection.mutable.Map("hot" -> 0, "cold" -> 0)
    def counting(name: String): (SparkSession, String) => DataFrame =
      (s, _) => { counts(name) += 1; s.range(3).toDF("id") }
    val (timed, errors, _) = Bench.timeQueries(spark,
      Seq("hot", "cold"),
      Map("hot" -> counting("hot"), "cold" -> counting("cold")),
      sf, n => if (n == "hot") 4 else 2)
    assert(errors.isEmpty)
    assert(counts("hot") === 4, "high-spread query must run min-of-4")
    assert(counts("cold") === 2, "stable query keeps the cheap default")
    assert(timed.map(_._1).toSet === Set("hot", "cold"))
  }
}
