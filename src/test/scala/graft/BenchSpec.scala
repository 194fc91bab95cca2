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
    val (timed, errors) = Bench.timeQueries(spark,
      Seq("g", "b"), Map("g" -> good, "b" -> broken), sf, reps = 2)
    assert(errors === Map("b" -> 2), "every failing pass must be counted")
    val byName = timed.map(t => t._1 -> t).toMap
    assert(byName("g")._2 > 0.0, "successful query reports its min time")
    // the all-failed query reports its MAX elapsed — the cost actually
    // paid — not a near-zero min that would shrink the total
    assert(byName("b")._2 === byName("b")._3)
    assert(byName("b")._2 > 0.0)
  }

  test("all-green run returns an empty error map") {
    val (timed, errors) = Bench.timeQueries(spark,
      Seq("g"), Map("g" -> good), sf, reps = 2)
    assert(errors.isEmpty)
    assert(timed.head._2 <= timed.head._3, "min over passes <= max")
  }
}
