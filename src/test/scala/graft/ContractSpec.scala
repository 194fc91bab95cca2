package graft

import graft.streaming.Streams
import graft.multimodal.Multimodal
import graft.Tables.t
import org.apache.spark.sql.functions._

/** Driver-contract level checks: every query runs and returns rows,
  * every query has an oracle, streaming agrees with batch. */
class ContractSpec extends SparkSpec {

  test("entry returns rows (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle and every oracle a query") {
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet)
  }

  test("every query runs non-empty at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"query $name returned 0 rows")
    }
  }

  test("every multi-row oracle carries a total ORDER BY (CLAUDE.md rule)") {
    // a LIMIT cut without a total order is nondeterministic across
    // engines; single-row aggregates are the only sanctioned exception
    val exempt = Set("q_count_approx", "q_count_filtered", "r_events_funnel",
      "r_promo_revenue", "r_q6_forecast", "x_quality_corr")
    val missing = SparkEntry.oracleSql.collect {
      case (name, sql) if !sql.toLowerCase.contains("order by") &&
        !exempt.contains(name) => name
    }
    assert(missing.isEmpty,
      s"oracles without ORDER BY (add one, or add to the single-row " +
        s"exempt list with justification): ${missing.toSeq.sorted.mkString(", ")}")
    // the exempt list itself must stay single-row aggregates: they
    // exist in the suite and claim exactly one row at sf0.001
    exempt.foreach { name =>
      assert(SparkEntry.oracleSql.contains(name), s"stale exempt entry $name")
      assert(SparkEntry.queries(name)(spark, sf).count() === 1L,
        s"$name is exempt as a single-row aggregate but returned more")
    }
    // and no oracle may call a nondeterministic function — compared
    // output must be identical run over run on both engines
    val banned = Seq("uuid(", "random(", "now()", "current_timestamp")
    val dirty = SparkEntry.oracleSql.collect {
      case (name, sql) if banned.exists(sql.toLowerCase.contains) => name
    }
    assert(dirty.isEmpty,
      s"oracles calling nondeterministic functions: ${dirty.toSeq.sorted.mkString(", ")}")
  }

  test("streaming window agg equals batch window agg") {
    val streamed = Streams.eventWindowCountsStreaming(spark, sf)
    val batch = graft.ops.Relational.eventWindowCounts(Tables.events(spark, sf))
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }

  test("multimodal decode: batch shape independent (batchSize doesn't change rows)") {
    val m = Multimodal.withBlob(t(spark, sf, "documents"))
    val a = Multimodal.decodeFeatures(m, 16).collect().sortBy(_.doc_id)
    val b = Multimodal.decodeFeatures(m, 7).collect().sortBy(_.doc_id)
    assert(a.toSeq === b.toSeq)
  }
}
