package graft

import org.apache.spark.sql.types._

/** Fixture-drift canary. The events `ts` encoding changed under the
  * repo twice, each time breaking double-digit query counts with
  * opaque downstream errors; this spec makes the NEXT regeneration
  * fail here first, with the column and the drift named. Assertions
  * are deliberately as loose as the engine's real tolerance:
  * integral keys may be int or long (joins/comparisons adapt),
  * embeddings may be float or double arrays (the native kernels are
  * element-type adaptive), and events.ts accepts every encoding
  * Tables.TsCodec knows — a FOURTH encoding already fails loudly in
  * EventsEncodingSpec. Anything outside those envelopes is a drift
  * the oracles or kernels would NOT absorb, and needs a codec or an
  * oracle-cast decision, not a mystery hunt. */
class FixtureCanarySpec extends SparkSpec {

  private def schemaOf(table: String): Map[String, DataType] =
    Tables.t(spark, sf, table).schema.fields
      .map(f => f.name -> f.dataType).toMap

  private val integral: Set[DataType] = Set(IntegerType, LongType)
  private val floating: Set[DataType] = Set(FloatType, DoubleType)

  private def assertCols(
      table: String, expect: Map[String, DataType => Boolean]): Unit = {
    val got = schemaOf(table)
    val missing = expect.keySet -- got.keySet
    assert(missing.isEmpty,
      s"$table lost column(s) ${missing.toSeq.sorted.mkString(", ")} — " +
        s"fixture regenerated with a new shape? present: ${got.keySet.toSeq.sorted.mkString(", ")}")
    expect.foreach { case (name, ok) =>
      assert(ok(got(name)),
        s"$table.$name drifted to ${got(name)} — decide: adapt a codec " +
          "(the TsCodec pattern) or re-cast the oracles, then update this canary")
    }
  }

  test("TPC-H tables keep the dtype families the oracles cast for") {
    assertCols("region", Map(
      "r_regionkey" -> integral.contains, "r_name" -> (_ == StringType)))
    assertCols("nation", Map(
      "n_nationkey" -> integral.contains, "n_name" -> (_ == StringType),
      "n_regionkey" -> integral.contains))
    assertCols("customer", Map(
      "c_custkey" -> integral.contains, "c_name" -> (_ == StringType),
      "c_nationkey" -> integral.contains, "c_acctbal" -> floating.contains,
      "c_mktsegment" -> (_ == StringType)))
    assertCols("supplier", Map(
      "s_suppkey" -> integral.contains, "s_nationkey" -> integral.contains,
      "s_acctbal" -> floating.contains))
    assertCols("part", Map(
      "p_partkey" -> integral.contains, "p_type" -> (_ == StringType),
      "p_size" -> integral.contains, "p_retailprice" -> floating.contains))
    // money as DECIMAL would silently change every revenue oracle's
    // engine-side type (the HUGEINT lesson) — flag it here
    assertCols("orders", Map(
      "o_orderkey" -> integral.contains, "o_custkey" -> integral.contains,
      "o_orderstatus" -> (_ == StringType),
      "o_totalprice" -> floating.contains,
      "o_orderdate" -> (dt => dt == TimestampType || dt == TimestampNTZType),
      "o_orderpriority" -> (_ == StringType)))
    assertCols("lineitem", Map(
      "l_orderkey" -> integral.contains, "l_partkey" -> integral.contains,
      "l_suppkey" -> integral.contains, "l_linenumber" -> integral.contains,
      "l_quantity" -> floating.contains, "l_extendedprice" -> floating.contains,
      "l_discount" -> floating.contains, "l_tax" -> floating.contains,
      "l_returnflag" -> (_ == StringType), "l_linestatus" -> (_ == StringType),
      "l_shipdate" -> (dt => dt == TimestampType || dt == TimestampNTZType)))
  }

  test("documents / embeddings / events stay inside the engine's adaptive envelope") {
    assertCols("documents", Map(
      "doc_id" -> integral.contains, "text" -> (_ == StringType),
      "lang" -> (_ == StringType), "source" -> (_ == StringType),
      "n_chars" -> integral.contains))
    assertCols("embeddings", Map(
      "vec_id" -> integral.contains,
      "embedding" -> {
        case ArrayType(et, _) => floating.contains(et)
        case _ => false
      },
      "label" -> integral.contains))
    // events.ts: any codec-known encoding is fine — the loud-unknown
    // path is EventsEncodingSpec's drill; here just prove the read
    // normalizes end-to-end on the CURRENT fixture
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.limit(1).count() === 1L)
    assertCols("events", Map(
      "event_id" -> integral.contains, "user_id" -> integral.contains,
      "event_type" -> (_ == StringType), "value" -> floating.contains))
  }
}
