package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The events fixture's `ts` encoding has already changed once under
  * the engine (TIMESTAMP-nanos → TIMESTAMP_NTZ µs between rounds 6 and
  * 7, which silently broke 11 queries). This spec fabricates EVERY
  * supported encoding so the codec — not a hard-coded assumption — is
  * what every consumer exercises, and the next regeneration fails
  * loudly here instead of in production queries. */
class EventsEncodingSpec extends SparkSpec {

  // one logical fixture: (event_id, epoch µs, user_id, type, value)
  private val rows = Seq(
    (1L, 1704067200000000L, 10L, "click", 1.5),
    (2L, 1704067201500000L, 10L, "purchase", 2.5),
    (3L, 1704070800000000L, 11L, "view", 0.5))

  /** Write the logical fixture as `events.parquet` under `enc`. */
  private def writeFixture(enc: Tables.TsCodec): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"graft_enc").toString
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .select(col("event_id"), enc.fromMicros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"),
        lit(null).cast("string").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val encodings: Seq[(String, Tables.TsCodec)] = Seq(
    "nanos-as-long" -> Tables.TsNanosAsLong,
    "ntz-micros" -> Tables.TsMicrosNtz,
    "ltz-micros" -> Tables.TsMicrosLtz)

  test("Tables.events normalizes every ts encoding to identical timestamps") {
    val got = encodings.map { case (name, enc) =>
      val df = Tables.events(spark, writeFixture(enc))
      assert(df.schema("ts").dataType === TimestampType, s"$name must normalize to TimestampType")
      name -> df.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val expected = rows.map(r => (r._1, r._2)).toSet
    got.foreach { case (name, s) =>
      assert(s === expected, s"encoding $name lost or shifted timestamps")
    }
  }

  test("tsCodec picks the right codec per loaded schema and is loud on unknowns") {
    def schemaOf(dt: DataType) = StructType(Seq(StructField("ts", dt)))
    assert(Tables.tsCodec(schemaOf(LongType)) === Tables.TsNanosAsLong)
    assert(Tables.tsCodec(schemaOf(TimestampNTZType)) === Tables.TsMicrosNtz)
    assert(Tables.tsCodec(schemaOf(TimestampType)) === Tables.TsMicrosLtz)
    val e = intercept[IllegalArgumentException] {
      Tables.tsCodec(schemaOf(StringType))
    }
    assert(e.getMessage.contains("TsCodec"))
  }

  test("an UNKNOWN fourth on-disk encoding refuses loudly end-to-end") {
    import spark.implicits._
    // The fixture has changed encoding under the repo twice. If it
    // changes again to something the codec does NOT know (here: epoch
    // seconds as DOUBLE, and int32 days), the full read path must
    // refuse with an actionable message — never mis-read timestamps.
    val fourths: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "double-seconds" -> (col("us").cast("double") / lit(1e6)),
      "int32" -> (col("us") / lit(86400000000L)).cast("int"))
    fourths.foreach { case (name, tsCol) =>
      val dir = java.nio.file.Files.createTempDirectory("graft_enc4").toString
      rows.toDF("event_id", "us", "user_id", "event_type", "value")
        .select(col("event_id"), tsCol.as("ts"), col("user_id"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
      val e = intercept[IllegalArgumentException] {
        Tables.events(spark, dir)
      }
      assert(e.getMessage.contains("TsCodec") && e.getMessage.contains("events.ts"),
        s"$name: unknown encoding must name the column and the fix, got: ${e.getMessage}")
    }
  }

  test("toMicros/fromMicros round-trip exactly in every encoding") {
    import spark.implicits._
    // include a value with non-zero µs remainder and one past 2^53 ns
    val us = Seq(1704067200000001L, 9007199254740993L, 0L)
    encodings.foreach { case (name, enc) =>
      val back = us.toDF("us")
        .select(enc.fromMicros(col("us")).as("ts"), col("us"))
        .select(enc.toMicros.as("got"), col("us"))
        .collect()
      back.foreach(r => assert(r.getLong(0) === r.getLong(1),
        s"encoding $name: ${r.getLong(1)} round-tripped to ${r.getLong(0)}"))
    }
  }

  test("stream sentinel row unions with the fixture in its own encoding") {
    encodings.foreach { case (name, enc) =>
      val dir = writeFixture(enc)
      val raw = spark.read.parquet(s"$dir/events.parquet")
      assert(Tables.tsCodec(raw.schema) === enc, s"$name: codec detection")
      val maxUs = raw.agg(max(enc.toMicros)).head.getLong(0)
      assert(maxUs === rows.map(_._2).max, s"$name: max ts µs")
      val sentinel = graft.streaming.Streams.sentinelRow(spark, enc, maxUs, gapHours = 6)
      assert(sentinel.schema("ts").dataType === raw.schema("ts").dataType,
        s"$name: sentinel must match the fixture's on-disk ts type")
      val unioned = raw.unionByName(sentinel)
      val sentinelUs = unioned.agg(max(enc.toMicros)).head.getLong(0)
      assert(sentinelUs === maxUs + 6L * 3600L * 1000000L, s"$name: sentinel gap")
    }
  }
}
