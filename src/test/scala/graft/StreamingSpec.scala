package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.streaming.Streams

/** Structured Streaming behavior beyond the oracle gate. */
class StreamingSpec extends SparkSpec {

  test("sessionize: stateful streaming equals batch window sessionization") {
    val streamed = Streams.sessionize(spark, sf)
    // batch equivalent: gap-break + running session id
    val e = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
    val batch = e
      .withColumn("brk",
        when(col("ts_us") - lag(col("ts_us"), 1).over(w) > 3600000000L, 1).otherwise(0))
      .withColumn("sid", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_events"), min(col("ts_us")).as("first_ts"),
        max(col("ts_us")).as("last_ts"))
      .select(col("user_id"), col("n_events"), col("first_ts"), col("last_ts"))
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }

  test("sessions have positive durations and event counts") {
    val s = Streams.sessionize(spark, sf)
    assert(s.filter(col("n_events") < 1 || col("last_ts") < col("first_ts")).count() === 0L)
    assert(s.count() > 0)
  }
}
