package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicInteger

/** Structured Streaming equivalents (extension — the reference has no
  * streaming; SURVEY.md §2 G sanctions it for the events table).
  *
  * The incremental-indexing pipeline is stream-shaped by nature (new
  * PDFs arrive → embed → upsert), so the engine exposes the same
  * tumbling-window aggregation as a `readStream` plan with a
  * watermark. At scale this runs continuously with state eviction via
  * the watermark; here a bounded parquet source drives it to
  * completion so the result is deterministic and oracle-comparable.
  */
object Streams {

  private val runId = new AtomicInteger(0)

  /** Tumbling 1-hour windowed counts per event_type, computed by an
    * actual streaming query (memory sink, complete mode) over the
    * bounded events fixture. Returns the materialized result as a
    * batch DataFrame. */
  def eventWindowCountsStreaming(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    val schema = spark.read.parquet(path).schema
    val name = s"graft_stream_${runId.incrementAndGet()}"
    // the streaming file source requires a directory; scope it to the
    // events file with a glob
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("total_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("total_value"))
    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s_stream_window" -> ((s, dir) =>
      eventWindowCountsStreaming(s, dir)
        .orderBy(col("window_start"), col("event_type")))
  )

  /** Same oracle as the batch tumbling window — streaming over a
    * bounded source must agree with batch. */
  def oracles: Map[String, String] = Map(
    "s_stream_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
        |  count(*) AS n, ROUND(sum(value), 6) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin
  )
}
