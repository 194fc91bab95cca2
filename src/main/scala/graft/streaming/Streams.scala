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

  /** One user-session row. */
  case class UserSession(user_id: Long, n_events: Long, first_ts: Long, last_ts: Long)

  case class Ev(user_id: Long, ts_us: Long)

  /** Stateful sessionization with flatMapGroupsWithState: per-user
    * sessions closed after `gapMinutes` of inactivity (event-time via
    * watermark). The custom-state surface of Structured Streaming
    * (KeyValueGroupedDataset) the engine exposes for incremental
    * ingest bookkeeping; exercised in StreamingSpec. */
  def sessionize(spark: SparkSession, sfDir: String, gapMinutes: Int = 60): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val name = s"graft_sessions_${runId.incrementAndGet()}"
    val gapUs = gapMinutes * 60L * 1000000L
    val events = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("ts", "2 hours")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .as[Ev]

    val sessions = events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Seq[Long], UserSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[Ev], state: GroupState[Seq[Long]]) =>
          // bounded input (one micro-batch covers the fixture): fold the
          // user's timestamps into gap-separated sessions
          val all = (state.getOption.getOrElse(Seq.empty[Long]) ++ evs.map(_.ts_us)).sorted
          state.update(all)
          val out = scala.collection.mutable.ListBuffer.empty[UserSession]
          var start = -1L; var prev = -1L; var n = 0L
          for (t <- all) {
            if (start < 0) { start = t; prev = t; n = 1 }
            else if (t - prev > gapUs) {
              out += UserSession(uid, n, start, prev)
              start = t; prev = t; n = 1
            } else { prev = t; n += 1 }
          }
          if (start >= 0) out += UserSession(uid, n, start, prev)
          out.iterator
      }
    val q = sessions.toDF().writeStream
      .outputMode("append")
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
        .orderBy(col("window_start"), col("event_type"))),
    "s_sessionize" -> ((s, dir) =>
      sessionize(s, dir)
        .orderBy(col("user_id"), col("first_ts")))
  )

  /** Batch-SQL oracles: streaming over a bounded source must agree
    * with the equivalent batch window/sessionization SQL. */
  def oracles: Map[String, String] = Map(
    "s_stream_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
        |  count(*) AS n, ROUND(sum(value), 6) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,
    "s_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
        |l AS (SELECT user_id, ts_us,
        |  CASE WHEN ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) > 3600000000 THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |s AS (SELECT user_id, ts_us, sum(brk) OVER (PARTITION BY user_id ORDER BY ts_us
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM l)
        |SELECT user_id, count(*) AS n_events, min(ts_us) AS first_ts, max(ts_us) AS last_ts
        |FROM s GROUP BY user_id, sid ORDER BY user_id, first_ts""".stripMargin
  )
}
