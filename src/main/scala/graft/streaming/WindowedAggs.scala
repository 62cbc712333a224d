package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Time-windowed event aggregation — one transform, two execution modes.
  *
  * Structured Streaming's unified Dataset API means the SAME declarative
  * transform runs as a batch query (for the DuckDB oracle) and as an
  * incremental streaming query with watermarked state eviction (the
  * production path the reference targets with its Kafka consumer).
  */
object WindowedAggs {

  /** Shared aggregation body: the metric contract (count + rounded
    * value sum) is defined ONCE for every window shape so tumbling and
    * sliding faces can never silently diverge.
    */
  private def aggByWindow(events: DataFrame, w: org.apache.spark.sql.Column,
                          startName: String): DataFrame =
    events
      .groupBy(w.as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           round(sum("value"), 2).as("total_value"))
      .select(col("w.start").as(startName), col("event_type"), col("n"), col("total_value"))

  /** Hourly tumbling window per event type. Batch/stream shared. */
  def hourlyByType(events: DataFrame): DataFrame =
    aggByWindow(events, window(col("ts"), "1 hour"), "hour_start")

  /** Batch entry (Verify/oracle path). */
  def hourlyByTypeBatch(spark: SparkSession, dir: String): DataFrame =
    hourlyByType(Tables.events(spark, dir)).orderBy("hour_start", "event_type")

  /** Streaming entry: 2-hour watermark bounds state; late events beyond
    * it are dropped deterministically. Output mode `update` pairs with
    * an upsert sink (see ParquetUpsertSink).
    */
  def hourlyByTypeStream(events: DataFrame): DataFrame =
    hourlyByType(events.withWatermark("ts", "2 hours"))

  val hourlySql: String =
    """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start, event_type,
      |       count(*) AS n, round(sum(value), 2) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin

  /** SLIDING (overlapping) window per event type: 1-hour windows every
    * 15 minutes, so each event lands in 4 windows — the moving-metric
    * shape (rolling error rates, rate limits) that a tumbling window
    * can't express. Spark's `window(ts, len, slide)` replicates each
    * row into its windows BEFORE the aggregation, so the plan is still
    * one partial-agg shuffle, just on 4× the rows — which is the
    * honest cost of sliding windows at any scale; the slide/length
    * ratio bounds the blow-up.
    */
  def slidingByType(events: DataFrame): DataFrame =
    aggByWindow(events, window(col("ts"), "1 hour", "15 minutes"), "win_start")

  def slidingByTypeBatch(spark: SparkSession, dir: String): DataFrame =
    slidingByType(Tables.events(spark, dir)).orderBy("win_start", "event_type")

  /** Streaming face: watermark bounds the open-window state. */
  def slidingByTypeStream(events: DataFrame): DataFrame =
    slidingByType(events.withWatermark("ts", "2 hours"))

  /** Per-window trending top-k: rank event types inside each hourly
    * window by count and keep the top k — the "what's hot right now"
    * view. The STATEFUL part is exactly [[hourlyByType]] (watermarked,
    * incremental); the rank is a stateless post-projection applied per
    * finalized window downstream (foreachBatch sink, or over the
    * materialized result table), because a rank over a still-open
    * window is unstable by definition. The window partition bounds the
    * rank's sort to (#event types) rows — never a global sort.
    */
  def trendingTopK(hourly: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("hour_start").orderBy(col("n").desc, col("event_type"))
    hourly.select("hour_start", "event_type", "n")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("hour_start", "rank", "event_type", "n")
  }

  def trendingTopKBatch(spark: SparkSession, dir: String): DataFrame =
    trendingTopK(hourlyByType(Tables.events(spark, dir)))
      .orderBy("hour_start", "rank")

  val trendingSql: String =
    """WITH h AS (
      |  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_start,
      |         event_type, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |r AS (
      |  SELECT hour_start, event_type, n,
      |    CAST(row_number() OVER (
      |      PARTITION BY hour_start ORDER BY n DESC, event_type) AS INTEGER) AS rank
      |  FROM h)
      |SELECT hour_start, rank, event_type, n FROM r WHERE rank <= 3
      |ORDER BY hour_start, rank""".stripMargin

  /** Oracle: replicate each event into its 4 enclosing windows (the
    * window START is the 15-min grid point at or before ts, minus 0-3
    * slides) and aggregate — the relational definition of the same
    * windows Spark materializes.
    */
  val slidingSql: String =
    """WITH slid AS (
      |  SELECT date_trunc('minute', ts) - INTERVAL (EXTRACT(minute FROM ts)::INT % 15) MINUTE
      |           - INTERVAL (o.off * 15) MINUTE AS win_start,
      |         event_type, value
      |  FROM events, (SELECT unnest(range(0, 4)) AS off) o)
      |SELECT CAST(win_start AS TIMESTAMP) AS win_start, event_type,
      |       count(*) AS n, round(sum(value), 2) AS total_value
      |FROM slid
      |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin
}
