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

  /** Hourly tumbling window per event type. Batch/stream shared. */
  def hourlyByType(events: DataFrame): DataFrame = {
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           round(sum("value"), 2).as("total_value"))
      .select(col("w.start").as("hour_start"), col("event_type"), col("n"), col("total_value"))
  }

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
}
