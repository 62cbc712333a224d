package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-static dimension enrichment — the streaming face of the
  * reference's static-data pattern
  * (/root/reference/files/staticdata/cities.csv, an email→city dim
  * joined onto the CDC stream).
  *
  * Stream-static joins are STATELESS in Structured Streaming: every
  * micro-batch re-plans the join against the static side, so the state
  * store carries nothing and a refreshed dim file is picked up without
  * restarting the query. With the dim broadcast, the stream side never
  * shuffles — the enrichment adds zero exchanges to the streaming plan,
  * which is the shape that survives a 100 TB/day stream.
  */
object StreamEnrich {

  /** Load a small `;`-delimited CSV dim (the reference's format). */
  def loadCsvDim(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("delimiter", ";").csv(path)

  /** Left-enrich `stream` (streaming or batch — the declarative join is
    * identical) with a broadcast dim. The dim's key column is renamed
    * away before the join, and any OTHER dim column whose name collides
    * with a stream column gets a `_dim` suffix — so the output never
    * carries ambiguous duplicate names.
    */
  def withDim(stream: DataFrame, dim: DataFrame,
              streamKey: String, dimKey: String): DataFrame = {
    // collision checks are case-insensitive (Spark's default resolver
    // is), and the suffix loop guarantees the new name is itself free
    val streamCols = stream.columns.map(_.toLowerCase).toSet
    val d0 = dim.withColumnRenamed(dimKey, "__dim_key")
    val d = dim.columns.filter(c => c != dimKey && streamCols.contains(c.toLowerCase))
      .foldLeft(d0) { (acc, c) =>
        val taken = streamCols ++ acc.columns.map(_.toLowerCase)
        var name = c + "_dim"
        while (taken.contains(name.toLowerCase)) name += "_"
        acc.withColumnRenamed(c, name)
      }
    stream.join(broadcast(d), col(streamKey) === col("__dim_key"), "left")
      .drop("__dim_key")
  }
}
