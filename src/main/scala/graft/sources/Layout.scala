package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout management — the write-side half of the 100 TB
  * design. Every read-side operator in this engine assumes filters
  * reach the scan; these writers produce layouts where the scan can
  * also SKIP:
  *
  *   - [[writeDatePartitioned]]: hive-style `event_date=…` directory
  *     partitioning, so a date predicate prunes whole directories
  *     before any file is opened (PartitionFilters, not PushedFilters
  *     — zero I/O for excluded days). The repartition by the partition
  *     column keeps one task per day writing, avoiding the classic
  *     small-file spray of tasks × days files.
  *   - [[writeBucketed]]: `bucketBy(key)` table layout, so equi-joins
  *     and aggregations on the bucket key need NO exchange at read
  *     time — the join that dominates a CDC-state ⋈ fact workload
  *     becomes shuffle-free (asserted in LayoutSpec: zero Exchange in
  *     the bucketed join plan).
  *
  * Both are write-once/read-many investments: the write pays one
  * shuffle to organize data so every subsequent query avoids one.
  */
object Layout {

  /** Write events hive-partitioned by calendar day. */
  def writeDatePartitioned(events: DataFrame, path: String): Unit =
    events
      .withColumn("event_date", to_date(col("ts")))
      .repartition(col("event_date"))
      .write.partitionBy("event_date").mode("overwrite").parquet(path)

  /** Read one day back — the filter must show up as a PartitionFilter
    * (directory pruning), not a row-level filter.
    */
  def readDay(spark: SparkSession, path: String, day: String): DataFrame =
    spark.read.parquet(path).filter(col("event_date") === lit(day).cast("date"))

  /** Persist a DataFrame as a bucketed+sorted table (hash(keyCols) %
    * nBuckets file layout recorded in the catalog), so key-equi joins
    * between co-bucketed tables read pre-shuffled data.
    */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
                    nBuckets: Int = 8): Unit =
    df.write
      .bucketBy(nBuckets, keyCol)
      .sortBy(keyCol)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
}
