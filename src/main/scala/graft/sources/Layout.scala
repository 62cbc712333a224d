package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** 32-bit Morton (Z-order) key over two numeric columns, each
    * normalized to a 16-bit rank in its [min, max] span and
    * bit-interleaved. A linear sort tightens parquet min/max stats for
    * its FIRST column only; sorting by this key tightens them for BOTH
    * dims at once, so selective predicates on either column skip most
    * row groups / files — the multi-dimensional data-skipping layout
    * (Delta/Iceberg OPTIMIZE ZORDER) expressed as a plain column.
    * Pure projection (32 shift/mask/or terms, whole-stage codegen).
    */
  def zOrderKey(x: Column, y: Column,
                xMin: Double, xMax: Double, yMin: Double, yMax: Double): Column = {
    def rank16(c: Column, lo: Double, hi: Double): Column =
      least(lit(65535), greatest(lit(0),
        ((c.cast("double") - lit(lo)) / lit(math.max(hi - lo, Double.MinPositiveValue))
          * lit(65535.0)).cast("int"))).cast("long")
    val (a, b) = (rank16(x, xMin, xMax), rank16(y, yMin, yMax))
    (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Rewrite `df` Z-ordered on two numeric columns: range-partition by
    * the Morton key (so files tile the Z-curve, no overlap between
    * tasks) and sort within partitions before writing. The column
    * bounds come from one tiny min/max aggregate — at 100 TB that scan
    * is the same full pass the rewrite itself must make, so the layout
    * costs one extra scalar job, not a second data pass.
    */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                    nFiles: Int = 8): Unit = {
    val b = df.agg(min(xCol).cast("double"), max(xCol).cast("double"),
      min(yCol).cast("double"), max(yCol).cast("double")).head()
    val z = zOrderKey(col(xCol), col(yCol),
      b.getDouble(0), b.getDouble(1), b.getDouble(2), b.getDouble(3))
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Per-file min/max skipping stats for `cols` — what a stats-based
    * scan planner (or this module's specs) reads to decide which files
    * a predicate can skip. Span fraction ≈ the expected fraction of
    * files a uniform point predicate on that column must open.
    */
  def skippingStats(spark: SparkSession, path: String, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).cast("double").as(s"${c}__mn"), max(col(c)).cast("double").as(s"${c}__mx")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
