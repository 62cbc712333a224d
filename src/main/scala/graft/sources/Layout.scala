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
    * between co-bucketed tables read pre-shuffled data. An explicit
    * `path` makes it an external table (files land there instead of the
    * warehouse dir).
    */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
                    nBuckets: Int = 8, path: Option[String] = None): Unit = {
    val w = df.write
      .bucketBy(nBuckets, keyCol)
      .sortBy(keyCol)
      .mode("overwrite")
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Memoized bucketed layout for the driver face: orders and customer
    * bucketed on custkey (8 buckets each) written ONCE per (session,
    * dir) as external tables under java.io.tmpdir — the write-once
    * investment whose cost Bench attributes as the `layout_bucketed`
    * artifact line. Returns (ordersTable, customerTable).
    *
    * The table/path tag ([[graft.SessionCache.scratchTag]]) is an md5
    * prefix of the dir (hashCode would let two dirs collide onto one
    * table and silently serve each other's rows) scoped by the Spark
    * application id, so two JVMs benching the SAME dir concurrently
    * write disjoint roots instead of racing one shared external path.
    */
  def bucketedTables(spark: SparkSession, dir: String): (String, String) =
    graft.SessionCache.getOrElseUpdate(spark, ("layoutBucketed", dir)) {
      val tag = graft.SessionCache.scratchTag(spark, dir)
      val base = s"${System.getProperty("java.io.tmpdir")}/graft-bucketed-$tag"
      val ordersT = s"graft_bucketed_orders_$tag"
      val custT = s"graft_bucketed_customer_$tag"
      writeBucketed(graft.Tables.load(spark, dir, "orders"), ordersT,
        "o_custkey", nBuckets = 8, path = Some(s"$base/orders"))
      writeBucketed(graft.Tables.load(spark, dir, "customer"), custT,
        "c_custkey", nBuckets = 8, path = Some(s"$base/customer"))
      (ordersT, custT)
    }

  /** Driver face over the bucketed layout: the customer⋈orders join
    * reads co-bucketed files, so the join itself needs NO Exchange —
    * the one shuffle in the plan is the per-segment aggregation above
    * it (asserted in LayoutSpec). The oracle runs the identical query
    * over the RAW parquet, so the layout must be a pure physical
    * optimization: any row lost or duplicated by the bucketed
    * write/read round-trip hash-mismatches.
    */
  def bucketedAgg(spark: SparkSession, dir: String): DataFrame = {
    val (ordersT, custT) = bucketedTables(spark, dir)
    spark.table(ordersT)
      .join(spark.table(custT), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total_price"))
      .orderBy("c_mktsegment")
  }

  val bucketedAggSql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  round(sum(o_totalprice), 2) AS total_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

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

  /** Where a layout's persisted skipping index lives (sibling of the
    * data directory, not inside it — a plain `read.parquet(path)` of
    * the data must never pick up index rows).
    */
  def statsPath(path: String): String = s"$path.__stats"

  /** [[writeZOrdered]] plus a PERSISTED skipping index: after the
    * Z-order rewrite, per-file min/max for the two layout dims are
    * computed and written as a tiny sibling parquet
    * ([[statsPath]]) — the Delta/Iceberg data-skipping pattern
    * (stats collected once at write time, consumed by the read
    * planner on every query). The stats job re-scans only the two
    * indexed columns of the freshly written files; at 100 TB that is
    * a column-pruned metadata-class pass paid once per rewrite, and
    * it is what lets every subsequent read open a FRACTION of the
    * files instead of all of them.
    */
  def writeZOrderedIndexed(df: DataFrame, path: String, xCol: String, yCol: String,
                           nFiles: Int = 8): Unit = {
    writeZOrdered(df, path, xCol, yCol, nFiles)
    skippingStats(df.sparkSession, path, Seq(xCol, yCol))
      .coalesce(1).write.mode("overwrite").parquet(statsPath(path))
  }

  /** Stats-pruned scan — the read half of the Z-order loop: evaluate a
    * two-dim range predicate against the persisted per-file index and
    * plan a scan over ONLY the files whose [min, max] box intersects
    * it, then apply the predicate row-level as the residual (stats
    * prune files, not rows). The file-list decision reads the tiny
    * index table on the driver — bounded by file count, the same
    * metadata-scale work any catalog-backed scan planner
    * (Delta/Iceberg) does before launching tasks; the data files
    * excluded here are never opened, which on a Z-ordered layout means
    * a selective two-dim predicate reads O(matching tiles), not the
    * whole table (the span-halving property LayoutSpec proves).
    *
    * Soundness of the null edge: parquet min/max ignore nulls, so a
    * file whose indexed column is entirely null has null bounds and is
    * pruned — correct, because a range predicate never matches null
    * rows; files with a mix keep non-null bounds and survive pruning,
    * and their null rows fall to the residual filter.
    */
  def readSkipping(spark: SparkSession, path: String,
                   xCol: String, xLo: Double, xHi: Double,
                   yCol: String, yLo: Double, yHi: Double): DataFrame = {
    val pred = col(xCol).cast("double").between(xLo, xHi) &&
      col(yCol).cast("double").between(yLo, yHi)
    val files = plannedFiles(spark, path, xCol, xLo, xHi, yCol, yLo, yHi)
    if (files.isEmpty) spark.read.parquet(path).filter(lit(false))
    else spark.read.parquet(files.toIndexedSeq: _*).filter(pred)
  }

  /** The pruned file list [[readSkipping]] plans — public so the spec
    * asserts on files PLANNED (the skipping claim), not merely files
    * that happened to produce output rows.
    */
  def plannedFiles(spark: SparkSession, path: String,
                   xCol: String, xLo: Double, xHi: Double,
                   yCol: String, yLo: Double, yHi: Double): Array[String] =
    spark.read.parquet(statsPath(path))
      .filter(col(s"${xCol}__mx") >= xLo && col(s"${xCol}__mn") <= xHi &&
        col(s"${yCol}__mx") >= yLo && col(s"${yCol}__mn") <= yHi)
      .select("file").collect().map(_.getString(0))

  /** Memoized Z-ordered events layout for the driver face: events
    * rewritten Z-ordered on (user_id, value) with the persisted
    * skipping index, written once per (session, dir) under
    * java.io.tmpdir (same tag/single-writer contract as
    * [[bucketedTables]]). Bench attributes the write as the
    * `layout_zordered` artifact line, so the driver entry's number is
    * the READ-side cost — the amortized shape a real deployment pays.
    */
  def zorderedEvents(spark: SparkSession, dir: String): String =
    graft.SessionCache.getOrElseUpdate(spark, ("layoutZordered", dir)) {
      val tag = graft.SessionCache.scratchTag(spark, dir)
      val path = s"${System.getProperty("java.io.tmpdir")}/graft-zordered-$tag/events"
      writeZOrderedIndexed(graft.Tables.load(spark, dir, "events"), path,
        "user_id", "value")
      path
    }

  /** Driver face: a selective two-dim range slice of events served by
    * the stats-pruned scan over the Z-ordered layout. The oracle runs
    * the identical predicate over the RAW parquet, so any row a pruned
    * file should have contributed (or any spurious row) hash-
    * mismatches — file skipping must be a pure physical optimization.
    */
  def zorderSkipRead(spark: SparkSession, dir: String): DataFrame =
    readSkipping(spark, zorderedEvents(spark, dir),
      "user_id", 0, 5, "value", 50, 150)
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy("event_id")

  val zorderSkipReadSql: String =
    """SELECT event_id, user_id, value FROM events
      |WHERE user_id BETWEEN 0 AND 5 AND value BETWEEN 50 AND 150
      |ORDER BY event_id""".stripMargin

  /** Small-file compaction — the OPTIMIZE / rewriteDataFiles analog.
    * At 100 TB it is the FILE COUNT, not the byte count, that degrades
    * a table (driver listing + planning memory, a task per tiny file,
    * open/footer overhead per scan); high-parallelism streaming writes
    * produce exactly that fragmentation. The rewrite needs NO shuffle:
    * Spark's file-source scan already bin-packs small files into
    * read splits of `spark.sql.files.maxPartitionBytes` (+ openCost
    * per file), so reading the fragmented directory and writing it
    * back emits one healthy file per packed split — compaction rides
    * the scan's own packing instead of a round-robin exchange.
    * Returns (files before, files after).
    */
  def compact(spark: SparkSession, inPath: String, outPath: String): (Int, Int) = {
    def parquetFiles(p: String): Int = {
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(hp).count(_.getPath.getName.endsWith(".parquet"))
    }
    spark.read.parquet(inPath).write.mode("overwrite").parquet(outPath)
    (parquetFiles(inPath), parquetFiles(outPath))
  }

  /** Memoized fragment-then-compact of the events table (the
    * `layout_compacted` artifact): 64-way fragmented write (the
    * streaming-job spray this operator exists to repair), then one
    * shuffle-free compaction pass. Returns the compacted path.
    */
  def compactedEvents(spark: SparkSession, dir: String): String =
    graft.SessionCache.getOrElseUpdate(spark, ("layoutCompacted", dir)) {
      val tag = graft.SessionCache.scratchTag(spark, dir)
      val root = s"${System.getProperty("java.io.tmpdir")}/graft-compact-$tag"
      val frag = s"$root/frag"
      val out = s"$root/events"
      graft.Tables.load(spark, dir, "events").repartition(64)
        .write.mode("overwrite").parquet(frag)
      val (before, after) = compact(spark, frag, out)
      require(after < before,
        s"compaction did not reduce the file count ($before -> $after)")
      out
    }

  /** Driver face: a per-day accounting of the compacted table. The
    * oracle computes the identical accounting from the RAW parquet, so
    * a row lost or duplicated anywhere in the fragment → compact →
    * read chain hash-mismatches — compaction must be a pure physical
    * rewrite.
    */
  def compactionRead(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(compactedEvents(spark, dir))
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy("day")

  val compactionReadSql: String =
    """SELECT strftime(ts, '%Y-%m-%d') AS day, count(*) AS n_events,
      |  round(sum(value), 2) AS sum_value
      |FROM events GROUP BY 1 ORDER BY day""".stripMargin
}
