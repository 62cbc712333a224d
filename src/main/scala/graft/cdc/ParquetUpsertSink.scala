package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed upsert sink over bucket-partitioned parquet — the engine's
  * stand-in for the reference's Delta table
  * (/root/reference/src/main/scala/com/sg/job/streaming/StreamingJobExecutor.scala:20,
  * `DeltaTable.forPath(... "/mnt/delta/events")`).
  *
  * State layout: `statePath/bucket=<b>/…parquet` where
  * `b = pmod(hash(key), numBuckets)`.
  *
  * Scale design: a micro-batch touches only the buckets its keys hash
  * into. We read ONLY those buckets (partition pruning on the `bucket`
  * partition column), merge, and overwrite ONLY those directories
  * (dynamic partition overwrite). A 100 TB state with a 1 GB batch
  * rewrites ~batch-sized data, not the world — the same dirty-file
  * story Delta's merge gives, built from plain parquet + hash
  * partitioning.
  */
class ParquetUpsertSink(spark: SparkSession, statePath: String,
                        keyCols: Seq[String], numBuckets: Int = 64) {

  private def bucketCol = pmod(hash(keyCols.map(col): _*), lit(numBuckets)).as("bucket")

  private def stateExists: Boolean = {
    val p = new org.apache.hadoop.fs.Path(statePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  def readState(): DataFrame = spark.read.parquet(statePath).drop("bucket")

  /** Merge one changelog micro-batch (keyCols ++ dataCols ++ op, ts_ms,
    * seq) into the state. Idempotent per batchId is delegated to the
    * caller's checkpointing (foreachBatch replays whole batches).
    */
  def merge(batch: DataFrame, batchId: Long): Unit = {
    val dataCols = batch.columns.filterNot((keyCols ++ Seq("op", "ts_ms", "seq")).contains).toSeq
    if (!stateExists) {
      val state0 = CdcOps.latestState(batch, keyCols, dataCols)
        .drop("n_changes")
      write(state0)
    } else {
      // Prune to dirty buckets only: collect the distinct bucket ids of
      // this batch (tiny: ≤ numBuckets values), then read just those
      // partitions of the state.
      val batchB = batch.withColumn("bucket", bucketCol)
      val dirty = batchB.select("bucket").distinct().collect().map(_.getInt(0))
      val base = spark.read.parquet(statePath)
        .filter(col("bucket").isin(dirty.toSeq: _*))
        .drop("bucket")
      // Materialize before overwriting the directory we just read
      // (severing lineage is what makes read-then-overwrite safe here;
      // at cluster scale this would be a new version directory + swap).
      val merged = CdcOps.mergeChangeSet(base, batch, keyCols, dataCols).localCheckpoint(true)
      write(merged)
    }
  }

  private def write(state: DataFrame): Unit = {
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      state.withColumn("bucket", bucketCol)
        .repartition(col("bucket"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(statePath)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }
}
