package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.queries.Analytics

/** Continuous Population-Stability-Index monitor — the deployed form
  * of `value_psi` ([[Analytics.valuePsi]]): in production the
  * reference distribution is FIXED when the model ships and the live
  * stream is compared against it, so the streaming face uses the
  * bootstrap-then-immutable pattern ([[StreamingKMeansAssignJob]]'s
  * model discipline applied to the decile table):
  *
  *   1. the FIRST non-empty batch fits per-type decile boundaries
  *      (the batch face's exact-percentile fit) and persists them plus
  *      its own bucket counts as the immutable REFERENCE;
  *   2. every batch (including the bootstrap) buckets itself map-side
  *      against the broadcast boundary table and appends its
  *      (event_type, bucket, n) counts — additive when each event
  *      arrives once, so the [[AdditiveDeltaState]] contract applies
  *      verbatim; state is ≤ 10·¦types¦ rows;
  *   3. [[readPsi]] folds reference-vs-maintained counts through the
  *      SAME smoothed-PSI projection as the batch entry. Directly
  *      after bootstrap the maintained counts equal the reference, so
  *      PSI is exactly 0 — drift shows up as later batches shift the
  *      mix (the retrain alarm, live instead of nightly).
  */
class StreamingPsiJob(spark: SparkSession, modelPath: String,
                      compactEvery: Int = 16) {

  private def boundsDir = s"$modelPath/bounds"
  private def refDir = s"$modelPath/reference"
  private def fs = new Path(modelPath)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private[graft] val state = new AdditiveDeltaState(spark, modelPath,
    "psi_counts", Seq("event_type", "bucket"), Seq("n"), compactEvery)

  /** The persisted boundary table, once bootstrapped. */
  def readBounds(): Option[DataFrame] =
    if (fs.exists(new Path(boundsDir))) Some(spark.read.parquet(boundsDir))
    else None

  private def bucketCounts(events: DataFrame, bounds: DataFrame): DataFrame =
    events.select(col("event_type"), col("value"))
      .join(broadcast(bounds), "event_type")
      .withColumn("bucket", Analytics.psiBucket)
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n"))

  /** One micro-batch of (event_type, value, ...) rows — each event
    * arrives once. */
  def processBatch(events: DataFrame, batchId: Long): Unit = {
    // an empty batch must never reach the bootstrap: a boundary table
    // fitted on zero rows would become the permanent reference
    if (events.isEmpty) return
    val bounds = readBounds().getOrElse {
      val b = Analytics.psiBounds(events.select(col("event_type"), col("value")))
      b.write.mode("overwrite").parquet(boundsDir)
      val persisted = spark.read.parquet(boundsDir)
      bucketCounts(events, persisted).write.mode("overwrite").parquet(refDir)
      persisted
    }
    state.append(bucketCounts(events, bounds), batchId)
  }

  private def empty: DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Int, Long)].toDF("event_type", "bucket", "n")
  }

  /** PSI of the maintained stream counts against the immutable
    * reference — the batch entry's smoothed fold, with the reference
    * as the "first" side. n_first/n_second report the two masses.
    */
  def readPsi(): DataFrame = {
    val ref =
      if (fs.exists(new Path(refDir))) spark.read.parquet(refDir) else empty
    val cur = state.state().getOrElse(empty)
    Analytics.psiFold(
      ref.select(col("event_type"), col("bucket"), col("n").as("a"))
        .join(cur.select(col("event_type"), col("bucket"), col("n").as("b")),
          Seq("event_type", "bucket"), "full")
        .na.fill(0L, Seq("a", "b")))
  }

  /** Run continuously over a streaming events frame. */
  def start(events: DataFrame, checkpoint: String,
            trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) => processBatch(batch, batchId) }
      .trigger(trigger)
      .start()
}
