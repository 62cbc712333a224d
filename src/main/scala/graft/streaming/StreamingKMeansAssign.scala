package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.similarity.KMeans

/** Streaming cluster assignment — the model-serving face of
  * [[KMeans.embeddingKmeans]] for a continuous embedding ingest
  * (the bootstrap-then-immutable pattern of
  * [[StreamingAnnIngestJob]]'s quantizers applied to the centroid
  * table):
  *
  *   1. the FIRST non-empty batch trains the k-means model with the
  *      SAME Lloyd machinery as the batch face and persists the
  *      centroid table — immutable afterwards, which is what makes
  *      every assignment replay-reproducible (a centroid table that
  *      drifted between attempts would assign a replayed batch
  *      differently);
  *   2. every batch assigns ITSELF map-side against the persisted
  *      broadcast centroids (fused codegen l2sq + partially-aggregated
  *      argmin — the batch face's plan) and appends its
  *      (vec_id, cluster_id, dist) rows under `assign/batch=<id>`,
  *      idempotent under at-least-once replay by per-batch overwrite;
  *   3. per-cluster population and inertia (Σ dist) fold in an
  *      [[AdditiveDeltaState]] — both are sums over rows of a pure
  *      per-batch function (the centroids never change), so the
  *      additive replay/compaction/crash contract applies verbatim.
  *      The read face is the drift monitor a serving pipeline
  *      watches: a cluster whose mean distance creeps up is a model
  *      due for retraining.
  *
  * Per-batch cost scales with the batch (assignment is one broadcast
  * probe; nothing historical is ever rescored), and the maintained
  * stats are k-bounded regardless of corpus size.
  */
class StreamingKMeansAssignJob(spark: SparkSession, modelPath: String,
                               compactEvery: Int = 16) {

  private def centroidsDir = s"$modelPath/centroids"
  private def assignDir = s"$modelPath/assign"
  private def fs = new Path(modelPath)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private[graft] val stats = new AdditiveDeltaState(spark, modelPath,
    "cluster_stats", Seq("cluster_id"), Seq("n", "sdist"), compactEvery)

  /** The persisted model, once the bootstrap batch has committed it. */
  def readCentroids(): Option[DataFrame] =
    if (fs.exists(new Path(centroidsDir)))
      Some(spark.read.parquet(centroidsDir))
    else None

  /** One micro-batch of (vec_id, embedding) rows: bootstrap the model
    * on first contact, assign the batch against the persisted
    * centroids, append assignments + additive cluster-stat deltas.
    */
  def processBatch(embs: DataFrame, batchId: Long): Unit = {
    // an empty batch must never reach the bootstrap: a centroid table
    // trained on zero rows would be persisted as the immutable model
    // and permanently assign every later batch to nothing
    if (embs.isEmpty) return
    val widened = KMeans.widen(embs).localCheckpoint(true)
    val cents = readCentroids().getOrElse {
      val c = KMeans.train(widened)
      require(!c.isEmpty,
        s"refusing to persist an empty k-means model for $modelPath")
      c.write.mode("overwrite").parquet(centroidsDir)
      spark.read.parquet(centroidsDir)
    }
    val assigned = KMeans.assign(widened, cents)
      .select(col("vec_id"), col("cluster_id"), col("dist"))
      .localCheckpoint(true)
    // assignments first, stats second: a crash between the two writes
    // is healed by the replay overwriting both (the immutable model
    // makes the recompute byte-stable)
    assigned.write.mode("overwrite").parquet(s"$assignDir/batch=$batchId")
    stats.append(
      assigned.groupBy("cluster_id")
        .agg(count(lit(1)).as("n"), sum(col("dist")).as("sdist")),
      batchId)
  }

  /** Everything assigned so far. Empty before the first commit. */
  def readAssignments(): DataFrame =
    if (fs.exists(new Path(assignDir)))
      spark.read.parquet(assignDir).select("vec_id", "cluster_id", "dist")
    else emptyAssignments

  /** The maintained drift monitor: (cluster_id, n_vecs, mean_dist). */
  def readStats(): DataFrame = stats.state() match {
    case Some(s) => s.select(col("cluster_id"), col("n").as("n_vecs"),
      (col("sdist") / col("n")).as("mean_dist"))
    case None => emptyAssignments
      .select(col("cluster_id"), lit(0L).as("n_vecs"), lit(0.0).as("mean_dist"))
      .limit(0)
  }

  private def emptyAssignments: DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Int, Double)].toDF("vec_id", "cluster_id", "dist")
  }

  /** Run continuously over a streaming (vec_id, embedding) frame. */
  def start(embs: DataFrame, checkpoint: String,
            trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    embs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) => processBatch(batch, batchId) }
      .trigger(trigger)
      .start()
}
