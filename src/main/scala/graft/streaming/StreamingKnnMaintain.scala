package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.similarity.Ann

/** Streaming k-NN-graph maintenance — the continuous face of
  * [[graft.similarity.Ann.knnGraphIncremental]], built on the
  * persisted-artifact pattern [[StreamingAnnIngestJob]] establishes:
  *
  *   1. the first non-empty batch trains the coarse quantizer and
  *      persists it — immutable afterwards, so cell membership is
  *      stable and every later batch assigns map-side with no
  *      retraining;
  *   2. every batch appends its cell assignment under a per-batch
  *      directory (idempotent overwrite under at-least-once replay);
  *   3. ONLY the batch's DIRTY cells re-rank their edge lists — a
  *      clean cell's top-k provably cannot change because candidates
  *      never cross cells (the [[Ann.knnGraphIncremental]] IVM bound,
  *      spec'd there as bit-identical carry-over) — and the edge
  *      store is parquet PARTITIONED BY cell written under dynamic
  *      partition overwrite, so the publish touches exactly the dirty
  *      partitions. Per-batch cost is Σ|dirty cell|² + the batch
  *      assignment scan, never the accumulated corpus.
  *
  * Replay consistency: the per-batch assignment overwrite is
  * byte-identical (immutable quantizer ⇒ same cells), and the edge
  * recompute is a pure function of (accumulated assignment, dirty
  * cells) — a replayed batch re-publishes the same edge partitions it
  * published the first time, so the graph converges to exactly the
  * batch recompute regardless of replays (asserted in the spec).
  */
class StreamingKnnMaintainJob(spark: SparkSession, indexPath: String,
                              nCells: Int = 16, k: Int = 5) {

  private def assignedDir = s"$indexPath/assigned"
  private def centroidsDir = s"$indexPath/centroids"
  private def edgesDir = s"$indexPath/edges"
  private def fs = new Path(indexPath)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val geometryMarker = new Path(indexPath, "_knn_geometry")
  private def geometry = s"knn:cells=$nCells,k=$k"

  private def checkOrWriteGeometry(): Unit = {
    if (fs.exists(geometryMarker)) {
      val in = fs.open(geometryMarker)
      val found = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      if (found != geometry) throw new IllegalStateException(
        s"knn graph at $indexPath was built with '$found' but this job is " +
          s"configured for '$geometry' — rebuild the graph")
    } else {
      val out = fs.create(geometryMarker, true)
      try out.write((geometry + "\n").getBytes("UTF-8")) finally out.close()
    }
  }

  def readCentroids(): Option[DataFrame] =
    if (fs.exists(new Path(centroidsDir))) Some(spark.read.parquet(centroidsDir))
    else None

  /** The accumulated (vec_id, embedding, cell) assignment. */
  def readAssigned(): Option[DataFrame] =
    if (fs.exists(new Path(assignedDir)) &&
        fs.listStatus(new Path(assignedDir)).nonEmpty)
      Some(spark.read.parquet(assignedDir).select("vec_id", "embedding", "cell"))
    else None

  /** The current edge list (vec_id, neighbor_id, rank, cosine). Empty
    * frame before the first commit.
    */
  def readGraph(): DataFrame =
    if (fs.exists(new Path(edgesDir)))
      spark.read.parquet(edgesDir).select("vec_id", "neighbor_id", "rank", "cosine")
    else spark.range(0).select(col("id").as("vec_id"), col("id").as("neighbor_id"),
      lit(1).as("rank"), lit(0.0).as("cosine")).limit(0)

  /** One micro-batch: bootstrap the quantizer on first contact, assign
    * the batch map-side, append its assignment, re-rank the dirty
    * cells' edge lists against the accumulated assignment.
    */
  def processBatch(embs: DataFrame, batchId: Long): Unit = {
    checkOrWriteGeometry()
    // an empty batch must not reach the bootstrap (an empty quantizer
    // would permanently assign every later batch to zero cells)
    if (embs.isEmpty) return
    val centroids = readCentroids().getOrElse {
      val (c, _) = Ann.ivfIndex(embs, nCells)
      require(!c.isEmpty,
        s"refusing to persist an empty IVF quantizer for $indexPath")
      c.write.mode("overwrite").parquet(centroidsDir)
      spark.read.parquet(centroidsDir)
    }
    val newAssigned = Ann.assignCells(centroids, embs)
      .localCheckpoint(true)
    newAssigned.write.mode("overwrite").parquet(s"$assignedDir/batch=$batchId")
    val dirty = newAssigned.select("cell").distinct()
    val all = readAssigned().get
    // the IVM step: candidates never cross cells, so re-ranking the
    // dirty cells IS the full recompute for every affected point
    val dirtyAssigned = all.join(broadcast(dirty), "cell")
    val dirtyEdges = Ann.knnGraphEdges(dirtyAssigned, k)
      .join(all.select(col("vec_id"), col("cell")), "vec_id")
      .select("cell", "vec_id", "neighbor_id", "rank", "cosine")
    // dynamic partition overwrite: ONLY the dirty cell partitions are
    // replaced; clean cells' files are untouched (asserted in the spec
    // via file modification times)
    dirtyEdges.write
      .partitionBy("cell")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .parquet(edgesDir)
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
