package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.similarity.Ann

/** Streaming ANN-index ingest — the streaming face of
  * [[graft.similarity.Ann.ivfpqIndex]] for continuous embedding
  * arrival (the pattern [[StreamingNearDedupJob]] establishes for the
  * band index, applied to the IVF-PQ artifacts):
  *
  *   1. the FIRST batch trains the quantizers (coarse centroids + PQ
  *      codebooks) and persists them — after that they are immutable,
  *      which is what keeps every later batch retraining-free and the
  *      whole code table self-consistent;
  *   2. every batch encodes ITSELF map-side against the persisted
  *      quantizers (`Ann.ivfpqAssign` — cell argmin + native PQ encode)
  *      and appends its codes under a per-batch directory;
  *   3. queries at any point probe the accumulated code table through
  *      the ordinary persisted-index path (`ivfpqTopKFromIndex`).
  *
  * Cost per batch scales with the batch (nothing old is re-encoded),
  * and the index holds ~4·nSub bytes per vector — the property that
  * lets a continuously-embedding pipeline keep its similarity index
  * current instead of rebuilding nightly.
  *
  * Consistency contract: the per-batch code directory makes the append
  * idempotent under at-least-once replay (`batch=<id>` is simply
  * overwritten), and because the quantizers never change after batch
  * one, a replayed batch writes byte-identical codes. Replay stays
  * idempotent ACROSS compaction too: the compacted directory carries a
  * `_compacted_through` marker (published by the same rename that
  * publishes the folded codes, so the two can never disagree) holding
  * the highest batch id folded into it, and [[processBatch]] skips any
  * batch id at or below the marker — a batch replayed after its rows
  * were folded into `batch=0` can not re-append them as duplicate
  * vec_ids that the top-k window would rank twice. A quantizer
  * marker records the (nCells, nSub, nCodes) configuration — an engine
  * restarted with a different geometry fails loudly instead of mixing
  * incompatible codes. Compaction folds the per-batch directories with
  * the same displaced-live/two-rename protocol as the band index, so
  * no crash point loses codes. Empty micro-batches are no-ops: in
  * particular an empty FIRST batch must not train-and-persist empty
  * quantizers (which would permanently encode every later batch to
  * zero rows) — the first non-empty batch bootstraps instead.
  */
class StreamingAnnIngestJob(spark: SparkSession, indexPath: String,
                            nCells: Int = 16, nSub: Int = 16, nCodes: Int = 16,
                            compactEvery: Int = 16) {

  private def codesDir = s"$indexPath/codes"
  private def centroidsDir = s"$indexPath/centroids"
  private def codebooksDir = s"$indexPath/codebooks"
  private def fs = new Path(indexPath)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val geometryMarker = new Path(indexPath, "_pq_geometry")
  private def geometry = s"ivfpq:cells=$nCells,sub=$nSub,codes=$nCodes"

  private def checkOrWriteGeometry(): Unit = {
    if (fs.exists(geometryMarker)) {
      val in = fs.open(geometryMarker)
      val found = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      if (found != geometry) throw new IllegalStateException(
        s"index at $indexPath was built with '$found' but this job is configured " +
          s"for '$geometry' — rebuild the index")
    } else {
      val out = fs.create(geometryMarker, true)
      try out.write((geometry + "\n").getBytes("UTF-8")) finally out.close()
    }
  }

  private def liveDir = new Path(codesDir)
  private def preCompactDir = new Path(s"$indexPath/_pre_compact")
  // lives INSIDE the codes dir (underscore-prefixed → invisible to the
  // parquet reader) so the publish rename commits marker + folded codes
  // as one atomic unit
  private val compactedMarkerName = "_compacted_through"

  /** Highest batch id whose rows are inside the compacted `batch=0`
    * directory; -1 before any compaction. Appends at or below this id
    * are replays of already-folded batches and must be skipped.
    */
  private[graft] def compactedThrough(): Long = {
    recoverIfNeeded()
    val m = new Path(liveDir, compactedMarkerName)
    if (fs.exists(m)) {
      val in = fs.open(m)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    } else -1L
  }

  private def recoverIfNeeded(): Unit =
    if (!fs.exists(liveDir) && fs.exists(preCompactDir)) {
      if (!fs.rename(preCompactDir, liveDir)) throw new IllegalStateException(
        s"could not restore $preCompactDir to $liveDir after an interrupted compaction")
    }

  /** The persisted quantizers, if the bootstrap batch has committed
    * them yet.
    */
  def readQuantizers(): Option[(DataFrame, DataFrame)] =
    if (fs.exists(new Path(centroidsDir)) && fs.exists(new Path(codebooksDir)))
      Some((spark.read.parquet(centroidsDir), spark.read.parquet(codebooksDir)))
    else None

  /** The accumulated code table, if any batch has committed one. */
  def readCodes(): Option[DataFrame] = {
    recoverIfNeeded()
    if (fs.exists(liveDir) && fs.listStatus(liveDir).nonEmpty)
      Some(spark.read.parquet(codesDir).select("vec_id", "cell", "codes", "dnorm2"))
    else None
  }

  /** One micro-batch: bootstrap quantizers on first contact, encode the
    * batch against the persisted artifacts, append its codes, fold the
    * per-batch directories once enough accumulate (observed count, not
    * batchId arithmetic — replays can't starve or double-run the
    * policy).
    */
  def processBatch(embs: DataFrame, batchId: Long): Unit = {
    checkOrWriteGeometry()
    // a batch id already folded into batch=0 is an at-least-once replay
    // that crossed a compaction — re-appending it would duplicate its
    // vec_ids and rank them twice in the top-k window
    if (batchId <= compactedThrough()) return
    // an empty batch has nothing to encode — and must never reach the
    // bootstrap below, where quantizers trained on zero rows would be
    // persisted as the immutable artifacts and permanently encode every
    // later batch to zero rows
    if (embs.isEmpty) return
    val (centroids, codebooks) = readQuantizers().getOrElse {
      val (c, b, _) = Ann.ivfpqIndex(embs, nCells, nSub, nCodes)
      require(!c.isEmpty && !b.isEmpty,
        s"refusing to persist empty IVF-PQ quantizers for $indexPath — " +
          "training produced no centroids/codebooks; the index would be " +
          "permanently poisoned (every later batch would encode zero rows)")
      // two independent writes, but ordered so a crash between them
      // leaves readQuantizers() false (codebooks land first, the
      // centroid write PUBLISHES) — the next batch just re-trains
      b.write.mode("overwrite").parquet(codebooksDir)
      c.write.mode("overwrite").parquet(centroidsDir)
      (spark.read.parquet(centroidsDir), spark.read.parquet(codebooksDir))
    }
    Ann.ivfpqAssign(centroids, codebooks, embs)
      .write.mode("overwrite").parquet(s"$codesDir/batch=$batchId")
    if (batchDirCount() >= compactEvery) compact()
  }

  private[graft] def batchDirCount(): Int = {
    recoverIfNeeded()
    if (fs.exists(liveDir)) fs.listStatus(liveDir)
      .count(_.getPath.getName.startsWith("batch=")) else 0
  }

  /** Fold per-batch code directories into one (same displaced-live /
    * two-rename protocol as the band index — see
    * [[StreamingNearDedupJob.compact]] for the crash-window analysis).
    */
  def compact(): Unit = readCodes().foreach { codes =>
    // highest batch id being folded, joined with any previous marker
    // (batch=0 from an earlier compaction no longer carries the original
    // ids — the marker does, monotonically)
    val foldedThrough = (compactedThrough() +: fs.listStatus(liveDir).toSeq
      .map(_.getPath.getName).filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)).max
    val staged = new Path(s"$indexPath/_compacting")
    fs.delete(staged, true)
    codes.write.parquet(new Path(staged, "batch=0").toString)
    // marker rides inside the staged dir: the publish rename below
    // commits it atomically with the folded codes
    val mout = fs.create(new Path(staged, compactedMarkerName), true)
    try mout.write((foldedThrough.toString + "\n").getBytes("UTF-8")) finally mout.close()
    fs.delete(preCompactDir, true)
    if (!fs.rename(liveDir, preCompactDir)) throw new IllegalStateException(
      s"compaction could not displace $liveDir (concurrent writer?)")
    if (!fs.rename(staged, liveDir)) {
      if (!fs.rename(preCompactDir, liveDir)) throw new IllegalStateException(
        s"compaction could not publish $liveDir AND could not restore " +
          s"$preCompactDir — restore it manually before the next batch")
      throw new IllegalStateException(
        s"compaction could not publish $liveDir (restored previous index)")
    }
    fs.delete(preCompactDir, true)
  }

  /** Top-k probe over everything ingested so far. Empty before the
    * first commit.
    */
  def queryIndex(queries: DataFrame, k: Int = 5, nProbe: Int = 6): DataFrame =
    (readQuantizers(), readCodes()) match {
      case (Some((c, b)), Some(codes)) => Ann.ivfpqTopKFromIndex(c, b, codes, queries, k, nProbe)
      case _ => queries.select(
        org.apache.spark.sql.functions.col("vec_id").as("query_id"),
        org.apache.spark.sql.functions.col("vec_id").as("neighbor_id"),
        org.apache.spark.sql.functions.lit(1).as("rank"),
        org.apache.spark.sql.functions.lit(0.0).as("cosine")).limit(0)
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
