package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.TextFunctions

/** Streaming corpus-vocabulary maintenance — the streaming face of
  * [[graft.functions.TextFunctions.tokenVocab]] for continuous document
  * ingest (the pattern [[StreamingNearDedupJob]] establishes for the
  * band index, applied to token statistics):
  *
  *   1. each micro-batch computes its own (token, n, n_docs) delta
  *      map-side + one batch-local groupBy (docs never span batches, so
  *      per-batch doc frequencies are ADDITIVE — the delta is a pure
  *      function of the batch);
  *   2. the delta appends under a per-batch directory; the queryable
  *      vocabulary at any point is one sum-combine over the deltas
  *      (mergeable state, like the engine's sketches);
  *   3. compaction periodically folds the delta directories so listing
  *      cost stays bounded — sum-of-sums equals the original sum, so
  *      folding never changes the vocabulary.
  *
  * At 100 TB/day this is the right shape for corpus stats: per-batch
  * cost scales with the batch, state grows with the VOCABULARY (not
  * the corpus), and nightly full recounts disappear. Consistency
  * contract: `batch=<id>` overwrite makes replay idempotent, and the
  * `_compacted_through` marker (published atomically with the folded
  * delta, same as the ANN/near-dup jobs) keeps replay idempotent
  * ACROSS compaction — a replayed batch already folded into `batch=0`
  * is skipped, never double-counted.
  */
class StreamingVocabJob(spark: SparkSession, statePath: String,
                        compactEvery: Int = 16) {

  private def deltaDir = s"$statePath/vocab"
  private def fs = new Path(statePath)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def liveDir = new Path(deltaDir)
  private def preCompactDir = new Path(s"$statePath/_pre_compact")
  private val compactedMarkerName = "_compacted_through"

  private def recoverIfNeeded(): Unit =
    if (!fs.exists(liveDir) && fs.exists(preCompactDir)) {
      if (!fs.rename(preCompactDir, liveDir)) throw new IllegalStateException(
        s"could not restore $preCompactDir to $liveDir after an interrupted compaction")
    }

  /** Highest batch id folded into `batch=0`; -1 before any compaction. */
  private[graft] def compactedThrough(): Long = {
    recoverIfNeeded()
    val m = new Path(liveDir, compactedMarkerName)
    if (fs.exists(m)) {
      val in = fs.open(m)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    } else -1L
  }

  /** The accumulated (token, n, n_docs) deltas, if any batch committed. */
  private def readDeltas(): Option[DataFrame] = {
    recoverIfNeeded()
    if (fs.exists(liveDir) && fs.listStatus(liveDir).nonEmpty)
      Some(spark.read.parquet(deltaDir).select("token", "n", "n_docs"))
    else None
  }

  /** The current vocabulary: one sum-combine over the deltas, ranked
    * like the batch face. Empty before the first commit.
    */
  def readVocab(k: Int = 100): DataFrame = readDeltas() match {
    case None => spark.emptyDataFrame
      .select(lit(0).as("rank"), lit("").as("token"), lit(0L).as("n"), lit(0L).as("n_docs"))
      .limit(0)
    case Some(d) =>
      val top = d.groupBy("token")
        .agg(sum("n").as("n"), sum("n_docs").as("n_docs"))
        .orderBy(col("n").desc, col("token"))
        .limit(k)
      top.withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("n").desc, col("token"))))
        .select("rank", "token", "n", "n_docs")
  }

  /** One micro-batch: append the batch's delta, fold once enough
    * directories accumulate (observed count — replays can't starve or
    * double-run the policy).
    */
  def processBatch(docs: DataFrame, batchId: Long): Unit = {
    // a batch id already folded into batch=0 is an at-least-once replay
    // across a compaction — re-appending would double-count its tokens
    if (batchId <= compactedThrough()) return
    TextFunctions.docTokenCounts(docs)
      .groupBy("token")
      .agg(sum("tf").as("n"), count(lit(1)).as("n_docs"))
      .write.mode("overwrite").parquet(s"$deltaDir/batch=$batchId")
    if (batchDirCount() >= compactEvery) compact()
  }

  private[graft] def batchDirCount(): Int = {
    recoverIfNeeded()
    if (fs.exists(liveDir)) fs.listStatus(liveDir)
      .count(_.getPath.getName.startsWith("batch=")) else 0
  }

  /** Fold the per-batch deltas into one (sum-of-sums == sum; the
    * two-rename displaced-live protocol and crash-window analysis are
    * [[StreamingNearDedupJob.compact]]'s).
    */
  def compact(): Unit = readDeltas().foreach { d =>
    val foldedThrough = (compactedThrough() +: fs.listStatus(liveDir).toSeq
      .map(_.getPath.getName).filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)).max
    val folded = d.groupBy("token").agg(sum("n").as("n"), sum("n_docs").as("n_docs"))
    val staged = new Path(s"$statePath/_compacting")
    fs.delete(staged, true)
    folded.write.parquet(new Path(staged, "batch=0").toString)
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
        s"compaction could not publish $liveDir (restored previous state)")
    }
    fs.delete(preCompactDir, true)
  }

  /** Run continuously over a streaming (doc_id, text) frame. */
  def start(docs: DataFrame, checkpoint: String,
            trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) => processBatch(batch, batchId) }
      .trigger(trigger)
      .start()
}
