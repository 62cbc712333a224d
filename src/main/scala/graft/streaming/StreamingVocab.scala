package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.TextFunctions

/** Streaming corpus-vocabulary maintenance — the streaming face of
  * [[graft.functions.TextFunctions.tokenVocab]] for continuous document
  * ingest:
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
  * the corpus), and nightly full recounts disappear. The replay /
  * compaction / crash-recovery contract (batch=<id> overwrite,
  * `_compacted_through` marker, two-rename displaced-live swap) lives
  * in [[AdditiveDeltaState]], shared with [[StreamingBigramJob]] since
  * the bigram job generalized it to multiple states per job.
  */
class StreamingVocabJob(spark: SparkSession, statePath: String,
                        compactEvery: Int = 16) {

  // pre-r7 layouts used the unsuffixed crash-recovery slot
  // `_pre_compact`: a state dir left in the mid-compaction crash window
  // by the old code must be restored, not silently abandoned (which
  // would reset the vocabulary to empty with no error)
  locally {
    val fs = new org.apache.hadoop.fs.Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val legacy = new org.apache.hadoop.fs.Path(s"$statePath/_pre_compact")
    val live = new org.apache.hadoop.fs.Path(s"$statePath/vocab")
    if (fs.exists(legacy) && !fs.exists(live)) {
      if (!fs.rename(legacy, live)) throw new IllegalStateException(
        s"could not restore legacy $legacy to $live")
    }
  }

  private[graft] val state = new AdditiveDeltaState(spark, statePath,
    "vocab", Seq("token"), Seq("n", "n_docs"), compactEvery)

  /** Highest batch id folded into `batch=0`; -1 before any compaction. */
  private[graft] def compactedThrough(): Long = state.compactedThrough()

  private[graft] def batchDirCount(): Int = state.batchDirCount()

  /** The current vocabulary: one sum-combine over the deltas, ranked
    * like the batch face. Empty before the first commit.
    */
  def readVocab(k: Int = 100): DataFrame = state.state() match {
    case None => spark.emptyDataFrame
      .select(lit(0).as("rank"), lit("").as("token"), lit(0L).as("n"), lit(0L).as("n_docs"))
      .limit(0)
    case Some(d) =>
      val top = d
        .orderBy(col("n").desc, col("token"))
        .limit(k)
      top.withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("n").desc, col("token"))))
        .select("rank", "token", "n", "n_docs")
  }

  /** One micro-batch: append the batch's delta (replay-idempotent,
    * skipped at or below the compaction marker — see
    * [[AdditiveDeltaState.append]]).
    */
  def processBatch(docs: DataFrame, batchId: Long): Unit =
    state.append(
      TextFunctions.docTokenCounts(docs)
        .groupBy("token")
        .agg(sum("tf").as("n"), count(lit(1)).as("n_docs")), batchId)

  /** Fold the per-batch deltas into one (sum-of-sums == sum). */
  def compact(): Unit = state.compact()

  /** Run continuously over a streaming (doc_id, text) frame. */
  def start(docs: DataFrame, checkpoint: String,
            trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) => processBatch(batch, batchId) }
      .trigger(trigger)
      .start()
}
