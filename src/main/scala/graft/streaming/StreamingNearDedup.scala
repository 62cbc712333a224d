package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.dedup.Dedup

/** Streaming near-duplicate detection — the streaming face of
  * [[graft.dedup.Dedup.incrementalCandidatesFromBands]] for continuous
  * ingest: the corpus seen so far is represented ONLY by its persisted
  * MinHash band index, and each micro-batch
  *
  *   1. signs its own documents map-side (native banding expression);
  *   2. band-joins them against the persisted index (batch-vs-corpus)
  *      and against themselves (within-batch);
  *   3. hands the candidate pairs to the caller's sink;
  *   4. appends its bands to the index under a per-batch directory.
  *
  * Cost per batch scales with the batch (nothing old is re-signed), and
  * index growth is ~16 small rows per document — the property that lets
  * a 100 TB/day ingest keep near-dup checking continuous instead of
  * re-running corpus-wide LSH nightly.
  *
  * Consistency contract: the per-batch index directory makes the append
  * idempotent under at-least-once replay (`batch=<id>` is simply
  * overwritten), and a replayed batch re-emits the same candidate SET —
  * duplicated band rows can never mint new pairs because candidates are
  * `distinct()` by construction. Candidates are emitted BEFORE the
  * batch's bands are appended, so a batch never pairs with itself
  * through the corpus index on the happy path (and on replay such pairs
  * collapse into the within-batch set). Replay stays idempotent ACROSS
  * compaction too: the compacted directory carries a
  * `_compacted_through` marker (published by the same rename that
  * publishes the folded bands) holding the highest batch id folded into
  * it, and a replayed batch at or below the marker re-emits its
  * candidates but does NOT re-append bands already inside `batch=0` —
  * the index never accumulates duplicate band rows across
  * crash-at-compaction replays.
  */
class StreamingNearDedupJob(spark: SparkSession, indexPath: String,
                            onCandidates: (DataFrame, Long) => Unit,
                            compactEvery: Int = 16) {

  private def indexDir = s"$indexPath/bands"
  private def fs = new Path(indexPath)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Band hashes only join meaningfully against bands produced by the
    * SAME hash family — a marker file pins the family the index was
    * built with, so an engine upgrade that changes the banding can
    * never silently band-join old and new hashes into zero matches
    * (it fails loudly and asks for a rebuild instead).
    */
  private val formatMarker = new Path(indexPath, "_band_format")

  private def checkOrWriteFormat(): Unit = {
    if (fs.exists(formatMarker)) {
      val in = fs.open(formatMarker)
      val found = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      if (found != Dedup.BandFormat) throw new IllegalStateException(
        s"band index at $indexPath was built with '$found' but this engine " +
          s"produces '${Dedup.BandFormat}' — rebuild the index")
    } else if (readIndex().isDefined) {
      // bands exist but carry no marker: an index of unknown provenance
      // (e.g. built before markers existed) must NOT be silently
      // adopted — its hashes may predate the current band family, and
      // stamping it would convert a loud failure into zero matches
      throw new IllegalStateException(
        s"band index at $indexPath has no format marker — rebuild it (or, " +
          s"if it is KNOWN to be '${Dedup.BandFormat}', write that to ${formatMarker.getName})")
    } else {
      val out = fs.create(formatMarker, true)
      try out.write((Dedup.BandFormat + "\n").getBytes("UTF-8")) finally out.close()
    }
  }

  private def liveDir = new Path(indexDir)
  private def preCompactDir = new Path(s"$indexPath/_pre_compact")
  // lives INSIDE the bands dir (underscore-prefixed → invisible to the
  // parquet reader) so the publish rename commits marker + folded bands
  // as one atomic unit
  private val compactedMarkerName = "_compacted_through"

  /** Highest batch id whose bands are inside the compacted `batch=0`
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

  /** If a compaction crashed between displacing the live dir and
    * publishing the staged one, the previous index is still intact at
    * [[preCompactDir]] — restore it before reading anything.
    */
  private def recoverIfNeeded(): Unit =
    if (!fs.exists(liveDir) && fs.exists(preCompactDir)) {
      if (!fs.rename(preCompactDir, liveDir)) throw new IllegalStateException(
        s"could not restore $preCompactDir to $liveDir after an interrupted compaction")
    }

  /** The persisted band index, if any batch has committed one yet. */
  def readIndex(): Option[DataFrame] = {
    recoverIfNeeded()
    if (fs.exists(liveDir) && fs.listStatus(liveDir).nonEmpty)
      Some(spark.read.parquet(indexDir).select("doc_id", "band_id", "band_hash"))
    else None
  }

  /** One micro-batch: emit candidates, append the batch's bands, and
    * fold the index once enough per-batch directories accumulate.
    * Compaction runs HERE — inside the single writer's batch callback,
    * between an append and the next read — so the "never concurrently
    * with an append" contract of [[compact]] holds with no external
    * scheduler. The trigger is the OBSERVED directory count, not
    * `batchId % N`: replayed or skipped batch ids can't starve (or
    * double-run) the policy, and listing cost stays bounded by
    * `compactEvery` forever.
    */
  def processBatch(docs: DataFrame, batchId: Long): Unit = {
    checkOrWriteFormat()
    val newBands = Dedup.lshBandIndex(docs).localCheckpoint(true)
    val candidates = readIndex() match {
      case Some(idx) => Dedup.incrementalCandidatesFromBands(idx, newBands)
      case None => Dedup.lshCandidatesFromIndex(newBands)
    }
    onCandidates(candidates, batchId)
    // a batch id already folded into batch=0 is an at-least-once replay
    // that crossed a compaction: its candidates were just re-emitted
    // (the sink is at-least-once), but its bands are already inside the
    // compacted directory — re-appending them would permanently
    // duplicate the rows and re-pay the join on every later batch
    if (batchId > compactedThrough())
      newBands.write.mode("overwrite").parquet(s"$indexDir/batch=$batchId")
    if (batchDirCount() >= compactEvery) compact()
  }

  /** Number of per-batch directories currently in the live index. */
  private[graft] def batchDirCount(): Int = {
    recoverIfNeeded()
    if (fs.exists(liveDir)) fs.listStatus(liveDir)
      .count(_.getPath.getName.startsWith("batch=")) else 0
  }

  /** Fold the accumulated per-batch directories into one compacted
    * directory. Run periodically (e.g. every N batches, or nightly):
    * file-listing cost otherwise grows with every batch forever. Run it
    * from the single writer (between batches), never concurrently with
    * an append.
    *
    * Crash safety: the swap is two renames, not one, so there IS a
    * window where the live dir is absent — but the full previous index
    * sits at `_pre_compact` throughout it, and [[recoverIfNeeded]]
    * (invoked by every read) restores it on the next touch, so no crash
    * point loses data or silently empties the corpus: either the old
    * index is (re)stored live, or the new one is published.
    */
  def compact(): Unit = readIndex().foreach { idx =>
    // highest batch id being folded, joined with any previous marker
    // (batch=0 from an earlier compaction no longer carries the original
    // ids — the marker does, monotonically)
    val foldedThrough = (compactedThrough() +: fs.listStatus(liveDir).toSeq
      .map(_.getPath.getName).filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)).max
    val staged = new Path(s"$indexPath/_compacting")
    fs.delete(staged, true)
    // keep the batch=<n> partition layout: later appends land beside
    // batch=0 without conflicting with partition discovery (a replayed
    // folded batch is skipped via the marker, never re-appended)
    idx.write.parquet(new Path(staged, "batch=0").toString)
    // marker rides inside the staged dir: the publish rename below
    // commits it atomically with the folded bands
    val mout = fs.create(new Path(staged, compactedMarkerName), true)
    try mout.write((foldedThrough.toString + "\n").getBytes("UTF-8")) finally mout.close()
    fs.delete(preCompactDir, true)
    if (!fs.rename(liveDir, preCompactDir)) throw new IllegalStateException(
      s"compaction could not displace $liveDir (concurrent writer?)")
    if (!fs.rename(staged, liveDir)) {
      if (!fs.rename(preCompactDir, liveDir)) throw new IllegalStateException(
        s"compaction could not publish $liveDir AND could not restore " +
          s"$preCompactDir — restore it manually before the next batch")
      throw new IllegalStateException(s"compaction could not publish $liveDir (restored previous index)")
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
