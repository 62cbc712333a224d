package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A persisted, append-per-batch parquet index with idempotent replay
  * and crash-safe compaction — the storage substrate shared by the
  * streaming dedup families ([[StreamingNearDedupJob]]'s MinHash band
  * index, [[StreamingPhashDedupJob]]'s perceptual-hash index). One
  * instance == one index directory:
  *
  *   - rows append under `live/batch=<id>` (per-batch overwrite →
  *     idempotent under at-least-once replay);
  *   - a FORMAT MARKER pins the hash family the index was built with,
  *     so an engine upgrade that changes the hashing fails loudly and
  *     asks for a rebuild instead of silently band-joining old and new
  *     hashes into zero matches;
  *   - [[compact]] folds the per-batch directories into one `batch=0`
  *     plus a `_compacted_through` marker (published by the same
  *     rename, so marker and folded rows commit atomically); appends
  *     at or below the marker are replays of already-folded batches
  *     and are skipped;
  *   - a compaction crash between the two renames leaves the full
  *     previous index at `_pre_compact`, restored by the next read
  *     ([[recoverIfNeeded]]), so no crash point loses rows.
  *
  * Single-writer discipline: call [[append]]/[[maybeCompact]] only from
  * the stream's own foreachBatch callback.
  */
class BatchedParquetIndex(spark: SparkSession, indexPath: String,
                          subdir: String, markerName: String,
                          format: String, columns: Seq[String],
                          compactEvery: Int = 16) {

  private def indexDir = s"$indexPath/$subdir"
  private def fs = new Path(indexPath)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val formatMarker = new Path(indexPath, markerName)
  private def liveDir = new Path(indexDir)
  // staging/recovery dirs are namespaced BY SUBDIR: two indexes sharing
  // one indexPath root (e.g. a bands index and a hashes index) must not
  // be able to rename each other's crashed _pre_compact into their own
  // live dir (the StreamingBigram _pre_compact_$name discipline)
  private def preCompactDir = new Path(s"$indexPath/_pre_compact_$subdir")
  private def compactingDir = new Path(s"$indexPath/_compacting_$subdir")
  // lives INSIDE the index dir (underscore-prefixed → invisible to the
  // parquet reader) so the publish rename commits marker + folded rows
  // as one atomic unit
  private val compactedMarkerName = "_compacted_through"

  def checkOrWriteFormat(): Unit = {
    if (fs.exists(formatMarker)) {
      val in = fs.open(formatMarker)
      val found = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      if (found != format) throw new IllegalStateException(
        s"index at $indexPath was built with '$found' but this engine " +
          s"produces '$format' — rebuild the index")
    } else if (readIndex().isDefined) {
      // rows exist but carry no marker: an index of unknown provenance
      // must NOT be silently adopted — its hashes may predate the
      // current family, and stamping it would convert a loud failure
      // into zero matches
      throw new IllegalStateException(
        s"index at $indexPath has no format marker — rebuild it (or, " +
          s"if it is KNOWN to be '$format', write that to ${formatMarker.getName})")
    } else {
      val out = fs.create(formatMarker, true)
      try out.write((format + "\n").getBytes("UTF-8")) finally out.close()
    }
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

  // pre-r16 builds staged at the UN-namespaced `_pre_compact`; an index
  // that crashed mid-compaction under that layout must still recover
  private def legacyPreCompactDir = new Path(s"$indexPath/_pre_compact")

  private def recoverIfNeeded(): Unit =
    if (!fs.exists(liveDir)) {
      if (fs.exists(preCompactDir)) {
        if (!fs.rename(preCompactDir, liveDir)) throw new IllegalStateException(
          s"could not restore $preCompactDir to $liveDir after an interrupted compaction")
      } else if (fs.exists(legacyPreCompactDir)) {
        // one-time migration: a legacy crash left the full previous
        // index at the shared `_pre_compact` name. Only the index whose
        // live dir is ABSENT can own it (compaction displaces exactly
        // one live dir), so adopting it here is safe — and silently
        // treating the index as empty would lose every pre-crash row.
        if (!fs.rename(legacyPreCompactDir, liveDir)) throw new IllegalStateException(
          s"could not restore legacy $legacyPreCompactDir to $liveDir " +
            "after an interrupted pre-upgrade compaction")
      }
    }

  /** The persisted index, if any batch has committed one yet. */
  def readIndex(): Option[DataFrame] = {
    recoverIfNeeded()
    if (fs.exists(liveDir) && fs.listStatus(liveDir).nonEmpty)
      Some(spark.read.parquet(indexDir).select(columns.map(org.apache.spark.sql.functions.col): _*))
    else None
  }

  /** Append a batch's rows (skipped if the id is already folded into
    * the compacted directory — an at-least-once replay that crossed a
    * compaction), then fold once enough per-batch directories
    * accumulate. The trigger is the OBSERVED directory count, not
    * `batchId % N`: replayed or skipped batch ids can't starve (or
    * double-run) the policy, and listing cost stays bounded by
    * `compactEvery` forever.
    */
  def append(rows: DataFrame, batchId: Long): Unit = {
    if (batchId > compactedThrough())
      rows.write.mode("overwrite").parquet(s"$indexDir/batch=$batchId")
    if (batchDirCount() >= compactEvery) compact()
  }

  private[graft] def batchDirCount(): Int = {
    recoverIfNeeded()
    if (fs.exists(liveDir)) fs.listStatus(liveDir)
      .count(_.getPath.getName.startsWith("batch=")) else 0
  }

  /** Fold the accumulated per-batch directories into one compacted
    * directory. Crash safety: the swap is two renames, so there IS a
    * window where the live dir is absent — but the full previous index
    * sits at `_pre_compact` throughout it, restored by the next read.
    */
  def compact(): Unit = readIndex().foreach { idx =>
    val foldedThrough = (compactedThrough() +: fs.listStatus(liveDir).toSeq
      .map(_.getPath.getName).filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong)).max
    val staged = compactingDir
    fs.delete(staged, true)
    // keep the batch=<n> partition layout: later appends land beside
    // batch=0 without conflicting with partition discovery
    idx.write.parquet(new Path(staged, "batch=0").toString)
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
}
