package graft.cdc

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed upsert sink over bucket-partitioned parquet — the engine's
  * stand-in for the reference's Delta table
  * (/root/reference/src/main/scala/com/sg/job/streaming/StreamingJobExecutor.scala:20,
  * `DeltaTable.forPath(... "/mnt/delta/events")`).
  *
  * State layout (a poor-man's transaction log, the property Delta gives
  * the reference):
  * {{{
  *   statePath/
  *     _manifest.v<e>          committed bucket map for epoch e
  *                             (one "bucket<TAB>relative/dir" line per
  *                             live bucket; highest e wins)
  *     v<e>-<attempt>/bucket=<b>/part-N.parquet  immutable data written
  *                                               at epoch e
  * }}}
  *
  * Commit protocol: each merge writes its output to a FRESH per-attempt
  * version directory `v<e>-<attempt>` (never touching directories any
  * manifest references — unique even if two writers race the same
  * epoch), then publishes atomically by renaming a temp file to
  * `_manifest.v<e>` — rename-to-new-name is atomic on HDFS/posix; on
  * object stores you'd swap this single call for a conditional PUT.
  * A crash at ANY point before the rename leaves the previous manifest
  * as the newest one, so readers (and the checkpoint replay) still see
  * the last committed state; the half-written `v<e>` is an orphan that
  * the next successful merge garbage-collects. This replaces the r1
  * in-place dynamic-partition overwrite, where a crash mid-write left
  * buckets half-rewritten and replay merged into corrupt state.
  *
  * Deletes that empty a bucket commit correctly too: the new manifest
  * simply omits the bucket, so its old directory stops being visible —
  * no "resurrection" of deleted rows from a directory that an
  * overwrite-based scheme would have skipped rewriting.
  *
  * Scale design is unchanged: a micro-batch touches only the buckets
  * its keys hash into (`b = pmod(hash(key), numBuckets)`); the merge
  * reads ONLY those buckets' committed directories and writes
  * ~batch-sized data. A 100 TB state with a 1 GB batch rewrites the
  * dirty buckets, not the world.
  */
class ParquetUpsertSink(spark: SparkSession, statePath: String,
                        keyCols: Seq[String], numBuckets: Int = 64,
                        retainEpochs: Int = 2) {
  require(retainEpochs >= 2,
    "retainEpochs must keep at least the current and previous manifest " +
      "(in-flight readers planned against the previous epoch)")

  private def bucketCol = pmod(hash(keyCols.map(col): _*), lit(numBuckets)).as("bucket")

  private def root = new Path(statePath)
  private def fs: FileSystem = root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val ManifestRe = """_manifest\.v(\d+)""".r

  /** (epoch, manifestFile) pairs present in the state dir, ascending. */
  private def manifests(): Seq[(Long, Path)] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.flatMap { st =>
      st.getPath.getName match {
        case ManifestRe(e) => Some((e.toLong, st.getPath))
        case _ => None
      }
    }.sortBy(_._1)

  /** Current committed bucket map: bucket id → relative data dir, plus
    * the state schema (recorded so an all-deleted state stays readable).
    */
  private def readManifest(): Option[(Long, Map[Int, String], Option[org.apache.spark.sql.types.StructType])] =
    manifests().lastOption.map { case (epoch, p) => readManifestAt(epoch, p) }

  private def readManifestAt(epoch: Long, p: Path)
      : (Long, Map[Int, String], Option[org.apache.spark.sql.types.StructType]) = {
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val (schemaLines, entryLines) = text.linesIterator.filter(_.nonEmpty).toSeq
      .partition(_.startsWith("#schema\t"))
    val schema = schemaLines.headOption.map { l =>
      org.apache.spark.sql.types.DataType.fromJson(l.stripPrefix("#schema\t"))
        .asInstanceOf[org.apache.spark.sql.types.StructType]
    }
    val entries = entryLines.map { line =>
      val Array(b, dir) = line.split('\t')
      b.toInt -> dir
    }.toMap
    (epoch, entries, schema)
  }

  def stateExists: Boolean = manifests().nonEmpty

  /** Read the committed state (data columns only; no bucket column —
    * each referenced directory is read as its own parquet root). A
    * committed state with every key deleted reads as an EMPTY frame
    * with the recorded schema, not an error.
    */
  def readState(): DataFrame = {
    val (_, entries, schema) = readManifest().getOrElse(
      throw new IllegalStateException(s"no committed state at $statePath"))
    stateFrom(entries, schema)
  }

  /** Time travel: the state exactly as committed at `epoch`. Epochs stay
    * readable while their manifest is retained (`retainEpochs` newest —
    * immutable data dirs are only vacuumed once no retained manifest
    * references them, so a retained epoch's read NEVER races a commit).
    * The epoch values are the stream's batchIds, so "the state before
    * batch N was applied" is `readStateAt(N - 1)`.
    */
  def readStateAt(epoch: Long): DataFrame =
    manifests().find(_._1 == epoch) match {
      case Some((e, p)) =>
        val (_, entries, schema) = readManifestAt(e, p)
        stateFrom(entries, schema)
      case None =>
        throw new IllegalStateException(
          s"epoch $epoch is not retained at $statePath " +
            s"(retained: ${manifests().map(_._1).mkString(", ")})")
    }

  /** Retained epochs, ascending — each is valid for [[readStateAt]]. */
  def retainedEpochs(): Seq[Long] = manifests().map(_._1)

  private def stateFrom(entries: Map[Int, String],
                        schema: Option[org.apache.spark.sql.types.StructType]): DataFrame = {
    val paths = entries.values.toSeq.sorted.map(rel => s"$statePath/$rel")
    // read with the manifest's recorded schema: after an evolution
    // commit, clean buckets still hold pre-evolution files — an
    // explicit schema null-fills their missing columns, while parquet's
    // own schema sampling could silently drop the new column entirely
    if (paths.nonEmpty) schema match {
      case Some(s) => spark.read.schema(s).parquet(paths: _*)
      case None    => spark.read.parquet(paths: _*)
    }
    else schema match {
      case Some(s) =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
      case None =>
        throw new IllegalStateException(
          s"state at $statePath is empty and its manifest carries no schema")
    }
  }

  /** Change data feed between two retained epochs: the keyed diff of
    * the committed states — which keys were added, removed, or changed
    * by the batches in (fromEpoch, toEpoch]. This is the "what did the
    * stream do to my table" answer an incremental downstream consumer
    * needs without replaying the changelog itself.
    *
    * One co-partitioned full-outer join on the key (the same shuffle
    * shape as the merge); presence is decided by MARKER columns, not
    * data nullness, so a legitimately-NULL attribute can't masquerade
    * as an absent key. Output: keyCols ++ change ∈ {added, removed,
    * changed} ++ the after-image data columns (NULL for removed keys).
    */
  def changesBetween(fromEpoch: Long, toEpoch: Long): DataFrame = {
    require(fromEpoch < toEpoch, s"need fromEpoch < toEpoch, got $fromEpoch, $toEpoch")
    val dataCols = readState().columns.filterNot(keyCols.contains).toSeq
    val b = readStateAt(fromEpoch).withColumn("__b", lit(true)).alias("b")
    val a = readStateAt(toEpoch).withColumn("__a", lit(true)).alias("a")
    val joinCond = keyCols.map(k => col(s"b.$k") <=> col(s"a.$k")).reduce(_ && _)
    // exact null-safe struct compare — a hash digest here could collide
    // and silently classify a real change as unchanged
    def img(side: String) = struct(dataCols.map(c => col(s"$side.$c")): _*)
    b.join(a, joinCond, "full_outer")
      .withColumn("change",
        when(col("b.__b").isNull, "added")
          .when(col("a.__a").isNull, "removed")
          .when(!(img("a") <=> img("b")), "changed")
          .otherwise("unchanged"))
      .filter(col("change") =!= "unchanged")
      .select(keyCols.map(k => coalesce(col(s"a.$k"), col(s"b.$k")).as(k)) ++
        Seq(col("change")) ++ dataCols.map(c => col(s"a.$c").as(c)): _*)
  }

  /** Materialize the committed state as a PLAIN parquet directory that
    * any engine — spark-shell, DuckDB, Trino, a BI tool — can read with
    * no knowledge of the manifest protocol. This restores the
    * reference's "the materialized table is directly queryable by
    * Dremio/Superset" property (its state is Delta; see the reference
    * README, "Setting-up Dremio") for graft's bespoke manifest-epoch
    * layout. Spark's job-commit protocol stages the write in
    * `_temporary` and drops a `_SUCCESS` marker only on completion, so
    * external readers should treat `_SUCCESS` as the completeness
    * signal; a crashed export never presents as a finished snapshot.
    */
  def exportSnapshot(path: String): Unit =
    readState().write.mode("overwrite").parquet(path)

  /** [[exportSnapshot]] in Delta's public table layout — parquet plus a
    * `_delta_log`, so external Delta/Trino readers consume the snapshot
    * directly (the reference publishes Delta; see [[DeltaExport]]).
    */
  def exportSnapshotDelta(path: String): Int =
    DeltaExport.write(readState(), path)

  /** Merge one changelog micro-batch (keyCols ++ dataCols ++ op, ts_ms,
    * seq) into the state. At-least-once replay from the stream
    * checkpoint is safe: replaying a committed batch re-applies the
    * same latest-image per key (idempotent), and a batch that crashed
    * mid-merge never published, so its partial output is invisible.
    */
  def merge(batch: DataFrame, batchId: Long): Unit = {
    readManifest() match {
      case None =>
        val dataCols = dataColsOf(batch)
        val state0 = CdcOps.latestState(batch, keyCols, dataCols).drop("n_changes")
        commit(0L, Map.empty, dirtyOf(batch), state0)
      case Some((epoch, current, stateSchema)) =>
        val dirty = dirtyOf(batch)
        val dirtyWithData = dirty.filter(current.contains)
        // schema evolution: read dirty buckets with the MANIFEST schema
        // (older bucket files missing newer columns null-fill; parquet
        // schema sampling could otherwise silently drop a new column),
        // and merge over the UNION of batch and state data columns so
        // a widening feed backfills NULL and a narrowed feed carries
        // state values instead of wiping them.
        val base = stateSchema match {
          case Some(s) if dirtyWithData.nonEmpty =>
            spark.read.schema(s).parquet(dirtyWithData.map(b => s"$statePath/${current(b)}"): _*)
          case _ if dirtyWithData.nonEmpty =>
            spark.read.parquet(dirtyWithData.map(b => s"$statePath/${current(b)}"): _*)
          case Some(s) =>
            spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
          case None => emptyLike(batch, dataColsOf(batch))
        }
        val baseDataCols = base.columns.toSeq
          .filterNot(c => keyCols.contains(c) || c == "last_ts_ms")
        val dataCols = (dataColsOf(batch) ++
          baseDataCols.filterNot(dataColsOf(batch).contains)).distinct
        val merged = CdcOps.mergeChangeSet(base, batch, keyCols, dataCols)
        commit(epoch + 1, current, dirty, merged)
    }
  }

  private def dataColsOf(batch: DataFrame): Seq[String] =
    batch.columns.filterNot((keyCols ++ Seq("op", "ts_ms", "seq")).contains).toSeq

  /** Distinct bucket ids of this batch — tiny (≤ numBuckets values). */
  private def dirtyOf(batch: DataFrame): Seq[Int] =
    batch.select(bucketCol).distinct().collect().map(_.getInt(0)).toSeq

  /** The committed state restricted to the buckets this batch touches —
    * the before-image substrate an incremental-view-maintenance
    * consumer needs ([[AggMaintain.epochDelta]] joins the batch's keys
    * against state, and every batch key hashes into a dirty bucket, so
    * the delta computed against this frame equals one computed against
    * the full state — spec-held). Cost is ¦dirty buckets¦ × bucket
    * size, independent of total state size once buckets are sized to a
    * fixed row target; [[readState]] by contrast reads everything.
    * Returns an empty frame when no state is committed yet.
    */
  def readDirtyState(batch: DataFrame): DataFrame =
    readManifest() match {
      case None => emptyLike(batch, dataColsOf(batch))
      case Some((_, entries, schema)) =>
        val withData = dirtyOf(batch).filter(entries.contains)
        if (withData.isEmpty) emptyLike(batch, dataColsOf(batch))
        else {
          val paths = withData.map(b => s"$statePath/${entries(b)}")
          schema match {
            case Some(s) => spark.read.schema(s).parquet(paths: _*)
            case None    => spark.read.parquet(paths: _*)
          }
        }
    }

  /** Zero-row frame with the base-state schema (keys ++ data ++ last_ts_ms)
    * for the first merge that touches only previously-unseen buckets.
    */
  private def emptyLike(batch: DataFrame, dataCols: Seq[String]): DataFrame =
    batch.select(keyCols.map(col) ++ dataCols.map(col) :+ col("ts_ms").as("last_ts_ms"): _*)
      .limit(0)

  /** Write the merged dirty-bucket state into v<epoch>, then atomically
    * publish a manifest carrying: every clean bucket's previous entry +
    * every dirty bucket that still has rows. Dirty buckets with no
    * surviving rows are dropped from the manifest (all keys deleted).
    */
  private[graft] def commit(epoch: Long, previous: Map[Int, String],
                            dirty: Seq[Int], merged: DataFrame): Unit = {
    // detect a single-writer violation BEFORE touching any file, and
    // stage data in a per-attempt directory: even a writer racing at
    // the same epoch can then never clobber files that a just-published
    // manifest references — its loss is confined to its own orphan dir
    if (fs.exists(new Path(root, s"_manifest.v$epoch")))
      throw new IllegalStateException(
        s"epoch $epoch already committed at $statePath (concurrent writer?)")
    val versionDir = s"v$epoch-${java.util.UUID.randomUUID().toString.take(8)}"
    merged.withColumn("bucket", bucketCol)
      .repartition(col("bucket"))
      .write.mode("overwrite")
      .partitionBy("bucket")
      .parquet(s"$statePath/$versionDir")
    // which dirty buckets actually produced rows?
    val written: Set[Int] = fs.listStatus(new Path(root, versionDir)).toSeq
      .map(_.getPath.getName).collect { case s if s.startsWith("bucket=") =>
        s.stripPrefix("bucket=").toInt
      }.toSet
    val entries = (previous -- dirty) ++
      written.filter(dirty.contains).map(b => b -> s"$versionDir/bucket=$b")
    val tmp = new Path(root, s"_tmp-manifest-$epoch")
    val out = fs.create(tmp, true)
    val schemaLine = s"#schema\t${merged.schema.json}\n"
    try out.write((schemaLine + entries.toSeq.sortBy(_._1)
      .map { case (b, d) => s"$b\t$d" }.mkString("", "\n", "\n")).getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(tmp, new Path(root, s"_manifest.v$epoch")))
      throw new IllegalStateException(
        s"manifest commit for epoch $epoch failed (concurrent writer?)")
    vacuum(epoch)
  }

  /** Drop data no reader can reach: version dirs from older epochs whose
    * bucket dirs NO retained manifest (the `retainEpochs` newest)
    * references — including orphans from crashed merges — plus the
    * manifest files that aged out of the retention window. Keeping
    * everything a retained manifest references means a reader that
    * planned against any retained epoch still finds its files (that is
    * what makes [[readStateAt]] safe), and at the default
    * retainEpochs=2 an epoch-1 reader racing this commit keeps its
    * grace window (single-writer contract; longer reader pins → raise
    * retainEpochs).
    */
  private def vacuum(epoch: Long): Unit = {
    val retained = manifests().filter(_._1 > epoch - retainEpochs)
    val referenced: Set[String] = retained
      .flatMap { case (e, p) => readManifestAt(e, p)._2.values }.toSet
    val VersionRe = """v(\d+)(?:-[0-9a-f]+)?""".r
    fs.listStatus(root).toSeq.foreach { st =>
      val name = st.getPath.getName
      val dirEpoch = name match {
        case VersionRe(e) if st.isDirectory => Some(e.toLong)
        case _ => None
      }
      if (dirEpoch.exists(_ < epoch)) {
        fs.listStatus(st.getPath).toSeq.foreach { sub =>
          val rel = s"$name/${sub.getPath.getName}"
          if (sub.getPath.getName.startsWith("bucket=") && !referenced.contains(rel))
            fs.delete(sub.getPath, true)
        }
        if (fs.listStatus(st.getPath).forall(!_.getPath.getName.startsWith("bucket=")))
          fs.delete(st.getPath, true)
      }
      name match {
        case ManifestRe(e) if e.toLong <= epoch - retainEpochs =>
          fs.delete(st.getPath, false)
        case _ => ()
      }
    }
  }
}
