package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.cdc._

/** Streaming-throughput bench: rows/s through the reference-shaped
  * continuous path — file-source JSON envelopes → distributed
  * [[graft.cdc.DebeziumEnvelope]] parse → keyed merge →
  * [[graft.cdc.ParquetUpsertSink]] commit (the exact pipeline the
  * reference's StreamingJobExecutor runs against Kafka + Delta; see
  * /root/reference/src/main/scala/com/sg/job/streaming/StreamingJobExecutor.scala:17-66).
  *
  * The batch entries meter every analytic operator round-over-round;
  * this line does the same for the CONTINUOUS substrate, so a
  * regression in parse/merge/commit cost shows up in bench_full.json
  * instead of hiding behind spec wall-clock. Source data is the sf
  * dir's own user changelog, envelope-encoded once; each trial streams
  * it through a fresh state/checkpoint (a reused checkpoint would
  * measure a no-op), and min-of-trials reports the least load-sensitive
  * point, matching the batch discipline.
  */
object StreamBench {

  /** Returns (changelog rows, best wall seconds over `trials`). */
  def run(spark: SparkSession, sfDir: String, trials: Int = 2): (Long, Double) = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sbench")
    // try/finally, not success-path-only cleanup: a failed trial leaks
    // the encoded source + per-trial checkpoints/state on every failed
    // bench round otherwise
    try runTrials(spark, sfDir, trials, tmp)
    finally deleteRecursively(tmp.toFile)
  }

  private def runTrials(spark: SparkSession, sfDir: String, trials: Int,
                        tmp: java.nio.file.Path): (Long, Double) = {
    val srcDir = s"$tmp/in"
    val ch = CdcOps.userChangelog(spark, sfDir).localCheckpoint(true)
    val after = when(col("op") =!= "d",
      struct(col("user_id"), col("last_event_type"), col("last_value")))
      .otherwise(lit(null))
    val before = when(col("op") === "d",
      struct(col("user_id"), col("last_event_type"), col("last_value")))
      .otherwise(lit(null))
    DebeziumEnvelope.encode(ch, Seq("user_id"), col("op"), col("ts_ms"),
        after, before, "users", lsnCol = col("seq"))
      .repartition(8).write.mode("overwrite").json(srcDir)
    val n = ch.count()
    val times = (1 to math.max(trials, 1)).map { t =>
      val config = CdcJobConfig(
        source = FileSource(srcDir),
        checkpointLocation = s"$tmp/ckpt$t",
        statePath = s"$tmp/state$t",
        keyCols = Seq("user_id"),
        pkSchema = CdcQueries.userPkSchema,
        rowSchema = CdcQueries.userRowSchema,
        numBuckets = 64)
      val t0 = System.nanoTime()
      val q = new CdcStreamJob(spark, config).execute(Trigger.AvailableNow())
      q.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }
    (n, times.min)
  }

  /** Image-ingest throughput: rows/s through the continuous perceptual
    * dedup path — file-source PNG payloads → REAL per-batch ImageIO
    * decode + dHash → banded pair join against the persisted index →
    * per-batch index append ([[graft.streaming.StreamingPhashDedupJob]]).
    * The decode is the expensive stage of any image pipeline; its
    * sustained rows/s is the capacity number an image-curation
    * deployment asks first, pinned here so codec/band regressions
    * surface round-over-round like the CDC line. Source data is the sf
    * dir's documents rendered once to genuine PNGs; each trial streams
    * them through a fresh index/checkpoint (a reused index would
    * measure replay skips), min-of-trials.
    */
  def runPhash(spark: SparkSession, sfDir: String, trials: Int = 2): (Long, Double) = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-mmbench")
    try {
      val srcDir = s"$tmp/in"
      val images = graft.multimodal.BinaryPipeline
        .asImageTable(Tables.documents(spark, sfDir))
        .select("item_id", "payload")
      images.write.mode("overwrite").parquet(srcDir)
      val n = spark.read.parquet(srcDir).count()
      val schema = spark.read.parquet(srcDir).schema
      val times = (1 to math.max(trials, 1)).map { t =>
        val job = new graft.streaming.StreamingPhashDedupJob(
          spark, s"$tmp/index$t", (pairs, _) => { pairs.count(); () })
        val t0 = System.nanoTime()
        val q = job.start(
          spark.readStream.schema(schema).parquet(srcDir),
          checkpoint = s"$tmp/ckpt$t",
          trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
        q.awaitTermination()
        (System.nanoTime() - t0) / 1e9
      }
      (n, times.min)
    } finally deleteRecursively(tmp.toFile)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(); ()
  }
}
