package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Operability face for the streaming jobs: a [[StreamingQueryListener]]
  * that keeps the last `capacity` micro-batch progress records in a
  * bounded ring buffer, queryable as a DataFrame — the "is my CDC
  * pipeline keeping up" answer (rows/sec, batch duration, state size)
  * without shipping logs anywhere.
  *
  * Scale notes: the listener runs on the DRIVER and stores a few
  * hundred small records — cost is independent of data volume. For
  * state that outgrows executor heaps (a 100 TB table's key space),
  * [[StreamMetrics.useRocksDbStateStore]] flips the job to the RocksDB
  * state store provider (disk-backed, incremental-checkpoint) — the
  * standard Structured Streaming lever for large keyed state, spec'd
  * here to produce identical results to the default provider.
  */
final class StreamMetrics(capacity: Int = 256) extends StreamingQueryListener {
  import StreamMetrics.BatchProgress

  private val buf = new java.util.ArrayDeque[BatchProgress](capacity)

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val stateRows =
      if (p.stateOperators == null || p.stateOperators.isEmpty) 0L
      else p.stateOperators.map(_.numRowsTotal).sum
    val rps = p.processedRowsPerSecond
    val rec = BatchProgress(
      Option(p.name).getOrElse(""), p.batchId, p.numInputRows,
      if (rps.isNaN) 0.0 else rps, p.batchDuration, stateRows)
    buf.synchronized {
      if (buf.size >= capacity) buf.pollFirst()
      buf.addLast(rec)
    }
  }

  def snapshot(): Seq[BatchProgress] = buf.synchronized {
    import scala.jdk.CollectionConverters._
    buf.iterator().asScala.toVector
  }

  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    snapshot().toDF()
  }

  def attach(spark: SparkSession): this.type = { spark.streams.addListener(this); this }
  def detach(spark: SparkSession): Unit = spark.streams.removeListener(this)
}

object StreamMetrics {
  final case class BatchProgress(
      queryName: String, batchId: Long, numInputRows: Long,
      processedRowsPerSecond: Double, durationMs: Long, stateRows: Long)

  /** Point keyed streaming state at RocksDB (disk-backed, incremental
    * checkpoints) — required once state exceeds executor memory. Takes
    * effect for queries STARTED after the call.
    */
  def useRocksDbStateStore(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  def useDefaultStateStore(spark: SparkSession): Unit =
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
}
