package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Reader/sink configuration — the reference's config surface
  * (/root/reference/src/main/scala/com/sg/job/streaming/StreamingUtils.scala:1-7),
  * kept source-compatible in spirit but generalized: a CDC stream can
  * come from Kafka (production), a JSON-lines directory (replayable
  * test/backfill source), or an in-memory stream (specs).
  */
final case class KafkaReaderConfig(
    kafkaBootstrapServers: String,
    topics: String,
    startingOffsets: String = "latest")

final case class JdbcConfig(
    url: String,
    user: String = "test",
    password: String = "Test123",
    tableName: String = "orders_it")

sealed trait CdcSource
final case class KafkaSource(config: KafkaReaderConfig) extends CdcSource
final case class FileSource(path: String) extends CdcSource
final case class MemorySource(raw: DataFrame) extends CdcSource

final case class CdcJobConfig(
    source: CdcSource,
    checkpointLocation: String,
    statePath: String,
    keyCols: Seq[String],
    pkSchema: StructType,
    rowSchema: StructType,
    numBuckets: Int = 64)

/** Streaming CDC job: source → distributed envelope decode → keyed
  * upsert into a bucket-partitioned parquet state table.
  *
  * This is the reference's StreamingJobExecutor
  * (/root/reference/src/main/scala/com/sg/job/streaming/StreamingJobExecutor.scala:17-66)
  * re-expressed Spark-first:
  *   - the envelope decode is `from_json` (executor-side, codegen), not a
  *     driver loop;
  *   - the Delta `merge` becomes [[CdcOps.mergeChangeSet]] +
  *     [[ParquetUpsertSink]] with dirty-bucket-only rewrites;
  *   - `foreachBatch` + checkpointing gives exactly-once state evolution,
  *     as in the reference.
  */
class CdcStreamJob(spark: SparkSession, config: CdcJobConfig) {

  def readRaw(): DataFrame = config.source match {
    case KafkaSource(k) =>
      spark.readStream
        .format(CdcStreamJob.KafkaFormat)
        .options(CdcStreamJob.kafkaOptions(k))
        .load()
        .selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value",
          "topic", "offset")
    case FileSource(path) =>
      spark.readStream
        .schema("key STRING, value STRING, topic STRING")
        .json(path)
    case MemorySource(raw) => raw
  }

  def parsed(): DataFrame =
    DebeziumEnvelope.parse(readRaw(), config.pkSchema, config.rowSchema)

  /** Start the continuous upsert. Each micro-batch is merged into the
    * parquet state with Delta-merge semantics.
    */
  def execute(trigger: Trigger = Trigger.ProcessingTime("10 seconds")): StreamingQuery = {
    val sink = new ParquetUpsertSink(spark, config.statePath, config.keyCols, config.numBuckets)
    parsed().writeStream
      .outputMode("update")
      .option("checkpointLocation", config.checkpointLocation)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink.merge(flattenAfterImage(batch), batchId)
      }
      .start()
  }

  /** Flatten parsed envelope rows (after-image struct) into the sink's
    * flat changelog shape: key cols + op + ts_ms + seq + data cols.
    *
    * `seq` is the within-millisecond tiebreak for the (ts_ms, seq)
    * recency order — Debezium's ts_ms is millisecond-resolution, so two
    * changes to one key in the same ms are common and a ts-only order
    * would pick a nondeterministic winner. Preference: the source log
    * position (`src_lsn`: Postgres lsn / MySQL pos — totally ordered
    * within a source), then the Kafka partition offset (ordered within
    * a key because Debezium keys the topic by PK), then ts_ms.
    *
    * Contract: within one topic all envelopes must draw `seq` from the
    * SAME ordinal domain — true for any single Debezium connector,
    * which emits lsn (or pos) either always or never. Mixing domains
    * (some rows lsn, some offset-only) would compare incomparable
    * ordinals inside a same-millisecond tie; don't merge streams from
    * heterogeneous connectors into one state table without normalizing
    * seq first.
    */
  def flattenAfterImage(parsed: DataFrame): DataFrame = {
    val dataCols = config.rowSchema.fieldNames.filterNot(config.keyCols.contains)
    val seqSources =
      Seq(col("src_lsn")) ++
        (if (parsed.columns.contains("offset")) Seq(col("offset")) else Seq.empty) ++
        Seq(col("ts_ms"), lit(0L))
    parsed.select(
      config.keyCols.map(col) ++ Seq(col("op"), col("ts_ms"),
        coalesce(seqSources: _*).as("seq")) ++
        dataCols.map(f => col(s"after.$f").as(f)): _*)
  }
}

object CdcStreamJob {
  val KafkaFormat = "kafka"

  /** Reader options for the Kafka source — the reference's
    * StreamingJobExecutor.read surface
    * (/root/reference/src/main/scala/com/sg/job/streaming/StreamingJobExecutor.scala:36-46),
    * exposed as data so the plumbing is spec-checkable without a broker.
    */
  def kafkaOptions(k: KafkaReaderConfig): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> k.kafkaBootstrapServers,
    "subscribe" -> k.topics,
    "startingOffsets" -> k.startingOffsets,
    "failOnDataLoss" -> "false")
}

/** Initial-load job (the reference's StreamingJobInitialExecutor,
  * /root/reference/src/main/scala/com/sg/job/streaming/StreamingJobInitialExecutor.scala:17-55):
  * consumes the Debezium snapshot (op='r') stream in append mode and
  * seeds the state table.
  */
class CdcInitialLoadJob(spark: SparkSession, config: CdcJobConfig) {
  private val job = new CdcStreamJob(spark, config)

  def execute(trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val snapshot = job.parsed().filter(col("op") === "r")
    snapshot.writeStream
      .outputMode("append")
      .option("checkpointLocation", config.checkpointLocation)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sink = new ParquetUpsertSink(spark, config.statePath, config.keyCols, config.numBuckets)
        sink.merge(job.flattenAfterImage(batch), batchId)
      }
      .start()
  }
}
