package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed Debezium CDC envelope codec.
  *
  * The reference parses Debezium JSON on the driver, one row at a time,
  * building a single-row DataFrame per record
  * (/root/reference/src/main/scala/com/sg/utils/DebeziumDeltaFormatter.scala:14-33
  * — `toLocalIterator` + per-row `spark.createDataFrame` + union). That
  * is O(records) driver work and collapses at any real scale. The
  * Spark-native equivalent below is a single `from_json` projection:
  * fully distributed, whole-stage-codegen'd, and schema-checked.
  *
  * Envelope layout follows Debezium's event format:
  *   key   = {"schema": ..., "payload": {<pk fields>}}
  *   value = {"schema": ..., "payload": {"before": ..., "after": ...,
  *            "source": {...}, "op": "c|u|d|r", "ts_ms": ...}}
  */
object DebeziumEnvelope {

  /** Value-payload schema for a given row schema (before/after typed). */
  def valueSchema(rowSchema: StructType): StructType =
    StructType(Seq(
      StructField("payload", StructType(Seq(
        StructField("before", rowSchema, nullable = true),
        StructField("after", rowSchema, nullable = true),
        StructField("source", StructType(Seq(
          StructField("version", StringType, nullable = true),
          StructField("connector", StringType, nullable = true),
          StructField("name", StringType, nullable = true),
          StructField("ts_ms", LongType, nullable = true),
          StructField("db", StringType, nullable = true),
          StructField("table", StringType, nullable = true),
          StructField("lsn", LongType, nullable = true),
          StructField("pos", LongType, nullable = true))), nullable = true),
        StructField("op", StringType, nullable = true),
        StructField("ts_ms", LongType, nullable = true))), nullable = true)))

  def keySchema(pkSchema: StructType): StructType =
    StructType(Seq(StructField("payload", pkSchema, nullable = true)))

  /** Parse raw Kafka-shaped records (string `key`, string `value`) into
    * typed CDC change rows. Pure projection — no shuffle, codegen'd.
    *
    * Output columns: every field of `pkSchema` (from the key), plus
    * `op`, `ts_ms`, `before` (struct), `after` (struct), `src_table`,
    * and `src_lsn` — the source's log position (Postgres `lsn` /
    * MySQL binlog `pos`), the genuinely ordered tiebreak for changes
    * sharing a ts_ms millisecond. When the raw frame carries a Kafka
    * `offset` column it is passed through too (per-partition ordered —
    * the fallback tiebreak when the connector emits no log position).
    */
  def parse(raw: DataFrame, pkSchema: StructType, rowSchema: StructType): DataFrame = {
    val k = from_json(col("key"), keySchema(pkSchema))
    val v = from_json(col("value"), valueSchema(rowSchema))
    val pkCols = pkSchema.fields.toIndexedSeq.map(f => col(s"k.payload.${f.name}").as(f.name))
    val passthrough =
      if (raw.columns.contains("offset")) Seq(col("offset")) else Seq.empty
    raw
      .withColumn("k", k)
      .withColumn("v", v)
      .select(pkCols ++ Seq(
        col("v.payload.op").as("op"),
        col("v.payload.ts_ms").as("ts_ms"),
        col("v.payload.before").as("before"),
        col("v.payload.after").as("after"),
        col("v.payload.source.table").as("src_table"),
        coalesce(col("v.payload.source.lsn"), col("v.payload.source.pos")).as("src_lsn")) ++
        passthrough: _*)
  }

  /** Encode typed change rows into Debezium-shaped JSON strings —
    * the inverse of [[parse]]; used to manufacture test/verification
    * streams and as a sink format for CDC re-publication.
    *
    * `keyCols` become the key payload; `afterCols`/`beforeCols` the
    * value payload's after/before images.
    */
  def encode(df: DataFrame, keyCols: Seq[String], opCol: Column, tsMsCol: Column,
             afterStruct: Column, beforeStruct: Column, table: String,
             lsnCol: Column = lit(null).cast("long")): DataFrame = {
    val keyPayload = struct(keyCols.map(col): _*)
    val source = struct(
      lit("2.5").as("version"), lit("graft").as("connector"),
      lit("graftserver").as("name"), tsMsCol.as("ts_ms"),
      lit("inventory").as("db"), lit(table).as("table"),
      lsnCol.as("lsn"), lit(null).cast("long").as("pos"))
    df.select(
      to_json(struct(keyPayload.as("payload"))).as("key"),
      to_json(struct(struct(
        beforeStruct.as("before"),
        afterStruct.as("after"),
        source.as("source"),
        opCol.as("op"),
        tsMsCol.as("ts_ms")).as("payload"))).as("value"),
      lit(s"graftserver.inventory.$table").as("topic"))
  }
}
