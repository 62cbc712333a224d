package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc._

class CdcSpec extends AnyFunSuite with SparkSpec {

  test("debezium envelope roundtrip is lossless") {
    val ch = CdcOps.userChangelog(spark, sfDir)
    val parsed = CdcQueries.parseEnvelope(spark, sfDir)
    assert(parsed.count() === ch.count())
    // ops survive
    val opCounts = parsed.groupBy("op").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = ch.groupBy("op").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(opCounts === expected)
    // deletes have null after-image fields
    assert(parsed.filter(col("op") === "d" && col("last_event_type").isNotNull).count() === 0)
  }

  test("mergeChangeSet(first half, second half) == latestState(all)") {
    val df = CdcQueries.mergeBatch(spark, sfDir)
    val all = CdcOps.latestState(CdcOps.userChangelog(spark, sfDir), Seq("user_id"), CdcOps.userDataCols)
      .withColumn("last_value", round(col("last_value"), 2))
      .select("user_id", "last_event_type", "last_value", "last_ts_ms")
    assert(df.select("user_id", "last_event_type", "last_value", "last_ts_ms")
      .exceptAll(all).count() === 0)
    assert(all.exceptAll(df.select("user_id", "last_event_type", "last_value", "last_ts_ms"))
      .count() === 0)
  }

  test("latestState drops deleted keys") {
    val ch = CdcOps.userChangelog(spark, sfDir)
    val state = CdcOps.latestState(ch, Seq("user_id"), CdcOps.userDataCols)
    // a user whose very last change is 'd' must be absent
    val lastOps = ch.groupBy("user_id")
      .agg(max_by(col("op"), struct(col("ts_ms"), col("seq"))).as("last_op"))
    val deleted = lastOps.filter(col("last_op") === "d").select("user_id")
    assert(state.join(deleted, Seq("user_id"), "inner").count() === 0)
  }

  test("streaming CDC upsert through ParquetUpsertSink equals batch latestState") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val tmp = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    val ch = CdcOps.userChangelog(spark, sfDir)
      .orderBy("ts_ms", "seq")
      .collect()

    val stream = MemoryStream[(Long, String, Long, Long, String, Double)]
    val sink = new ParquetUpsertSink(spark, s"$tmp/state", Seq("user_id"), numBuckets = 8)
    val sdf = stream.toDF().toDF("user_id", "op", "ts_ms", "seq", "last_event_type", "last_value")
    val q = sdf.writeStream
      .outputMode("update")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) => sink.merge(b, id) }
      .start()

    // feed in three micro-batches (split roughly in thirds)
    val rows = ch.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getString(4), r.getDouble(5)))
    rows.grouped(math.max(rows.length / 3, 1)).foreach { g =>
      stream.addData(g.toSeq)
      q.processAllAvailable()
    }
    q.stop()

    val streamed = sink.readState().select("user_id", "last_event_type", "last_value", "last_ts_ms")
    val batch = CdcOps.latestState(CdcOps.userChangelog(spark, sfDir), Seq("user_id"), CdcOps.userDataCols)
      .select("user_id", "last_event_type", "last_value", "last_ts_ms")
    assert(streamed.exceptAll(batch).count() === 0, "streamed minus batch")
    assert(batch.exceptAll(streamed).count() === 0, "batch minus streamed")
  }

  test("JdbcStateSink builds the reference-compatible writer options") {
    val sink = new JdbcStateSink(JdbcConfig(
      url = "jdbc:postgresql://localhost:5432/inventory",
      user = "test", password = "Test123", tableName = "orders_it"))
    val opts = sink.writerOptions
    assert(opts("url") === "jdbc:postgresql://localhost:5432/inventory")
    assert(opts("dbtable") === "orders_it")
    assert(opts("truncate") === "true", "DDL-preserving overwrite expected")
    assert(opts("batchsize").toInt > 0)
  }

  test("CdcStreamJob end-to-end survives a restart from checkpoint") {
    import org.apache.spark.sql.streaming.Trigger

    val tmp = java.nio.file.Files.createTempDirectory("graft-cdc-restart").toString
    val srcDir = s"$tmp/stream-in"

    // Changelog with a strictly-unique per-row ts_ms (= event_id) so the
    // envelope path's recency ordering is total and restart-deterministic.
    val ch = CdcOps.userChangelog(spark, sfDir).withColumn("ts_ms", col("seq")).cache()
    val after = when(col("op") =!= "d",
      struct(col("user_id"), col("last_event_type"), col("last_value"))).otherwise(lit(null))
    val before = when(col("op") === "d",
      struct(col("user_id"), col("last_event_type"), col("last_value"))).otherwise(lit(null))
    val encoded = DebeziumEnvelope.encode(ch, Seq("user_id"), col("op"), col("ts_ms"),
      after, before, "users").cache()

    val n = encoded.count()
    val splitId = ch.orderBy("ts_ms").limit((n / 2).toInt)
      .agg(max("ts_ms")).head().getLong(0)
    val config = CdcJobConfig(
      source = FileSource(srcDir),
      checkpointLocation = s"$tmp/ckpt",
      statePath = s"$tmp/state",
      keyCols = Seq("user_id"),
      pkSchema = CdcQueries.userPkSchema,
      rowSchema = CdcQueries.userRowSchema,
      numBuckets = 8)

    // tranche 1 → run to completion → query stops (AvailableNow)
    encoded.join(ch.filter(col("ts_ms") <= splitId).select("ts_ms"),
      expr(s"get_json_object(value, '$$.payload.ts_ms') = ts_ms")).drop("ts_ms")
      .write.mode("append").json(srcDir)
    val q1 = new CdcStreamJob(spark, config).execute(Trigger.AvailableNow())
    q1.awaitTermination()

    // tranche 2 lands while the job is down; a NEW job instance resumes
    // from the checkpoint and must not re-merge tranche 1
    encoded.join(ch.filter(col("ts_ms") > splitId).select("ts_ms"),
      expr(s"get_json_object(value, '$$.payload.ts_ms') = ts_ms")).drop("ts_ms")
      .write.mode("append").json(srcDir)
    val q2 = new CdcStreamJob(spark, config).execute(Trigger.AvailableNow())
    q2.awaitTermination()

    val streamed = spark.read.parquet(s"$tmp/state")
      .select("user_id", "last_event_type", "last_value", "last_ts_ms")
    val batch = CdcOps.latestState(ch, Seq("user_id"), CdcOps.userDataCols)
      .select("user_id", "last_event_type", "last_value", "last_ts_ms")
    assert(streamed.exceptAll(batch).count() === 0, "restarted stream minus batch")
    assert(batch.exceptAll(streamed).count() === 0, "batch minus restarted stream")
    ch.unpersist(); encoded.unpersist()
  }
}
