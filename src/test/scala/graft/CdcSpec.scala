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
}
