package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions
import graft.queries.Analytics
import graft.streaming.{StreamingActivityJob, StreamingSourceEntropyJob}

/** Streamed == batch for the two concentration monitors maintained as
  * additive count relations: user-activity Gini and source language
  * entropy.
  */
class StreamingConcentrationSpec extends AnyFunSuite with SparkSpec {

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toList).toSeq.sortBy(_.toString)

  private def eventTranches(n: Int): Seq[DataFrame] = {
    val ev = Tables.events(spark, sfDir)
    val ids = ev.agg(max("event_id")).head.getLong(0) + 1
    (0 until n).map(i => ev.filter(
      col("event_id") >= i * ids / n && col("event_id") < (i + 1) * ids / n))
  }

  private def docTranches(n: Int): Seq[DataFrame] = {
    val docs = Tables.documents(spark, sfDir)
    val ids = docs.agg(max("doc_id")).head.getLong(0) + 1
    (0 until n).map(i => docs.filter(
      col("doc_id") >= i * ids / n && col("doc_id") < (i + 1) * ids / n))
  }

  test("maintained gini face equals the batch entry, replay is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("sact").toString
    val job = new StreamingActivityJob(spark, dir, compactEvery = 2)
    val cuts = eventTranches(3)
    cuts.zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    assert(rows(job.readGini()) === rows(Analytics.userActivityGini(spark, sfDir)),
      "maintained counts must reproduce the batch Gini")
    val before = rows(job.readGini())
    cuts.zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    assert(rows(job.readGini()) === before, "replay must be a no-op")
  }

  test("maintained entropy face equals the batch entry, replay is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("sent").toString
    val job = new StreamingSourceEntropyJob(spark, dir, compactEvery = 2)
    val cuts = docTranches(3)
    cuts.zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    assert(rows(job.readEntropy()) === rows(TextFunctions.sourceLangEntropy(spark, sfDir)),
      "maintained counts must reproduce the batch entropy")
    val before = rows(job.readEntropy())
    cuts.zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    assert(rows(job.readEntropy()) === before, "replay must be a no-op")
  }

  test("empty states read as empty faces") {
    val d1 = java.nio.file.Files.createTempDirectory("sact-e").toString
    val d2 = java.nio.file.Files.createTempDirectory("sent-e").toString
    assert(new StreamingActivityJob(spark, d1).readGini().collect()
      .head.getAs[Long]("n_users") === 0L)
    assert(new StreamingSourceEntropyJob(spark, d2).readEntropy().count() === 0)
  }
}
