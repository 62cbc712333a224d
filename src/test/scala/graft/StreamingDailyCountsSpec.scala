package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Analytics
import graft.streaming.StreamingDailyCountsJob

/** Streamed == batch for the whole monitoring stack: integer counts
  * fold with no FP residue, and the read faces are the batch entries'
  * own code paths, so equality is EXACT.
  */
class StreamingDailyCountsSpec extends AnyFunSuite with SparkSpec {

  private def ev = Tables.events(spark, sfDir)

  private def tranches(n: Int): Seq[DataFrame] = {
    val ids = ev.agg(max("event_id")).head.getLong(0) + 1
    (0 until n).map(i => ev.filter(
      col("event_id") >= i * ids / n && col("event_id") < (i + 1) * ids / n))
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toList).toSeq.sortBy(_.toString)

  test("streamed grid and change-points equal the batch faces exactly") {
    val dir = java.nio.file.Files.createTempDirectory("sdc").toString
    val job = new StreamingDailyCountsJob(spark, dir)
    tranches(3).zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    assert(rows(job.readGrid()) === rows(Analytics.gapFillDaily(spark, sfDir)),
      "maintained dense grid must equal the batch gap-fill")
    assert(rows(job.readChangepoints()) === rows(Analytics.cusumChangepoint(spark, sfDir)),
      "maintained change-points must equal the batch detector")
  }

  test("replay across compaction is a no-op on the folded counts") {
    val dir = java.nio.file.Files.createTempDirectory("sdc-rp").toString
    val job = new StreamingDailyCountsJob(spark, dir, compactEvery = 2)
    val cuts = tranches(3)
    cuts.zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    val before = rows(job.readDaily().get)
    cuts.zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    assert(rows(job.readDaily().get) === before)
  }

  test("empty state reads as empty faces") {
    val dir = java.nio.file.Files.createTempDirectory("sdc-e").toString
    val job = new StreamingDailyCountsJob(spark, dir)
    assert(job.readDaily().isEmpty)
    assert(job.readGrid().count() === 0)
    assert(job.readChangepoints().count() === 0)
  }
}
