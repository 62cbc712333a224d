package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Analytics
import graft.streaming.StreamingEventPathsJob

/** Streamed == batch for the journey-prefix family: the maintained
  * per-user bottom-k is a semilattice fold, and the read face is the
  * batch entry's own [[Analytics.pathHistogram]], so equality is EXACT
  * — including under out-of-order arrival and batch replay.
  */
class StreamingEventPathsSpec extends AnyFunSuite with SparkSpec {

  private def ev = Tables.events(spark, sfDir)

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toList).toSeq.sortBy(_.toString)

  /** Tranches by event_id REVERSED — later batches carry EARLIER
    * events for many users, so the lattice displacement path is
    * exercised, not just append.
    */
  private def reversedTranches(n: Int): Seq[DataFrame] = {
    val ids = ev.agg(max("event_id")).head.getLong(0) + 1
    (0 until n).reverse.map(i => ev.filter(
      col("event_id") >= i * ids / n && col("event_id") < (i + 1) * ids / n))
  }

  test("streamed paths equal the batch histogram under out-of-order batches") {
    val dir = java.nio.file.Files.createTempDirectory("sep").toString
    val job = new StreamingEventPathsJob(spark, dir)
    reversedTranches(3).zipWithIndex.foreach { case (cut, i) =>
      job.processBatch(cut, i.toLong)
    }
    assert(rows(job.readPaths()) === rows(Analytics.eventPaths(spark, sfDir)),
      "maintained path histogram must equal the batch entry")
  }

  test("replaying a committed batch re-commits the same prefixes") {
    val dir = java.nio.file.Files.createTempDirectory("sep-rp").toString
    val job = new StreamingEventPathsJob(spark, dir)
    val cuts = reversedTranches(3)
    cuts.zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    val before = rows(job.readPrefixes())
    // at-least-once: replay the middle batch, then the last
    job.processBatch(cuts(1), 1L)
    job.processBatch(cuts(2), 2L)
    assert(rows(job.readPrefixes()) === before, "lattice replay must be a no-op")
  }

  test("empty state reads as an empty histogram") {
    val dir = java.nio.file.Files.createTempDirectory("sep-e").toString
    val job = new StreamingEventPathsJob(spark, dir)
    assert(job.readPaths().count() === 0)
  }
}
