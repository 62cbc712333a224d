package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.{AggMaintain, CdcOps}
import graft.streaming.StreamingTopKMaintainJob

/** The streamed ordered-statistic support relation must make every
  * read face (top-k, min/max/median) equal its batch recompute at
  * every micro-batch — the [[graft.streaming.StreamingJoinMaintainJob]]
  * discipline applied to the [[AggMaintain]] support construction.
  * Values are exact integer cents, so equality is bit-equality.
  */
class StreamingTopKMaintainSpec extends AnyFunSuite with SparkSpec {

  private val key = "user_id"
  private val grpCol = "last_event_type"
  private val valCol = "last_value"

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  /** n tranches of the user changelog at quantile bounds (non-empty). */
  private def tranches(n: Int): Seq[DataFrame => DataFrame] = {
    val ch = CdcOps.userChangelog(spark, sfDir)
    val qs = (1 until n).map(_.toDouble / n).toArray
    val bounds = ch.stat.approxQuantile("ts_ms", qs, 0.0).map(_.toLong)
    val lows = Long.MinValue +: bounds.toSeq
    val highs = bounds.toSeq :+ Long.MaxValue
    lows.zip(highs).map { case (lo, hi) =>
      (c: DataFrame) => c.filter(col("ts_ms") >= lo && col("ts_ms") < hi)
    }
  }

  private def recompute(upTo: Int, cuts: Seq[DataFrame => DataFrame]): DataFrame = {
    val ch = CdcOps.userChangelog(spark, sfDir)
    val prefix = (0 to upTo).map(cuts(_)(ch)).reduce(_ unionByName _)
    AggMaintain.centsSupport(
      CdcOps.latestState(prefix, Seq(key), CdcOps.userDataCols).drop("n_changes"),
      grpCol, valCol)
  }

  test("streamed top-k and extrema equal the batch recompute after every micro-batch") {
    val dir = java.nio.file.Files.createTempDirectory("stk").toString
    val job = new StreamingTopKMaintainJob(spark, dir)
    val ch = CdcOps.userChangelog(spark, sfDir)
    val cuts = tranches(3)
    cuts.zipWithIndex.foreach { case (cut, i) =>
      job.processBatch(cut(ch), i.toLong)
      val want = recompute(i, cuts)
      assert(rows(job.readTopK()) === rows(AggMaintain.readTopK(want, 3)),
        s"after batch $i: streamed top-k diverged from batch recompute")
      assert(rows(job.readExtrema()) === rows(AggMaintain.readExtrema(want)),
        s"after batch $i: streamed extrema diverged from batch recompute")
    }
    // tail replay of the last committed batch must be a no-op
    val before = rows(job.readTopK())
    job.processBatch(cuts.last(ch), (cuts.size - 1).toLong)
    assert(rows(job.readTopK()) === before, "tail replay changed the view")
  }

  test("a crash after either step converges on replay") {
    val ch = CdcOps.userChangelog(spark, sfDir)
    val cuts = tranches(2)
    val want = rows(AggMaintain.readTopK(recompute(1, cuts), 3))
    (1 to 2).foreach { stopAfter =>
      val dir = java.nio.file.Files.createTempDirectory(s"stk-crash$stopAfter").toString
      val job = new StreamingTopKMaintainJob(spark, dir)
      job.processBatch(cuts(0)(ch), 0L)
      job.processBatchSteps(cuts(1)(ch), 1L, stopAfter)
      job.processBatch(cuts(1)(ch), 1L)
      assert(rows(job.readTopK()) === want,
        s"crash after step $stopAfter did not converge on replay")
    }
  }

  test("fresh-checkpoint full replay (with compaction) leaves the support unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("stk-replay").toString
    // compactEvery=2 so the fold compacts mid-run — replayed batch ids
    // must be skipped by the marker even after their dirs are folded away
    val job = new StreamingTopKMaintainJob(spark, dir, compactEvery = 2)
    val ch = CdcOps.userChangelog(spark, sfDir)
    val cuts = tranches(3)
    cuts.zipWithIndex.foreach { case (cut, i) => job.processBatch(cut(ch), i.toLong) }
    val before = rows(job.readTopK())
    assert(before === rows(AggMaintain.readTopK(recompute(2, cuts), 3)))
    cuts.zipWithIndex.foreach { case (cut, i) => job.processBatch(cut(ch), i.toLong) }
    assert(rows(job.readTopK()) === before,
      "full replay from a fresh checkpoint changed the support")
  }

  test("deleting the sole #1 holder promotes the runner-up (streamed leader retraction)") {
    import spark.implicits._
    def batch(rs: (Long, String, Long, Long, String, Double)*): DataFrame =
      rs.toDF(key, "op", "ts_ms", "seq", grpCol, valCol)
    val dir = java.nio.file.Files.createTempDirectory("stk-retract").toString
    val job = new StreamingTopKMaintainJob(spark, dir, k = 2)
    // u1 leads group a at 9.99, u2 trails at 5.00, u3 elsewhere
    job.processBatch(batch(
      (1L, "c", 10L, 1L, "a", 9.99), (2L, "c", 11L, 2L, "a", 5.00),
      (3L, "c", 12L, 3L, "b", 7.00)), 0L)
    assert(rows(job.readTopK()) === Seq(
      Seq("a", 1L, 9.99, 1L), Seq("a", 2L, 5.00, 1L), Seq("b", 1L, 7.00, 1L)))
    // retract the leader: u2 must promote to rank 1 with no rescan source
    job.processBatch(batch((1L, "d", 20L, 4L, "a", 9.99)), 1L)
    assert(rows(job.readTopK()) === Seq(
      Seq("a", 1L, 5.00, 1L), Seq("b", 1L, 7.00, 1L)))
    // ...and a re-insert at a new level re-enters the board
    job.processBatch(batch((1L, "c", 30L, 5L, "a", 6.25)), 2L)
    assert(rows(job.readTopK()) === Seq(
      Seq("a", 1L, 6.25, 1L), Seq("a", 2L, 5.00, 1L), Seq("b", 1L, 7.00, 1L)))
  }
}
