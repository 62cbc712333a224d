package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Analytics
import graft.streaming.StreamingDailyRevenueJob

/** Streamed == batch for both calendar revenue faces off ONE
  * maintained relation. The order-grain cents quantization makes the
  * fold invariant to how rows are batched, so the tranches here split
  * DAYS across batches on purpose.
  */
class StreamingDailyRevenueSpec extends AnyFunSuite with SparkSpec {

  private def orders = Tables.orders(spark, sfDir)

  /** Tranches by o_orderkey — day cells deliberately span batches. */
  private def tranches(n: Int): Seq[DataFrame] = {
    val ids = orders.agg(max("o_orderkey")).head.getLong(0) + 1
    (0 until n).map(i => orders.filter(
      col("o_orderkey") >= i * ids / n && col("o_orderkey") < (i + 1) * ids / n))
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toList).toSeq.sortBy(_.toString)

  test("both maintained faces equal the batch entries under day-splitting batches") {
    val dir = java.nio.file.Files.createTempDirectory("sdr").toString
    val job = new StreamingDailyRevenueJob(spark, dir)
    tranches(3).zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    assert(rows(job.readRolling()) === rows(Analytics.rollingRevenue7d(spark, sfDir)),
      "maintained rolling 7d must equal the batch entry")
    assert(rows(job.readMonthly()) === rows(Analytics.monthlyGrowth(spark, sfDir)),
      "maintained monthly growth must equal the batch entry")
  }

  test("replay is a no-op on the folded cents") {
    val dir = java.nio.file.Files.createTempDirectory("sdr-rp").toString
    val job = new StreamingDailyRevenueJob(spark, dir, compactEvery = 2)
    val cuts = tranches(3)
    cuts.zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    val before = rows(job.readRolling())
    cuts.zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    assert(rows(job.readRolling()) === before)
  }

  test("empty state reads as empty faces") {
    val dir = java.nio.file.Files.createTempDirectory("sdr-e").toString
    val job = new StreamingDailyRevenueJob(spark, dir)
    assert(job.readRolling().count() === 0)
    assert(job.readMonthly().count() === 0)
  }
}
