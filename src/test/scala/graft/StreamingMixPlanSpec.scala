package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions
import graft.streaming.StreamingMixPlanJob

/** Streamed == batch for the temperature-mixture planner off one
  * maintained per-source stratum relation.
  */
class StreamingMixPlanSpec extends AnyFunSuite with SparkSpec {

  private def docs = Tables.documents(spark, sfDir)

  private def tranches(n: Int): Seq[DataFrame] = {
    val ids = docs.agg(max("doc_id")).head.getLong(0) + 1
    (0 until n).map(i => docs.filter(
      col("doc_id") >= i * ids / n && col("doc_id") < (i + 1) * ids / n))
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toList).toSeq.sortBy(_.toString)

  test("maintained plan equals the batch entry") {
    val dir = java.nio.file.Files.createTempDirectory("smp").toString
    val job = new StreamingMixPlanJob(spark, dir)
    tranches(3).zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    assert(rows(job.readPlan()) === rows(TextFunctions.mixTemperaturePlan(spark, sfDir)),
      "maintained mixture plan must equal the batch entry")
  }

  test("replay across compaction is a no-op on the plan") {
    val dir = java.nio.file.Files.createTempDirectory("smp-rp").toString
    val job = new StreamingMixPlanJob(spark, dir, compactEvery = 2)
    val cuts = tranches(3)
    cuts.zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    val before = rows(job.readPlan())
    cuts.zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    assert(rows(job.readPlan()) === before)
  }

  test("empty state reads as an empty plan") {
    val dir = java.nio.file.Files.createTempDirectory("smp-e").toString
    val job = new StreamingMixPlanJob(spark, dir)
    assert(job.readPlan().count() === 0)
  }
}
