package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions
import graft.streaming.StreamingReadabilityJob

/** Streamed == batch for the readability profile: integer sums fold
  * exactly and the read face is the batch entry's own ratio
  * projection.
  */
class StreamingReadabilitySpec extends AnyFunSuite with SparkSpec {

  private def docs = Tables.documents(spark, sfDir)

  private def tranches(n: Int): Seq[DataFrame] = {
    val ids = docs.agg(max("doc_id")).head.getLong(0) + 1
    (0 until n).map(i => docs.filter(
      col("doc_id") >= i * ids / n && col("doc_id") < (i + 1) * ids / n))
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toList).toSeq.sortBy(_.toString)

  test("streamed profile equals the batch entry exactly") {
    val dir = java.nio.file.Files.createTempDirectory("srd").toString
    val job = new StreamingReadabilityJob(spark, dir)
    tranches(3).zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    assert(rows(job.readProfile()) === rows(TextFunctions.textReadability(spark, sfDir)))
  }

  test("replay across compaction leaves the folded sums untouched") {
    val dir = java.nio.file.Files.createTempDirectory("srd-rp").toString
    val job = new StreamingReadabilityJob(spark, dir, compactEvery = 2)
    val cuts = tranches(3)
    cuts.zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    val before = rows(job.readProfile())
    cuts.zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    assert(rows(job.readProfile()) === before)
  }

  test("empty state reads as an empty profile") {
    val dir = java.nio.file.Files.createTempDirectory("srd-e").toString
    assert(new StreamingReadabilityJob(spark, dir).readProfile().count() === 0)
  }
}
