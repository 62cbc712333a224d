package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions
import graft.streaming.StreamingTokenStatsJob

/** Streamed == batch for the token-statistics faces off one maintained
  * vocabulary relation.
  */
class StreamingTokenStatsSpec extends AnyFunSuite with SparkSpec {

  private def docs = Tables.documents(spark, sfDir)

  private def tranches(n: Int): Seq[DataFrame] = {
    val ids = docs.agg(max("doc_id")).head.getLong(0) + 1
    (0 until n).map(i => docs.filter(
      col("doc_id") >= i * ids / n && col("doc_id") < (i + 1) * ids / n))
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toList).toSeq.sortBy(_.toString)

  test("maintained vocab and zipf faces equal the batch entries") {
    val dir = java.nio.file.Files.createTempDirectory("sts").toString
    val job = new StreamingTokenStatsJob(spark, dir)
    tranches(3).zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    assert(rows(job.readVocab()) === rows(TextFunctions.tokenVocab(spark, sfDir)),
      "maintained vocabulary must equal the batch entry")
    assert(rows(job.readZipf()) === rows(TextFunctions.tokenZipfFit(spark, sfDir)),
      "maintained Zipf fit must equal the batch entry")
  }

  test("replay across compaction is a no-op on the vocabulary") {
    val dir = java.nio.file.Files.createTempDirectory("sts-rp").toString
    val job = new StreamingTokenStatsJob(spark, dir, compactEvery = 2)
    val cuts = tranches(3)
    cuts.zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    val before = rows(job.readVocab())
    cuts.zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    assert(rows(job.readVocab()) === before)
  }

  test("empty state reads as empty faces") {
    val dir = java.nio.file.Files.createTempDirectory("sts-e").toString
    val job = new StreamingTokenStatsJob(spark, dir)
    assert(job.readVocab().count() === 0)
    // the regression face is a global aggregate: one row, zero tokens
    assert(job.readZipf().collect().head.getLong(0) === 0L)
  }
}
