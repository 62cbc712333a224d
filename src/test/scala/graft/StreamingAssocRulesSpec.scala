package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Analytics
import graft.streaming.StreamingAssocRulesJob

/** Streamed == batch for the market-basket rules: integer counts fold
  * exactly over order-whole batches and the read face is the batch
  * entry's own projection.
  */
class StreamingAssocRulesSpec extends AnyFunSuite with SparkSpec {

  private def li = Tables.lineitem(spark, sfDir)
  private def dim = Tables.part(spark, sfDir).select("p_partkey", "p_brand")

  /** Tranches by l_orderkey range — each ORDER lands wholly in one
    * batch, the job's delivery contract. */
  private def tranches(n: Int): Seq[DataFrame] = {
    val ids = li.agg(max("l_orderkey")).head.getLong(0) + 1
    (0 until n).map(i => li.filter(
      col("l_orderkey") >= i * ids / n && col("l_orderkey") < (i + 1) * ids / n))
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toList).toSeq.sortBy(_.toString)

  test("streamed rules equal the batch entry exactly") {
    val dir = java.nio.file.Files.createTempDirectory("sar").toString
    val job = new StreamingAssocRulesJob(spark, dir, dim)
    tranches(3).zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    assert(rows(job.readRules()) === rows(Analytics.assocRules(spark, sfDir)))
  }

  test("replay across compaction is a no-op on all three folds") {
    val dir = java.nio.file.Files.createTempDirectory("sar-rp").toString
    val job = new StreamingAssocRulesJob(spark, dir, dim, compactEvery = 2)
    val cuts = tranches(3)
    cuts.zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    val before = rows(job.readRules())
    cuts.zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    assert(rows(job.readRules()) === before)
  }

  test("empty state reads as empty rules") {
    val dir = java.nio.file.Files.createTempDirectory("sar-e").toString
    assert(new StreamingAssocRulesJob(spark, dir, dim).readRules().count() === 0)
  }
}
