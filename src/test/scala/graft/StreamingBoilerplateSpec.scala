package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions
import graft.streaming.StreamingBoilerplateJob

/** Streamed == batch for the boilerplate faces off one maintained
  * sentence-df relation.
  */
class StreamingBoilerplateSpec extends AnyFunSuite with SparkSpec {

  private def docs = Tables.documents(spark, sfDir)

  private def tranches(n: Int): Seq[DataFrame] = {
    val ids = docs.agg(max("doc_id")).head.getLong(0) + 1
    (0 until n).map(i => docs.filter(
      col("doc_id") >= i * ids / n && col("doc_id") < (i + 1) * ids / n))
  }

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toList).toSeq.sortBy(_.toString)

  test("maintained per-doc face equals the batch entry") {
    val dir = java.nio.file.Files.createTempDirectory("sbp").toString
    val job = new StreamingBoilerplateJob(spark, dir)
    tranches(3).zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    assert(rows(job.readPerDoc(docs)) ===
      rows(TextFunctions.boilerplateStats(spark, sfDir)),
      "maintained sentence-df must reproduce the batch boilerplate profile")
  }

  test("summary face agrees with a literal recompute off the maintained state") {
    val dir = java.nio.file.Files.createTempDirectory("sbp-s").toString
    val job = new StreamingBoilerplateJob(spark, dir)
    tranches(2).zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    val st = job.state.state().get.collect()
      .map(r => r.getAs[String]("s") -> r.getAs[Long]("sdf"))
    val sm = job.readSummary().collect().head
    assert(sm.getAs[Long]("n_sentences") === st.length.toLong)
    assert(sm.getAs[Long]("n_boilerplate") === st.count(_._2 >= 2).toLong)
    val dupMass = st.filter(_._2 >= 2).map(_._2).sum.toDouble / st.map(_._2).sum
    assert(math.abs(sm.getAs[Double]("dup_occurrence_share") - dupMass) < 1e-4)
  }

  test("replay across compaction is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("sbp-rp").toString
    val job = new StreamingBoilerplateJob(spark, dir, compactEvery = 2)
    val cuts = tranches(3)
    cuts.zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    val before = rows(job.readPerDoc(docs))
    cuts.zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    assert(rows(job.readPerDoc(docs)) === before)
  }

  test("empty state reads as empty faces") {
    val dir = java.nio.file.Files.createTempDirectory("sbp-e").toString
    val job = new StreamingBoilerplateJob(spark, dir)
    assert(job.readPerDoc(docs).count() === 0)
    val sm = job.readSummary().collect().head
    assert(sm.getAs[Long]("n_sentences") === 0L)
    assert(sm.getAs[Double]("dup_occurrence_share") === 0.0)
  }
}
