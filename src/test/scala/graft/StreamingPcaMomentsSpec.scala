package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.similarity.Pca
import graft.streaming.StreamingPcaMomentsJob

/** The streamed moment state must reproduce the batch moment pass over
  * every prefix — additivity is the whole contract, so equality is to
  * float-addition-order tolerance (1e-9), checked after EVERY batch.
  */
class StreamingPcaMomentsSpec extends AnyFunSuite with SparkSpec {

  private def embs = Tables.embeddings(spark, sfDir)

  private def tranches(n: Int): Seq[DataFrame] = {
    val ids = embs.agg(max("vec_id")).head.getLong(0) + 1
    (0 until n).map(i => embs.filter(
      col("vec_id") >= i * ids / n && col("vec_id") < (i + 1) * ids / n))
  }

  private def assertClose(a: (Array[Double], Array[Array[Double]], Long),
                          b: (Array[Double], Array[Array[Double]], Long), tag: String): Unit = {
    assert(a._3 == b._3, s"$tag: counts differ ${a._3} vs ${b._3}")
    val dmean = a._1.zip(b._1).map { case (x, y) => math.abs(x - y) }.max
    assert(dmean < 1e-9, s"$tag: mean drift $dmean")
    val dcov = a._2.flatten[Double].zip(b._2.flatten[Double])
      .map { case (x, y) => math.abs(x - y) }.max
    assert(dcov < 1e-9, s"$tag: cov drift $dcov")
  }

  private def batchMoments(prefix: DataFrame): (Array[Double], Array[Array[Double]], Long) =
    Pca.momentsOf(Pca.momentRows(prefix).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))))

  test("streamed moments equal the batch pass after every micro-batch; spectrum matches") {
    val dir = java.nio.file.Files.createTempDirectory("spm").toString
    val job = new StreamingPcaMomentsJob(spark, dir)
    val cuts = tranches(3)
    cuts.zipWithIndex.foreach { case (cut, i) =>
      job.processBatch(cut, i.toLong)
      val prefix = cuts.take(i + 1).reduce(_ unionByName _)
      assertClose(job.readMoments().get, batchMoments(prefix), s"batch $i")
    }
    // full-corpus spectrum: streamed read face vs the batch driver face
    val streamed = job.readSpectrum().collect().map(_.toSeq)
    val batch = Pca.pcaSpectrum(spark, sfDir).collect().map(_.toSeq)
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) =>
      assert(s.head == b.head, "pc order differs")
      s.tail.zip(b.tail).foreach { case (x: Double, y: Double) =>
        assert(math.abs(x - y) <= 1e-6 + 1e-9, s"spectrum drift: $x vs $y")
      }
    }
  }

  test("replay and compaction leave the moments unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("spm-rp").toString
    val job = new StreamingPcaMomentsJob(spark, dir, compactEvery = 2)
    val cuts = tranches(3)
    cuts.zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    val before = job.readMoments().get
    // fresh-checkpoint full replay across the compacted marker
    cuts.zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    assertClose(job.readMoments().get, before, "replay")
  }

  test("empty state reads as None / empty spectrum") {
    val dir = java.nio.file.Files.createTempDirectory("spm-e").toString
    val job = new StreamingPcaMomentsJob(spark, dir)
    assert(job.readMoments().isEmpty)
    assert(job.readSpectrum().count() == 0)
  }
}
