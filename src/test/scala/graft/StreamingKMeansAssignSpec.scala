package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.similarity.KMeans
import graft.streaming.StreamingKMeansAssignJob

/** The streaming assignment face must serve the SAME model the batch
  * trainer would produce on the bootstrap tranche, assign later
  * batches byte-stably against it, and keep the maintained cluster
  * stats equal to a from-scratch recompute over everything ingested —
  * under replay and across compaction.
  */
class StreamingKMeansAssignSpec extends AnyFunSuite with SparkSpec {

  private def embs = Tables.embeddings(spark, sfDir)

  private def tranches(n: Int): Seq[DataFrame] = {
    val ids = embs.agg(max("vec_id")).head.getLong(0) + 1
    (0 until n).map(i => embs.filter(
      col("vec_id") >= i * ids / n && col("vec_id") < (i + 1) * ids / n))
  }

  private def statsOf(job: StreamingKMeansAssignJob): Map[Int, (Long, Double)] =
    job.readStats().collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  test("bootstrap trains on the first batch; later batches assign without retraining") {
    val dir = java.nio.file.Files.createTempDirectory("skm").toString
    val job = new StreamingKMeansAssignJob(spark, dir)
    val cuts = tranches(3)
    cuts.zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    // model == the batch trainer on the bootstrap tranche alone
    val got = job.readCentroids().get.collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val want = KMeans.train(KMeans.widen(cuts.head).localCheckpoint(true))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(got === want, "persisted model must be the bootstrap-tranche training result")
    // every ingested vector is assigned exactly once, to its argmin cluster
    val assigned = job.readAssignments().collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(assigned.length === embs.count())
    assert(assigned.map(_._1).distinct.length === assigned.length)
    val direct = KMeans.assign(KMeans.widen(embs).localCheckpoint(true),
        job.readCentroids().get)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assigned.foreach { case (id, c, _) =>
      assert(c === direct(id), s"vec $id assigned to $c, direct says ${direct(id)}")
    }
    // maintained stats == recompute from the assignment table
    val want2 = assigned.groupBy(_._2).map { case (c, rows) =>
      c -> ((rows.length.toLong, rows.map(_._3).sum / rows.length)) }
    val got2 = statsOf(job)
    assert(got2.keySet === want2.keySet)
    got2.foreach { case (c, (n, md)) =>
      assert(n === want2(c)._1, s"cluster $c count")
      assert(math.abs(md - want2(c)._2) < 1e-9, s"cluster $c mean dist")
    }
  }

  test("replay across compaction changes neither assignments nor stats") {
    val dir = java.nio.file.Files.createTempDirectory("skm-rp").toString
    val job = new StreamingKMeansAssignJob(spark, dir, compactEvery = 2)
    val cuts = tranches(3)
    cuts.zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    val beforeA = job.readAssignments().collect().map(_.toSeq).sortBy(_.toString)
    val beforeS = statsOf(job)
    cuts.zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    assert(job.readAssignments().collect().map(_.toSeq).sortBy(_.toString)
      .sameElements(beforeA), "replayed assignments must be byte-stable")
    assert(statsOf(job) === beforeS, "replayed stats must fold to the same state")
  }

  test("an empty first batch must not poison the model; empty state reads empty") {
    val dir = java.nio.file.Files.createTempDirectory("skm-e").toString
    val job = new StreamingKMeansAssignJob(spark, dir)
    assert(job.readStats().count() === 0)
    job.processBatch(embs.limit(0), 0L)
    assert(job.readCentroids().isEmpty, "empty batch must not bootstrap")
    job.processBatch(tranches(3).head, 1L)
    assert(job.readCentroids().nonEmpty)
    assert(job.readAssignments().count() > 0)
  }
}
