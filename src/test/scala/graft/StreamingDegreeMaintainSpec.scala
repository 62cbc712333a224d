package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingDegreeMaintainJob

/** The streamed degree table must equal a from-scratch recompute over
  * every basket seen so far after EVERY micro-batch — the set-novelty
  * twist on the [[graft.streaming.StreamingTopKMaintainJob]] crash
  * discipline: the maintained object is the edge set, and a replayed
  * or repeated edge must never count twice.
  */
class StreamingDegreeMaintainSpec extends AnyFunSuite with SparkSpec {

  private def li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey")

  private def degMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  /** n whole-order tranches at orderkey quantile bounds. */
  private def tranches(n: Int): Seq[DataFrame => DataFrame] = {
    val qs = (1 until n).map(_.toDouble / n).toArray
    val bounds = li.stat.approxQuantile("l_orderkey", qs, 0.0).map(_.toLong)
    val lows = Long.MinValue +: bounds.toSeq
    val highs = bounds.toSeq :+ Long.MaxValue
    lows.zip(highs).map { case (lo, hi) =>
      (c: DataFrame) => c.filter(col("l_orderkey") >= lo && col("l_orderkey") < hi)
    }
  }

  private def recompute(upTo: Int, cuts: Seq[DataFrame => DataFrame]): Map[Long, Long] = {
    val prefix = (0 to upTo).map(cuts(_)(li)).reduce(_ unionByName _)
    val pairs = prefix.groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
      .filter(size(col("parts")) >= 2)
      .select(explode(graft.dedup.Dedup.postingPairs(col("parts"))).as("pr"))
      .select(col("pr.id_a").as("src"), col("pr.id_b").as("dst"))
      .distinct()
    degMap(pairs.select(col("src").as("node"))
      .union(pairs.select(col("dst").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree")))
  }

  test("streamed degrees equal the batch recompute after every micro-batch") {
    val dir = java.nio.file.Files.createTempDirectory("sdm").toString
    val job = new StreamingDegreeMaintainJob(spark, dir)
    val cuts = tranches(3)
    cuts.zipWithIndex.foreach { case (cut, i) =>
      job.processBatch(cut(li), i.toLong)
      assert(degMap(job.readDegrees()) === recompute(i, cuts),
        s"after batch $i: streamed degrees diverged from batch recompute")
    }
    // tail replay of the last committed batch must be a no-op
    val before = degMap(job.readDegrees())
    job.processBatch(cuts.last(li), (cuts.size - 1).toLong)
    assert(degMap(job.readDegrees()) === before, "tail replay changed the degrees")
  }

  test("a crash after either step converges on replay") {
    val cuts = tranches(2)
    val want = recompute(1, cuts)
    (1 to 2).foreach { stopAfter =>
      val dir = java.nio.file.Files.createTempDirectory(s"sdm-crash$stopAfter").toString
      val job = new StreamingDegreeMaintainJob(spark, dir)
      job.processBatch(cuts(0)(li), 0L)
      job.processBatchSteps(cuts(1)(li), 1L, stopAfter)
      job.processBatch(cuts(1)(li), 1L)
      assert(degMap(job.readDegrees()) === want,
        s"crash after step $stopAfter did not converge on replay")
    }
  }

  test("fresh-checkpoint full replay (with compaction) leaves the degrees unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("sdm-replay").toString
    val job = new StreamingDegreeMaintainJob(spark, dir, compactEvery = 2)
    val cuts = tranches(3)
    cuts.zipWithIndex.foreach { case (cut, i) => job.processBatch(cut(li), i.toLong) }
    val before = degMap(job.readDegrees())
    assert(before === recompute(2, cuts))
    cuts.zipWithIndex.foreach { case (cut, i) => job.processBatch(cut(li), i.toLong) }
    assert(degMap(job.readDegrees()) === before,
      "full replay from a fresh checkpoint changed the degrees")
  }

  test("an edge repeating across batches counts once (set novelty, not blind addition)") {
    import spark.implicits._
    def basket(order: Long, parts: Long*): DataFrame =
      parts.map(p => (order, p)).toDF("l_orderkey", "l_partkey")
    val dir = java.nio.file.Files.createTempDirectory("sdm-novel").toString
    val job = new StreamingDegreeMaintainJob(spark, dir)
    // batch 0: orders {1,2} and {2,3}; batch 1 repeats edge (1,2) in a
    // new order and adds (3,4)
    job.processBatch(basket(10L, 1L, 2L).union(basket(11L, 2L, 3L)), 0L)
    assert(degMap(job.readDegrees()) === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
    job.processBatch(basket(20L, 1L, 2L).union(basket(21L, 3L, 4L)), 1L)
    assert(degMap(job.readDegrees()) === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L),
      "a repeated edge must not increment degrees")
  }
}
