package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc._

/** The maintained JOIN view ([[JoinMaintain]]) must equal a
  * from-scratch recompute of γ(A ⋈ B) AT EVERY EPOCH while BOTH sides
  * change — the defining invariant of incremental join-view
  * maintenance. Deltas are exact integer cents, so equality is
  * bit-equality, not tolerance.
  */
class JoinMaintainSpec extends AnyFunSuite with SparkSpec {

  private val aKey = "user_id"
  private val bKey = "o_orderkey"
  private val fkCol = "cust"
  private val valCol = "val"

  private def viewMap(df: DataFrame): Map[String, (Long, Long)] =
    df.collect().map { r =>
      val n = if (df.columns.contains("n_pairs")) "n_pairs" else "n_rows"
      Option(r.get(r.fieldIndex("grp"))).map(_.toString).getOrElse("∅") ->
        ((r.getLong(r.fieldIndex(n)), r.getLong(r.fieldIndex("sum_cents"))))
    }.toMap

  test("maintained join view == recomputed at every epoch over random tranche boundaries (seeded)") {
    val grpCol = "last_event_type"
    val chA = CdcOps.userChangelog(spark, sfDir).cache()
    val chB = JoinMaintain.ordersChangelog(spark, sfDir).cache()
    def range(ch: DataFrame): (Long, Long) = {
      val r = ch.agg(min("ts_ms"), max("ts_ms")).head(); (r.getLong(0), r.getLong(1))
    }
    val (aLo, aHi) = range(chA)
    val (bLo, bHi) = range(chB)
    val rnd = new scala.util.Random(11L)
    for (trial <- 1 to 2) {
      val k = rnd.nextInt(2) + 3 // epochs per trial
      def cuts(lo: Long, hi: Long): Seq[(Long, Long)] = {
        val inner = Seq.fill(k - 1)(lo + math.abs(rnd.nextLong()) % math.max(hi - lo, 1L)).sorted
        val b = (Long.MinValue +: inner) :+ Long.MaxValue
        b.zip(b.tail) // tranches may be EMPTY — an idle side in an epoch must be a no-op
      }
      val aCuts = cuts(aLo, aHi)
      val bCuts = cuts(bLo, bHi)
      var aState = CdcOps.latestState(chA.filter(lit(false)), Seq(aKey), CdcOps.userDataCols)
        .drop("n_changes").localCheckpoint(true)
      var bState = CdcOps.latestState(chB.filter(lit(false)), Seq(bKey), JoinMaintain.ordersDataCols)
        .drop("n_changes").localCheckpoint(true)
      var bByFk = AggMaintain.groupAgg(bState, fkCol, valCol).localCheckpoint(true)
      var view = JoinMaintain.joinAgg(aState, bState, aKey, grpCol, fkCol, valCol)
        .localCheckpoint(true)
      aCuts.zip(bCuts).zipWithIndex.foreach { case (((a0, a1), (b0, b1)), i) =>
        val aBatch = chA.filter(col("ts_ms") >= a0 && col("ts_ms") < a1)
        val bBatch = chB.filter(col("ts_ms") >= b0 && col("ts_ms") < b1)
        val (a2, b2, idx2, v2) = JoinMaintain.maintainEpoch(aState, bState, bByFk, view,
          aBatch, bBatch, aKey, grpCol, CdcOps.userDataCols, bKey, fkCol, valCol)
        aState = a2.localCheckpoint(true); bState = b2.localCheckpoint(true)
        bByFk = idx2.localCheckpoint(true); view = v2.localCheckpoint(true)
        // recompute BOTH states from the raw prefix (not the merge path)
        // and the view from them — catches sequencing errors in the
        // merge interleave as well as delta errors
        val aFull = CdcOps.latestState(chA.filter(col("ts_ms") < a1), Seq(aKey),
          CdcOps.userDataCols).drop("n_changes")
        val bFull = CdcOps.latestState(chB.filter(col("ts_ms") < b1), Seq(bKey),
          JoinMaintain.ordersDataCols).drop("n_changes")
        assert(viewMap(view) ===
          viewMap(JoinMaintain.joinAgg(aFull, bFull, aKey, grpCol, fkCol, valCol)),
          s"trial $trial epoch ${i + 1}: maintained join view diverged from recompute")
        // the auxiliary per-fk index must itself be maintained exactly
        assert(viewMap(bByFk) === viewMap(AggMaintain.groupAgg(bFull, fkCol, valCol)),
          s"trial $trial epoch ${i + 1}: maintained per-fk index diverged")
      }
    }
    chA.unpersist(); chB.unpersist()
  }

  test("fk moves, deletes and re-inserts on either side maintain exactly (hand-built epochs)") {
    import spark.implicits._
    val grpCol = "grp"
    def changesA(rows: (Long, String, Long, Long, String)*) =
      rows.toDF(aKey, "op", "ts_ms", "seq", grpCol)
    def changesB(rows: (Long, String, Long, Long, Option[Long], Option[Double])*) =
      rows.toDF(bKey, "op", "ts_ms", "seq", fkCol, valCol)
    // epoch 1: u1(a), u2(b); o1→u1 $1, o2→u2 $2, o3→dangling u999, o5→u3 (not yet live)
    val a1 = changesA((1L, "c", 10L, 1L, "a"), (2L, "c", 11L, 2L, "b"))
    val b1 = changesB((1L, "c", 10L, 1L, Some(1L), Some(1.0)),
      (2L, "c", 11L, 2L, Some(2L), Some(2.0)),
      (3L, "c", 12L, 3L, Some(999L), Some(4.0)),
      (5L, "c", 13L, 4L, Some(3L), Some(8.0)))
    // epoch 2: u1 deleted (strands o4, arriving the SAME epoch), u3 born
    // (its pre-existing order o5 lights up); o1 fk-moves u1→u2
    val a2 = changesA((1L, "d", 20L, 5L, "a"), (3L, "c", 21L, 6L, "a"))
    val b2 = changesB((1L, "u", 20L, 5L, Some(2L), Some(1.0)),
      (4L, "c", 21L, 6L, Some(1L), Some(16.0)))
    // epoch 3: u1 reborn in group c (o4's pair REAPPEARS there); o2
    // delete + re-insert intra-epoch nets to its final image (fk now 1);
    // o5 repriced in place
    val a3 = changesA((1L, "c", 30L, 7L, "c"))
    val b3 = changesB((2L, "d", 30L, 7L, None, None),
      (2L, "c", 31L, 8L, Some(1L), Some(2.5)),
      (5L, "u", 32L, 9L, Some(3L), Some(8.25)))
    var aState = CdcOps.latestState(a1.filter(lit(false)), Seq(aKey), Seq(grpCol))
      .drop("n_changes")
    var bState = CdcOps.latestState(b1.filter(lit(false)), Seq(bKey),
      JoinMaintain.ordersDataCols).drop("n_changes")
    var bByFk = AggMaintain.groupAgg(bState, fkCol, valCol)
    var view = JoinMaintain.joinAgg(aState, bState, aKey, grpCol, fkCol, valCol)
    val expected = Seq(
      Map("a" -> ((1L, 100L)), "b" -> ((1L, 200L))),
      Map("a" -> ((1L, 800L)), "b" -> ((2L, 300L))),
      Map("a" -> ((1L, 825L)), "b" -> ((1L, 100L)), "c" -> ((2L, 1850L))))
    Seq((a1, b1), (a2, b2), (a3, b3)).zip(expected).zipWithIndex.foreach {
      case (((aB, bB), want), i) =>
        val (x, y, z, v) = JoinMaintain.maintainEpoch(aState, bState, bByFk, view,
          aB, bB, aKey, grpCol, Seq(grpCol), bKey, fkCol, valCol)
        aState = x; bState = y; bByFk = z; view = v
        assert(viewMap(view) === want, s"epoch ${i + 1}: wrong view")
        assert(viewMap(view) === viewMap(JoinMaintain.joinAgg(aState, bState,
          aKey, grpCol, fkCol, valCol)), s"epoch ${i + 1}: diverged from recompute")
    }
  }

  test("a NULL fk matches nothing — even a null-keyed user state row (SQL inner-join semantics)") {
    import spark.implicits._
    val grpCol = "grp"
    def changesA(rows: (Option[Long], String, Long, Long, String)*) =
      rows.toDF(aKey, "op", "ts_ms", "seq", grpCol)
    def changesB(rows: (Long, String, Long, Long, Option[Long], Option[Double])*) =
      rows.toDF(bKey, "op", "ts_ms", "seq", fkCol, valCol)
    // a null-KEYED user exists as a real state row; o1 has a null FK —
    // the view join must NOT pair them (plain =, not <=>), while the
    // state-side before-image joins stay null-safe
    val a1 = changesA((None, "c", 10L, 1L, "a"), (Some(1L), "c", 11L, 2L, "b"))
    val b1 = changesB((1L, "c", 10L, 1L, None, Some(5.0)),
      (2L, "c", 11L, 2L, Some(1L), Some(1.0)))
    // the null-keyed user moves groups (null-safe retraction must fire,
    // to no view effect); o1's fk heals null→1 (adds under group b)
    val a2 = changesA((None, "u", 20L, 3L, "b"))
    val b2 = changesB((1L, "u", 20L, 3L, Some(1L), Some(5.0)))
    var aState = CdcOps.latestState(a1.filter(lit(false)), Seq(aKey), Seq(grpCol))
      .drop("n_changes")
    var bState = CdcOps.latestState(b1.filter(lit(false)), Seq(bKey),
      JoinMaintain.ordersDataCols).drop("n_changes")
    var bByFk = AggMaintain.groupAgg(bState, fkCol, valCol)
    var view = JoinMaintain.joinAgg(aState, bState, aKey, grpCol, fkCol, valCol)
    val expected = Seq(Map("b" -> ((1L, 100L))), Map("b" -> ((2L, 600L))))
    Seq((a1, b1), (a2, b2)).zip(expected).zipWithIndex.foreach {
      case (((aB, bB), want), i) =>
        val (x, y, z, v) = JoinMaintain.maintainEpoch(aState, bState, bByFk, view,
          aB, bB, aKey, grpCol, Seq(grpCol), bKey, fkCol, valCol)
        aState = x; bState = y; bByFk = z; view = v
        assert(viewMap(view) === want, s"epoch ${i + 1}: wrong view")
    }
  }

  // ---- streaming face ----

  private def trancheBounds(n: Int): Seq[(DataFrame => DataFrame, DataFrame => DataFrame)] = {
    // n equal-width ts tranches of each changelog, as (filterA, filterB)
    def cutsOf(ch: DataFrame): Seq[DataFrame => DataFrame] = {
      val r = ch.agg(min("ts_ms"), max("ts_ms")).head()
      val (lo, hi) = (r.getLong(0), r.getLong(1))
      val step = math.max((hi - lo) / n, 1L)
      (0 until n).map { i =>
        val a = if (i == 0) Long.MinValue else lo + i * step
        val b = if (i == n - 1) Long.MaxValue else lo + (i + 1) * step
        (df: DataFrame) => df.filter(col("ts_ms") >= a && col("ts_ms") < b)
      }
    }
    val chA = CdcOps.userChangelog(spark, sfDir)
    val chB = JoinMaintain.ordersChangelog(spark, sfDir)
    cutsOf(chA).zip(cutsOf(chB))
  }

  private def streamRecompute(upToEpoch: Int, n: Int): DataFrame = {
    val cuts = trancheBounds(n)
    val chA = CdcOps.userChangelog(spark, sfDir)
    val chB = JoinMaintain.ordersChangelog(spark, sfDir)
    val aPrefix = (0 to upToEpoch).map(i => cuts(i)._1(chA)).reduce(_ unionByName _)
    val bPrefix = (0 to upToEpoch).map(i => cuts(i)._2(chB)).reduce(_ unionByName _)
    JoinMaintain.joinAgg(
      CdcOps.latestState(aPrefix, Seq(aKey), CdcOps.userDataCols).drop("n_changes"),
      CdcOps.latestState(bPrefix, Seq(bKey), JoinMaintain.ordersDataCols).drop("n_changes"),
      aKey, "last_event_type", fkCol, valCol)
  }

  test("streaming job: maintained view equals batch recompute after every micro-batch") {
    val dir = java.nio.file.Files.createTempDirectory("sjm").toString
    val job = new graft.streaming.StreamingJoinMaintainJob(spark, dir)
    val chA = CdcOps.userChangelog(spark, sfDir)
    val chB = JoinMaintain.ordersChangelog(spark, sfDir)
    val cuts = trancheBounds(3)
    cuts.zipWithIndex.foreach { case ((fa, fb), i) =>
      job.processBatch(fa(chA), fb(chB), i.toLong)
      assert(viewMap(job.readView()) === viewMap(streamRecompute(i, 3)),
        s"after batch $i: streamed view diverged from batch recompute")
    }
    // tail replay of the last committed batch must be a no-op
    val before = viewMap(job.readView())
    job.processBatch(cuts.last._1(chA), cuts.last._2(chB), (cuts.size - 1).toLong)
    assert(viewMap(job.readView()) === before, "tail replay changed the view")
  }

  test("streaming job: a crash after any step converges on replay") {
    val chA = CdcOps.userChangelog(spark, sfDir)
    val chB = JoinMaintain.ordersChangelog(spark, sfDir)
    val cuts = trancheBounds(2)
    val want = viewMap(streamRecompute(1, 2))
    (1 to 4).foreach { stopAfter =>
      val dir = java.nio.file.Files.createTempDirectory(s"sjm-crash$stopAfter").toString
      val job = new graft.streaming.StreamingJoinMaintainJob(spark, dir)
      job.processBatch(cuts(0)._1(chA), cuts(0)._2(chB), 0L)
      // crash mid-batch-1 ...
      job.processBatchSteps(cuts(1)._1(chA), cuts(1)._2(chB), 1L, stopAfter)
      // ... then the stream replays the batch in full
      job.processBatch(cuts(1)._1(chA), cuts(1)._2(chB), 1L)
      assert(viewMap(job.readView()) === want,
        s"crash after step $stopAfter did not converge on replay")
    }
  }

  test("streaming job: fresh-checkpoint full replay (with compaction) leaves the view unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("sjm-replay").toString
    // compactEvery=2 so the folds compact mid-run — replayed batch ids
    // must be skipped by the marker even after their dirs are folded away
    val job = new graft.streaming.StreamingJoinMaintainJob(spark, dir, compactEvery = 2)
    val chA = CdcOps.userChangelog(spark, sfDir)
    val chB = JoinMaintain.ordersChangelog(spark, sfDir)
    val cuts = trancheBounds(3)
    cuts.zipWithIndex.foreach { case ((fa, fb), i) =>
      job.processBatch(fa(chA), fb(chB), i.toLong)
    }
    val before = viewMap(job.readView())
    assert(before === viewMap(streamRecompute(2, 3)))
    cuts.zipWithIndex.foreach { case ((fa, fb), i) =>
      job.processBatch(fa(chA), fb(chB), i.toLong)
    }
    assert(viewMap(job.readView()) === before,
      "full replay from a fresh checkpoint changed the view")
  }

  test("driver face equals the from-scratch recompute on full latest states") {
    val maintained = JoinMaintain.joinMaintain(spark, sfDir)
    val aFull = CdcOps.latestState(CdcOps.userChangelog(spark, sfDir), Seq(aKey),
      CdcOps.userDataCols).drop("n_changes")
    val bFull = CdcOps.latestState(JoinMaintain.ordersChangelog(spark, sfDir), Seq(bKey),
      JoinMaintain.ordersDataCols).drop("n_changes")
    val recomputed = JoinMaintain.joinAgg(aFull, bFull, aKey, "last_event_type", fkCol, valCol)
      .select(col("grp").as("last_event_type"), col("n_pairs"),
        (col("sum_cents").cast("double") / 100d).as("order_value"))
      .orderBy("last_event_type")
    assert(maintained.collect().toSeq === recomputed.collect().toSeq)
    assert(maintained.columns.toSeq === Seq("last_event_type", "n_pairs", "order_value"))
  }
}
