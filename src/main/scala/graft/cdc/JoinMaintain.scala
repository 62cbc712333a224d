package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Incremental maintenance of an aggregated JOIN view over TWO CDC
  * changelogs — the step past [[AggMaintain]]'s single-table
  * aggregates, and the classic materialized-view problem: keep
  *
  *   V = γ_{A.grp}( A ⋈_{A.key = B.fk} B ;  count(*), Σ cents(B.val) )
  *
  * current while BOTH sides evolve (inserts, updates — including
  * foreign-key moves — and deletes on either side), without ever
  * rescanning either base state.
  *
  * The delta rule is the textbook one, sequenced per epoch:
  *
  *   V_new = V + γ(ΔA ⋈ B_old) + γ(A_new ⋈ ΔB)
  *
  * where ΔA/ΔB are SIGNED image tranches ([[AggMaintain.signedImages]]:
  * −before / +after per touched key) and A_new = A_old + ΔA. Applying
  * ΔA against the OLD B and ΔB against the NEW A counts the
  * both-sides-changed overlap exactly once.
  *
  * The two join terms are where naive maintenance dies at 100 TB, and
  * each has a keyed answer:
  *
  *  - ΔA ⋈ B_old must NOT scan B: what a changed A-row needs from B is
  *    only the per-fk aggregate (n rows, Σ cents) for ITS key. So we
  *    maintain that secondary aggregate B_byfk = γ_{fk}(B) as its own
  *    incrementally-maintained view — literally
  *    [[AggMaintain.epochDelta]]/[[AggMaintain.applyDelta]] with
  *    group = fk — and ΔA joins the batch's keys against it. This is
  *    the "auxiliary view" of classic IVM, here BUILT FROM the same
  *    primitive it augments. At scale B_byfk is bucketed on fk — the
  *    same key A's state is bucketed on — so the lookup is co-located.
  *  - A_new ⋈ ΔB is a batch-keyed lookup of the fk against A's state
  *    (the dirty buckets the sink merge already reads), never a scan
  *    of A.
  *
  * Both deltas are batch-sized; the apply is a full-outer join of two
  * group-cardinality frames. Nothing scans untouched state — the
  * whole epoch costs what the sink's own merge pays, plus two keyed
  * batch joins.
  *
  * Like [[AggMaintain]], min/max-style measures are out of scope
  * (retraction needs a rescan); count/sum/avg form the abelian group
  * that makes ±delta maintenance exact. Values canonicalize to integer
  * cents BEFORE accumulation, so maintained == recomputed is
  * bit-equality in any epoch order.
  *
  * Reference relation: the reference merges each Debezium batch into
  * Delta and re-queries the joined tables downstream
  * (/root/reference/src/main/scala/com/sg/job/streaming/
  * StreamingJobExecutor.scala:49-65); this face keeps the joined
  * answer itself current for batch-sized cost per epoch.
  */
object JoinMaintain {

  /** Exact integer-cents canonicalization (same as [[AggMaintain]]). */
  private def cents(v: Column): Column =
    floor(v * lit(100d) + lit(0.5d)).cast("long")

  /** Deterministic orders-table CDC changelog — the second stream of
    * the two-sided story, derived in ONE scan (conditional image array
    * + explode, no per-op re-scan of the base):
    *   every order       → 'c' insert at o_orderdate;
    *   status 'O' orders → 'u' update 3 days later repricing to 95%
    *                       (a value update);
    *   status 'F' orders → 'u' update 3 days later moving the order to
    *                       custkey+1 (a FOREIGN-KEY move — the case
    *                       that distinguishes join maintenance from
    *                       aggregate maintenance);
    *   status 'P' orders → 'd' delete 5 days later.
    * Keyed by o_orderkey; (ts_ms, seq) orders changes within a key.
    */
  def ordersChangelog(spark: SparkSession, dir: String): DataFrame = {
    val dayMs = 86400000L
    val o = Tables.orders(spark, dir)
    val img = (op: Column, dt: Long, seq: Long, cust: Column, value: Column) =>
      // o_orderdate is TIMESTAMP_NTZ; sessions pin UTC, so the cast is fixed
      struct(op.as("op"), (unix_millis(col("o_orderdate").cast("timestamp")) + lit(dt * dayMs)).as("ts_ms"),
        lit(seq).as("seq"), cust.cast("long").as("cust"), value.cast("double").as("val"))
    o.select(col("o_orderkey"),
        explode(array_compact(array(
          img(lit("c"), 0L, 1L, col("o_custkey"), col("o_totalprice")),
          when(col("o_orderstatus") === "O",
            img(lit("u"), 3L, 2L, col("o_custkey"), col("o_totalprice") * 0.95)),
          when(col("o_orderstatus") === "F",
            img(lit("u"), 3L, 2L, col("o_custkey") + 1, col("o_totalprice"))),
          when(col("o_orderstatus") === "P",
            img(lit("d"), 5L, 3L, lit(null), lit(null)))))).as("ch"))
      .select(col("o_orderkey"), col("ch.op").as("op"), col("ch.ts_ms").as("ts_ms"),
        col("ch.seq").as("seq"), col("ch.cust").as("cust"), col("ch.val").as("val"))
  }

  val ordersDataCols: Seq[String] = Seq("cust", "val")

  /** From-scratch recompute of the join view from the two current
    * states — the face the maintained view must always equal. Plain
    * (not null-safe) fk equality: a NULL fk matches nothing, exactly
    * as the SQL oracle's inner join does.
    */
  def joinAgg(aState: DataFrame, bState: DataFrame,
              aKey: String, grpCol: String, fkCol: String, valCol: String): DataFrame =
    aState.select(col(aKey), col(grpCol).as("grp"))
      .join(bState.select(col(fkCol), col(valCol)), col(fkCol) === col(aKey))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_pairs"), sum(cents(col(valCol))).as("sum_cents"))

  /** View delta from the A side of one epoch: signed A images joined
    * against the maintained per-fk aggregate of B (OLD, pre-epoch) —
    * a user entering/leaving/moving groups carries its CURRENT order
    * mass with it. Inner join: keys with no B rows contribute nothing.
    */
  def deltaFromA(aState: DataFrame, aBatch: DataFrame, bByFk: DataFrame,
                 aKey: String, grpCol: String): DataFrame =
    AggMaintain.signedImages(aState, aBatch, Seq(aKey), Seq(grpCol))
      .join(bByFk.select(col("grp").as("__fk"), col("n_rows"), col("sum_cents")),
        col("__fk") === col(aKey))
      .select(col(grpCol).as("grp"),
        (col("sign") * col("n_rows")).as("dn"),
        (col("sign") * col("sum_cents")).as("dc"))

  /** View delta from the B side of one epoch: signed B images joined
    * against A's NEW (post-ΔA) state on the fk — each ±order row lands
    * in the group of the user it references now. Inner join: an order
    * whose fk has no live user (or a NULL fk) contributes nothing.
    */
  def deltaFromB(bState: DataFrame, bBatch: DataFrame, aStateNew: DataFrame,
                 bKey: String, fkCol: String, valCol: String,
                 aKey: String, grpCol: String): DataFrame =
    AggMaintain.signedImages(bState, bBatch, Seq(bKey), Seq(fkCol, valCol))
      .join(aStateNew.select(col(aKey), col(grpCol)), col(fkCol) === col(aKey))
      .select(col(grpCol).as("grp"), col("sign").as("dn"),
        (col("sign") * cents(col(valCol))).as("dc"))

  /** One maintenance epoch: returns (A_new, B_new, B_byfk_new, V_new).
    * Sequencing per the scaladoc delta rule — ΔA sees B_old (via
    * B_byfk_old), ΔB sees A_new.
    */
  def maintainEpoch(aState: DataFrame, bState: DataFrame, bByFk: DataFrame,
                    view: DataFrame, aBatch: DataFrame, bBatch: DataFrame,
                    aKey: String, grpCol: String, aDataCols: Seq[String],
                    bKey: String, fkCol: String, valCol: String)
  : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val dA = deltaFromA(aState, aBatch, bByFk, aKey, grpCol)
    val aNew = CdcOps.mergeChangeSet(aState, aBatch, Seq(aKey), aDataCols)
    val dB = deltaFromB(bState, bBatch, aNew, bKey, fkCol, valCol, aKey, grpCol)
    val vNew = AggMaintain.applyDelta(
      view.withColumnRenamed("n_pairs", "n_rows"),
      dA.unionByName(dB).groupBy("grp")
        .agg(sum("dn").as("d_n"), sum("dc").as("d_cents")))
      .withColumnRenamed("n_rows", "n_pairs")
    val bByFkNew = AggMaintain.applyDelta(bByFk,
      AggMaintain.epochDelta(bState, bBatch, Seq(bKey), fkCol, valCol))
    val bNew = CdcOps.mergeChangeSet(bState, bBatch, Seq(bKey), Seq(fkCol, valCol))
    (aNew, bNew, bByFkNew, vNew)
  }

  /** Per-epoch batches + cumulative committed states of the orders
    * changelog (multi-year tranches), mirroring
    * [[AggMaintain.cachedUserEpochs]]. Attributed as the
    * `cdc_orders_epochs` bench artifact.
    */
  def cachedOrdersEpochs(spark: SparkSession, dir: String): (Seq[DataFrame], Seq[DataFrame]) =
    graft.SessionCache.getOrElseUpdate(spark, ("ordersEpochs", dir)) {
      val ch = graft.SessionCache.getOrElseUpdate(spark, ("ordersChangelog", dir))(
        ordersChangelog(spark, dir).localCheckpoint(true))
      val batches = AggMaintain.tranches(ch,
        Seq("1996-09-01", "1998-05-01", "2000-01-01"))
      val s0 = CdcOps.latestState(batches.head, Seq("o_orderkey"), ordersDataCols)
        .drop("n_changes").localCheckpoint(true)
      val states = batches.tail.scanLeft(s0)((st, b) =>
        CdcOps.mergeChangeSet(st, b, Seq("o_orderkey"), ordersDataCols)
          .localCheckpoint(true))
      (batches, states)
    }

  /** Driver face: maintain the per-event-type (n_pairs, order_value)
    * join view of the user CDC state against the orders CDC state,
    * BOTH streams delivered in four epochs (weekly tranches of the
    * user feed interleaved with multi-year tranches of the orders
    * feed — epoching is delivery order, not wall-clock alignment).
    * The committed state chains are the shared epoch substrates (the
    * cost a real sink already pays, paid once per session here); the
    * view and the per-fk index flow ONLY through the delta path —
    * per-epoch signed images against the pre-epoch states, never a
    * rescan. The oracle recomputes the view from both full-range
    * latest states, so a missed fk-move retraction, a double-counted
    * both-sides epoch, or a user delete that strands order mass all
    * hash-mismatch.
    */
  def joinMaintain(spark: SparkSession, dir: String): DataFrame = {
    val (aKey, grpCol) = ("user_id", "last_event_type")
    val (bKey, fkCol, valCol) = ("o_orderkey", "cust", "val")
    val (aBatches, aStates) = AggMaintain.cachedUserEpochs(spark, dir)
    val (bBatches, bStates) = cachedOrdersEpochs(spark, dir)
    // pre-epoch state for epoch i (empty before epoch 0); post-epoch
    // state is aStates(i)/bStates(i) — ΔB joins the POST-ΔA user state,
    // which for whole-epoch sequencing is the committed aStates(i)
    val aPres = aStates.head.filter(lit(false)) +: aStates.init
    val bPres = bStates.head.filter(lit(false)) +: bStates.init
    var bByFk = AggMaintain.groupAgg(bPres.head, fkCol, valCol)
    val deltas = aBatches.indices.map { i =>
      val dA = deltaFromA(aPres(i), aBatches(i), bByFk, aKey, grpCol)
      val dB = deltaFromB(bPres(i), bBatches(i), aStates(i), bKey, fkCol, valCol, aKey, grpCol)
      bByFk = AggMaintain.applyDelta(bByFk,
        AggMaintain.epochDelta(bPres(i), bBatches(i), Seq(bKey), fkCol, valCol))
        // lazy cache, not an eager localCheckpoint: bByFk(i) has two
        // consumers (epoch i+1's delta-from-A join and its own next
        // fold) and persist() lets the one final job compute it once
        // and serve both — an eager checkpoint per epoch was measured
        // STRICTLY worse (4 extra tiny jobs of scheduling overhead
        // outcost the recompute they avoid on group-cardinality data)
        .persist()
      dA.unionByName(dB)
    }
    // every epoch's delta is still computed strictly against its
    // PRE-epoch states and index (the IVM path — never a base rescan);
    // only the APPLICATION is batched: applyDelta is an additive merge,
    // associative over any consistent delta stream (a group's support
    // hitting zero nets its cents to zero too), so one grouped sum of
    // all four epochs' signed rows equals the sequential four-fold —
    // the oracle's full recompute holds the equality — at ONE merge
    // shuffle instead of four full-outer joins chained through the
    // plan. A continuous deployment applies per epoch (see
    // StreamingJoinMaintainJob); this batch face folds the identical
    // deltas the way a catch-up replay would.
    val view = AggMaintain.applyDelta(
      joinAgg(aPres.head, bPres.head, aKey, grpCol, fkCol, valCol)
        .withColumnRenamed("n_pairs", "n_rows"),
      deltas.reduce(_.unionByName(_)).groupBy("grp")
        .agg(sum("dn").as("d_n"), sum("dc").as("d_cents")))
      .withColumnRenamed("n_rows", "n_pairs")
    view.select(col("grp").as("last_event_type"), col("n_pairs"),
        (col("sum_cents").cast("double") / 100d).as("order_value"))
      .orderBy("last_event_type")
  }

  /** The recompute the maintained join view must equal: both latest
    * states derived in full, joined and grouped with the identical
    * cents canonicalization.
    */
  val joinMaintainSql: String =
    """WITH ch AS (SELECT user_id,
      |  CASE event_type WHEN 'signup' THEN 'c' WHEN 'error' THEN 'd' ELSE 'u' END AS op,
      |  CAST(epoch_ms(ts) AS BIGINT) AS ts_ms, event_id AS seq,
      |  event_type AS last_event_type
      |FROM events),
      |ra AS (SELECT *,
      |  row_number() OVER (PARTITION BY user_id ORDER BY ts_ms DESC, seq DESC) AS rn
      |  FROM ch),
      |ustate AS (SELECT user_id, last_event_type FROM ra WHERE rn = 1 AND op <> 'd'),
      |och AS (
      |  SELECT o_orderkey, 'c' AS op, CAST(epoch_ms(o_orderdate) AS BIGINT) AS ts_ms,
      |         1 AS seq, CAST(o_custkey AS BIGINT) AS cust, o_totalprice AS val
      |  FROM orders
      |  UNION ALL
      |  SELECT o_orderkey, 'u', CAST(epoch_ms(o_orderdate) AS BIGINT) + 259200000,
      |         2, CAST(o_custkey AS BIGINT), o_totalprice * 0.95
      |  FROM orders WHERE o_orderstatus = 'O'
      |  UNION ALL
      |  SELECT o_orderkey, 'u', CAST(epoch_ms(o_orderdate) AS BIGINT) + 259200000,
      |         2, CAST(o_custkey + 1 AS BIGINT), o_totalprice
      |  FROM orders WHERE o_orderstatus = 'F'
      |  UNION ALL
      |  SELECT o_orderkey, 'd', CAST(epoch_ms(o_orderdate) AS BIGINT) + 432000000,
      |         3, NULL, NULL
      |  FROM orders WHERE o_orderstatus = 'P'),
      |rb AS (SELECT *,
      |  row_number() OVER (PARTITION BY o_orderkey ORDER BY ts_ms DESC, seq DESC) AS rn
      |  FROM och),
      |ostate AS (SELECT cust, val FROM rb WHERE rn = 1 AND op <> 'd')
      |SELECT u.last_event_type, count(*) AS n_pairs,
      |  CAST(sum(CAST(floor(o.val * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 AS order_value
      |FROM ustate u JOIN ostate o ON o.cust = u.user_id
      |GROUP BY 1 ORDER BY 1""".stripMargin
}
