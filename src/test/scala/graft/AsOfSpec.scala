package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.AsOfJoinOps
import graft.queries.AsOf

class AsOfSpec extends AnyFunSuite with SparkSpec {

  test("custom AsOfJoinExec produces exactly the composed as-of join's result") {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id", "ts")
      .agg(max("event_id").as("view_id"), max_by(col("value"), col("event_id")).as("view_value"))

    val custom = AsOfJoinOps.asofJoin(purchases, views, "user_id", "ts")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("p_ts"),
        col("view_id_r").as("view_id"), col("ts_r").as("v_ts"),
        round(col("view_value_r"), 2).as("view_value"))
    val composed = AsOf.purchaseAttribution(spark, sfDir)
      .select("user_id", "purchase_id", "p_ts", "view_id", "v_ts", "view_value")

    assert(custom.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      "the custom physical operator should appear in the plan")
    assert(custom.exceptAll(composed).count() === 0, "custom minus composed")
    assert(composed.exceptAll(custom).count() === 0, "composed minus custom")
  }

  test("the asof_join driver entry runs on AsOfJoinExec and equals the composed form") {
    // the oracle-certified entry must exercise the whole-operator path:
    // lock the physical shape (AsOfJoinExec present, exactly one
    // exchange per side inserted by EnsureRequirements) and the rows
    val entry = AsOf.purchaseAttributionExec(spark, sfDir)
    val plan = entry.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"),
      s"driver entry must plan the custom operator:\n$plan")
    val composed = AsOf.purchaseAttribution(spark, sfDir)
    assert(entry.exceptAll(composed).count() === 0, "exec-entry minus composed")
    assert(composed.exceptAll(entry).count() === 0, "composed minus exec-entry")
  }

  test("forward as-of equals the brute-force earliest-following-view join") {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_uid"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id", "ts")
      .agg(max("event_id").as("view_id"), max_by(col("value"), col("event_id")).as("view_value"))
    // brute force: range join + min_by over every following view
    val expected = purchases
      .join(views, col("p_uid") === col("user_id") && col("p_ts") <= col("ts"))
      .groupBy("p_uid", "purchase_id", "p_ts")
      .agg(min_by(struct(col("view_id"), col("ts").as("v_ts"), col("view_value")),
        struct(col("ts"), col("view_id"))).as("m"))
      .select(col("p_uid").as("user_id"), col("purchase_id"), col("p_ts"),
        col("m.view_id").as("view_id"), col("m.v_ts").as("v_ts"),
        (unix_millis(col("m.v_ts")) - unix_millis(col("p_ts"))).as("wait_ms"),
        round(col("m.view_value"), 2).as("view_value"))
    val got = AsOf.nextViewAttribution(spark, sfDir)
    assert(got.count() > 0)
    assert(got.exceptAll(expected).count() === 0, "forward minus brute force")
    assert(expected.exceptAll(got).count() === 0, "brute force minus forward")
    // every wait is non-negative and the matched view never precedes the purchase
    assert(got.filter(col("wait_ms") < 0).count() === 0)
  }

  test("nearest as-of equals the brute-force minimal-|gap| join with backward tie-break") {
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_uid"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id", "ts")
      .agg(max("event_id").as("view_id"), max_by(col("value"), col("event_id")).as("view_value"))
    // brute force: all (purchase, view) pairs per user, argmin |gap|;
    // ties break to the EARLIER view (v_ts asc), matching the
    // operator's backward-wins rule
    val expected = purchases
      .join(views, col("p_uid") === col("user_id"))
      .withColumn("agap", abs(unix_millis(col("ts")) - unix_millis(col("p_ts"))))
      .groupBy("p_uid", "purchase_id", "p_ts")
      .agg(min_by(struct(col("view_id"), col("ts").as("v_ts"), col("view_value"), col("agap")),
        struct(col("agap"), col("ts"))).as("m"))
      .select(col("p_uid").as("user_id"), col("purchase_id"), col("p_ts"),
        col("m.view_id").as("view_id"), col("m.v_ts").as("v_ts"),
        col("m.agap").as("gap_ms"),
        round(col("m.view_value"), 2).as("view_value"))
    val got = AsOf.nearestViewAttribution(spark, sfDir)
    assert(got.count() > 0)
    assert(got.exceptAll(expected).count() === 0, "nearest minus brute force")
    assert(expected.exceptAll(got).count() === 0, "brute force minus nearest")
    // the nearest gap can never exceed either directional face's gap
    val back = AsOf.purchaseAttribution(spark, sfDir)
      .select(col("purchase_id"), col("gap_ms").as("b_gap"))
    assert(got.join(back, "purchase_id").filter(col("gap_ms") > col("b_gap")).count() === 0)
  }

  test("AsOfJoinExec is inner: left rows with no prior right row drop out") {
    import spark.implicits._
    val left = Seq((1L, 100L, "a"), (1L, 50L, "early"), (2L, 10L, "no-match"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 60L, 9.0), (1L, 90L, 7.0), (3L, 1L, 0.0))
      .toDF("k", "t", "v")
    val out = AsOfJoinOps.asofJoin(left, right, "k", "t")
      .select("tag", "t_r", "v_r").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // (1,100) matches (1,90); (1,50) has no right ≤ 50; key 2 has no right rows
    assert(out.toSet === Set(("a", 90L, 7.0)))
  }

  test("AsOfJoinExec equals a serial brute-force reference on randomized adversarial inputs (seeded)") {
    import spark.implicits._
    // nulls on both columns, colliding timestamps across keys, keys on
    // one side only, duplicate left rows — everything the zip-merge's
    // buffered-match state machine has to survive. Right side is
    // deduped per (k, t) so the winning row is well-defined (the
    // engine's own contract: views dedup per (user, ts) before the
    // join; with (k, t) dup right rows the tie winner is unspecified).
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 3) {
      val nKeys = 1 + rnd.nextInt(4)
      def rows(n: Int): Seq[(Option[Long], Option[Long], Long)] = Seq.fill(n)((
        if (rnd.nextInt(8) == 0) None else Some(rnd.nextInt(nKeys).toLong),
        if (rnd.nextInt(8) == 0) None else Some(rnd.nextInt(15).toLong),
        rnd.nextInt(1000).toLong))
      val left = rows(30 + rnd.nextInt(40)).toDF("k", "t", "lv")
      val right = rows(30 + rnd.nextInt(40)).toDF("k", "t", "rv")
        .groupBy("k", "t").agg(org.apache.spark.sql.functions.max("rv").as("rv"))

      val got = AsOfJoinOps.asofJoin(left, right, "k", "t")
        .select("k", "t", "lv", "t_r", "rv_r").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSeq.sorted

      val rightRows = right.collect().map(r => (
        Option(r.get(0)).map(_.asInstanceOf[Long]),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        r.getLong(2)))
      val expected = left.collect().flatMap { r =>
        val (k, t) = (Option(r.get(0)).map(_.asInstanceOf[Long]),
          Option(r.get(1)).map(_.asInstanceOf[Long]))
        for {
          kk <- k; tt <- t
          m <- rightRows.filter(x => x._1.contains(kk) && x._2.exists(_ <= tt))
            .sortBy(_._2.get).lastOption
        } yield (kk, tt, r.getLong(2), m._2.get, m._3)
      }.toSeq.sorted
      assert(got === expected, s"trial $trial diverged from the serial reference")
    }
  }

  test("null keys/timestamps never match (no zero-key aliasing)") {
    import spark.implicits._
    val left = Seq((Option(0L), Option(100L), "zero-key"),
                   (Option.empty[Long], Option(100L), "null-key"),
                   (Option(1L), Option.empty[Long], "null-ts"))
      .toDF("k", "t", "tag")
    val right = Seq((Option(0L), Option(50L), 1.0),
                    (Option.empty[Long], Option(10L), 2.0))
      .toDF("k", "t", "v")
    val out = AsOfJoinOps.asofJoin(left, right, "k", "t")
      .select("tag").collect().map(_.getString(0))
    // only the genuine key-0 row matches; a null key must NOT read as 0
    assert(out.toSet === Set("zero-key"))
  }

  test("equal timestamps match (backward >= semantics)") {
    import spark.implicits._
    val left = Seq((1L, 100L, "x")).toDF("k", "t", "tag")
    val right = Seq((1L, 100L, 5.0)).toDF("k", "t", "v")
    val out = AsOfJoinOps.asofJoin(left, right, "k", "t").select("tag", "v_r").collect()
    assert(out.length === 1 && out(0).getDouble(1) === 5.0)
  }
}
