package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** As-of (backward) join — for each left row (key, ts), the latest
  * right row of the same key with r_ts ≤ ts. Spark has no native as-of
  * join; this module gives it two ways:
  *
  *   - [[purchaseAttribution]] composes built-ins: tag both sides, one
  *     union, ONE shuffle+sort on (key, ts), and a `last(_, ignoreNulls)`
  *     running window carries the latest right image forward into left
  *     rows. At 100 TB that is the minimal-shuffle formulation — the
  *     same single sort a sort-merge join would pay, no range explosion.
  *   - [[graft.plans.AsOfJoinExec]] is the whole-operator form (custom
  *     logical node + strategy + physical zip-merge exec), asserted
  *     equivalent in PlanSpec/AsOfSpec.
  *
  * Semantics follow DuckDB's `ASOF JOIN` (the oracle): inner, backward
  * (>=), one winning right row per left row.
  */
object AsOf {

  /** Tagged sides for the union trick: purchases (side=1) and views
    * deduped to one row per (user, ts) (side=0) so tie-at-equal-ts is
    * deterministic on both engines.
    */
  private def sides(ev: DataFrame): (DataFrame, DataFrame) = {
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("side"),
        col("event_id").as("purchase_id"), lit(null).cast("long").as("view_id"),
        lit(null).cast("double").as("view_value"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id", "ts")
      .agg(max("event_id").as("view_id"), max_by(col("value"), col("event_id")).as("view_value"))
      .select(col("user_id"), col("ts"), lit(0).as("side"),
        lit(null).cast("long").as("purchase_id"), col("view_id"), col("view_value"))
    (purchases, views)
  }

  /** Composed as-of join of purchases to their latest preceding view
    * per user.
    */
  def purchaseAttribution(spark: SparkSession, dir: String): DataFrame = {
    val (purchases, views) = sides(Tables.events(spark, dir))

    // right rows sort before left rows at equal ts → ts >= matches
    // equality. The matched view is carried as ONE struct so all its
    // fields come from the same winning row — separate last(_, ignore
    // Nulls) columns would skip a NULL view_value and pair it with an
    // older view's value (a row matching no actual view).
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionByName(views)
      .withColumn("m_view", last(when(col("side") === 0,
        struct(col("ts").as("v_ts"), col("view_id"), col("view_value"))),
        ignoreNulls = true).over(w))
      .filter(col("side") === 1 && col("m_view").isNotNull)
      .select(col("user_id"), col("purchase_id"), col("ts").as("p_ts"),
        col("m_view.view_id").as("view_id"), col("m_view.v_ts").as("v_ts"),
        (unix_millis(col("ts")) - unix_millis(col("m_view.v_ts"))).as("gap_ms"),
        round(col("m_view.view_value"), 2).as("view_value"))
      .orderBy("user_id", "purchase_id")
  }

  /** The whole-operator face of [[purchaseAttribution]] — the SAME
    * query routed through the custom physical operator
    * ([[graft.plans.AsOfJoinExec]]: logical node + strategy + zip-merge
    * exec). This is the `asof_join` DRIVER entry, so the path the
    * DuckDB oracle certifies every round is the custom operator, not
    * only the composed formulation (which AsOfSpec keeps asserting
    * equivalent). Same single key-shuffle + per-partition merge;
    * purchases with no preceding view inner-drop.
    */
  def purchaseAttributionExec(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id", "ts")
      .agg(max("event_id").as("view_id"), max_by(col("value"), col("event_id")).as("view_value"))
    graft.plans.AsOfJoinOps.asofJoin(purchases, views, "user_id", "ts")
      .select(col("user_id"), col("purchase_id"), col("ts").as("p_ts"),
        col("view_id_r").as("view_id"), col("ts_r").as("v_ts"),
        (unix_millis(col("ts")) - unix_millis(col("ts_r"))).as("gap_ms"),
        round(col("view_value_r"), 2).as("view_value"))
      .orderBy("user_id", "purchase_id")
  }

  /** FORWARD as-of: for each purchase, the EARLIEST view with
    * v_ts ≥ p_ts — "time to next engagement". Same single
    * shuffle+sort union trick as the backward join, with the sort
    * REVERSED (ts desc): walking from the largest ts down, the most
    * recently seen view is exactly the smallest v_ts ≥ the current
    * row's ts; views sort before purchases at equal ts so equality
    * matches. Oracle = DuckDB `ASOF JOIN ... ON p_ts <= v_ts`.
    */
  def nextViewAttribution(spark: SparkSession, dir: String): DataFrame = {
    val (purchases, views) = sides(Tables.events(spark, dir))
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionByName(views)
      .withColumn("m_view", last(when(col("side") === 0,
        struct(col("ts").as("v_ts"), col("view_id"), col("view_value"))),
        ignoreNulls = true).over(w))
      .filter(col("side") === 1 && col("m_view").isNotNull)
      .select(col("user_id"), col("purchase_id"), col("ts").as("p_ts"),
        col("m_view.view_id").as("view_id"), col("m_view.v_ts").as("v_ts"),
        (unix_millis(col("m_view.v_ts")) - unix_millis(col("ts"))).as("wait_ms"),
        round(col("m_view.view_value"), 2).as("view_value"))
      .orderBy("user_id", "purchase_id")
  }

  /** NEAREST as-of: for each purchase, the view minimizing |v_ts −
    * p_ts| in EITHER direction (ties → the earlier view, i.e. the
    * backward match) — "closest engagement" attribution, the third
    * face of the as-of family. Composition: the backward and forward
    * window columns are computed over the SAME user_id partitioning,
    * so the plan pays ONE shuffle and two in-partition sorts (asc +
    * desc) — not two joins and not a range explosion; the winner is a
    * map-side struct pick. Purchases with no view on either side drop
    * (inner contract, like the directional faces).
    */
  def nearestViewAttribution(spark: SparkSession, dir: String): DataFrame = {
    val (purchases, views) = sides(Tables.events(spark, dir))
    def mView = last(when(col("side") === 0,
      struct(col("ts").as("v_ts"), col("view_id"), col("view_value"))),
      ignoreNulls = true)
    val wB = Window.partitionBy("user_id").orderBy(col("ts"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy("user_id").orderBy(col("ts").desc, col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionByName(views)
      .withColumn("b_view", mView.over(wB))
      .withColumn("f_view", mView.over(wF))
      .filter(col("side") === 1 && (col("b_view").isNotNull || col("f_view").isNotNull))
      .withColumn("b_gap", unix_millis(col("ts")) - unix_millis(col("b_view.v_ts")))
      .withColumn("f_gap", unix_millis(col("f_view.v_ts")) - unix_millis(col("ts")))
      .withColumn("m_view", when(col("f_view").isNull ||
          (col("b_view").isNotNull && col("b_gap") <= col("f_gap")), col("b_view"))
        .otherwise(col("f_view")))
      .select(col("user_id"), col("purchase_id"), col("ts").as("p_ts"),
        col("m_view.view_id").as("view_id"), col("m_view.v_ts").as("v_ts"),
        abs(unix_millis(col("m_view.v_ts")) - unix_millis(col("ts"))).as("gap_ms"),
        round(col("m_view.view_value"), 2).as("view_value"))
      .orderBy("user_id", "purchase_id")
  }

  /** Oracle: DuckDB has no nearest ASOF — compose its two directional
    * ASOF LEFT JOINs and pick per row with the same tie rule.
    */
  val nearestViewAttributionSql: String = {
    val pickB = """(f.v_ts IS NULL OR (b.v_ts IS NOT NULL AND
      | epoch_ms(b.p_ts) - epoch_ms(b.v_ts) <= epoch_ms(f.v_ts) - epoch_ms(f.p_ts)))""".stripMargin
    s"""WITH p AS (
       |  SELECT user_id, event_id AS purchase_id, ts AS p_ts FROM events
       |  WHERE event_type = 'purchase'),
       |v AS (
       |  SELECT user_id, ts AS v_ts, max(event_id) AS view_id,
       |         arg_max(value, event_id) AS view_value
       |  FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
       |b AS (
       |  SELECT p.user_id AS user_id, purchase_id, p_ts, view_id, v_ts, view_value
       |  FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.p_ts >= v.v_ts),
       |f AS (
       |  SELECT p.user_id AS user_id, purchase_id, p_ts, view_id, v_ts, view_value
       |  FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.p_ts <= v.v_ts)
       |SELECT b.user_id AS user_id, b.purchase_id AS purchase_id, b.p_ts AS p_ts,
       |  CASE WHEN $pickB THEN b.view_id ELSE f.view_id END AS view_id,
       |  CASE WHEN $pickB THEN b.v_ts ELSE f.v_ts END AS v_ts,
       |  CAST(CASE WHEN $pickB THEN epoch_ms(b.p_ts) - epoch_ms(b.v_ts)
       |       ELSE epoch_ms(f.v_ts) - epoch_ms(f.p_ts) END AS BIGINT) AS gap_ms,
       |  round(CASE WHEN $pickB THEN b.view_value ELSE f.view_value END, 2) AS view_value
       |FROM b JOIN f ON b.purchase_id = f.purchase_id
       |WHERE b.v_ts IS NOT NULL OR f.v_ts IS NOT NULL
       |ORDER BY user_id, purchase_id""".stripMargin
  }

  val nextViewAttributionSql: String =
    """WITH p AS (
      |  SELECT user_id, event_id AS purchase_id, ts AS p_ts FROM events
      |  WHERE event_type = 'purchase'),
      |v AS (
      |  SELECT user_id, ts AS v_ts, max(event_id) AS view_id,
      |         arg_max(value, event_id) AS view_value
      |  FROM events WHERE event_type = 'view' GROUP BY user_id, ts)
      |SELECT p.user_id AS user_id, purchase_id, p_ts, view_id, v_ts,
      |  CAST(epoch_ms(v_ts) - epoch_ms(p_ts) AS BIGINT) AS wait_ms,
      |  round(view_value, 2) AS view_value
      |FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.p_ts <= v.v_ts
      |ORDER BY p.user_id, purchase_id""".stripMargin

  val purchaseAttributionSql: String =
    """WITH p AS (
      |  SELECT user_id, event_id AS purchase_id, ts AS p_ts FROM events
      |  WHERE event_type = 'purchase'),
      |v AS (
      |  SELECT user_id, ts AS v_ts, max(event_id) AS view_id,
      |         arg_max(value, event_id) AS view_value
      |  FROM events WHERE event_type = 'view' GROUP BY user_id, ts)
      |SELECT p.user_id AS user_id, purchase_id, p_ts, view_id, v_ts,
      |  CAST(epoch_ms(p_ts) - epoch_ms(v_ts) AS BIGINT) AS gap_ms,
      |  round(view_value, 2) AS view_value
      |FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.p_ts >= v.v_ts
      |ORDER BY p.user_id, purchase_id""".stripMargin
}
