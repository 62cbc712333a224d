package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Batch CDC semantics: snapshot reconstruction, initial load, merge.
  *
  * These are the set-oriented equivalents of the reference's Delta
  * `merge` upsert (/root/reference/src/main/scala/com/sg/job/streaming/
  * StreamingJobExecutor.scala:49-65: whenMatched(op='d')→delete,
  * whenMatched→update, whenNotMatched→insert, keyed on id).
  *
  * A changelog DataFrame here is: keyCols ++ dataCols ++ (op, ts_ms, seq)
  * where (ts_ms, seq) totally orders changes within a key.
  *
  * Scale design: `latestState` uses `max_by(struct(...), struct(ts, seq))`
  * — an aggregation with map-side partial reduction (SortAggregate,
  * because struct-typed agg buffers are not hash-aggregable) — instead
  * of a `row_number` window. On 100 TB of changes, the partial agg
  * collapses each partition's updates for a key locally before the
  * single shuffle on the key; a window would shuffle and sort the full
  * changelog. Asserted in PlanSpec.
  */
object CdcOps {

  /** Deterministic CDC changelog derived from the `events` table: each
    * event is a change to a per-user state record.
    *   signup → 'c' (insert), error → 'd' (delete), others → 'u'.
    * Ordered per key by (ts_ms, seq).
    */
  def userChangelog(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir).select(
      col("user_id"),
      when(col("event_type") === "signup", "c")
        .when(col("event_type") === "error", "d")
        .otherwise("u").as("op"),
      unix_millis(col("ts")).as("ts_ms"),
      col("event_id").as("seq"),
      col("event_type").as("last_event_type"),
      col("value").as("last_value"))
  }

  val userDataCols: Seq[String] = Seq("last_event_type", "last_value")

  /** Memoized changelog for the DRIVER faces: nine CDC entries parse
    * the same events table — without sharing, each re-pays the scan +
    * projection. Same shared-artifact discipline as the dedup pair
    * table / ANN tiers / BPE training ([[graft.SessionCache]] holds the
    * scoping and staleness contract); the checkpoint materializes the
    * six changelog columns once, so every consumer reads checkpoint
    * blocks, not the parquet scan.
    */
  def cachedChangelog(spark: SparkSession, dir: String): DataFrame =
    graft.SessionCache.getOrElseUpdate(spark, ("cdcChangelog", dir))(
      userChangelog(spark, dir).localCheckpoint(true))

  /** Memoized latest-state (raw, un-rounded) per (session, dir): five
    * driver entries (latest_state, state_checksum, dim_enrichment,
    * merge_batch's oracle twin, gap audit consumers) otherwise each
    * re-run the same key aggregation behind their own face. One key
    * shuffle, materialized once per pass.
    */
  def cachedLatestState(spark: SparkSession, dir: String): DataFrame =
    graft.SessionCache.getOrElseUpdate(spark, ("cdcLatestState", dir))(
      latestState(cachedChangelog(spark, dir), Seq("user_id"), userDataCols)
        .localCheckpoint(true))

  private def imageStruct(dataCols: Seq[String]): Column =
    struct((col("op") +: dataCols.map(col)): _*)

  /** Latest surviving row per key: the batch meaning of continuous CDC
    * upsert. Deletes participate in recency, then drop out.
    * Output: keyCols ++ dataCols ++ (last_ts_ms, n_changes).
    */
  def latestState(changelog: DataFrame, keyCols: Seq[String], dataCols: Seq[String]): DataFrame = {
    changelog
      .groupBy(keyCols.map(col): _*)
      .agg(
        max_by(imageStruct(dataCols), struct(col("ts_ms"), col("seq"))).as("s"),
        max(col("ts_ms")).as("last_ts_ms"),
        count(lit(1)).as("n_changes"))
      .filter(col("s.op") =!= "d")
      .select(keyCols.map(col) ++ dataCols.map(f => col(s"s.$f").as(f)) ++
        Seq(col("last_ts_ms"), col("n_changes")): _*)
  }

  /** Initial snapshot (the reference's StreamingJobInitialExecutor path):
    * the first image per key, stamped op='r' as Debezium does for
    * snapshot reads.
    */
  def initialSnapshot(changelog: DataFrame, keyCols: Seq[String], dataCols: Seq[String]): DataFrame = {
    changelog
      .groupBy(keyCols.map(col): _*)
      .agg(min_by(imageStruct(dataCols), struct(col("ts_ms"), col("seq"))).as("s"),
           min(col("ts_ms")).as("first_ts_ms"))
      .select(keyCols.map(col) ++ Seq(lit("r").as("op")) ++
        dataCols.map(f => col(s"s.$f").as(f)) ++ Seq(col("first_ts_ms")): _*)
  }

  /** Per-op change accounting (audit stream). */
  def changeCounts(changelog: DataFrame, keyCol: String): DataFrame =
    changelog.groupBy("op")
      .agg(count(lit(1)).as("n"), countDistinct(col(keyCol)).as("n_keys"))
      .orderBy("op")

  /** SCD Type-2 dimension history from a changelog: every non-delete
    * change opens a version row; a version closes when the NEXT change
    * of the same key arrives (a delete closes the last open version
    * without opening a new one). `valid_to` is NULL on the open
    * version, so `WHERE valid_to IS NULL` is exactly `latestState` and
    * `WHERE valid_from <= t AND (valid_to IS NULL OR t < valid_to)`
    * is the as-of-`t` snapshot.
    *
    * Scale: both windows (lead + version numbering) share one
    * partitioning and ordering, so the changelog shuffles and sorts
    * ONCE on the key — the same single key-shuffle latestState pays.
    * No self-join against "next change"; the window frame carries it.
    *
    * Output: keyCols ++ dataCols ++ (valid_from, valid_to, is_current,
    * version_no).
    */
  def scd2History(changelog: DataFrame, keyCols: Seq[String], dataCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("ts_ms"), col("seq"))
    changelog
      .withColumn("valid_to", lead(col("ts_ms"), 1).over(w))
      .filter(col("op") =!= "d")
      .withColumn("version_no", row_number().over(w))
      .select(keyCols.map(col) ++ dataCols.map(col) ++ Seq(
        col("ts_ms").as("valid_from"),
        col("valid_to"),
        when(col("valid_to").isNull, 1).otherwise(0).as("is_current"),
        col("version_no")): _*)
  }

  /** Merge a change-set into a base state — exactly the reference's
    * Delta merge, as a pure DataFrame transform:
    *   matched ∧ latest-op='d'  → delete
    *   matched                  → update to latest after-image
    *   not matched ∧ op≠'d'     → insert
    *
    * Implementation: collapse the change-set per key first (map-side
    * partial agg), then ONE full-outer shuffle join against base on the
    * key. At scale the base is bucket-partitioned (see ParquetUpsertSink)
    * so only dirty buckets are rewritten.
    *
    * base schema: keyCols ++ dataCols ++ last_ts_ms (extra cols carried
    * through via coalesce-by-name when present on both sides).
    */
  def mergeChangeSet(base: DataFrame, changelog: DataFrame,
                     keyCols: Seq[String], dataCols: Seq[String]): DataFrame = {
    // schema evolution: dataCols is the UNION of base and batch data
    // columns. A column the batch doesn't carry (dropped from the feed,
    // or a clean-epoch column the batch predates) is CARRIED from base —
    // absence from the feed must not wipe values, unlike an in-image
    // NULL, which legitimately wins. A column base doesn't have yet
    // (just appeared in the feed) backfills NULL for untouched rows.
    val batchCols = changelog.columns.toSet
    val baseCols = base.columns.toSet
    val imgCols = dataCols.filter(batchCols.contains)
    val latestIncl = changelog
      .groupBy(keyCols.map(col): _*)
      .agg(
        max_by(imageStruct(imgCols), struct(col("ts_ms"), col("seq"))).as("s"),
        max(col("ts_ms")).as("c_last_ts_ms"))
    val b = base.alias("b")
    val c = latestIncl.alias("c")
    val joinCond = keyCols.map(k => col(s"b.$k") <=> col(s"c.$k")).reduce(_ && _)
    b.join(c, joinCond, "full_outer")
      .filter(col("c.s").isNull || col("c.s.op") =!= "d")
      .select(
        keyCols.map(k => coalesce(col(s"c.$k"), col(s"b.$k")).as(k)) ++
          // gate on IMAGE presence, not field nullness: an update that
          // legitimately sets a column to NULL must win — a per-field
          // coalesce would silently resurrect the base's stale value
          dataCols.map { f =>
            if (imgCols.contains(f) && baseCols.contains(f))
              when(col("c.s").isNotNull, col(s"c.s.$f")).otherwise(col(s"b.$f")).as(f)
            else if (imgCols.contains(f)) // new in this batch: base rows backfill NULL
              when(col("c.s").isNotNull, col(s"c.s.$f")).as(f)
            else // absent from this batch: carry base (NULL for new keys)
              col(s"b.$f").as(f)
          } ++ Seq(
          coalesce(col("c.c_last_ts_ms"), col("b.last_ts_ms")).as("last_ts_ms")): _*)
  }
}
