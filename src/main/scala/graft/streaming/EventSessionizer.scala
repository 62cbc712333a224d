package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp
import graft.Tables

/** Sessionization (30-minute inactivity gap) — batch and streaming.
  *
  * Batch path: gaps-and-islands with window functions — a single
  * shuffle+sort on (user_id, ts). Streaming path: custom keyed state via
  * `flatMapGroupsWithState` with event-time timeout, the Structured
  * Streaming idiom for session windows the built-in tumbling/sliding
  * windows can't express.
  */
object EventSessionizer {

  val GapSeconds = 1800L

  /** Batch gaps-and-islands sessionization.
    * Output: user_id, session_id (1-based per user), n_events,
    * session_start, session_end, total_value.
    */
  def sessionizeBatch(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ms").isNull || unix_millis(col("ts")) - col("prev_ms") > GapSeconds * 1000, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        round(sum("value"), 2).as("total_value"))
      .orderBy("user_id", "session_id")
  }

  def sessionizeBatch(spark: SparkSession, dir: String): DataFrame =
    sessionizeBatch(Tables.events(spark, dir))

  val sessionizeSql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN CAST(epoch_ms(ts) AS BIGINT)
      |           - lag(CAST(epoch_ms(ts) AS BIGINT)) OVER w > 1800000
      |         OR lag(ts) OVER w IS NULL
      |    THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT user_id, ts, value,
      |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM flagged)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  min(ts) AS session_start, max(ts) AS session_end,
      |  round(sum(value), 2) AS total_value
      |FROM sessions GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** Daily session-quality rollup over the certified sessionization —
    * the canonical web/product-analytics KPI row: per session-start
    * day, session count, bounce rate (single-event sessions), mean
    * session duration (ms) and mean events per session. A rising
    * bounce rate is the first symptom of broken instrumentation or a
    * bot wave — both of which poison events-derived training data.
    *
    * Scale design: a ¦days¦-key rollup over the already-shuffled
    * session table — marginal cost on top of [[sessionizeBatch]].
    */
  def sessionBounce(spark: SparkSession, dir: String): DataFrame =
    sessionizeBatch(spark, dir)
      .groupBy(date_format(col("session_start"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounce"),
        round(avg(unix_millis(col("session_end")) - unix_millis(col("session_start"))), 4)
          .as("mean_duration_ms"),
        round(avg(col("n_events")), 4).as("mean_events"))
      .withColumn("bounce_rate",
        round(col("n_bounce").cast("double") / col("n_sessions"), 4))
      .orderBy("day")

  val sessionBounceSql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN CAST(epoch_ms(ts) AS BIGINT)
      |           - lag(CAST(epoch_ms(ts) AS BIGINT)) OVER w > 1800000
      |         OR lag(ts) OVER w IS NULL
      |    THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT user_id, ts,
      |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM flagged),
      |sess AS (
      |  SELECT user_id, session_id, count(*) AS n_events,
      |    min(ts) AS t0, max(ts) AS t1
      |  FROM sessions GROUP BY 1, 2)
      |SELECT strftime(t0, '%Y-%m-%d') AS day,
      |  CAST(count(*) AS BIGINT) AS n_sessions,
      |  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
      |  round(avg(CAST(epoch_ms(t1) - epoch_ms(t0) AS DOUBLE)), 4) AS mean_duration_ms,
      |  round(avg(CAST(n_events AS DOUBLE)), 4) AS mean_events,
      |  round(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS bounce_rate
      |FROM sess GROUP BY 1 ORDER BY 1""".stripMargin

  /** The same sessions through Spark's NATIVE `session_window` operator
    * — the declarative face of [[sessionizeBatch]]. Emitted
    * `session_end` is `sw.end - gap`, because the built-in's window end
    * is last-event-time + gap (an eviction horizon), while this module's
    * contract (and the oracle) reports the last event time itself.
    * Session starts/ends/counts/sums match the gaps-and-islands form
    * row for row, with the boundary pinned explicitly: the built-in
    * starts a NEW session at a gap of exactly 30:00.000000 (an event at
    * `last + gap` falls outside the half-open eviction horizon
    * `[start, last + gap)`), so this operator's oracle flags a new
    * session on `gap >= 30 min` — engine-identical even on data that
    * hits the exact boundary. ([[sessionizeBatch]]'s islands form and
    * its custom-state streaming twin keep the strict-`>` contract;
    * the two operator families are separate entries with matching
    * oracles each.)
    *
    * Scale: one shuffle on user_id, sessions merged inside the
    * aggregate — the same cost shape as the islands form but without
    * the two window passes (no sort-based lag + running sum); in
    * streaming mode this operator is ALSO the watermark-correct session
    * agg, so batch and stream share one declaration.
    */
  def sessionWindowBatch(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), s"$GapSeconds seconds").as("sw"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .select(col("user_id"),
        col("sw.start").as("session_start"),
        (col("sw.end") - expr(s"INTERVAL $GapSeconds SECONDS")).as("session_end"),
        col("n_events"), col("total_value"))
      .orderBy("user_id", "session_start")

  def sessionWindowBatch(spark: SparkSession, dir: String): DataFrame =
    sessionWindowBatch(Tables.events(spark, dir))

  val sessionWindowSql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN CAST(epoch_ms(ts) AS BIGINT)
      |           - lag(CAST(epoch_ms(ts) AS BIGINT)) OVER w >= 1800000
      |         OR lag(ts) OVER w IS NULL
      |    THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT user_id, ts, value,
      |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM flagged)
      |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
      |  count(*) AS n_events, round(sum(value), 2) AS total_value
      |FROM sessions GROUP BY user_id, session_id
      |ORDER BY user_id, session_start""".stripMargin

  /** Streaming face of [[sessionWindowBatch]] — the SAME declaration
    * under `readStream`: watermark + native session windows, append
    * mode emits each session once when the watermark passes its gap
    * horizon. State is Spark-managed (merged open windows per key),
    * the declarative counterpart of [[sessionizeStream]]'s explicit
    * `flatMapGroupsWithState` state machine; the spec pins all three
    * faces (native batch, native stream, custom state) to identical
    * rows on the testdata.
    */
  def sessionWindowStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), s"$GapSeconds seconds").as("sw"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .select(col("user_id"),
        col("sw.start").as("session_start"),
        (col("sw.end") - expr(s"INTERVAL $GapSeconds SECONDS")).as("session_end"),
        col("n_events"), col("total_value"))

  // ---------------- streaming path ----------------

  case class Ev(user_id: Long, ts: Timestamp, value: Double)
  /** start/end are epoch MICROSECONDS — `Timestamp.getTime` is ms-only and
    * would truncate the µs component the batch path's min(ts)/max(ts) keep. */
  case class SessionState(start: Long, end: Long, n: Long, total: Double)
  case class SessionOut(user_id: Long, session_start: Timestamp, session_end: Timestamp,
                        n_events: Long, total_value: Double)

  private[streaming] def epochMicros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private[streaming] def microsToTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Streaming sessionization: emits a session when the event-time
    * watermark passes its gap timeout. State per key is one open
    * session — O(active users), evicted on timeout.
    *
    * Delivery contract: exact batch equivalence holds when each key's
    * events arrive in nondecreasing event time (the Kafka-keyed-by-user
    * layout). A late-but-within-watermark event merges into the OPEN
    * session (extending start/end as needed) but cannot reopen a
    * session already emitted at gap detection — eager emission trades
    * that edge for O(1) state. [[sessionizeStreamBuffered]] is the
    * out-of-order-exact alternative (O(events-in-horizon) state).
    */
  def sessionizeStream(spark: SparkSession, events: Dataset[Ev]): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, microsToTs(s.start), microsToTs(s.end), s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(e => (epochMicros(e.ts), e.value))
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = epochMicros(e.ts)
              cur match {
                case Some(s) if withinGap(t, s.end) =>
                  cur = Some(SessionState(math.min(s.start, t), math.max(s.end, t),
                    s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed ::= SessionOut(userId, microsToTs(s.start), microsToTs(s.end), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end / 1000L + GapSeconds * 1000L)
            }
            closed.reverseIterator
          }
      }
  }

  case class BufferState(events: Seq[(Long, Double)])

  /** Gap compared at MILLISECOND resolution, exactly like the batch
    * path's unix_millis diff — a µs-resolution compare would split
    * sessions differently at the exact boundary. ONE shared rule for
    * the eager sessionizer, the buffered sessionizer, and (by
    * construction) the batch SQL, so the paths cannot drift apart.
    */
  private def withinGap(t: Long, end: Long): Boolean =
    Math.floorDiv(t, 1000L) - Math.floorDiv(end, 1000L) <= GapSeconds * 1000L

  /** Batch-rule gaps-and-islands fold over (µs, value) events sorted by
    * time — shared by the buffered sessionizer's seal-and-emit steps.
    */
  private def foldSessions(sorted: Seq[(Long, Double)]): Seq[SessionState] = {
    val out = scala.collection.mutable.ListBuffer.empty[SessionState]
    var cur: Option[SessionState] = None
    sorted.foreach { case (t, v) =>
      cur match {
        case Some(s) if withinGap(t, s.end) =>
          cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1, s.total + v))
        case Some(s) => out += s; cur = Some(SessionState(t, t, 1, v))
        case None => cur = Some(SessionState(t, t, 1, v))
      }
    }
    cur.foreach(out += _)
    out.toSeq
  }

  /** Watermark-exact sessionization for OUT-OF-ORDER delivery: events
    * buffer in keyed state; each batch re-sessionizes the sorted buffer
    * and emits exactly the sessions the watermark has SEALED (end + gap
    * < watermark — no admissible future event can extend them, since it
    * would be below the watermark and dropped). Unsealed sessions'
    * events stay buffered, so state is genuinely bounded by the
    * watermark horizon even for keys that never go idle; the event-time
    * timeout only flushes the tail when a key does go idle. Exact batch
    * equivalence for any arrival order the watermark admits (vs
    * [[sessionizeStream]]'s O(1) state + in-order delivery contract).
    */
  def sessionizeStreamBuffered(spark: SparkSession, events: Dataset[Ev]): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[BufferState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Ev], state: GroupState[BufferState]) =>
          def emit(s: SessionState) =
            SessionOut(userId, microsToTs(s.start), microsToTs(s.end), s.n, s.total)
          // one path for both wake-ups (new data OR timeout): re-fold the
          // buffer, emit the watermark-sealed prefix, keep the rest. The
          // timeout is armed at the FIRST open session's seal point — not
          // the last's — so an idle key's earlier sessions emit as soon
          // as the watermark seals them instead of waiting for the whole
          // buffered span to seal at once.
          val incoming =
            if (state.hasTimedOut) Seq.empty
            else rows.map(e => (epochMicros(e.ts), e.value)).toSeq
          val all = (state.getOption.map(_.events).getOrElse(Seq.empty) ++ incoming)
            .sortBy(identity)
          val wmMs = state.getCurrentWatermarkMs()
          val (finished, open) = foldSessions(all)
            .partition(s => Math.floorDiv(s.end, 1000L) + GapSeconds * 1000L < wmMs)
          open.headOption match {
            case Some(first) =>
              val remaining = all.filter(_._1 >= first.start)
              state.update(BufferState(remaining))
              // must be strictly beyond the current watermark or Spark
              // rejects the timestamp (seal check above is strict too)
              state.setTimeoutTimestamp(Math.max(
                Math.floorDiv(first.end, 1000L) + GapSeconds * 1000L, wmMs + 1L))
            case None => state.remove()
          }
          finished.iterator.map(emit)
      }
  }
}
