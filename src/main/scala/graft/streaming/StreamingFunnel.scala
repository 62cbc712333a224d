package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp
import EventSessionizer.{epochMicros, microsToTs}

/** Streaming face of the ordered view→click→purchase funnel
  * ([[graft.queries.Analytics.funnelUserStages]] is the batch face):
  * per user, the first view, the first click strictly after it, the
  * first purchase strictly after that — tracked as THREE timestamps of
  * keyed state (O(active users), no event buffering: the same
  * heavy-user-proof property as the batch form's filtered
  * min-aggregates), emitted once when the user has been idle past the
  * horizon and the event-time watermark seals them.
  *
  * Delivery contract (same family as [[EventSessionizer.sessionizeStream]]):
  * exact batch equivalence when each key's events arrive in
  * nondecreasing event time (the Kafka-keyed-by-user layout). The fold
  * is order-sensitive by design — a view arriving AFTER a
  * same-user click it precedes in event time would have qualified that
  * click in batch; buffering the horizon per key would recover
  * out-of-order exactness at O(events-in-horizon) state, the
  * [[EventSessionizer.sessionizeStreamBuffered]] trade.
  */
object StreamingFunnel {

  /** Attribution window: a user's funnel row is final once they have
    * been idle this long in event time. Unlike a session gap this must
    * DOMINATE ordinary between-visit gaps (a funnel is first-touch over
    * the whole window, not per burst) — 30 days by default; a user
    * active again inside the window just extends their seal point.
    */
  val DefaultHorizonMicros: Long = 30L * 24 * 3600 * 1000000L

  case class FEv(user_id: Long, ts: Timestamp, event_type: String)
  /** Stage timestamps in epoch micros ([[EventSessionizer]]'s
    * convention — ms-only `Timestamp.getTime` would truncate the µs
    * the batch min(ts) keeps); `Unset` = stage not reached.
    */
  case class FunnelState(tView: Long, tClick: Long, tPurchase: Long, lastSeen: Long)
  case class FunnelOut(user_id: Long, t_view: Timestamp, t_click: Timestamp,
                       t_purchase: Timestamp)

  private val Unset = Long.MinValue

  def funnelStream(spark: SparkSession, events: Dataset[FEv],
                   horizonMicros: Long = DefaultHorizonMicros): Dataset[FunnelOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[FEv], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            if (s.tView != Unset)
              Iterator.single(FunnelOut(userId, microsToTs(s.tView),
                if (s.tClick == Unset) null else microsToTs(s.tClick),
                if (s.tPurchase == Unset) null else microsToTs(s.tPurchase)))
            else Iterator.empty
          } else {
            var s = state.getOption.getOrElse(FunnelState(Unset, Unset, Unset, Unset))
            rows.toSeq.sortBy(e => epochMicros(e.ts)).foreach { e =>
              val t = epochMicros(e.ts)
              e.event_type match {
                case "view" if s.tView == Unset =>
                  s = s.copy(tView = t)
                case "click" if s.tView != Unset && s.tClick == Unset && t > s.tView =>
                  s = s.copy(tClick = t)
                case "purchase" if s.tClick != Unset && s.tPurchase == Unset && t > s.tClick =>
                  s = s.copy(tPurchase = t)
                case _ => // stage already reached, out of order, or other event type
              }
              if (t > s.lastSeen) s = s.copy(lastSeen = t)
            }
            state.update(s)
            state.setTimeoutTimestamp((s.lastSeen + horizonMicros) / 1000L)
            Iterator.empty
          }
      }
  }
}
