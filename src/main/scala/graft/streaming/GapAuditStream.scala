package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of [[graft.cdc.CdcQueries.gapAudit]]: sequence gaps
  * flagged AS THEY ARRIVE instead of in a post-hoc sweep — the alert
  * path of the same feed-integrity check (a lost-change gap pages an
  * operator; the batch audit quantifies the damage afterwards).
  *
  * State per key is the last (ts_ms, seq) pair — O(keys), constant per
  * key regardless of history. Emitted gap events are immutable facts
  * (Append contract): once seq jumps, that jump happened; a later
  * replay of the missing range is a NEW observation, not a retraction.
  *
  * Delivery contract: per-key nondecreasing (ts_ms, seq) arrival, the
  * same Kafka keyed-by-primary-key layout the other streaming faces
  * document. The aggregate of the emitted events equals the batch
  * audit row for row (spec-asserted).
  */
object GapAuditStream {

  case class Chg(user_id: Long, ts_ms: Long, seq: Long)
  case class LastSeen(ts_ms: Long, seq: Long)
  case class GapEvent(user_id: Long, after_seq: Long, gap_width: Long, at_ts_ms: Long)

  def gapEvents(spark: SparkSession, changes: Dataset[Chg]): Dataset[GapEvent] = {
    import spark.implicits._
    changes
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastSeen, GapEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Chg], state: GroupState[LastSeen]) =>
          val out = List.newBuilder[GapEvent]
          var last = state.getOption
          rows.toSeq.sortBy(c => (c.ts_ms, c.seq)).foreach { c =>
            last.foreach { l =>
              if (c.seq != l.seq + 1)
                out += GapEvent(userId, l.seq, c.seq - l.seq - 1, c.ts_ms)
            }
            last = Some(LastSeen(c.ts_ms, c.seq))
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }
}
