package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming face of [[graft.cdc.CdcOps.scd2History]]: closed SCD
  * Type-2 versions emitted continuously as their closing change
  * arrives. A version is append-only once closed (its valid_to can
  * never move), which is exactly the Structured Streaming Append-mode
  * contract — so the history table this writes is directly the batch
  * operator's `valid_to IS NOT NULL` slice, row for row, version_no
  * for version_no (spec-asserted).
  *
  * State per key is ONE open version plus its version counter —
  * O(keys ever seen), independent of history length. A delete closes
  * the open version but the counter stays (batch numbers versions
  * across a delete→re-insert, so the counter must survive); no
  * timeout is needed for correctness (an idle key's open version is
  * simply not closed yet, the same as batch).
  *
  * Delivery contract: per-key nondecreasing (ts_ms, seq) order — the
  * Kafka keyed-by-primary-key layout, the same contract the eager
  * sessionizer documents. Cross-key interleaving is arbitrary.
  */
object Scd2Stream {

  case class Chg(user_id: Long, op: String, ts_ms: Long, seq: Long,
                 last_event_type: String, last_value: Double)
  case class OpenVer(from: Long, verNo: Int, et: String, v: Double)
  /** version counter survives the open version being closed */
  case class Scd2State(open: Option[OpenVer], nextVer: Int)
  case class ClosedVer(user_id: Long, last_event_type: String, last_value: Double,
                       valid_from: Long, valid_to: Long, version_no: Int)

  def closedVersions(spark: SparkSession, changes: Dataset[Chg]): Dataset[ClosedVer] = {
    import spark.implicits._
    changes
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, ClosedVer](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Chg], state: GroupState[Scd2State]) =>
          var st = state.getOption.getOrElse(Scd2State(None, 1))
          val out = List.newBuilder[ClosedVer]
          rows.toSeq.sortBy(c => (c.ts_ms, c.seq)).foreach { c =>
            st.open.foreach { o =>
              out += ClosedVer(userId, o.et, o.v, o.from, c.ts_ms, o.verNo)
            }
            st =
              if (c.op == "d") Scd2State(None, st.nextVer)
              else Scd2State(Some(OpenVer(c.ts_ms, st.nextVer, c.last_event_type, c.last_value)),
                st.nextVer + 1)
          }
          // keep the bare counter even with no open version: batch
          // version_no keeps counting across a delete → re-insert
          if (st.open.isEmpty && st.nextVer == 1) { if (state.exists) state.remove() }
          else state.update(st)
          out.result().iterator
      }
  }
}
