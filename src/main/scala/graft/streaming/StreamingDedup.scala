package graft.streaming

import org.apache.spark.sql.DataFrame

/** Exact streaming deduplication — the streaming face of
  * graft.dedup.Dedup.exact for ingest pipelines (CDC replays, at-least-
  * once sources). `dropDuplicatesWithinWatermark` keeps the first row
  * per key and evicts key state once the event-time watermark passes
  * it, so state is O(keys within the horizon) rather than O(all keys
  * ever) — the property that makes exact ingest dedup viable on an
  * unbounded 100 TB/day stream. Later duplicates beyond the horizon
  * are the (documented) trade: catch those with the batch MinHash/exact
  * passes downstream.
  */
object StreamingDedup {

  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  watermarkCol: String, delay: String): DataFrame =
    events
      .withWatermark(watermarkCol, delay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
}
