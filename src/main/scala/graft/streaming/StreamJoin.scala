package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join: every purchase matched to
  * the views by the same user inside the preceding attribution window.
  *
  * This is the streaming capability the as-of operator family doesn't
  * cover: BOTH sides are unbounded, so the join must buffer state — and
  * the watermarks plus the closed time interval let Spark bound that
  * state (a view older than watermark + window can never match a future
  * purchase and is evicted). State size tracks the window, not the
  * stream; an inner interval join emits matches as they arrive.
  *
  * Input contract: purchases(user_id, purchase_id, p_ts),
  * views(v_user, view_id, v_ts, v_value).
  */
object StreamJoin {

  def purchaseViewStream(purchases: DataFrame, views: DataFrame,
                         windowMinutes: Int = 30,
                         watermark: String = "1 hour"): DataFrame =
    purchases.withWatermark("p_ts", watermark)
      .join(views.withWatermark("v_ts", watermark),
        expr(s"user_id = v_user AND " +
          s"v_ts >= p_ts - INTERVAL $windowMinutes MINUTES AND v_ts <= p_ts"))
}
