package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable distributed quantile sketch — a bottom-k (KMV-style)
  * uniform sample keyed by a 60-bit content hash, packaged as a typed
  * [[Aggregator]] so `functions.udaf` gives it map-side partial
  * aggregation like any built-in.
  *
  * Why bottom-k and not t-digest/KLL: the sample is a PURE FUNCTION OF
  * THE ROW SET. Keeping the k smallest hash keys is associative,
  * commutative, AND idempotent (set semantics — re-ingesting the same
  * rows cannot change the sketch), so per-day / per-shard sketches
  * merge to exactly the sketch of the union, in any order, with
  * replays. That is the property a 100 TB rollup pipeline needs:
  * quantiles of any group combination come from k-entry sketches, no
  * re-scan, no global sort; a quantile's standard rank error is
  * ~sqrt(p(1-p)/k) (k=256 → ±3.1% at the median).
  *
  * State is bounded at k (key, value) pairs per group; reduce is
  * O(k) worst case on insert (a linear insertion — at k=256 the
  * vector copy is cheaper than heap bookkeeping) and O(1) on the
  * common reject path (key above the current max). Set semantics are
  * enforced on BOTH paths: reduce rejects a key already in the buffer
  * and merge dedups after a full (key, value) sort, so a replayed row
  * is a no-op everywhere and a (vanishingly rare) 60-bit hash
  * collision resolves to the same (key, value)-minimal entry whether
  * the colliding rows meet in reduce or in merge, in any order.
  */
class BottomKSketch(k: Int)
    extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {

  override def zero: Seq[(Long, Double)] = Vector.empty

  override def reduce(b: Seq[(Long, Double)], a: (Long, Double)): Seq[(Long, Double)] =
    if (b.size >= k && a._1 > b.last._1) b
    else {
      val j = b.indexWhere(_._1 == a._1)
      if (j >= 0) {
        // key already present: keep the (key, value)-minimal entry, the
        // same collision rule as merge — a replayed row is a no-op and
        // a 60-bit hash collision resolves identically on every path
        if (b(j)._2 <= a._2) b else b.updated(j, a)
      } else {
        val i = b.indexWhere(_._1 > a._1)
        val ins = if (i < 0) b :+ a else (b.take(i) :+ a) ++ b.drop(i)
        if (ins.size > k) ins.take(k) else ins
      }
    }

  override def merge(b1: Seq[(Long, Double)], b2: Seq[(Long, Double)]): Seq[(Long, Double)] =
    (b1 ++ b2).sorted.distinctBy(_._1).take(k)

  override def finish(b: Seq[(Long, Double)]): Seq[(Long, Double)] = b

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
}

object QuantileSketch {

  val DefaultK = 256

  /** The sketch as a SQL aggregate: `bottomK(hashKey, value)`. */
  def bottomK(k: Int = DefaultK): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(new BottomKSketch(k))

  /** 60-bit content-hash key — same md5-prefix trick as the weighted
    * sampler / state checksum, so the sketch is engine- and
    * retry-stable, never `rand()`-dependent.
    */
  def hashKey(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 15), 16, 10).cast("long")

  /** Rank-p estimate from a sketch's value array (nearest-rank over the
    * uniform sample), as a plain SQL expression over the entries.
    */
  def estimate(sketch: Column, p: Double): Column = {
    val vals = array_sort(transform(sketch, e => e.getField("_2")))
    element_at(vals, greatest(lit(1), ceil(size(vals) * lit(p)).cast("int")))
  }

  /** Streaming face: the SAME aggregator as streaming state — Spark
    * holds one bounded sketch per group and folds each micro-batch in
    * through the partial-merge path, so a continuously-ingesting
    * pipeline always has current quantiles at k-entry cost per group.
    * Because the sketch is a pure function of the row set, the
    * streamed result is bit-identical to batch (spec), not merely
    * approximate-equal.
    */
  def quantileSketchStream(events: DataFrame, k: Int = DefaultK): DataFrame = {
    val agg = bottomK(k)
    events
      .select(col("event_type"), hashKey(col("event_id")).as("hkey"), col("value"))
      .groupBy("event_type")
      .agg(agg(col("hkey"), col("value")).as("sketch"))
  }

  /** Per-event-type quantile estimates from bounded sketches — the
    * driver entry. Approximate as a QUANTILE (rank error ~√(p(1−p)/k),
    * spec'd) but fully DETERMINISTIC as a computation: the sample is
    * the bottom-k of 60-bit md5 keys with a (key, value)-minimal
    * collision rule, so [[quantileSketchSql]] replays the exact sample
    * and both nearest-rank reads — hash-CERTIFIED since r14 (one wrong
    * sample member, collision resolution, or rank index mismatches).
    */
  def quantileSketch(spark: SparkSession, dir: String, k: Int = DefaultK): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
    val agg = bottomK(k)
    ev.select(col("event_type"), hashKey(col("event_id")).as("hkey"), col("value"))
      .groupBy("event_type")
      .agg(agg(col("hkey"), col("value")).as("sketch"))
      .select(col("event_type"),
        size(col("sketch")).as("n_sample"),
        round(estimate(col("sketch"), 0.5), 2).as("p50_est"),
        round(estimate(col("sketch"), 0.9), 2).as("p90_est"))
      .orderBy("event_type")
  }

  /** [[quantileSketch]] replayed: the same 60-bit md5 keys, the same
    * per-key value-min collision rule, the same bottom-k cut and the
    * same nearest-rank indices (ceil(n·p), floored at 1) — the sketch
    * is a pure function of the row set, so the oracle rebuilds it
    * verbatim instead of tolerating it.
    */
  def quantileSketchSql(k: Int = DefaultK): String =
    s"""WITH h AS (
       |  SELECT event_type,
       |    ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS hkey,
       |    value
       |  FROM events),
       |d AS (SELECT event_type, hkey, min(value) AS value FROM h GROUP BY 1, 2),
       |r AS (SELECT event_type, hkey, value,
       |        row_number() OVER (PARTITION BY event_type ORDER BY hkey) AS rn
       |      FROM d),
       |s AS (SELECT event_type, value FROM r WHERE rn <= $k),
       |r2 AS (SELECT event_type, value,
       |         row_number() OVER (PARTITION BY event_type ORDER BY value) AS vr,
       |         count(*) OVER (PARTITION BY event_type) AS n
       |       FROM s)
       |SELECT event_type, CAST(max(n) AS INTEGER) AS n_sample,
       |  round(max(CASE WHEN vr = greatest(1, CAST(ceil(n * 0.5) AS BIGINT))
       |    THEN value END), 2) AS p50_est,
       |  round(max(CASE WHEN vr = greatest(1, CAST(ceil(n * 0.9) AS BIGINT))
       |    THEN value END), 2) AS p90_est
       |FROM r2 GROUP BY event_type ORDER BY event_type""".stripMargin
}
