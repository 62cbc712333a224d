package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich et al. 2016,
  * arXiv:1508.07909): start each word as characters (+ an end-of-word
  * marker), repeatedly merge the corpus's most frequent adjacent
  * symbol pair.
  *
  * Scale design — the whole algorithm runs on the WORD-FREQUENCY
  * table, not the corpus: one up-front token count collapses 100 TB of
  * text into |vocabulary| weighted rows (the standard BPE trick).
  * After that the cost driver is not data size but ROUND COUNT — each
  * round is a driver-scheduled Spark job, so a 30k-merge vocabulary at
  * one merge per round would cost ~30k sequential jobs (days of pure
  * scheduling at ~250 ms/job, regardless of cluster size). Rounds are
  * therefore BATCHED: each round aggregates pair counts once (map-side
  * partials over the bounded word table), then accepts up to `batch`
  * merges that are pairwise SYMBOL-DISJOINT in (count desc, left,
  * right) order. Disjointness makes the accepted counts exact — a
  * merge (a,b) can only change the count of a pair sharing a symbol
  * with {a, b, ab} — so every accepted merge is applied with the same
  * count it would have had if applied alone. Words shrunk to a single
  * symbol can never merge again and are dropped, so the table only
  * shrinks; per-round lineage is cut with localCheckpoint.
  *
  * Batch semantics vs strict serial BPE (documented tie-handling):
  * with `batch = 1` the trainer IS serial BPE — ties break
  * (count desc, left asc, right asc) under Spark's UTF-8 binary
  * string order (= code-point order), and the spec pins it to an
  * independent serial implementation using the same code-point
  * tie-break. With `batch > 1` the accepted set can deviate from
  * serial order in one documented case: a pair CREATED by an earlier
  * merge in the batch (one containing the new symbol `ab`) could have
  * outranked a later batch member in the serial schedule. This is the
  * standard distributed-BPE batching trade (created pairs wait one
  * round); it never produces an invalid merge — every accepted pair
  * existed with its exact corpus count when selected. The quality
  * impact is bounded by FREQUENCY-THRESHOLD acceptance: a round only
  * fills extra slots with pairs whose count is ≥ `thresholdFrac` of
  * the round's maximum, so a deferred created pair (count ≤ the max)
  * can displace only merges of comparable value. Batch size thereby
  * ADAPTS to the count distribution — chain-heavy early rounds accept
  * few merges (quality ≈ serial), the flat Zipf tail where a real
  * vocabulary spends its budget accepts full batches (rounds ≈
  * nMerges/batch); the spec enforces end-to-end compression parity
  * with serial.
  *
  * The per-word merge application is a JVM fold over the symbol
  * vector ([[mergeWord]]) via a typed map — the word table is
  * |vocabulary| rows of driver-known bounded width, not the corpus,
  * and a round applies up to `batch` merges in one pass where nested
  * higher-order column expressions would defeat codegen at real batch
  * sizes.
  */
object Bpe {

  val EndOfWord = "</w>"

  /** Max merges accepted per round; a real 30k-merge vocabulary costs
    * ~10³ rounds instead of ~10⁵ (the Zipf tail accepts full batches).
    */
  val DefaultBatch = 8

  /** A round's extra slots only accept pairs with count ≥ this
    * fraction of the round's max — the quality guard described above.
    */
  val DefaultThresholdFrac = 0.7

  /** Training is a deterministic function of (data dir, nMerges,
    * batch) — memoized via [[graft.SessionCache]] so `bpe_merges` and
    * `bpe_compression` in one driver/bench pass share ONE training run
    * instead of each paying the full round schedule.
    */

  /** (syms array<string>, w long) word-frequency table: every distinct
    * token split to characters plus the end-of-word marker, weighted by
    * corpus occurrence count.
    */
  def wordTable(docs: DataFrame): DataFrame =
    docs
      .select(explode(TextFunctions.wsTokens(trim(lower(col("text"))))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token")
      .agg(count(lit(1)).as("w"))
      .select(concat(split(col("token"), ""), array(lit(EndOfWord))).as("syms"), col("w"))

  /** Greedy left-to-right application of one merge to a symbol vector.
    * A symbol produced by the merge equals a+b and a+b != a (b is never
    * empty), so a fresh merge can't be re-consumed — exactly the
    * non-overlapping left-to-right semantics of reference BPE.
    */
  def mergeWord(s: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]; var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += (a + b); i += 2 }
      else { out += s(i); i += 1 }
    }
    out.result()
  }

  /** Learn `nMerges` merges, up to `batch` pairwise-disjoint ones per
    * round. Returns (left, right, weightedPairCount) in acceptance
    * order; `batch = 1` is exactly serial BPE.
    */
  def learnMerges(docs: DataFrame, nMerges: Int, batch: Int = 1,
                  thresholdFrac: Double = DefaultThresholdFrac): Seq[(String, String, Long)] = {
    require(batch >= 1, s"batch must be >= 1, got $batch")
    val spark = docs.sparkSession
    import spark.implicits._
    var words = wordTable(docs).as[(Seq[String], Long)].localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    while (merges.size < nMerges && !done) {
      val want = math.min(batch, nMerges - merges.size)
      // one bounded-table aggregation per ROUND (not per merge); the
      // candidate list is oversized so disjointness rejections rarely
      // starve a round
      val cand = words.toDF("syms", "w")
        .select(col("w"), explode(transform(sequence(lit(0), size(col("syms")) - 2),
          i => struct(element_at(col("syms"), i + 1).as("a"),
            element_at(col("syms"), i + 2).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("w").as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(math.max(4 * want, 16))
        .collect()
      // greedy symbol-disjoint acceptance in sorted order: a candidate
      // touching any accepted symbol (or an accepted OUTPUT symbol ab,
      // whose occurrences the batch is about to change) waits for the
      // next round's fresh counts
      val used = scala.collection.mutable.Set.empty[String]
      val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      val floorCount =
        if (cand.isEmpty) 0L else math.ceil(cand.head.getLong(2) * thresholdFrac).toLong
      cand.iterator.takeWhile { r =>
        accepted.size < want && (accepted.isEmpty || r.getLong(2) >= floorCount)
      }.foreach { r =>
        val (a, b, n) = (r.getString(0), r.getString(1), r.getLong(2))
        if (!used(a) && !used(b) && !used(a + b)) {
          accepted += ((a, b, n))
          used += a; used += b; used += (a + b)
        }
      }
      if (accepted.isEmpty) done = true
      else {
        merges ++= accepted
        val ms = accepted.map(m => (m._1, m._2)).toVector
        words = words
          .map { case (s, w) =>
            val v = ms.foldLeft(s.toVector) { case (cur, (a, b)) => mergeWord(cur, a, b) }
            (v: Seq[String], w)
          }
          .filter(_._1.size >= 2)
          .localCheckpoint(true)
      }
    }
    merges.toSeq
  }

  /** Memoized training front-door — both driver entries resolve their
    * merge list here, so the suite trains once per configuration.
    */
  def trainedMerges(spark: SparkSession, dir: String, nMerges: Int,
                    batch: Int = DefaultBatch): Seq[(String, String, Long)] =
    graft.SessionCache.getOrElseUpdate(spark, ("bpe", dir, nMerges, batch))(
      learnMerges(graft.Tables.documents(spark, dir), nMerges, batch))

  /** Encode the corpus with learned merges and report the compression —
    * the acceptance number tokenizer training is judged by. The merge
    * list is tiny (driver state), so encoding is ONE typed map over the
    * word-frequency table (per-partition imperative symbol merging —
    * the codec-at-the-boundary pattern) followed by a scalar aggregate;
    * the corpus itself is touched only by the up-front token count.
    */
  def bpeCompression(spark: SparkSession, dir: String, nMerges: Int = 20,
                     batch: Int = DefaultBatch): DataFrame = {
    import spark.implicits._
    val merges = trainedMerges(spark, dir, nMerges, batch).map(m => (m._1, m._2))
    val words = wordTable(graft.Tables.documents(spark, dir)).as[(Seq[String], Long)]
    words.map { case (syms, w) =>
      val encoded = merges.foldLeft(syms.toVector) { case (s, (a, b)) => mergeWord(s, a, b) }
      (w, syms.size.toLong * w, encoded.size.toLong * w)
    }.toDF("w", "sym_before", "sym_after")
      .agg(
        sum("w").as("n_tokens"),
        sum("sym_before").as("symbols_before"),
        sum("sym_after").as("symbols_after"))
      .select(col("n_tokens"), col("symbols_before"), col("symbols_after"),
        round(col("symbols_after").cast("double") / col("symbols_before"), 4)
          .as("compression"))
  }

  /** Driver entry: the learned merge table (rank, left, right, merged,
    * pair_count). Iterative training has no SQL oracle → rows-only;
    * the batch=1 serial-reference equality and the batched-round
    * properties live in the spec.
    */
  def bpeMerges(spark: SparkSession, dir: String, nMerges: Int = 20,
                batch: Int = DefaultBatch): DataFrame = {
    import spark.implicits._
    trainedMerges(spark, dir, nMerges, batch)
      .zipWithIndex
      .map { case ((a, b, n), i) => (i + 1, a, b, a + b, n) }
      .toDF("rank", "left", "right", "merged", "pair_count")
  }
}
