package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich et al. 2016,
  * arXiv:1508.07909): start each word as characters (+ an end-of-word
  * marker), repeatedly merge the corpus's most frequent adjacent
  * symbol pair.
  *
  * Scale design — the whole algorithm runs on the WORD-FREQUENCY
  * table, not the corpus: one up-front token count collapses 100 TB of
  * text into |vocabulary| weighted rows (the standard BPE trick), and
  * every round after that is (1) one pair-count aggregation over that
  * bounded table with map-side partials, (2) a 1-row driver argmax,
  * (3) one map pass applying the merge. Driver state is the merge list
  * itself. Words shrunk to a single symbol can never merge again and
  * are dropped from the working set, so the table only shrinks. The
  * per-round lineage is cut with localCheckpoint (same pattern as the
  * k-means trainer in Ann) — without it round N replays rounds 1..N-1.
  *
  * Ties break (count desc, left asc, right asc), making the learned
  * merges a deterministic function of the corpus; the spec pins the
  * distributed trainer to an independent serial implementation.
  */
object Bpe {

  val EndOfWord = "</w>"

  /** Greedy left-to-right application of ONE merge (a, b) to a symbol
    * array, as a fold: append each symbol, or replace the accumulator's
    * tail with the merged symbol when it pairs. A symbol produced by
    * the merge equals a+b and a+b != a (b is never empty), so a fresh
    * merge can't be re-consumed — exactly the non-overlapping
    * left-to-right semantics of reference BPE.
    */
  private def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

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

  /** Learn `nMerges` merges. Returns (left, right, weightedPairCount)
    * in merge order.
    */
  def learnMerges(docs: DataFrame, nMerges: Int): Seq[(String, String, Long)] = {
    var words = wordTable(docs).localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    while (merges.size < nMerges && !done) {
      val top = words
        .select(col("w"), explode(transform(sequence(lit(0), size(col("syms")) - 2),
          i => struct(element_at(col("syms"), i + 1).as("a"),
            element_at(col("syms"), i + 2).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("w").as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, n) = (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        merges += ((a, b, n))
        words = words
          .select(applyMerge(col("syms"), a, b).as("syms"), col("w"))
          .filter(size(col("syms")) >= 2)
          .localCheckpoint(true)
      }
    }
    merges.toSeq
  }

  /** Greedy left-to-right application of one merge to a symbol vector
    * (JVM-side twin of [[applyMerge]], for the encode path's typed map).
    */
  def mergeWord(s: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]; var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { out += (a + b); i += 2 }
      else { out += s(i); i += 1 }
    }
    out.result()
  }

  /** Encode the corpus with learned merges and report the compression —
    * the acceptance number tokenizer training is judged by. The merge
    * list is tiny (driver state), so encoding is ONE typed map over the
    * word-frequency table (per-partition imperative symbol merging —
    * the codec-at-the-boundary pattern) followed by a scalar aggregate;
    * the corpus itself is touched only by the up-front token count.
    */
  def bpeCompression(spark: SparkSession, dir: String, nMerges: Int = 20): DataFrame = {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, dir)
    val merges = learnMerges(docs, nMerges).map(m => (m._1, m._2))
    val words = wordTable(docs).as[(Seq[String], Long)]
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
    * the serial-reference equality lives in the spec.
    */
  def bpeMerges(spark: SparkSession, dir: String, nMerges: Int = 20): DataFrame = {
    import spark.implicits._
    learnMerges(graft.Tables.documents(spark, dir), nMerges)
      .zipWithIndex
      .map { case ((a, b, n), i) => (i + 1, a, b, a + b, n) }
      .toDF("rank", "left", "right", "merged", "pair_count")
  }
}
