package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Perceptual-dedup skew probe (SURVEY §6): measures the hot-band cap
  * ([[graft.multimodal.BinaryPipeline.MaxBandBucket]]) on an
  * adversarially skewed hash corpus — the constant-band collapse a
  * natural-image corpus hits when smooth/dark frames share band
  * values. Hashes are synthesized Zipf-skewed over band 0 (a few band
  * values hold most of the corpus; the worst value holds ~1/H(16) of
  * it), remaining 48 bits uniform, so almost every band collision is
  * a NON-pair: exactly the case where the uncapped k² band join
  * explodes and the 4×12-bit sub-band split should not.
  *
  * Not part of the driver contract (Verify/Bench are); a dev main:
  *   sbt "runMain graft.PhashSkewProbe [nRows]"
  * Prints pair counts (must be EQUAL — the cap is lossless) and
  * wall seconds for capped vs uncapped plans.
  */
object PhashSkewProbe {

  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(50000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // Zipf over 16 band-0 values via the md5 coin (deterministic, no
    // driver-side RNG): value v gets mass ∝ 1/(v+1).
    val weights = (0 until 16).map(v => 1.0 / (v + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail.map(_ / weights.sum)
    val cumExpr = cum.zipWithIndex.foldRight(lit(15)) { case ((c, v), acc) =>
      when(col("u") < c, lit(v)).otherwise(acc)
    }
    val hashes = spark.range(n.toLong)
      .withColumn("u", (conv(substring(md5(concat(lit("zipf"), col("id"))), 1, 8), 16, 10)
        .cast("double") / lit(4294967296.0)))
      .withColumn("b0", cumExpr.cast("long"))
      // remaining 48 bits uniform from two more md5 slices
      .withColumn("r1", conv(substring(md5(concat(lit("hi"), col("id"))), 1, 8), 16, 10).cast("long"))
      .withColumn("r2a", conv(substring(md5(concat(lit("lo"), col("id"))), 1, 8), 16, 10).cast("long"))
      // dHash halves live in the LOW 32 bits (bit << (31-b)), so the
      // band layout is hi[31:16], hi[15:0], lo[31:16], lo[15:0]: the
      // zipf-skewed band goes to hi[31:16], the rest stays uniform
      .select(col("id").as("item_id"),
        shiftleft(col("b0"), 16).bitwiseOR(col("r1").bitwiseAND(lit(0xFFFFL)))
          .as("phash_hi"),
        col("r2a").as("phash_lo"))
      .localCheckpoint(true)

    def fmt(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    def run(label: String, cap: Int): (Long, Double) = {
      spark.conf.set("graft.mm.maxBandBucket", cap.toString)
      val t0 = System.nanoTime()
      val pairs = graft.multimodal.BinaryPipeline.phashPairsWithin(hashes).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"""{"probe":"phash_skew","plan":"$label","n":$n,"cap":$cap,"pairs":$pairs,"sec":${fmt(sec)}}""")
      (pairs, sec)
    }
    // warm codegen on a slice
    spark.conf.set("graft.mm.maxBandBucket", "1024")
    graft.multimodal.BinaryPipeline.phashPairsWithin(hashes.limit(500)).count()

    val (pc, cappedSec) = run("capped", graft.multimodal.BinaryPipeline.MaxBandBucket)
    val (pu, uncappedSec) = run("uncapped", Int.MaxValue)
    require(pc == pu, s"CAP LOST PAIRS: capped=$pc uncapped=$pu")
    println(s"""{"probe":"phash_skew","n":$n,"pairs_equal":true,"speedup":${fmt(uncappedSec / cappedSec)}}""")

    // The STREAMING face (corpus ∪ batch combined-count hotness,
    // phashPairsBetween) on the same skewed corpus: evens play the
    // persisted index, odds the incoming tranche — the shape every
    // StreamingPhashDedupJob batch runs. Cross-side pair sets must be
    // cap-invariant exactly like the batch join.
    val corpus = hashes.filter(col("item_id") % 2 === 0).localCheckpoint(true)
    val batch = hashes.filter(col("item_id") % 2 === 1).localCheckpoint(true)
    def runStream(label: String, cap: Int): (Long, Double) = {
      spark.conf.set("graft.mm.maxBandBucket", cap.toString)
      val t0 = System.nanoTime()
      val pairs = graft.multimodal.BinaryPipeline.phashPairsBetween(corpus, batch).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"""{"probe":"phash_skew_stream","plan":"$label","n":$n,"cap":$cap,"pairs":$pairs,"sec":${fmt(sec)}}""")
      (pairs, sec)
    }
    graft.multimodal.BinaryPipeline.phashPairsBetween(
      corpus.limit(500), batch.limit(500)).count() // warm
    val (sc, sCapped) = runStream("capped", graft.multimodal.BinaryPipeline.MaxBandBucket)
    val (su, sUncapped) = runStream("uncapped", Int.MaxValue)
    require(sc == su, s"STREAM CAP LOST PAIRS: capped=$sc uncapped=$su")
    println(s"""{"probe":"phash_skew_stream","n":$n,"pairs_equal":true,"speedup":${fmt(sUncapped / sCapped)}}""")
    spark.stop()
  }
}
