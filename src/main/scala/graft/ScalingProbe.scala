package graft

import org.apache.spark.sql.SparkSession

/** Scale-ratio measurement harness (SURVEY §6): times the
  * documents-only text/dedup entries on two directories and prints the
  * per-query ratio — built for the Zipf-vocabulary corpora
  * (`tools/gen_zipf_docs.py`), where the super-linear exact-Jaccard
  * reading measured on the driver testdata's 31-word vocabulary can be
  * checked against a natural rank-frequency distribution.
  *
  * Not part of the driver contract (Verify/Bench are); a dev main like
  * them. Usage:
  *   sbt "runMain graft.ScalingProbe [dirA] [dirB]"
  * defaults to data/zipf_sf0.1 and data/zipf_sf1.
  */
object ScalingProbe {

  /** Driver entries that read only documents.parquet. */
  val DocQueries: Seq[String] = Seq(
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_clusters", "near_dedup_keep", "dedup_simhash", "dup_span_stats",
    "text_token_count", "text_ngrams", "text_char_ngrams", "doc_tfidf",
    "bm25_score", "doc_similar_tfidf", "token_pmi", "bigram_logprob",
    "bpe_merges", "bpe_compression", "dedup_editdist",
    "kn_bigram_logprob", "ppl_buckets", "dsir_weights", "classifier_train")

  def main(args: Array[String]): Unit = {
    val dirA = args.lift(0).getOrElse("data/zipf_sf0.1")
    val dirB = args.lift(1).getOrElse("data/zipf_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def fmt(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)

    // warm codegen/JIT on the small dir so the timed passes measure the
    // engine, not janino/C2 (the generated-code cache is process-wide)
    DocQueries.foreach(q => try SparkEntry.queries(q)(spark, dirA).count()
      catch { case e: Throwable => System.err.println(s"[probe] warm $q: ${e.getMessage}") })

    // each timed pass runs in a FRESH session: the shared-artifact memo
    // is per (session, dir), so this is what makes the warm pass unable
    // to pre-pay dirA's pair table / BPE training for the timed pass
    def timedPass(dir: String): Seq[(String, Double)] = {
      val s = spark.newSession()
      def t(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      // shared artifacts first, as their own lines (the bench
      // discipline): pair table + BPE training dominate this family
      try Seq(
        "artifact:dedup_pair_table" -> t(dedup.Dedup.prewarmPairs(s, dir)),
        "artifact:bpe_training" -> t { functions.Bpe.trainedMerges(s, dir, nMerges = 20); () }) ++
        DocQueries.map(q => q -> t { SparkEntry.queries(q)(s, dir).count(); () })
      // the retired sibling session shares the live context, so the
      // stopped-context eviction never fires for it — release its
      // checkpointed artifacts explicitly
      finally SessionCache.invalidate(s)
    }
    val (a, b) = (timedPass(dirA), timedPass(dirB))
    println(f"""${"query"}%-28s ${dirA.split('/').last}%12s ${dirB.split('/').last}%12s ratio""")
    a.zip(b).foreach { case ((name, ta), (_, tb)) =>
      println(f"$name%-28s ${fmt(ta)}%12s ${fmt(tb)}%12s ${fmt(tb / math.max(ta, 1e-9))}x")
    }
    spark.stop()
  }
}
