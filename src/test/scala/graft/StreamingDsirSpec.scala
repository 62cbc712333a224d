package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextFunctions
import graft.streaming.StreamingDsirJob

/** The streaming DSIR face must fit the SAME λ table the batch trainer
  * produces on the bootstrap tranche, score later batches byte-stably
  * against the frozen model (unseen buckets falling back to the
  * persisted default), and keep the maintained per-class summary equal
  * to a from-scratch recompute — under replay and across compaction.
  */
class StreamingDsirSpec extends AnyFunSuite with SparkSpec {

  private def docs = Tables.documents(spark, sfDir)

  private def tranches(n: Int): Seq[DataFrame] =
    (0 until n).map(i => docs.filter(pmod(col("doc_id"), lit(n)) === i))

  private def summaryOf(job: StreamingDsirJob): Map[Int, (Long, Double)] =
    job.readSummary().collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  test("bootstrap fits on the first batch; later batches score against the frozen model") {
    val dir = java.nio.file.Files.createTempDirectory("sdsir").toString
    val job = new StreamingDsirJob(spark, dir)
    val cuts = tranches(3)
    cuts.zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    // persisted model == the batch trainer on the bootstrap tranche alone
    val got = job.readModel().get.collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = TextFunctions.dsirTrain(
        TextFunctions.dsirBucketRows(cuts.head).localCheckpoint(true))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === want, "persisted λ table must be the bootstrap-tranche fit")
    assert(got.contains(-1L), "the unseen-bucket default must ride the model")
    // every ingested doc with >=1 bigram scored exactly once, equal to a
    // direct rescore of everything against the SAME frozen model
    val streamed = job.readWeights().collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(streamed.map(_._1).distinct.length === streamed.length)
    val direct = TextFunctions.dsirScore(
        TextFunctions.dsirBucketRows(docs).localCheckpoint(true),
        job.readModel().get)
      .select(col("doc_id"), round(col("logw_raw"), 4).as("w"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(streamed.length === direct.size)
    streamed.foreach { case (id, _, _, w) =>
      assert(w === direct(id), s"doc $id streamed $w, direct says ${direct(id)}")
    }
    // maintained summary == recompute from the weight table
    val want2 = streamed.groupBy(_._2).map { case (t, rows) =>
      t -> ((rows.length.toLong,
        rows.map(r => math.round(r._4 * 10000)).sum / 10000.0 / rows.length))
    }
    val got2 = summaryOf(job)
    assert(got2.keySet === want2.keySet)
    got2.foreach { case (t, (n, m)) =>
      assert(n === want2(t)._1, s"class $t count")
      assert(math.abs(m - want2(t)._2) < 1e-9, s"class $t mean logw")
    }
  }

  test("a post-bootstrap batch of novel text scores via the persisted default λ") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sdsir-nv").toString
    val job = new StreamingDsirJob(spark, dir)
    job.processBatch(docs, 0L) // bootstrap on the corpus
    // novel vocabulary -> buckets the frozen model may never have seen
    val novel = Seq(
      (900001L, "qqxzv wplk jrtm qqxzv wplk nbvcx qqxzv jrtm", "en", "srcX", 40L),
      (900002L, "zzyqw kkjhg mmnbv zzyqw kkjhg ppoiu zzyqw", "fr", "srcX", 38L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    job.processBatch(novel, 1L)
    val got = job.readWeights().filter(col("doc_id") >= 900000L).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got.keySet === Set(900001L, 900002L))
    assert(got.values.forall(w => !w.isNaN && !w.isInfinite))
    // the novel docs' scores replay against the persisted model exactly
    val direct = TextFunctions.dsirScore(
        TextFunctions.dsirBucketRows(novel).localCheckpoint(true),
        job.readModel().get)
      .select(col("doc_id"), round(col("logw_raw"), 4).as("w"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === direct)
    // and a bucket-level check: at least one novel bucket is absent from
    // the model (the default-λ path genuinely fired)
    val modelBuckets = job.readModel().get.collect().map(_.getLong(0)).toSet
    val novelBuckets = TextFunctions.dsirBucketRows(novel)
      .select("bucket").collect().map(_.getLong(0)).toSet
    assert((novelBuckets -- modelBuckets).nonEmpty || modelBuckets.size > 1020,
      "expected an unseen bucket (or a saturated model making unseen impossible)")
  }

  test("replay across compaction changes neither weights nor summary") {
    val dir = java.nio.file.Files.createTempDirectory("sdsir-rp").toString
    val job = new StreamingDsirJob(spark, dir, compactEvery = 2)
    val cuts = tranches(3)
    cuts.zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    val beforeW = job.readWeights().collect().map(_.toSeq).sortBy(_.toString)
    val beforeS = summaryOf(job)
    cuts.zipWithIndex.foreach { case (cut, i) => job.processBatch(cut, i.toLong) }
    assert(job.readWeights().collect().map(_.toSeq).sortBy(_.toString)
      .sameElements(beforeW), "replayed weights must be byte-stable")
    assert(summaryOf(job) === beforeS, "replayed summary must fold to the same state")
  }

  test("empty first batch must not bootstrap; a single-class batch skips (not wedges) and retries") {
    val dir = java.nio.file.Files.createTempDirectory("sdsir-e").toString
    val job = new StreamingDsirJob(spark, dir)
    assert(job.readSummary().count() === 0)
    job.processBatch(docs.limit(0), 0L)
    assert(job.readModel().isEmpty, "empty batch must not bootstrap")
    assert(job.readWeights().count() === 0)
    // single-class pre-bootstrap batch: skipped (no throw — a throw
    // would wedge the query, the checkpointed batch replays verbatim),
    // nothing persisted, the skip counted
    val onlyTarget = docs.filter(col("lang") === TextFunctions.DsirTargetLang)
      .filter(pmod(col("doc_id"), lit(2)) === 0)
    val rest = docs.join(onlyTarget.select("doc_id"), Seq("doc_id"), "left_anti")
    job.processBatch(onlyTarget, 1L)
    assert(job.skippedBootstraps === 1L, "skipped bootstrap must be counted")
    assert(job.readModel().isEmpty, "skipped fit must not persist a model")
    assert(job.readWeights().count() === 0, "skipped batch must score nothing yet")
    // the NEXT two-class batch bootstraps normally — liveness restored —
    // and BACKFILLS the buffered batch: its docs appear in readWeights
    // under their original batch, so no document is permanently unscored
    job.processBatch(rest, 2L)
    assert(job.readModel().isDefined, "bootstrap must retry on the next batch")
    val weights = job.readWeights()
    val skippedIds = onlyTarget.select("doc_id").collect().map(_.getLong(0)).toSet
    val scoredIds = weights.select("doc_id").collect().map(_.getLong(0)).toSet
    val skippedWithBigrams = TextFunctions.dsirBucketRows(onlyTarget)
      .select("doc_id").distinct().count()
    assert(skippedWithBigrams > 0, "fixture: the skipped batch must carry scoreable docs")
    assert((skippedIds intersect scoredIds).size === skippedWithBigrams,
      "every scoreable doc of the skipped batch must be backfilled")
    // backfilled scores equal a direct scoring against the same frozen model
    val direct = TextFunctions.dsirScore(
      TextFunctions.dsirBucketRows(onlyTarget), job.readModel().get)
      .select(col("doc_id"), round(col("logw_raw"), 4).as("dsir_logw"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val backfilled = weights.filter(col("doc_id").isin(skippedIds.toSeq: _*))
      .select("doc_id", "dsir_logw")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(backfilled === direct, "backfilled weights must replay the frozen model")
    // the summary includes the backfilled docs and the buffer is drained
    assert(summaryOf(job).values.map(_._1).sum === weights.count(),
      "summary doc counts must include backfilled batches")
    assert(!new java.io.File(s"$dir/pending").exists(),
      "pending buffer must be deleted after backfill")
  }
}
