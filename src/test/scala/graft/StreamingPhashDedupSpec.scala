package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.BinaryPipeline
import graft.streaming.StreamingPhashDedupJob

/** Contracts of the streaming perceptual-dedup face: the union of
  * per-tranche pair emissions equals the batch face on the full corpus
  * (every unordered pair lands in exactly the tranche of its later
  * member), and the shared index substrate's replay/compaction/format
  * guarantees hold over the phash schema.
  */
class StreamingPhashDedupSpec extends AnyFunSuite with SparkSpec {

  private def collectPairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
    df.select("id_a", "id_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("streamed pairs over any tranche split equal the batch phash dedup") {
    val emitted = scala.collection.mutable.Map.empty[Long, Set[(Long, Long, Int)]]
    val tmp = java.nio.file.Files.createTempDirectory("sphash").toString
    val job = new StreamingPhashDedupJob(spark, s"$tmp/index",
      (pairs, id) => emitted(id) = collectPairs(pairs))
    val images = BinaryPipeline.asImageTable(Tables.documents(spark, sfDir))
      .select("item_id", "payload").localCheckpoint(true)
    (0 until 3).foreach { t =>
      job.processBatch(images.filter(pmod(col("item_id"), lit(3)) === t), t.toLong)
    }
    val streamed = emitted.values.reduce(_ ++ _)
    val batch = collectPairs(BinaryPipeline.phashDedup(spark, sfDir))
    assert(streamed === batch, "union of tranche emissions must equal the batch face")
    // disjointness: no pair is emitted by two tranches
    assert(emitted.values.map(_.size).sum === streamed.size,
      "each unordered pair must land in exactly one tranche")
  }

  test("replay across compaction re-emits pairs but never re-appends folded hashes") {
    import spark.implicits._
    // brightness-shifted copy hashes IDENTICALLY (dHash invariance), so
    // (1, 2) is a guaranteed hamming-0 pair; doc 10 is another copy
    val base = Array.tabulate[Byte](100)(i => (50 + (i * 37) % 100).toByte)
    def png(p: Array[Byte]) = BinaryPipeline.PngCodec.encode(p)
    val emitted = scala.collection.mutable.Map.empty[Long, Set[(Long, Long, Int)]]
    val tmp = java.nio.file.Files.createTempDirectory("sphash-replay").toString
    val job = new StreamingPhashDedupJob(spark, s"$tmp/index",
      (pairs, id) => emitted(id) = collectPairs(pairs), compactEvery = 64)

    job.processBatch(Seq((1L, png(base)), (2L, png(base.map(b => (b + 50).toByte))))
      .toDF("item_id", "payload"), 0L)
    assert(emitted(0L).contains((1L, 2L, 0)), "within-batch hamming-0 pair")
    job.processBatch(Seq((10L, png(base))).toDF("item_id", "payload"), 1L)
    assert(emitted(1L) === Set((1L, 10L, 0), (2L, 10L, 0)),
      "cross-batch pairs against the persisted index")
    val rowsBefore = job.readIndex().get.count()
    job.compact()
    assert(job.compactedThrough() === 1L)
    assert(job.readIndex().get.count() === rowsBefore,
      "compaction must preserve the hash rows exactly")

    // replay batch 1 after its hashes were folded into batch=0
    val firstEmit = emitted(1L)
    emitted.remove(1L)
    job.processBatch(Seq((10L, png(base))).toDF("item_id", "payload"), 1L)
    assert(emitted(1L) === firstEmit, "replay must re-emit the same pair set")
    assert(job.batchDirCount() === 1, "replayed folded batch must not re-append a dir")
    assert(job.readIndex().get.count() === rowsBefore,
      "replay across compaction duplicated hash rows")

    // a genuinely new batch still appends and pairs against the index
    job.processBatch(Seq((20L, png(base))).toDF("item_id", "payload"), 2L)
    assert(emitted(2L) === Set((1L, 20L, 0), (2L, 20L, 0), (10L, 20L, 0)))
    assert(job.readIndex().get.count() > rowsBefore)
  }

  test("a foreign hash-family marker is refused, not silently joined") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("sphash-fmt").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/index"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$tmp/index/_phash_format"),
      "dhash-gray-9x8-v0\n".getBytes("UTF-8"))
    val job = new StreamingPhashDedupJob(spark, s"$tmp/index", (_, _) => ())
    val img = Seq((1L, BinaryPipeline.PngCodec.encode(Array[Byte](1, 2, 3, 4))))
      .toDF("item_id", "payload")
    val e = intercept[IllegalStateException] { job.processBatch(img, 0L) }
    assert(e.getMessage.contains("rebuild the index"))
  }
}
