package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.BinaryPipeline
import graft.Tables

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  test("binary pipeline preserves row count and emits fixed-dim features") {
    val out = BinaryPipeline.pipelineRaw(spark, sfDir)
    val n = Tables.documents(spark, sfDir).count()
    assert(out.count() === n)
    assert(out.filter(size(col("features")) =!= BinaryPipeline.StubCodec.FeatureDim).count() === 0)
    assert(out.filter(col("payload_bytes") <= 0).count() === 0)
  }

  test("decode stub is deterministic (two runs identical)") {
    val a = BinaryPipeline.pipeline(spark, sfDir)
    val b = BinaryPipeline.pipeline(spark, sfDir)
    assert(a.exceptAll(b).count() === 0)
  }

  test("driver-facing views carry no array columns (harness-hashable)") {
    import org.apache.spark.sql.types.ArrayType
    Seq(BinaryPipeline.pipeline(spark, sfDir),
        BinaryPipeline.featureExtract(spark, sfDir),
        BinaryPipeline.frameSample(spark, sfDir)).foreach { df =>
      assert(!df.schema.exists(_.dataType.isInstanceOf[ArrayType]), df.schema.treeString)
    }
  }

  test("resize bounds output bytes and is deterministic") {
    val r1 = BinaryPipeline.resize(spark, sfDir)
    assert(r1.filter(col("resized_bytes") > BinaryPipeline.ResizeTargetBytes).count() === 0)
    assert(r1.count() === Tables.documents(spark, sfDir).count())
    val a = r1.collect(); val b = BinaryPipeline.resize(spark, sfDir).collect()
    assert(a.sameElements(b))
  }

  test("frame sampling keeps every k-th frame with per-frame features") {
    val fs = BinaryPipeline.frameSample(
      BinaryPipeline.asBinaryTable(Tables.documents(spark, sfDir)))
    // every item contributes at least frame 0; indices are multiples of 4
    assert(fs.filter(col("frame_idx") % 4 =!= 0).count() === 0)
    val items = fs.select("item_id").distinct().count()
    assert(items === Tables.documents(spark, sfDir).count())
    assert(fs.filter(org.apache.spark.sql.functions.size(col("frame_features"))
      =!= BinaryPipeline.StubCodec.FeatureDim).count() === 0)
  }

  test("binary dedup partitions items; byte-identical payloads collapse") {
    val groups = BinaryPipeline.binaryDedup(spark, sfDir)
    val n = Tables.documents(spark, sfDir).count()
    assert(groups.agg(sum(col("n_copies"))).head.getLong(0) === n)
    // one md5 group per distinct RAW payload (== distinct raw text,
    // since the payload is the utf-8 text bytes)
    val distinctRaw = Tables.documents(spark, sfDir).select("text").distinct().count()
    assert(groups.count() === distinctRaw)
  }

  test("mm IVF similarity composes binary features into the index tier with real recall") {
    val brute = BinaryPipeline.similarTopK(spark, sfDir).select("query_id", "neighbor_id")
    val ivf = BinaryPipeline.similarTopKIvf(spark, sfDir)
    // contract schema + per-query ranks, like every ANN entry
    assert(ivf.columns.toSeq === Seq("query_id", "neighbor_id", "rank", "cosine"))
    val perQuery = ivf.groupBy("query_id").count()
    assert(perQuery.filter(col("count") > 5).count() === 0, "top-k overflow")
    // nProbe-of-16-cells probing must still find most true neighbors
    val hits = ivf.select("query_id", "neighbor_id").intersect(brute).count().toDouble
    val recall = hits / brute.count()
    assert(recall >= 0.5, s"IVF recall vs brute force too low: $recall")
  }

  test("mm IVF-PQ similarity holds the flat-IVF recall floor over binary features") {
    val brute = BinaryPipeline.similarTopK(spark, sfDir).select("query_id", "neighbor_id")
    val ivfpq = BinaryPipeline.similarTopKIvfPq(spark, sfDir)
    assert(ivfpq.columns.toSeq === Seq("query_id", "neighbor_id", "rank", "cosine"))
    assert(ivfpq.filter(col("rank") < 1 || col("rank") > 5).count() === 0)
    val hits = ivfpq.select("query_id", "neighbor_id").intersect(brute).count().toDouble
    val recall = hits / brute.count()
    info(f"mm IVF-PQ recall@5 = $recall%.2f")
    assert(recall >= 0.5, s"IVF-PQ recall vs brute force too low: $recall")
  }

  test("payload binary column survives the round trip (no string inflation)") {
    val bin = BinaryPipeline.asBinaryTable(Tables.documents(spark, sfDir))
    val schema = bin.schema("payload").dataType.typeName
    assert(schema === "binary")
    // payload length equals utf-8 text byte length
    val joined = bin.join(Tables.documents(spark, sfDir), col("item_id") === col("doc_id"))
      .filter(length(col("payload")) =!= length(encode(col("text"), "UTF-8")))
    assert(joined.count() === 0)
  }
  test("media k-means partitions every item deterministically into multiple clusters") {
    import graft.multimodal.BinaryPipeline
    val a = BinaryPipeline.mediaKmeans(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val b = BinaryPipeline.mediaKmeans(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(a.sameElements(b), "clustering must be deterministic")
    val nItems = Tables.documents(spark, sfDir).count()
    assert(a.map(_._2).sum === nItems, "every media item lands in one cluster")
    assert(a.length > 1, "the stub features must split into multiple clusters")
    a.foreach { case (c, n, lo, hi, md) =>
      assert(n > 0 && lo <= hi && md >= 0, s"cluster $c roll-up invalid")
    }
  }
}
