package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.BinaryPipeline
import graft.Tables

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  // ---- PNG codec fixtures: the decode is REAL (ImageIO), so it is
  // spec-gated against known images the way BPE is gated against known
  // corpora ----

  test("png codec: encode writes a real PNG container with the claimed geometry") {
    val payload = Array.tabulate[Byte](10)(i => (i * 7).toByte) // 10 bytes -> 4x3
    val png = BinaryPipeline.PngCodec.encode(payload)
    // PNG magic, parsed independently of ImageIO
    assert(png.take(8).map(_ & 0xFF).toSeq === Seq(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A))
    def be32(off: Int): Int =
      ((png(off) & 0xFF) << 24) | ((png(off + 1) & 0xFF) << 16) |
        ((png(off + 2) & 0xFF) << 8) | (png(off + 3) & 0xFF)
    // IHDR: width @16, height @20, bit depth @24, color type @25
    assert(be32(16) === 4, "IHDR width")
    assert(be32(20) === 3, "IHDR height")
    assert((png(24) & 0xFF) === 8, "bit depth 8")
    assert((png(25) & 0xFF) === 0, "color type 0 = grayscale")
  }

  test("png codec: decode(encode(p)) round-trips pixels losslessly with zero pad") {
    val payload = Array.tabulate[Byte](13)(i => (250 - i * 3).toByte) // 13 -> 4x4, 3 pad
    val (w, h, c, pixels) = BinaryPipeline.PngCodec.decode(
      BinaryPipeline.PngCodec.encode(payload))
    assert((w, h, c) === (4, 4, 1))
    assert(pixels.take(13).toSeq === payload.toSeq, "decoded pixels must equal source bytes")
    assert(pixels.drop(13).toSeq === Seq[Byte](0, 0, 0), "tail must be zero pad")
    // encode is deterministic (same bytes in -> same container out)
    assert(BinaryPipeline.PngCodec.encode(payload).toSeq
      === BinaryPipeline.PngCodec.encode(payload).toSeq)
    // degenerate payloads still produce a decodable 1x1+ image
    val (w0, h0, _, p0) = BinaryPipeline.PngCodec.decode(
      BinaryPipeline.PngCodec.encode(Array.empty[Byte]))
    assert(w0 === 1 && h0 === 1 && p0.toSeq === Seq[Byte](0))
  }

  test("png codec: a non-image payload is refused, not guessed") {
    intercept[IllegalArgumentException] {
      BinaryPipeline.PngCodec.decode("definitely not a png".getBytes("UTF-8"))
    }
  }

  test("binary pipeline preserves row count and emits fixed-dim features") {
    val out = BinaryPipeline.pipelineRaw(spark, sfDir)
    val n = Tables.documents(spark, sfDir).count()
    assert(out.count() === n)
    assert(out.filter(size(col("features")) =!= BinaryPipeline.PngCodec.FeatureDim).count() === 0)
    assert(out.filter(col("pixel_bytes") <= 0).count() === 0)
    // geometry is the real decoded raster: pixel_bytes == width*height,
    // single gray channel, near-square
    assert(out.filter(col("pixel_bytes") =!= col("width") * col("height")).count() === 0)
    assert(out.filter(col("channels") =!= 1).count() === 0)
    assert(out.filter(col("width") < col("height")).count() === 0,
      "ceil-sqrt geometry keeps width >= height")
  }

  test("real decode is deterministic (two runs identical)") {
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

  test("resize point-samples the decoded raster to a fixed side and is deterministic") {
    val s = BinaryPipeline.ResizeSide
    val r1 = BinaryPipeline.resize(spark, sfDir)
    // every output is exactly s*s pixels (hex doubles the length)
    assert(r1.filter(length(col("resized_hex")) =!= s * s * 2).count() === 0)
    assert(r1.count() === Tables.documents(spark, sfDir).count())
    val a = r1.collect(); val b = BinaryPipeline.resize(spark, sfDir).collect()
    assert(a.sameElements(b))
  }

  test("resize kernel fixture: nearest-neighbor indices on a known raster") {
    import spark.implicits._
    val s = BinaryPipeline.ResizeSide
    // a 16x16 "image": byte at (y,x) = y*16+x, as one 256-byte payload
    val payload = Array.tabulate[Byte](256)(_.toByte)
    val img = Seq((1L, BinaryPipeline.PngCodec.encode(payload)))
      .toDF("item_id", "payload")
    val out = BinaryPipeline.resize(img).collect().head
    assert(out.getAs[Int]("orig_w") === 16 && out.getAs[Int]("orig_h") === 16)
    val resized = out.getAs[Array[Byte]]("resized")
    // out(y,x) = src(y*16/8, x*16/8) = src(2y, 2x) -> byte 32y + 2x
    for (y <- 0 until s; x <- 0 until s)
      assert((resized(y * s + x) & 0xFF) === 32 * y + 2 * x,
        s"pixel ($y,$x) must sample src(2y,2x)")
  }

  test("frame sampling keeps every k-th frame with per-frame features") {
    val fs = BinaryPipeline.frameSample(
      BinaryPipeline.asBinaryTable(Tables.documents(spark, sfDir)))
    // every item contributes at least frame 0; indices are multiples of 4
    assert(fs.filter(col("frame_idx") % 4 =!= 0).count() === 0)
    val items = fs.select("item_id").distinct().count()
    assert(items === Tables.documents(spark, sfDir).count())
    assert(fs.filter(org.apache.spark.sql.functions.size(col("frame_features"))
      =!= BinaryPipeline.PngCodec.FeatureDim).count() === 0)
  }

  test("pixel stats: bounds hold corpus-wide and a known ramp raster reads exactly") {
    val st = BinaryPipeline.pixelStats(spark, sfDir)
    assert(st.count() === Tables.documents(spark, sfDir).count())
    assert(st.filter(col("pixel_min") > col("pixel_max")).count() === 0)
    assert(st.filter(col("pixel_mean") < col("pixel_min")
      || col("pixel_mean") > col("pixel_max")).count() === 0)
    assert(st.filter(col("pixel_std") < 0).count() === 0)
    // fixture: the 0..255 ramp on a 16x16 raster — mean 127.5, full range
    val ramp = BinaryPipeline.PngCodec.decode(
      BinaryPipeline.PngCodec.encode(Array.tabulate[Byte](256)(_.toByte)))._4
    assert(ramp.map(_ & 0xFF).sum / 256.0 === 127.5)
  }

  test("phash: brightness shift leaves the hash invariant; monotone ramp hashes to zero") {
    // gradient SIGNS are what dHash keys on — adding a constant to every
    // pixel (no clamping: bytes kept in [50, 150]) must not change them
    val base = Array.tabulate[Byte](100)(i => (50 + (i * 37) % 100).toByte)
    val brighter = base.map(b => (b + 50).toByte)
    def hashOf(p: Array[Byte]) = {
      val (w, h, c, px) = BinaryPipeline.PngCodec.decode(BinaryPipeline.PngCodec.encode(p))
      BinaryPipeline.PngCodec.dhash(w, h, c, px)
    }
    assert(hashOf(base) === hashOf(brighter),
      "a global brightness shift must not move the dHash")
    // a strictly increasing ramp has no falling gradient anywhere
    val ramp = Array.tabulate[Byte](81)(i => (i * 3).toByte)
    assert(hashOf(ramp) === ((0L, 0L)), "monotone ramp must hash to all-zero bits")
    // driver face shape
    val ph = BinaryPipeline.phash(spark, sfDir)
    assert(ph.filter(length(col("phash")) =!= 16).count() === 0)
    assert(ph.filter(col("n_gradient_bits") < 0 || col("n_gradient_bits") > 64).count() === 0)
  }

  test("phash dedup: banded candidates equal the brute-force radius-3 pair set") {
    val hashes = BinaryPipeline.pipelineRaw(spark, sfDir)
      .select("item_id", "phash_hi", "phash_lo").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // brute-force truth: every pair within Hamming <= 3 of 64 bits
    val truth = (for {
      (ia, ha, la) <- hashes.iterator
      (ib, hb, lb) <- hashes.iterator
      if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) + java.lang.Long.bitCount(la ^ lb)
      if d <= BinaryPipeline.PhashMaxHamming
    } yield (ia, ib, d)).toSet
    val got = BinaryPipeline.phashDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === truth,
      "4x16-bit banding at radius 3 is pigeonhole-complete: banded == brute force")
  }

  test("image curation funnel: three monotone stages, stage 1 is the corpus") {
    val f = BinaryPipeline.curationFunnel(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(f.keySet === Set("1_decoded", "2_contrast", "3_perceptual_unique"))
    assert(f("1_decoded") === Tables.documents(spark, sfDir).count())
    assert(f("1_decoded") >= f("2_contrast"), "contrast gate can only drop")
    assert(f("2_contrast") >= f("3_perceptual_unique"), "dedup can only drop")
    assert(f("3_perceptual_unique") > 0, "a non-degenerate corpus keeps something")
  }

  test("image table payloads are genuine PNG containers") {
    val sig = Array(0x89, 0x50, 0x4E, 0x47).map(_.toByte)
    val bad = BinaryPipeline.asImageTable(Tables.documents(spark, sfDir))
      .filter(substring(col("payload"), 1, 4) =!= lit(sig))
    assert(bad.count() === 0, "every payload must start with the PNG signature")
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

  test("phash dedup hot-band cap: capped plan loses no pair on a skewed corpus") {
    import spark.implicits._
    // adversarial skew: one 16-bit band value shared by EVERY hash
    // (band 0 = 0xABCD — the constant-band collapse of smooth/dark
    // frames), remaining 48 bits random, plus planted near-dup pairs
    val rnd = new java.util.Random(42)
    // real dHash halves live in the low 32 bits — keep the fixture in
    // that domain (bands are hi[31:16], hi[15:0], lo[31:16], lo[15:0])
    val hashes = (0 until 60).map { i =>
      val hi = (0xABCDL << 16) | (rnd.nextLong() & 0xFFFFL)
      val lo = rnd.nextLong() & 0xFFFFFFFFL
      (i.toLong, hi, lo)
    } ++ Seq(
      // planted pairs at Hamming 1 and 3 of existing members
      (100L, (0xABCDL << 16) | 0x0001L, 0L),
      (101L, (0xABCDL << 16) | 0x0003L, 0L),          // Hamming 1 vs 100
      (102L, (0xABCDL << 16) | 0x0003L, 0x7L))        // Hamming 3 vs 101
    val ph = hashes.toDF("item_id", "phash_hi", "phash_lo")
    def ham(a: (Long, Long, Long), b: (Long, Long, Long)): Int =
      java.lang.Long.bitCount(a._2 ^ b._2) + java.lang.Long.bitCount(a._3 ^ b._3)
    val brute = (for {
      a <- hashes; b <- hashes if a._1 < b._1 && ham(a, b) <= BinaryPipeline.PhashMaxHamming
    } yield (a._1, b._1, ham(a, b))).toSet
    assert(brute.nonEmpty, "fixture must contain true near-dup pairs")
    def pairs(): Set[(Long, Long, Int)] =
      BinaryPipeline.phashPairsWithin(ph).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // cold path (every bucket under the default cap)
    assert(pairs() === brute)
    // force EVERY bucket hot: the 4x12-bit sub-band split must still
    // find every pair (pigeonhole over the 48 complement bits)
    spark.conf.set("graft.mm.maxBandBucket", "1")
    try assert(pairs() === brute, "capped plan dropped pairs")
    finally spark.conf.unset("graft.mm.maxBandBucket")
  }

  // ---- RGB (3-channel) codec + faces: the multi-channel path must be
  // as certified as the grayscale one ----

  test("rgb codec: encode writes a truecolor PNG with the dimsRgb geometry") {
    val payload = Array.tabulate[Byte](30)(i => (i * 11).toByte) // 10 px -> 4x3
    val png = BinaryPipeline.PngCodec.encodeRgb(payload)
    assert(png.take(8).map(_ & 0xFF).toSeq === Seq(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A))
    def be32(off: Int): Int =
      ((png(off) & 0xFF) << 24) | ((png(off + 1) & 0xFF) << 16) |
        ((png(off + 2) & 0xFF) << 8) | (png(off + 3) & 0xFF)
    assert(be32(16) === 4, "IHDR width")
    assert(be32(20) === 3, "IHDR height")
    assert((png(24) & 0xFF) === 8, "bit depth 8")
    assert((png(25) & 0xFF) === 2, "color type 2 = truecolor RGB")
  }

  test("rgb codec: decode(encodeRgb(p)) round-trips interleaved samples losslessly") {
    // 13 bytes -> npx=5 -> 3x2 raster = 18 samples, 5 zero-pad (one
    // PARTIAL pixel: byte 12 is the last real sample of pixel 4)
    val payload = Array.tabulate[Byte](13)(i => (37 + i * 17).toByte)
    val (w, h, c, px) = BinaryPipeline.PngCodec.decode(
      BinaryPipeline.PngCodec.encodeRgb(payload))
    assert((w, h, c) === (3, 2, 3))
    assert(px.length === w * h * 3)
    assert(px.take(13).toSeq === payload.toSeq,
      "decoded interleaved samples must equal source bytes (band order leak?)")
    assert(px.drop(13).forall(_ === 0), "tail must be zero pad")
    assert(BinaryPipeline.PngCodec.encodeRgb(payload).toSeq
      === BinaryPipeline.PngCodec.encodeRgb(payload).toSeq)
  }

  test("dhash: multi-channel raster hashes its integer-luma plane, strided correctly") {
    val rnd = new java.util.Random(11)
    val w = 17; val h = 13
    val rgb = new Array[Byte](w * h * 3)
    rnd.nextBytes(rgb)
    // hand-build the luma plane and hash it single-channel: the
    // 3-channel call must agree (a stride bug samples interleaved
    // positions and diverges immediately on random data)
    val luma = Array.tabulate[Byte](w * h) { p =>
      (((rgb(3 * p) & 0xFF) + (rgb(3 * p + 1) & 0xFF) + (rgb(3 * p + 2) & 0xFF)) / 3).toByte
    }
    assert(BinaryPipeline.PngCodec.dhash(w, h, 3, rgb)
      === BinaryPipeline.PngCodec.dhash(w, h, 1, luma))
    // a raster/shape mismatch is refused, never guessed
    intercept[IllegalArgumentException] {
      BinaryPipeline.PngCodec.dhash(w, h, 1, rgb)
    }
  }

  test("resize: 3-channel raster keeps every channel at the strided sample positions") {
    import spark.implicits._
    val payload = Array.tabulate[Byte](48)(i => (i * 5).toByte) // 16 px -> 4x4
    val imgTable = Seq((1L, BinaryPipeline.PngCodec.encodeRgb(payload)))
      .toDF("item_id", "payload")
    val out = BinaryPipeline.resize(imgTable).collect().head
    val resized = out.getAs[Array[Byte]]("resized")
    val s = BinaryPipeline.ResizeSide
    assert(resized.length === s * s * 3, "output must be S^2 x channels samples")
    // upsampling a 4x4: out(y,x) samples src(y*4/8, x*4/8) = src(y/2, x/2)
    for (y <- 0 until s; x <- 0 until s; c <- 0 until 3) {
      val src = ((y * 4 / s) * 4 + (x * 4 / s)) * 3 + c
      assert(resized((y * s + x) * 3 + c) === payload(src),
        s"sample ($y,$x,$c) must be src byte $src")
    }
  }

  test("rgb pixel stats: per-channel means and luma stats replay a known fixture") {
    // 6 bytes -> npx=2 -> 2x1(w=2,h=1): px0=(10,20,30) px1=(40,50,60)
    import spark.implicits._
    val fixtureStats = {
      val (w, h, c, px) = BinaryPipeline.PngCodec.decode(
        BinaryPipeline.PngCodec.encodeRgb(Array[Byte](10, 20, 30, 40, 50, 60)))
      assert((w, h, c) === (2, 1, 3))
      px
    }
    assert(fixtureStats.toSeq === Seq[Byte](10, 20, 30, 40, 50, 60))
    val out = BinaryPipeline.pixelStatsRgb(spark, sfDir)
    val n = Tables.documents(spark, sfDir).count()
    assert(out.count() === n)
    // corpus-wide bounds: means in [0,255], luma_min <= mean <= max, std >= 0
    assert(out.filter(col("r_mean") < 0 || col("r_mean") > 255
      || col("g_mean") < 0 || col("g_mean") > 255
      || col("b_mean") < 0 || col("b_mean") > 255).count() === 0)
    assert(out.filter(col("luma_min") > col("luma_mean")
      || col("luma_mean") > col("luma_max") || col("luma_std") < 0).count() === 0)
    assert(out.filter(col("channels") =!= 3).count() === 0)
  }

  test("rgb resize driver face: full interleaved thumbnail, deterministic") {
    val out = BinaryPipeline.resizeRgb(spark, sfDir)
    val s = BinaryPipeline.ResizeSide
    assert(out.filter(length(col("resized_hex")) =!= s * s * 3 * 2).count() === 0,
      "every thumbnail must be S^2 x 3 samples")
    assert(out.count() === Tables.documents(spark, sfDir).count())
    val a = BinaryPipeline.resizeRgb(spark, sfDir).collect().map(_.toSeq).toSeq
    val b = BinaryPipeline.resizeRgb(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("frame energy: alternating-extremes fixture reads exact RMS and crossings") {
    import spark.implicits._
    // 256-byte frame alternating 0x00 / 0xFF: samples -128 / +127 —
    // every adjacent pair is a strict sign change
    val payload = Array.tabulate[Byte](256)(i => if (i % 2 == 0) 0 else 0xFF.toByte)
    val out = BinaryPipeline.frameEnergy(
      Seq((7L, payload)).toDF("item_id", "payload"))
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getInt(2) === 256, "one full frame")
    val expectSs = 128L * (128L * 128L + 127L * 127L)
    assert(r.getLong(3) === expectSs, "exact integer sum of squares")
    assert(r.getInt(4) === 255, "every adjacent pair crosses zero")
    // silence: a constant-0x80 payload has zero energy and no crossings
    val silent = BinaryPipeline.frameEnergy(
      Seq((8L, Array.fill[Byte](300)(0x80.toByte))).toDF("item_id", "payload"))
      .collect()
    assert(silent.length === 1, "300 bytes -> one 256-byte frame (tail < frame is frame 1 at len/256=1)")
    assert(silent.forall(x => x.getLong(3) === 0L && x.getInt(4) === 0))
    // corpus-wide driver-face bounds
    val face = BinaryPipeline.frameEnergy(spark, sfDir)
    assert(face.filter(col("rms") < 0 || col("rms") > 128).count() === 0)
    assert(face.filter(col("n_zero_cross") >= col("frame_bytes")).count() === 0)
  }

  test("scene cuts: the boundary between two constant scenes is the max-delta frame") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col => c}
    // four 256-byte frames: two of 0x10, two of 0xF0 — identical
    // within a scene (delta 0), one sharp boundary at frame 2
    val payload = Array.tabulate[Byte](1024)(i => if (i < 512) 0x10 else 0xF0.toByte)
    val rows = BinaryPipeline.sceneCuts(spark, sfDir) // driver face smoke below
    val fixture = {
      val docs = Seq((1L, payload), (2L, Array.fill[Byte](100)(7)))
        .toDF("item_id", "payload")
      val frames = BinaryPipeline.frameSample(docs, everyK = 1)
      assert(frames.filter(c("item_id") === 1L).count() === 4)
      assert(frames.filter(c("item_id") === 2L).count() === 1)
      frames
    }
    // compose the same fold the entry runs, on the fixture
    val deltas = fixture.collect()
      .groupBy(_.getLong(0)).map { case (id, fs) =>
        val byIdx = fs.sortBy(_.getInt(1)).map(_.getSeq[Float](3)).toSeq
        id -> byIdx.sliding(2).collect { case Seq(a, b) =>
          a.zip(b).map { case (x, y) => (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum
        }.toSeq
      }
    assert(deltas(1L).count(_ == 0.0) === 2, "within-scene frames must read delta 0")
    assert(deltas(1L).count(_ > 0.0) === 1, "exactly one scene boundary")
    assert(deltas(2L).isEmpty, "a single-frame item has no consecutive pair")
    // corpus-wide driver face invariants
    assert(rows.count() === Tables.documents(spark, sfDir).count())
    assert(rows.filter(c("n_frames") >= 2 && c("cut_idx").isNull).count() === 0,
      "every multi-frame item must report its strongest boundary")
    assert(rows.filter(c("n_frames") < 2 && c("cut_idx").isNotNull).count() === 0,
      "single-frame items must report NULL cut columns")
    assert(rows.filter(c("max_delta") < 0).count() === 0)
  }

  test("scene cuts top-k: two boundaries rank by delta, ties break to the earlier frame") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col => c}
    // six 256-byte frames in three constant scenes: 0x10 ×2, 0xF0 ×2,
    // 0x80 ×2 — two true boundaries (frames 2 and 4), the 0x10→0xF0
    // jump strictly larger than 0xF0→0x80; within-scene deltas are 0,
    // so ranks 3+ are the zero-delta ties broken by frame index
    val payload = Array.tabulate[Byte](1536) { i =>
      if (i < 512) 0x10 else if (i < 1024) 0xF0.toByte else 0x80.toByte
    }
    val docs = Seq((1L, payload), (2L, Array.fill[Byte](100)(7)))
      .toDF("item_id", "payload")
    val out = BinaryPipeline.sceneCutsTopK(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(out.forall(_._1 == 1L), "a single-frame item emits no cut rows")
    val item1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(item1.length === BinaryPipeline.SceneCutsK,
      s"5 deltas cap to top-${BinaryPipeline.SceneCutsK}: ${item1.toSeq}")
    assert(item1(0)._3 === 2 && item1(1)._3 === 4,
      s"the two true boundaries must rank 1-2 in delta order: ${item1.toSeq}")
    assert(item1(0)._4 > item1(1)._4 && item1(1)._4 > 0.0)
    assert(item1(2)._4 === 0.0 && item1(2)._3 === 1,
      s"rank 3 is the earliest zero-delta frame: ${item1.toSeq}")
    // rank 1 reproduces the single-cut face on the real corpus
    val single = BinaryPipeline.sceneCuts(spark, sfDir)
      .filter(c("cut_idx").isNotNull)
      .select(c("item_id"), c("cut_idx"), c("max_delta").as("delta"))
    val top1 = BinaryPipeline.sceneCutsTopK(spark, sfDir)
      .filter(c("cut_rank") === 1)
      .select(c("item_id"), c("cut_idx"), c("delta"))
    assert(single.exceptAll(top1).count() === 0 && top1.exceptAll(single).count() === 0,
      "rank-1 cuts must equal the single-cut face")
  }

  test("rgb phash: deterministic, well-formed, and brightness-shift invariant") {
    val a = BinaryPipeline.phashRgb(spark, sfDir).collect()
    val b = BinaryPipeline.phashRgb(spark, sfDir).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    assert(a.forall(_.getString(1).matches("[0-9A-F]{16}")), "16-hex digest")
    // brightness invariance on a raw raster: shifting every channel by a
    // constant preserves every luma gradient sign
    val rnd = new java.util.Random(3)
    val w = 9; val h = 9
    val rgb = new Array[Byte](w * h * 3)
    rnd.nextBytes(rgb)
    val base = rgb.map(v => ((v & 0xFF) % 150).toByte)
    val shifted = base.map(v => ((v & 0xFF) + 60).toByte)
    assert(BinaryPipeline.PngCodec.dhash(w, h, 3, base)
      === BinaryPipeline.PngCodec.dhash(w, h, 3, shifted))
  }
}
