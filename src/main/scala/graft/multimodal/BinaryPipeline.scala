package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal column plumbing: opaque `binary` payloads + typed
  * metadata, batched decode/feature-extract via `mapPartitions`.
  *
  * Since r15 the image codec is REAL: payloads are genuine PNG files
  * ([[PngCodec.encode]] — `javax.imageio`, JDK-standard, zero new
  * dependencies) and every decode in the pipeline is an actual
  * `ImageIO.read` of the container, not a header fake. The testdata
  * images are manufactured from the documents table by rendering each
  * document's UTF-8 bytes as an 8-bit grayscale raster (width
  * ⌈√len⌉, zero-padded tail), which keeps the whole family
  * hash-certified: PNG is lossless, so the DECODED pixels equal the
  * source bytes + pad, and the DuckDB oracle replays every
  * pixel-derived number from the text bytes without ever parsing a PNG
  * — a wrong decode, a dropped pad byte, or a lossy round-trip
  * hash-mismatches. (Audio/video codecs remain out of scope in this
  * container; the frame-sampling face below keeps the byte-level
  * "video" framing shape.)
  *
  * The Spark shapes are unchanged and are the real 100 TB design:
  *   - payloads stay binary end-to-end (no base64 inflation);
  *   - decode happens per-partition, iterator in / iterator out — the
  *     same shape a JNI/FFI codec needs;
  *   - feature vectors come out as fixed-width float arrays, ready for
  *     the graft.similarity operators.
  */
object BinaryPipeline {

  /** Real PNG image codec over `javax.imageio` (public JDK API).
    * Encode renders a byte payload as an 8-bit grayscale PNG
    * (the testdata manufacturer); decode is a genuine container parse
    * + raster extraction and works on any PNG the JDK reader accepts.
    * A non-image payload fails LOUDLY (decode refuses, never guesses).
    */
  object PngCodec {
    javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors

    val FeatureDim = 16

    /** Raster geometry for a rendered payload: width ⌈√len⌉, height
      * ⌈len/width⌉, both clamped ≥ 1 — near-square, deterministic, and
      * replayable from the byte length alone (IEEE sqrt is correctly
      * rounded, so the ceil is exact in both engines).
      */
    def dims(len: Int): (Int, Int) = {
      val w = math.max(math.ceil(math.sqrt(len.toDouble)).toInt, 1)
      val h = math.max((len + w - 1) / w, 1)
      (w, h)
    }

    /** Render `payload` as a real grayscale PNG: pixel i = byte i,
      * zero-padded to the [[dims]] raster. Lossless by construction
      * (PNG stores 8-bit gray samples verbatim), so
      * decode(encode(p)).pixels == p ++ pad — the round-trip identity
      * the fixture spec pins and every oracle below relies on.
      */
    def encode(payload: Array[Byte]): Array[Byte] = {
      val (w, h) = dims(payload.length)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val data = img.getRaster.getDataBuffer
        .asInstanceOf[java.awt.image.DataBufferByte].getData
      System.arraycopy(payload, 0, data, 0, math.min(payload.length, data.length))
      val bos = new java.io.ByteArrayOutputStream(w * h / 2 + 256)
      val ok = javax.imageio.ImageIO.write(img, "png", bos)
      require(ok, "JDK has no PNG writer (headless ImageIO missing?)")
      bos.toByteArray
    }

    /** 3-channel raster geometry for a rendered payload: ⌈len/3⌉
      * interleaved RGB pixels laid out near-square — width ⌈√npx⌉,
      * height ⌈npx/w⌉, both clamped ≥ 1. Deterministic and replayable
      * from the byte length alone, like the grayscale [[dims]].
      */
    def dimsRgb(len: Int): (Int, Int) = {
      val npx = math.max((len + 2) / 3, 1)
      val w = math.max(math.ceil(math.sqrt(npx.toDouble)).toInt, 1)
      val h = math.max((npx + w - 1) / w, 1)
      (w, h)
    }

    /** Render `payload` as a real 3-channel RGB PNG: interleaved
      * sample i = byte i (R,G,B,R,G,B,…), zero-padded to the
      * [[dimsRgb]] raster. Lossless by construction (PNG truecolor
      * stores the 8-bit samples verbatim), so decode(encodeRgb(p))
      * yields channels == 3 and pixels == p ++ pad — the multi-channel
      * round-trip identity the RGB oracles replay from source bytes.
      */
    def encodeRgb(payload: Array[Byte]): Array[Byte] = {
      val (w, h) = dimsRgb(payload.length)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      // setPixels takes samples in BAND order (R,G,B per pixel)
      // regardless of the underlying BGR byte layout, and decode's
      // getPixels reads them back in the same band order — the
      // container's storage order never leaks into the pipeline
      val samples = new Array[Int](w * h * 3)
      var i = 0
      while (i < payload.length) { samples(i) = payload(i) & 0xFF; i += 1 }
      img.getRaster.setPixels(0, 0, w, h, samples)
      val bos = new java.io.ByteArrayOutputStream(w * h + 256)
      val ok = javax.imageio.ImageIO.write(img, "png", bos)
      require(ok, "JDK has no PNG writer (headless ImageIO missing?)")
      bos.toByteArray
    }

    /** REAL decode: parse the container with `ImageIO.read`, extract
      * the raster row-major as (width, height, channels, pixel bytes).
      * Refuses undecodable payloads instead of inventing metadata.
      */
    def decode(png: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      require(img != null, "payload is not a decodable image")
      val w = img.getWidth
      val h = img.getHeight
      val raster = img.getRaster
      val channels = raster.getNumBands
      val out = new Array[Byte](w * h * channels)
      val row = new Array[Int](w * channels)
      var y = 0
      var o = 0
      while (y < h) {
        raster.getPixels(0, y, w, 1, row)
        var i = 0
        while (i < row.length) { out(o) = row(i).toByte; o += 1; i += 1 }
        y += 1
      }
      (w, h, channels, out)
    }

    /** FeatureDim-dim feature vector over a byte buffer (decoded
      * pixels, or raw frame bytes for the framing face): per-bucket
      * byte sums (positions ≡ k mod FeatureDim) normalized by 255 and
      * the bucket width — a deterministic, order-free stand-in for an
      * embedding-model forward pass. Exact integer sums + one
      * IEEE-determined division chain + float32 cast, so an external
      * engine recomputes the vector bit-identically.
      */
    def features(bytes: Array[Byte]): Array[Float] = {
      val sums = new Array[Long](FeatureDim)
      var i = 0
      while (i < bytes.length) {
        sums(i % FeatureDim) += (bytes(i) & 0xFF)
        i += 1
      }
      val n = math.max(bytes.length / FeatureDim, 1)
      val acc = new Array[Float](FeatureDim)
      var j = 0
      while (j < FeatureDim) { acc(j) = (sums(j) / 255.0 / n).toFloat; j += 1 }
      acc
    }

    /** dHash side: the perceptual hash point-samples the raster to a
      * (Side+1)×Side gradient grid — the published 9×8 geometry.
      */
    val PhashSide = 8

    /** dHash (difference hash) over a decoded raster — the standard
      * perceptual near-dup signal of image-corpus curation: point-sample
      * the raster to a 9×8 gray grid (nearest neighbor, the certified
      * [[BinaryPipeline.resize]] kernel), then bit (y,x) = 1 iff
      * g(y,x) > g(y,x+1) — 64 horizontal-gradient signs, invariant to
      * global brightness/contrast shifts. Returned as (hi, lo) unsigned
      * 32-bit halves so Hamming distances stay in exact integer bit ops
      * on every engine.
      *
      * Multi-channel rasters project to gray FIRST: sample s = mean of
      * the pixel's `channels` interleaved samples under integer
      * division — exact, engine-replayable, and identical to the raw
      * sample when channels == 1. Indexing strides by `channels`, so an
      * RGB payload hashes its true pixel grid instead of silently
      * sampling channel-interleaved byte positions.
      */
    def dhash(w: Int, h: Int, channels: Int, pixels: Array[Byte]): (Long, Long) = {
      val s = PhashSide
      require(channels >= 1 && pixels.length == w * h * channels,
        s"raster shape mismatch: ${pixels.length} bytes != $w x $h x $channels")
      def gray(py: Int, px: Int): Int = {
        val base = (py * w + px) * channels
        var acc = 0
        var c = 0
        while (c < channels) { acc += pixels(base + c) & 0xFF; c += 1 }
        acc / channels
      }
      val g = new Array[Int]((s + 1) * s)
      var y = 0
      while (y < s) {
        val sy = y * h / s
        var x = 0
        while (x <= s) {
          g(y * (s + 1) + x) = gray(sy, x * w / (s + 1))
          x += 1
        }
        y += 1
      }
      var hi = 0L
      var lo = 0L
      var b = 0
      while (b < 64) {
        val y0 = b / s
        val x0 = b % s
        val bit = if (g(y0 * (s + 1) + x0) > g(y0 * (s + 1) + x0 + 1)) 1L else 0L
        if (b < 32) hi |= bit << (31 - b) else lo |= bit << (63 - b)
        b += 1
      }
      (hi, lo)
    }
  }

  /** Raw byte-payload table from `documents`: the text bytes AS the
    * opaque payload (no container). This is the face for operations
    * that must not decode — exact dedup hashes the stored bytes, frame
    * sampling windows them — and the substrate [[asImageTable]] renders
    * into PNGs.
    */
  def asBinaryTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("item_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        col("source").as("origin"),
        col("n_chars").cast("long").as("content_length"),
        lit("application/octet-stream").as("mime")).as("meta"))

  /** The multimodal INPUT table: real PNG payloads (driver testdata —
    * a production pipeline reads image blobs from parquet/lance binary
    * columns; only this manufacturer changes, never the pipeline).
    * Encode is per-partition, binary in / binary out.
    */
  def asImageTable(docs: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("item_id", LongType),
      StructField("payload", BinaryType),
      StructField("meta", StructType(Seq(
        StructField("origin", StringType),
        StructField("content_length", LongType),
        StructField("mime", StringType))))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    // positional access: rows arriving from a chained mapPartitions are
    // schema-less GenericRows, so the explicit select pins the layout
    asBinaryTable(docs).select("item_id", "payload", "meta").mapPartitions { rows =>
      rows.map { r =>
        val meta = r.getStruct(2)
        Row(r.getLong(0), PngCodec.encode(r.getAs[Array[Byte]](1)),
          Row(meta.getString(0), meta.getLong(1), "image/png"))
      }
    }(enc)
  }

  val outSchema: StructType = StructType(Seq(
    StructField("item_id", LongType),
    StructField("pixel_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("origin", StringType),
    StructField("features", ArrayType(FloatType)),
    // per-raster QC sufficient stats + perceptual hash, computed in the
    // SAME decode pass (decode once, serve every consumer — the scale
    // discipline; exact integers so every derived metric replays)
    StructField("px_sum", LongType),
    StructField("px_sumsq", LongType),
    StructField("px_min", IntegerType),
    StructField("px_max", IntegerType),
    StructField("phash_hi", LongType),
    StructField("phash_lo", LongType)))

  /** Decode + feature-extract, batched per partition. A REAL
    * `ImageIO.read` per payload: dimensions/channels come from the
    * parsed container, features from the decoded raster. Binary-safe,
    * constant memory per partition (iterator in, iterator out — no
    * partition-wide materialization).
    */
  def decodeAndFeaturize(imgTable: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    // no repartition: the decode is purely row-local, and shuffling the
    // payload column (the largest in the pipeline) to rebalance would
    // cost more than it saves — the scan's own splits (plus
    // Tables.fanOut for tiny test files) set the parallelism
    imgTable
      .select("item_id", "payload", "meta")
      .mapPartitions { rows =>
        rows.map { r =>
          val (w, h, c, pixels) = PngCodec.decode(r.getAs[Array[Byte]](1))
          var sum = 0L; var sumSq = 0L; var mn = 255; var mx = 0
          var i = 0
          while (i < pixels.length) {
            val p = pixels(i) & 0xFF
            sum += p; sumSq += p.toLong * p
            if (p < mn) mn = p
            if (p > mx) mx = p
            i += 1
          }
          val (phHi, phLo) = PngCodec.dhash(w, h, c, pixels)
          Row(r.getLong(0), pixels.length, w, h, c, r.getStruct(2).getString(0),
            PngCodec.features(pixels).toSeq, sum, sumSq, mn, mx, phHi, phLo)
        }
      }(enc)
  }

  /** End-to-end pipeline over the documents-derived PNG table: binary
    * → real decode → features → summary columns. Returns the raw
    * feature vectors (array<float>) — the shape downstream similarity
    * operators consume. Memoized per dir (the codec is the family's
    * dominant cost and FIVE driver entries re-run it otherwise — the
    * shared-artifact discipline of the BPE/dedup/ANN caches).
    */
  def pipelineRaw(spark: SparkSession, dir: String): DataFrame =
    // no global sort before the checkpoint: every consumer re-imposes
    // its own order, and the trainers downstream sample by VALUE
    // (k-smallest vec_ids, vec_id % stride), never by position — at
    // 100 TB of images a corpus-wide orderBy here is a pure-waste
    // shuffle of the largest intermediate in the family
    graft.SessionCache.getOrElseUpdate(spark, ("mmRaw", dir))(
      decodeAndFeaturize(asImageTable(Tables.documents(spark, dir)))
        .localCheckpoint(true))

  /** Driver-facing view of [[pipelineRaw]]: the feature vector is
    * reduced to its rounded L2 norm because the correctness harness
    * canonicalizes result rows by sorting every column and array cells
    * are not sortable there. Same rows, scalar-only schema —
    * hash-CERTIFIED: [[pipelineSql]] replays the raster geometry and
    * the pixel-rebuilt feature norm from the source bytes (PNG is
    * lossless, so decoded pixels == bytes + zero pad), certifying the
    * real decode end-to-end.
    */
  def pipeline(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions
    pipelineRaw(spark, dir)
      .select(col("item_id"), col("pixel_bytes"), col("width"), col("height"),
        col("channels"), col("origin"),
        round(VectorFunctions.l2norm(col("features")), 4).as("feat_norm"))
      .orderBy("item_id")
  }

  /** mm_binary_pipeline replayed: the ⌈√len⌉ raster geometry plus the
    * norm of the pixel-rebuilt feature vector ([[featureListCtes]]) —
    * the pad bytes are zero, so bucket sums over the text bytes equal
    * sums over the decoded raster, and only the normalization divisor
    * carries the padded length.
    */
  def pipelineSql: String =
    s"""WITH $featureListCtes
       |SELECT d.doc_id AS item_id, CAST(d.plen AS INTEGER) AS pixel_bytes,
       |  CAST(d.w AS INTEGER) AS width, CAST(d.h AS INTEGER) AS height,
       |  CAST(1 AS INTEGER) AS channels, d.origin,
       |  round(sqrt(list_sum(list_transform(fl.v, x -> x * x))), 4) AS feat_norm
       |FROM d JOIN fl USING (doc_id)
       |ORDER BY item_id""".stripMargin

  /** Output side length of the REAL image resize below (8×8). */
  val ResizeSide = 8

  val resizeSchema: StructType = StructType(Seq(
    StructField("item_id", LongType),
    StructField("orig_bytes", IntegerType),
    StructField("orig_w", IntegerType),
    StructField("orig_h", IntegerType),
    StructField("resized", BinaryType)))

  /** REAL image resize: decode the PNG, nearest-neighbor-sample the
    * raster down (or up) to [[ResizeSide]]² — out(y,x) = src(⌊y·h/S⌋,
    * ⌊x·w/S⌋) — the classic point-sampling kernel, chosen over
    * bilinear because it is exactly integer-replayable (the oracle
    * rebuilds every sampled pixel by index arithmetic; interpolation
    * would put float pixel blends outside DuckDB's reach). Binary in /
    * binary out, output size fixed by construction. Multi-channel
    * rasters keep every channel: the sample index strides by
    * `channels` and the output is S²·channels interleaved bytes —
    * identical to the single-plane kernel when channels == 1.
    */
  def resize(imgTable: DataFrame): DataFrame = {
    val s = ResizeSide
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(resizeSchema)
    imgTable.select("item_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val (w, h, ch, pixels) = PngCodec.decode(r.getAs[Array[Byte]](1))
        val out = new Array[Byte](s * s * ch)
        var y = 0
        while (y < s) {
          val sy = y * h / s
          var x = 0
          while (x < s) {
            val src = (sy * w + x * w / s) * ch
            var c = 0
            while (c < ch) { out((y * s + x) * ch + c) = pixels(src + c); c += 1 }
            x += 1
          }
          y += 1
        }
        Row(id, pixels.length, w, h, out)
      }
    }(enc)
  }

  /** Driver-facing [[resize]]: the resized raster surfaces as its hex
    * string (binary stays the library API; the harness hashes strings).
    * hash-CERTIFIED: [[resizeSql]] rebuilds every sampled pixel
    * position from the source bytes, so a wrong stride, a transposed
    * axis, or an off-by-one at the pad boundary hash-mismatches —
    * certifying decode + point-sampling end-to-end.
    */
  def resize(spark: SparkSession, dir: String): DataFrame =
    resize(asImageTable(Tables.documents(spark, dir)))
      .select(col("item_id"), col("orig_bytes"), col("orig_w"), col("orig_h"),
        hex(col("resized")).as("resized_hex"))
      .orderBy("item_id")

  /** mm_resize replayed: the ⌈√len⌉ raster rebuilt from the text
    * bytes (pad = 0x00), point-sampled at (⌊y·h/S⌋·w + ⌊x·w/S⌋),
    * re-joined in raster order.
    */
  def resizeSql: String = {
    val s = ResizeSide
    s"""WITH $geomCtes,
       |px AS (
       |  SELECT d.doc_id, ty.range * $s + tx.range AS i,
       |    CASE WHEN (ty.range * d.h // $s) * d.w + (tx.range * d.w // $s) < d.len
       |      THEN substr(d.hx,
       |        CAST(2 * ((ty.range * d.h // $s) * d.w + (tx.range * d.w // $s)) + 1 AS INTEGER), 2)
       |      ELSE '00' END AS hb
       |  FROM d CROSS JOIN range(0, $s) ty CROSS JOIN range(0, $s) tx)
       |SELECT d.doc_id AS item_id, CAST(d.plen AS INTEGER) AS orig_bytes,
       |  CAST(d.w AS INTEGER) AS orig_w, CAST(d.h AS INTEGER) AS orig_h,
       |  string_agg(px.hb, '' ORDER BY px.i) AS resized_hex
       |FROM d JOIN px USING (doc_id)
       |GROUP BY d.doc_id, d.plen, d.w, d.h
       |ORDER BY item_id""".stripMargin
  }

  /** Byte-level frame sampling: treats the RAW payload as a "video" of
    * fixed-size frames and keeps every `everyK`-th frame — one output
    * row per kept frame (item_id, frame_idx, frame payload, per-frame
    * features). The explode-to-frame-rows shape is the real pipeline
    * design: frame rows partition freely for downstream embedding/dedup
    * regardless of source-file boundaries. (Video containers are out of
    * scope in this sandbox — this face keeps the framing SHAPE on raw
    * bytes; the image path above is the genuinely-decoded one.)
    */
  val FrameBytes = 256
  val frameSchema: StructType = StructType(Seq(
    StructField("item_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("frame", BinaryType),
    StructField("frame_features", ArrayType(FloatType))))

  def frameSample(binTable: DataFrame, everyK: Int = 4): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(frameSchema)
    binTable.select("item_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val nFrames = math.max(payload.length / FrameBytes, 1)
        (0 until nFrames by everyK).iterator.map { f =>
          val from = math.min(f * FrameBytes, payload.length)
          val until = math.min(from + FrameBytes, payload.length)
          val frame = java.util.Arrays.copyOfRange(payload, from, until)
          Row(id, f, frame, PngCodec.features(frame).toSeq)
        }
      }
    }(enc)
  }

  /** Driver-facing frame sampling: per-frame feature vectors reduced to
    * the rounded norm for the same harness reason as [[pipeline]]; the
    * frame payload surfaces as its hex string. hash-CERTIFIED:
    * [[frameSampleSql]] rebuilds every kept frame's byte range AND its
    * feature norm from the payload bytes, so a wrong frame boundary, a
    * skipped tail, or a per-frame bucket-sum error hash-mismatches.
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions
    frameSample(asBinaryTable(Tables.documents(spark, dir)))
      .select(col("item_id"), col("frame_idx"),
        length(col("frame")).as("frame_bytes"),
        hex(col("frame")).as("frame_hex"),
        round(VectorFunctions.l2norm(col("frame_features")), 4).as("frame_norm"))
      .orderBy("item_id", "frame_idx")
  }

  /** mm_frame_sample replayed: every-4th fixed-width frame slice over
    * the hex-expanded payload (nFrames = max(len/$FrameBytes, 1), frame
    * f covers [f·w, min(f·w+w, len))), plus the per-frame feature norm
    * rebuilt with the bucket-sum arithmetic over each frame's own
    * bytes.
    */
  def frameSampleSql: String = {
    val w = FrameBytes
    val dim = PngCodec.FeatureDim
    s"""WITH b AS MATERIALIZED (
       |  SELECT doc_id, hex(encode(text)) AS hx,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS len
       |  FROM documents),
       |fx AS MATERIALIZED (
       |  SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
       |    least(f * $w + $w, len) - f * $w AS flen,
       |    substr(hx, CAST(2 * f * $w + 1 AS INTEGER),
       |      CAST(2 * (least(f * $w + $w, len) - f * $w) AS INTEGER)) AS fhx
       |  FROM (SELECT doc_id, hx, len,
       |          unnest(range(0, greatest(len // $w, 1), 4)) AS f FROM b)),
       |v AS (
       |  SELECT doc_id, frame_idx, CAST((j - 1) % $dim AS INTEGER) AS k,
       |    ('0x' || substr(fhx, CAST(2 * j - 1 AS INTEGER), 2))::BIGINT AS byte
       |  FROM (SELECT doc_id, frame_idx, fhx,
       |          unnest(range(1, CAST(flen + 1 AS INTEGER))) AS j FROM fx)),
       |s0 AS (SELECT doc_id, frame_idx, k, sum(byte) AS bs FROM v GROUP BY 1, 2, 3),
       |ks AS (SELECT unnest(range(0, $dim)) AS k),
       |ff AS (
       |  SELECT fx.doc_id, fx.frame_idx, ks.k,
       |    CAST(CAST(coalesce(s0.bs, 0) AS DOUBLE) / 255.0
       |      / greatest(fx.flen // $dim, 1) AS REAL) AS fv
       |  FROM fx CROSS JOIN ks
       |  LEFT JOIN s0 ON s0.doc_id = fx.doc_id
       |    AND s0.frame_idx = fx.frame_idx AND s0.k = ks.k),
       |fl2 AS (SELECT doc_id, frame_idx, list(CAST(fv AS DOUBLE) ORDER BY k) AS v
       |        FROM ff GROUP BY 1, 2)
       |SELECT fx.doc_id AS item_id, fx.frame_idx,
       |  CAST(fx.flen AS INTEGER) AS frame_bytes, fx.fhx AS frame_hex,
       |  round(sqrt(list_sum(list_transform(fl2.v, x -> x * x))), 4) AS frame_norm
       |FROM fx JOIN fl2 USING (doc_id, frame_idx)
       |ORDER BY item_id, frame_idx""".stripMargin
  }

  /** Scene segmentation over the byte-framed "video": every
    * consecutive-frame pair's feature delta (exact double fold over
    * the per-frame vectors — index-ordered zip, so the sum replays),
    * rolled up to the strongest boundary per item — the shot/scene
    * cut a video-curation pass samples around instead of uniformly.
    * Frames here are EVERY fixed-width slice (k=1, unlike 37b's
    * every-4th sampling face); items too short for two frames report
    * NULL cut columns. Codecs stay out of scope (§2 row 36's
    * boundary); the framing, per-frame features and boundary fold are
    * the real pipeline shape.
    */
  /** Consecutive-frame feature deltas (item_id, frame_idx, delta) over
    * the k=1 framing — the shared signal both scene-cut faces rank.
    * The lag window is per item over its bounded frame count, so the
    * partition never exceeds one payload's frames.
    */
  private def sceneDeltas(frames: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("item_id").orderBy("frame_idx")
    frames
      .withColumn("prev", lag(col("frame_features"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("item_id"), col("frame_idx"),
        round(aggregate(
          zip_with(col("frame_features"), col("prev"), (a, b) =>
            (a.cast("double") - b.cast("double")) * (a.cast("double") - b.cast("double"))),
          lit(0.0), (acc, v) => acc + v), 4).as("delta"))
  }

  def sceneCuts(spark: SparkSession, dir: String): DataFrame = {
    val frames = frameSample(asBinaryTable(Tables.documents(spark, dir)), everyK = 1)
    val cuts = sceneDeltas(frames)
      .groupBy("item_id")
      .agg(max_by(col("frame_idx"), struct(col("delta"), -col("frame_idx"))).as("cut_idx"),
        max(col("delta")).as("max_delta"))
    frames.groupBy("item_id").agg(count(lit(1)).cast("int").as("n_frames"))
      .join(cuts, Seq("item_id"), "left")
      .select(col("item_id"), col("n_frames"), col("cut_idx"), col("max_delta"))
      .orderBy("item_id")
  }

  /** How many boundaries [[sceneCutsTopK]] keeps per item. */
  val SceneCutsK = 3

  /** Multi-cut scene segmentation — [[sceneCuts]]'s argmax generalized
    * to the per-item top-[[SceneCutsK]] boundaries by (delta DESC,
    * frame_idx ASC): real video curation samples around the strongest
    * k cuts, not just the single sharpest one. One row per kept cut
    * (items too short for two frames emit nothing); rank 1 reproduces
    * the single-cut face's boundary. The rank window stays inside one
    * item's bounded frame set — no global ordering anywhere.
    * hash-CERTIFIED: [[sceneCutsTopKSql]] replays frames, deltas and
    * the rank pick verbatim.
    */
  def sceneCutsTopK(spark: SparkSession, dir: String): DataFrame =
    sceneCutsTopK(asBinaryTable(Tables.documents(spark, dir)))

  private[graft] def sceneCutsTopK(binTable: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val r = Window.partitionBy("item_id").orderBy(col("delta").desc, col("frame_idx"))
    sceneDeltas(frameSample(binTable, everyK = 1))
      .withColumn("cut_rank", row_number().over(r))
      .filter(col("cut_rank") <= SceneCutsK)
      .select(col("item_id"), col("cut_rank"),
        col("frame_idx").as("cut_idx"), col("delta"))
      .orderBy("item_id", "cut_rank")
  }

  /** mm_scene_cuts replayed: every frame's feature vector rebuilt from
    * the payload bytes (the 37b CTEs at k=1), consecutive deltas via
    * lag(), the strongest boundary by (delta DESC, frame_idx ASC).
    */
  /** The shared scene-cut CTE chain (frames → per-frame features →
    * consecutive deltas `dl`) both SQL faces rank over.
    */
  private def sceneDeltaCtes: String = {
    val w = FrameBytes
    val dim = PngCodec.FeatureDim
    s"""b AS MATERIALIZED (
       |  SELECT doc_id, hex(encode(text)) AS hx,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS len
       |  FROM documents),
       |fx AS MATERIALIZED (
       |  SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
       |    least(f * $w + $w, len) - f * $w AS flen,
       |    substr(hx, CAST(2 * f * $w + 1 AS INTEGER),
       |      CAST(2 * (least(f * $w + $w, len) - f * $w) AS INTEGER)) AS fhx
       |  FROM (SELECT doc_id, hx, len,
       |          unnest(range(0, greatest(len // $w, 1))) AS f FROM b)),
       |v AS (
       |  SELECT doc_id, frame_idx, CAST((j - 1) % $dim AS INTEGER) AS k,
       |    ('0x' || substr(fhx, CAST(2 * j - 1 AS INTEGER), 2))::BIGINT AS byte
       |  FROM (SELECT doc_id, frame_idx, fhx,
       |          unnest(range(1, CAST(flen + 1 AS INTEGER))) AS j FROM fx)),
       |s0 AS (SELECT doc_id, frame_idx, k, sum(byte) AS bs FROM v GROUP BY 1, 2, 3),
       |ks AS (SELECT unnest(range(0, $dim)) AS k),
       |ff AS (
       |  SELECT fx.doc_id, fx.frame_idx, ks.k,
       |    CAST(CAST(coalesce(s0.bs, 0) AS DOUBLE) / 255.0
       |      / greatest(fx.flen // $dim, 1) AS REAL) AS fv
       |  FROM fx CROSS JOIN ks
       |  LEFT JOIN s0 ON s0.doc_id = fx.doc_id
       |    AND s0.frame_idx = fx.frame_idx AND s0.k = ks.k),
       |fl2 AS MATERIALIZED (
       |  SELECT doc_id, frame_idx, list(CAST(fv AS DOUBLE) ORDER BY k) AS v
       |  FROM ff GROUP BY 1, 2),
       |dl AS (
       |  SELECT doc_id, frame_idx,
       |    round(list_sum(list_transform(list_zip(v,
       |      lag(v) OVER (PARTITION BY doc_id ORDER BY frame_idx)),
       |      p -> (p[1] - p[2]) * (p[1] - p[2]))), 4) AS delta
       |  FROM fl2
       |  QUALIFY lag(v) OVER (PARTITION BY doc_id ORDER BY frame_idx) IS NOT NULL)""".stripMargin
  }

  def sceneCutsSql: String =
    s"""WITH $sceneDeltaCtes,
       |best AS (
       |  SELECT doc_id, frame_idx AS cut_idx, delta AS max_delta
       |  FROM dl QUALIFY row_number() OVER (PARTITION BY doc_id
       |    ORDER BY delta DESC, frame_idx) = 1),
       |nf AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS n_frames FROM fx GROUP BY 1)
       |SELECT nf.doc_id AS item_id, nf.n_frames, best.cut_idx, best.max_delta
       |FROM nf LEFT JOIN best USING (doc_id)
       |ORDER BY item_id""".stripMargin

  /** mm_scene_cuts_topk replayed: the same delta chain, per-item
    * row_number by (delta DESC, frame_idx ASC) kept to [[SceneCutsK]].
    */
  def sceneCutsTopKSql: String =
    s"""WITH $sceneDeltaCtes
       |SELECT doc_id AS item_id,
       |  CAST(row_number() OVER (PARTITION BY doc_id
       |    ORDER BY delta DESC, frame_idx) AS INTEGER) AS cut_rank,
       |  frame_idx AS cut_idx, delta
       |FROM dl
       |QUALIFY row_number() OVER (PARTITION BY doc_id
       |  ORDER BY delta DESC, frame_idx) <= $SceneCutsK
       |ORDER BY item_id, cut_rank""".stripMargin

  /** Per-frame energy QC over the raw byte payload — the audio-shaped
    * screen of the binary pipeline (silence/clipping detection before
    * anything expensive), on the same fixed-width framing as
    * [[frameSample]] but over EVERY frame: samples are the payload
    * bytes centered at 128 (the unsigned-PCM convention), per frame
    *   - RMS energy = √(Σ s² / frame_len), exact integer sum of
    *     squares finished by one IEEE division + sqrt;
    *   - zero crossings = adjacent sample pairs with a strict sign
    *     change (zeros break runs) — the classic cheap
    *     voiced/unvoiced signal.
    * Audio CODECS stay out of scope in this container (the honest
    * boundary §2 row 36 declares); the framing, energy fold and
    * screen SHAPE are the real pipeline, byte-replayable end-to-end.
    */
  val frameEnergySchema: StructType = StructType(Seq(
    StructField("item_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("frame_bytes", IntegerType),
    StructField("sum_sq", LongType),
    StructField("n_zero_cross", IntegerType)))

  def frameEnergy(binTable: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(frameEnergySchema)
    binTable.select("item_id", "payload").mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val nFrames = math.max(payload.length / FrameBytes, 1)
        (0 until nFrames).iterator.map { f =>
          val from = math.min(f * FrameBytes, payload.length)
          val until = math.min(from + FrameBytes, payload.length)
          var sumSq = 0L
          var zc = 0
          var prev = 0
          var i = from
          while (i < until) {
            val s = (payload(i) & 0xFF) - 128
            sumSq += s.toLong * s
            if (i > from && ((prev > 0 && s < 0) || (prev < 0 && s > 0))) zc += 1
            prev = s
            i += 1
          }
          Row(id, f, until - from, sumSq, zc)
        }
      }
    }(enc)
  }

  def frameEnergy(spark: SparkSession, dir: String): DataFrame =
    frameEnergy(asBinaryTable(Tables.documents(spark, dir)))
      // RMS finished in the plan (exact integer sufficient stat → one
      // IEEE division chain + the engine-shared round) — the certified
      // rounding path every stats face uses
      .select(col("item_id"), col("frame_idx"), col("frame_bytes"),
        when(col("frame_bytes") > 0,
          round(sqrt(col("sum_sq").cast("double") / col("frame_bytes").cast("double")), 4))
          .otherwise(lit(0.0)).as("rms"),
        col("n_zero_cross"))
      .orderBy("item_id", "frame_idx")

  /** mm_frame_energy replayed: every fixed-width frame slice, centered
    * samples, exact integer sum of squares, and the lead()-paired
    * strict sign changes — all from the payload bytes.
    */
  def frameEnergySql: String = {
    val w = FrameBytes
    s"""WITH b AS MATERIALIZED (
       |  SELECT doc_id, hex(encode(text)) AS hx,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS len
       |  FROM documents),
       |fx AS MATERIALIZED (
       |  SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
       |    f * $w AS off, least(f * $w + $w, len) - f * $w AS flen
       |  FROM (SELECT doc_id, hx, len,
       |          unnest(range(0, greatest(len // $w, 1))) AS f FROM b)),
       |v AS (
       |  SELECT fx.doc_id, fx.frame_idx, j,
       |    ('0x' || substr(b.hx, CAST(2 * (fx.off + j) + 1 AS INTEGER), 2))::BIGINT
       |      - 128 AS s
       |  FROM fx JOIN b USING (doc_id)
       |  CROSS JOIN LATERAL (SELECT unnest(range(0, CAST(fx.flen AS INTEGER))) AS j) js),
       |en AS (
       |  SELECT doc_id, frame_idx, sum(s * s) AS ss, count(*) AS n FROM v GROUP BY 1, 2),
       |zc AS (
       |  SELECT doc_id, frame_idx,
       |    sum(CASE WHEN (s > 0 AND s2 < 0) OR (s < 0 AND s2 > 0) THEN 1 ELSE 0 END) AS z
       |  FROM (SELECT doc_id, frame_idx, s,
       |          lead(s) OVER (PARTITION BY doc_id, frame_idx ORDER BY j) AS s2 FROM v)
       |  GROUP BY 1, 2)
       |SELECT fx.doc_id AS item_id, fx.frame_idx,
       |  CAST(fx.flen AS INTEGER) AS frame_bytes,
       |  CASE WHEN fx.flen > 0
       |    THEN round(sqrt(CAST(en.ss AS DOUBLE) / CAST(en.n AS DOUBLE)), 4)
       |    ELSE 0.0 END AS rms,
       |  CAST(coalesce(zc.z, 0) AS INTEGER) AS n_zero_cross
       |FROM fx LEFT JOIN en USING (doc_id, frame_idx) LEFT JOIN zc USING (doc_id, frame_idx)
       |ORDER BY item_id, frame_idx""".stripMargin
  }

  /** Per-image pixel QC stats from the REAL decoded raster — the
    * brightness/contrast screen an image-corpus curation pass runs
    * before anything expensive (all-black thumbnails, blank scans and
    * washed-out frames drop here): min/max/mean/std over the gray
    * pixels, computed as exact integer sufficient stats in the one
    * memoized decode pass and finished with a fixed IEEE expression
    * tree, so DuckDB replays every number from the source bytes.
    */
  def pixelStats(spark: SparkSession, dir: String): DataFrame = {
    val n = col("pixel_bytes").cast("double")
    val mean = col("px_sum").cast("double") / n
    val variance = col("px_sumsq").cast("double") / n - mean * mean
    pipelineRaw(spark, dir)
      .select(col("item_id"), col("width"), col("height"),
        col("px_min").as("pixel_min"), col("px_max").as("pixel_max"),
        (col("px_max") - col("px_min")).as("contrast_range"),
        round(mean, 4).as("pixel_mean"),
        round(sqrt(greatest(variance, lit(0.0))), 4).as("pixel_std"))
      .orderBy("item_id")
  }

  /** mm_pixel_stats replayed: exact byte sums over the raster (the
    * zero pad adds nothing to sum/sumsq, forces min to 0 whenever the
    * raster is padded, never raises max), then the same
    * mean/variance/sqrt expression tree over the PADDED pixel count.
    */
  def pixelStatsSql: String =
    s"""WITH $geomCtes,
       |st AS (
       |  SELECT doc_id,
       |    sum(('0x' || substr(hx, CAST(2 * i - 1 AS INTEGER), 2))::BIGINT) AS s1,
       |    sum((('0x' || substr(hx, CAST(2 * i - 1 AS INTEGER), 2))::BIGINT)
       |      * (('0x' || substr(hx, CAST(2 * i - 1 AS INTEGER), 2))::BIGINT)) AS s2,
       |    min(('0x' || substr(hx, CAST(2 * i - 1 AS INTEGER), 2))::BIGINT) AS mn,
       |    max(('0x' || substr(hx, CAST(2 * i - 1 AS INTEGER), 2))::BIGINT) AS mx
       |  FROM (SELECT doc_id, hx, unnest(range(1, CAST(len + 1 AS INTEGER))) AS i FROM d)
       |  GROUP BY doc_id)
       |SELECT d.doc_id AS item_id, CAST(d.w AS INTEGER) AS width,
       |  CAST(d.h AS INTEGER) AS height,
       |  CAST(CASE WHEN d.plen > d.len THEN 0 ELSE st.mn END AS INTEGER) AS pixel_min,
       |  CAST(coalesce(st.mx, 0) AS INTEGER) AS pixel_max,
       |  CAST(coalesce(st.mx, 0) - CASE WHEN d.plen > d.len THEN 0 ELSE st.mn END
       |    AS INTEGER) AS contrast_range,
       |  round(CAST(coalesce(st.s1, 0) AS DOUBLE) / CAST(d.plen AS DOUBLE), 4)
       |    AS pixel_mean,
       |  round(sqrt(greatest(
       |    CAST(coalesce(st.s2, 0) AS DOUBLE) / CAST(d.plen AS DOUBLE)
       |      - (CAST(coalesce(st.s1, 0) AS DOUBLE) / CAST(d.plen AS DOUBLE))
       |        * (CAST(coalesce(st.s1, 0) AS DOUBLE) / CAST(d.plen AS DOUBLE)),
       |    0.0)), 4) AS pixel_std
       |FROM d LEFT JOIN st USING (doc_id)
       |ORDER BY item_id""".stripMargin

  /** Perceptual hash (dHash) of every image from the real decoded
    * raster: 9×8 nearest-neighbor gray grid → 64 horizontal-gradient
    * sign bits — the standard near-dup signal of image curation,
    * invariant to global brightness/contrast shifts (where mm_dedup's
    * byte hash only catches bit-identical files). Surfaced as the
    * 16-hex digest plus its gradient popcount; computed in the shared
    * decode pass, map-side only.
    */
  def phash(spark: SparkSession, dir: String): DataFrame =
    pipelineRaw(spark, dir)
      .select(col("item_id"),
        format_string("%08X%08X", col("phash_hi"), col("phash_lo")).as("phash"),
        (expr("bit_count(phash_hi)") + expr("bit_count(phash_lo)"))
          .cast("int").as("n_gradient_bits"))
      .orderBy("item_id")

  /** Shared dHash replay: thumbnail g(y,x) by the certified
    * nearest-neighbor index arithmetic over the padded raster, gradient
    * bits, and the (hi, lo) unsigned 32-bit halves. Yields
    * `ph(doc_id, hi, lo)` on top of `d`.
    */
  private def phashCtes: String = {
    val s = PngCodec.PhashSide
    s"""$geomCtes,
       |g AS (
       |  SELECT d.doc_id, ty.range AS y, tx.range AS x,
       |    CASE WHEN (ty.range * d.h // $s) * d.w + (tx.range * d.w // ${s + 1}) < d.len
       |      THEN ('0x' || substr(d.hx,
       |        CAST(2 * ((ty.range * d.h // $s) * d.w + (tx.range * d.w // ${s + 1})) + 1
       |          AS INTEGER), 2))::BIGINT
       |      ELSE 0 END AS v
       |  FROM d CROSS JOIN range(0, $s) ty CROSS JOIN range(0, ${s + 1}) tx),
       |bits AS (
       |  SELECT a.doc_id, a.y * $s + a.x AS b,
       |    CASE WHEN a.v > n.v THEN 1 ELSE 0 END AS bit
       |  FROM g a JOIN g n ON n.doc_id = a.doc_id AND n.y = a.y AND n.x = a.x + 1
       |  WHERE a.x < $s),
       |ph AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN b < 32 THEN bit * (1::BIGINT << (31 - b)) ELSE 0 END)
       |      AS BIGINT) AS hi,
       |    CAST(sum(CASE WHEN b >= 32 THEN bit * (1::BIGINT << (63 - b)) ELSE 0 END)
       |      AS BIGINT) AS lo
       |  FROM bits GROUP BY doc_id)""".stripMargin
  }

  /** mm_phash replayed: the dHash grid, bit assembly and hex digest
    * rebuilt from the source bytes.
    */
  def phashSql: String =
    s"""WITH $phashCtes
       |SELECT doc_id AS item_id, printf('%08X%08X', hi, lo) AS phash,
       |  CAST(bit_count(hi) + bit_count(lo) AS INTEGER) AS n_gradient_bits
       |FROM ph ORDER BY item_id""".stripMargin

  /** Perceptual near-dup pair cap: Hamming radius of the banded
    * search. 4 disjoint 16-bit bands + radius 3 ⇒ pigeonhole-complete
    * (any pair within radius shares at least one band verbatim).
    */
  val PhashMaxHamming = 3

  /** Version tag of the perceptual-hash family — pins a persisted
    * index to the hashing that built it (the Dedup.BandFormat
    * discipline).
    */
  val PhashFormat = "dhash-gray-9x8-v1"

  /** Standalone (item_id, phash_hi, phash_lo) table from an image
    * frame — the streaming face's per-batch hasher (real decode, one
    * mapPartitions pass; batch entries read the memoized
    * [[pipelineRaw]] instead).
    */
  def phashTable(imgTable: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("item_id", LongType),
      StructField("phash_hi", LongType),
      StructField("phash_lo", LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    imgTable.select("item_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val (w, h, c, pixels) = PngCodec.decode(r.getAs[Array[Byte]](1))
        val (hi, lo) = PngCodec.dhash(w, h, c, pixels)
        Row(r.getLong(0), hi, lo)
      }
    }(enc)
  }

  /** The 4 disjoint 16-bit bands of a (item_id, phash_hi, phash_lo)
    * table — the pigeonhole candidate keys (radius ≤ 3 of 64 bits
    * guarantees one shared band).
    */
  private def phashBands(ph: DataFrame): DataFrame =
    ph.select(col("item_id"), col("phash_hi").as("hi"), col("phash_lo").as("lo"))
      .select(col("item_id"), col("hi"), col("lo"),
        posexplode(array(
          shiftrightunsigned(col("hi"), 16), col("hi").bitwiseAND(lit(0xFFFFL)),
          shiftrightunsigned(col("lo"), 16), col("lo").bitwiseAND(lit(0xFFFFL))))
          .as(Seq("r", "band")))

  /** Hot-band cap of the perceptual band join: a (band position, band
    * value) bucket holding more than this many hashes is SPLIT before
    * pairing. Band values cap at 65,536 per position and natural-image
    * corpora are NOT uniform over them (smooth/dark frames collapse
    * into constant bands), so at web scale one hot bucket otherwise
    * costs k² candidate verifications — the skew twin of the MinHash
    * df-cap. Override per deployment via
    * `spark.conf.set("graft.mm.maxBandBucket", n)`.
    */
  val MaxBandBucket = 1024

  private def maxBandBucket(df: DataFrame): Int =
    df.sparkSession.conf.getOption("graft.mm.maxBandBucket")
      .map(_.toInt).getOrElse(MaxBandBucket)

  /** Split over-populated band buckets WITHOUT losing pigeonhole
    * completeness: members of a hot (r, band) bucket re-band on the 48
    * COMPLEMENT bits (the other three bands, concatenated) sliced into
    * 4 × 12-bit sub-bands. A pair at Hamming ≤ [[PhashMaxHamming]] that
    * shares the hot band has all ≤ 3 differing bits inside those 48,
    * so by the same pigeonhole it shares at least one 12-bit sub-band —
    * the candidate survives, but the hot bucket's k² join cost drops to
    * Σ(sub-bucket)² across 4 × 4096 finer keys. Cold buckets join
    * directly under sub = -1 (hotness is a bucket property, so a pair
    * never straddles the cold/hot paths). Duplicate candidates from
    * multi-sub-band agreement collapse in the verifier's distinct.
    */
  private def cappedBands(bands: DataFrame, counts: DataFrame, cap: Int): DataFrame = {
    val tagged = bands.join(counts, Seq("r", "band"))
    withSubBands(tagged, cap)
  }

  /** The cold/hot split + sub-band expansion over rows already carrying
    * their bucket population in `cnt`.
    */
  private def withSubBands(tagged: DataFrame, cap: Int): DataFrame = {
    def b(i: Int) = i match {
      case 0 => shiftrightunsigned(col("hi"), 16)
      case 1 => col("hi").bitwiseAND(lit(0xFFFFL))
      case 2 => shiftrightunsigned(col("lo"), 16)
      case 3 => col("lo").bitwiseAND(lit(0xFFFFL))
    }
    // complement bits: the three bands other than r, ascending index
    def rem(r: Int): org.apache.spark.sql.Column = {
      val o = (0 until 4).filterNot(_ == r)
      shiftleft(b(o(0)), 32).bitwiseOR(shiftleft(b(o(1)), 16)).bitwiseOR(b(o(2)))
    }
    val remCol = (0 until 4).foldRight(lit(-1L): org.apache.spark.sql.Column) {
      (r, acc) => when(col("r") === r, rem(r)).otherwise(acc)
    }
    // sub key = sub-band position * 4096 + 12-bit value (positions must
    // not cross-match)
    val subs = (0 until 4).map { j =>
      lit(j * 4096L) + shiftrightunsigned(remCol, 36 - 12 * j).bitwiseAND(lit(0xFFFL))
    }
    tagged.filter(col("cnt") <= cap).withColumn("sub", lit(-1L))
      .unionByName(tagged.filter(col("cnt") > cap)
        .withColumn("sub", explode(array(subs: _*))))
      .drop("cnt")
  }

  private def verifyPairs(cand: DataFrame): DataFrame =
    cand.select("id_a", "id_b", "hi_a", "lo_a", "hi_b", "lo_b").distinct()
      .select(col("id_a"), col("id_b"),
        (expr("bit_count(hi_a ^ hi_b)") + expr("bit_count(lo_a ^ lo_b)"))
          .cast("int").as("hamming"))
      .filter(col("hamming") <= PhashMaxHamming)

  /** Within-set perceptual pairs (id_a < id_b) of one hash table,
    * through the hot-band-capped join ([[cappedBands]]).
    */
  def phashPairsWithin(ph: DataFrame): DataFrame = {
    // bucket population via a WINDOW over the same (r, band) shuffle
    // the candidate join needs anyway — one exchange, not a separate
    // counts aggregate + join (the count's sort rides the exchange)
    val tagged = phashBands(ph).withColumn("cnt",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("r", "band")))
    val cb = withSubBands(tagged, maxBandBucket(ph))
    val a = cb.select(col("item_id").as("id_a"), col("hi").as("hi_a"),
      col("lo").as("lo_a"), col("r"), col("band"), col("sub"))
    val b = cb.select(col("item_id").as("id_b"), col("hi").as("hi_b"),
      col("lo").as("lo_b"), col("r"), col("band"), col("sub"))
    verifyPairs(a.join(b, Seq("r", "band", "sub")).filter(col("id_a") < col("id_b")))
  }

  /** Cross-set perceptual pairs (corpus index × new batch), surfaced
    * canonically as (min id, max id) so the union of within- and
    * cross-batch emissions over any tranche order equals the batch
    * pair set. Hotness is judged on the COMBINED (corpus ∪ batch)
    * bucket population, so both sides classify every bucket
    * identically and a pair never straddles the cold/hot paths.
    */
  def phashPairsBetween(corpus: DataFrame, batch: DataFrame): DataFrame = {
    // one union carries both sides through a single (r, band) window
    // count — the combined population decides hotness for both, and
    // the side marker splits the capped rows back into join inputs
    val all = phashBands(corpus).withColumn("side", lit(0))
      .unionByName(phashBands(batch).withColumn("side", lit(1)))
      .withColumn("cnt", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("r", "band")))
    val cb = withSubBands(all, maxBandBucket(corpus)).localCheckpoint(false)
    val a = cb.filter(col("side") === 0).select(col("item_id").as("ida"),
      col("hi").as("ha"), col("lo").as("la"), col("r"), col("band"), col("sub"))
    val b = cb.filter(col("side") === 1).select(col("item_id").as("idb"),
      col("hi").as("hb"), col("lo").as("lb"), col("r"), col("band"), col("sub"))
    verifyPairs(a.join(b, Seq("r", "band", "sub")).filter(col("ida") =!= col("idb"))
      .select(least(col("ida"), col("idb")).as("id_a"),
        greatest(col("ida"), col("idb")).as("id_b"),
        when(col("ida") < col("idb"), col("ha")).otherwise(col("hb")).as("hi_a"),
        when(col("ida") < col("idb"), col("la")).otherwise(col("lb")).as("lo_a"),
        when(col("ida") < col("idb"), col("hb")).otherwise(col("ha")).as("hi_b"),
        when(col("ida") < col("idb"), col("lb")).otherwise(col("la")).as("lo_b")))
  }

  /** Perceptual near-dup pairs: images whose dHashes differ in ≤
    * [[PhashMaxHamming]] of 64 bits — re-encoded, slightly-padded or
    * contrast-shifted copies that byte-exact dedup misses. Candidate
    * generation is the simhash pigeonhole discipline over the hash
    * itself: 4 disjoint 16-bit bands bucket-join (never all pairs),
    * and radius ≤ 3 guarantees a shared band, so the banding loses
    * nothing. Verification is two exact XOR popcounts per candidate.
    */
  /** The corpus-wide verified pair table, memoized per (session, dir)
    * and surfaced as the `mm_phash_pairs` bench artifact: both the
    * dedup face and the curation funnel consume it (the funnel's
    * survivor-set pairs are exactly this set restricted to survivor
    * endpoints — Hamming is subset-independent), so the banded join
    * runs once per session instead of once per consumer.
    */
  private[graft] def cachedPhashPairs(spark: SparkSession, dir: String): DataFrame =
    graft.SessionCache.getOrElseUpdate(spark, ("mmPhashPairs", dir))(
      phashPairsWithin(pipelineRaw(spark, dir)
        .select("item_id", "phash_hi", "phash_lo")).localCheckpoint(true))

  def phashDedup(spark: SparkSession, dir: String): DataFrame =
    cachedPhashPairs(spark, dir).orderBy("id_a", "id_b")

  /** mm_phash_dedup replayed: bands by integer div/mod, bucket
    * self-join, XOR popcount verify — verbatim.
    */
  def phashDedupSql: String =
    s"""WITH $phashCtes,
       |bands AS (
       |  SELECT doc_id, hi, lo, r,
       |    CASE r WHEN 0 THEN hi // 65536 WHEN 1 THEN hi % 65536
       |           WHEN 2 THEN lo // 65536 ELSE lo % 65536 END AS band
       |  FROM ph CROSS JOIN (SELECT unnest(range(0, 4)) AS r) rs),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    a.hi AS hi_a, a.lo AS lo_a, b.hi AS hi_b, b.lo AS lo_b
       |  FROM bands a JOIN bands b
       |    ON a.r = b.r AND a.band = b.band AND a.doc_id < b.doc_id)
       |SELECT id_a, id_b,
       |  CAST(bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) AS INTEGER)
       |    AS hamming
       |FROM cand
       |WHERE bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) <= $PhashMaxHamming
       |ORDER BY id_a, id_b""".stripMargin

  /** Contrast floor of the image-curation funnel: a raster whose full
    * dynamic range is narrower than this is a blank/washed-out frame.
    */
  val MinContrast = 32

  /** Image-curation funnel — the acceptance readout of the mm family,
    * mirroring the text `curation_funnel`: stage counts through
    *   1. `1_decoded`   — every payload the REAL codec decodes,
    *   2. `2_contrast`  — survivors of the pixel-QC contrast floor
    *      ([[MinContrast]] over [[pixelStats]]' exact range),
    *   3. `3_perceptual_unique` — contrast survivors with no
    *      smaller-id contrast-surviving perceptual neighbor at
    *      Hamming ≤ [[PhashMaxHamming]] (the near_dedup_keep rule over
    *      [[phashDedup]]'s banded pairs).
    * One row per stage; monotone by construction. Everything reads the
    * memoized decode pass; the only join is the banded pair probe.
    */
  def curationFunnel(spark: SparkSession, dir: String): DataFrame = {
    val raw = pipelineRaw(spark, dir)
    val passed = col("px_max") - col("px_min") >= MinContrast
    val pass = raw.filter(passed).select("item_id")
    // drop rule over the SURVIVOR set: any smaller-id surviving
    // neighbor. Survivor-set pairs are the memoized corpus-wide pair
    // table restricted to survivor ENDPOINTS (Hamming ≤ r between two
    // images does not depend on which subset they sit in, and the
    // banded candidate generation is complete for any subset), so the
    // banded join is never recomputed here.
    val pairs = cachedPhashPairs(spark, dir)
    val dropped = pairs
      .join(pass.select(col("item_id").as("id_a")), "id_a")
      .join(pass.select(col("item_id").as("id_b")), "id_b")
      .select(col("id_b").as("item_id")).distinct()
    // all three stage counts off ONE corpus scan: stage 1 = every row,
    // stage 2 = contrast survivors, stage 3 = survivors minus dropped
    // neighbors (the left-join NULL test ≡ the anti-join). The r16
    // shape — an eager per-call survivor checkpoint + a 3-branch agg
    // union — paid a materialization job per call (the 0.25 → 0.64 s
    // sf0.1 pin drift) for rows `raw` had already checkpointed.
    raw.select(col("item_id"), passed.cast("long").as("p"))
      .join(dropped.withColumn("d", lit(1L)), Seq("item_id"), "left")
      .agg(count(lit(1)).as("c1"),
        coalesce(sum(col("p")), lit(0L)).as("c2"),
        coalesce(sum(when(col("p") === 1L && col("d").isNull, 1L)
          .otherwise(0L)), lit(0L)).as("c3"))
      .select(explode(array(
        struct(lit("1_decoded").as("stage"), col("c1").as("n")),
        struct(lit("2_contrast").as("stage"), col("c2").as("n")),
        struct(lit("3_perceptual_unique").as("stage"), col("c3").as("n")))).as("s"))
      .select(col("s.stage").as("stage"), col("s.n").as("n"))
      .orderBy("stage")
  }

  /** mm_curation_funnel replayed: stage 1 is the corpus, stage 2 the
    * contrast floor over the padded-raster min/max, stage 3 the
    * anti-join against smaller-id surviving perceptual neighbors —
    * all rebuilt from the source bytes.
    */
  def curationFunnelSql: String =
    s"""WITH $phashCtes,
       |st AS (
       |  SELECT doc_id,
       |    min(('0x' || substr(hx, CAST(2 * i - 1 AS INTEGER), 2))::BIGINT) AS mn,
       |    max(('0x' || substr(hx, CAST(2 * i - 1 AS INTEGER), 2))::BIGINT) AS mx
       |  FROM (SELECT doc_id, hx, unnest(range(1, CAST(len + 1 AS INTEGER))) AS i FROM d)
       |  GROUP BY doc_id),
       |qc AS (
       |  SELECT d.doc_id,
       |    coalesce(st.mx, 0) - CASE WHEN d.plen > d.len THEN 0 ELSE st.mn END AS contrast
       |  FROM d LEFT JOIN st USING (doc_id)),
       |pass AS MATERIALIZED (
       |  SELECT ph.doc_id, ph.hi, ph.lo FROM ph JOIN qc USING (doc_id)
       |  WHERE qc.contrast >= $MinContrast),
       |bands AS (
       |  SELECT doc_id, hi, lo, r,
       |    CASE r WHEN 0 THEN hi // 65536 WHEN 1 THEN hi % 65536
       |           WHEN 2 THEN lo // 65536 ELSE lo % 65536 END AS band
       |  FROM pass CROSS JOIN (SELECT unnest(range(0, 4)) AS r) rs),
       |dropped AS (
       |  SELECT DISTINCT b.doc_id
       |  FROM bands a JOIN bands b
       |    ON a.r = b.r AND a.band = b.band AND a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
       |    <= $PhashMaxHamming)
       |SELECT '1_decoded' AS stage, count(*) AS n FROM d
       |UNION ALL SELECT '2_contrast', count(*) FROM pass
       |UNION ALL SELECT '3_perceptual_unique', count(*) FROM pass
       |  WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
       |ORDER BY stage""".stripMargin

  /** The 3-CHANNEL input table: real RGB PNG payloads (the testdata
    * manufacturer interleaves the document bytes as R,G,B samples —
    * lossless truecolor, so the decoded interleaved raster equals the
    * source bytes + pad and every RGB face replays from text). A real
    * multimodal corpus meets RGB before grayscale; this table is the
    * pipeline's proof that nothing assumes a single plane.
    */
  def asRgbImageTable(docs: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("item_id", LongType),
      StructField("payload", BinaryType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    asBinaryTable(docs).select("item_id", "payload").mapPartitions { rows =>
      rows.map(r => Row(r.getLong(0), PngCodec.encodeRgb(r.getAs[Array[Byte]](1))))
    }(enc)
  }

  private val rgbRawSchema: StructType = StructType(Seq(
    StructField("item_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("r_sum", LongType),
    StructField("g_sum", LongType),
    StructField("b_sum", LongType),
    StructField("luma_sum", LongType),
    StructField("luma_sumsq", LongType),
    StructField("luma_min", IntegerType),
    StructField("luma_max", IntegerType),
    StructField("phash_hi", LongType),
    StructField("phash_lo", LongType)))

  /** One REAL 3-channel decode pass over [[asRgbImageTable]], memoized
    * per dir: per-channel exact integer sums, integer-luma
    * ((r+g+b)//3 per pixel — exact, engine-replayable) sufficient
    * stats, and the luma dHash — every RGB face reads this single
    * codec run (the decode-once discipline of [[pipelineRaw]]).
    */
  def rgbRaw(spark: SparkSession, dir: String): DataFrame =
    graft.SessionCache.getOrElseUpdate(spark, ("mmRgbRaw", dir)) {
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(rgbRawSchema)
      asRgbImageTable(Tables.documents(spark, dir)).mapPartitions { rows =>
        rows.map { r =>
          val (w, h, c, px) = PngCodec.decode(r.getAs[Array[Byte]](1))
          require(c == 3, s"RGB table decoded to $c channel(s)")
          val chSum = new Array[Long](3)
          var lSum = 0L; var lSumSq = 0L; var lMin = 255; var lMax = 0
          var p = 0
          val nPix = w * h
          while (p < nPix) {
            val base = p * 3
            val r0 = px(base) & 0xFF
            val g0 = px(base + 1) & 0xFF
            val b0 = px(base + 2) & 0xFF
            chSum(0) += r0; chSum(1) += g0; chSum(2) += b0
            val l = (r0 + g0 + b0) / 3
            lSum += l; lSumSq += l.toLong * l
            if (l < lMin) lMin = l
            if (l > lMax) lMax = l
            p += 1
          }
          val (phHi, phLo) = PngCodec.dhash(w, h, 3, px)
          Row(r.getLong(0), w, h, 3, chSum(0), chSum(1), chSum(2),
            lSum, lSumSq, lMin, lMax, phHi, phLo)
        }
      }(enc).localCheckpoint(true)
    }

  /** Per-image RGB pixel QC from the real 3-channel decode: per-channel
    * means plus integer-luma mean/std/min/max — the color-aware screen
    * (color casts, blank planes, washed-out frames) an RGB curation
    * pass runs where [[pixelStats]] screens single-plane rasters.
    * hash-CERTIFIED: [[pixelStatsRgbSql]] replays channel c as byte
    * positions ≡ c (mod 3) and luma as the per-pixel integer mean, all
    * from the source bytes (the RGB render is lossless).
    */
  def pixelStatsRgb(spark: SparkSession, dir: String): DataFrame = {
    val nPix = (col("width") * col("height")).cast("double")
    val lMean = col("luma_sum").cast("double") / nPix
    val lVar = col("luma_sumsq").cast("double") / nPix - lMean * lMean
    rgbRaw(spark, dir)
      .select(col("item_id"), col("width"), col("height"), col("channels"),
        round(col("r_sum").cast("double") / nPix, 4).as("r_mean"),
        round(col("g_sum").cast("double") / nPix, 4).as("g_mean"),
        round(col("b_sum").cast("double") / nPix, 4).as("b_mean"),
        col("luma_min"), col("luma_max"),
        round(lMean, 4).as("luma_mean"),
        round(sqrt(greatest(lVar, lit(0.0))), 4).as("luma_std"))
      .orderBy("item_id")
  }

  /** Perceptual hash of every RGB image: the luma projection
    * ((r+g+b)//3, exact integer) of the real 3-channel raster fed
    * through the same 9×8 dHash as [[phash]] — re-encoded or
    * color-cast copies of an image land within a small Hamming radius
    * of their grayscale twin's hash family. Same output shape as
    * mm_phash; hash-CERTIFIED via [[phashRgbSql]].
    */
  def phashRgb(spark: SparkSession, dir: String): DataFrame =
    rgbRaw(spark, dir)
      .select(col("item_id"),
        format_string("%08X%08X", col("phash_hi"), col("phash_lo")).as("phash"),
        (expr("bit_count(phash_hi)") + expr("bit_count(phash_lo)"))
          .cast("int").as("n_gradient_bits"))
      .orderBy("item_id")

  /** Shared RGB oracle geometry: npx = ⌈len/3⌉ pixels, w = ⌈√npx⌉,
    * h = ⌈npx/w⌉ — [[PngCodec.dimsRgb]] replayed. Yields
    * `dr(doc_id, hx, len, w, h, npix)` over `documents`.
    */
  private def rgbGeomCtes: String =
    s"""dr AS MATERIALIZED (
       |  SELECT doc_id, hex(encode(text)) AS hx,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS len,
       |    greatest(CAST(ceil(sqrt(CAST(
       |      greatest((octet_length(encode(text)) + 2) // 3, 1) AS DOUBLE))) AS BIGINT), 1) AS w,
       |    greatest((greatest((len + 2) // 3, 1) + w - 1) // w, 1) AS h,
       |    w * greatest((greatest((len + 2) // 3, 1) + w - 1) // w, 1) AS npix
       |  FROM documents)""".stripMargin

  /** Per-pixel luma rebuilt from the source bytes: pixel p's three
    * samples are bytes 3p, 3p+1, 3p+2 (0-based; out-of-range = pad 0),
    * luma = (r+g+b) // 3. Yields `lm(doc_id, p, l)` for REAL pixels
    * (p < ⌈len/3⌉); pad pixels are all-zero → luma 0, handled by each
    * consumer's coalesce/count arithmetic.
    */
  private def rgbLumaCtes: String =
    s"""$rgbGeomCtes,
       |lm AS MATERIALIZED (
       |  SELECT doc_id, p,
       |    (coalesce(CASE WHEN 3 * p < len
       |        THEN ('0x' || substr(hx, CAST(6 * p + 1 AS INTEGER), 2))::BIGINT END, 0)
       |     + coalesce(CASE WHEN 3 * p + 1 < len
       |        THEN ('0x' || substr(hx, CAST(6 * p + 3 AS INTEGER), 2))::BIGINT END, 0)
       |     + coalesce(CASE WHEN 3 * p + 2 < len
       |        THEN ('0x' || substr(hx, CAST(6 * p + 5 AS INTEGER), 2))::BIGINT END, 0)) // 3 AS l
       |  FROM (SELECT doc_id, hx, len,
       |          unnest(range(0, CAST((len + 2) // 3 AS INTEGER))) AS p FROM dr))""".stripMargin

  /** Driver-facing RGB resize: the channel-strided nearest-neighbor
    * kernel ([[resize]]) over the truecolor table, surfaced as hex —
    * hash-CERTIFIES the multi-channel sampling end-to-end (the
    * grayscale mm_resize can never catch a stride bug; this face
    * rebuilds every (y, x, channel) sample position from the source
    * bytes, so sampling interleaved byte positions instead of pixel
    * positions hash-mismatches immediately).
    */
  def resizeRgb(spark: SparkSession, dir: String): DataFrame =
    resize(asRgbImageTable(Tables.documents(spark, dir)))
      .select(col("item_id"), col("orig_bytes"), col("orig_w"), col("orig_h"),
        hex(col("resized")).as("resized_hex"))
      .orderBy("item_id")

  /** mm_resize_rgb replayed: the ⌈√⌈len/3⌉⌉ RGB raster point-sampled
    * at ((⌊y·h/S⌋·w + ⌊x·w/S⌋)·3 + c) per channel, pad = 0x00,
    * re-joined in interleaved raster order.
    */
  def resizeRgbSql: String = {
    val s = ResizeSide
    s"""WITH $rgbGeomCtes,
       |px AS (
       |  SELECT dr.doc_id, (ty.range * $s + tx.range) * 3 + ch.range AS i,
       |    CASE WHEN ((ty.range * dr.h // $s) * dr.w + (tx.range * dr.w // $s)) * 3
       |             + ch.range < dr.len
       |      THEN substr(dr.hx,
       |        CAST(2 * (((ty.range * dr.h // $s) * dr.w + (tx.range * dr.w // $s)) * 3
       |          + ch.range) + 1 AS INTEGER), 2)
       |      ELSE '00' END AS hb
       |  FROM dr CROSS JOIN range(0, $s) ty CROSS JOIN range(0, $s) tx
       |  CROSS JOIN range(0, 3) ch)
       |SELECT dr.doc_id AS item_id, CAST(dr.npix * 3 AS INTEGER) AS orig_bytes,
       |  CAST(dr.w AS INTEGER) AS orig_w, CAST(dr.h AS INTEGER) AS orig_h,
       |  string_agg(px.hb, '' ORDER BY px.i) AS resized_hex
       |FROM dr JOIN px USING (doc_id)
       |GROUP BY dr.doc_id, dr.npix, dr.w, dr.h
       |ORDER BY item_id""".stripMargin
  }

  /** mm_pixel_stats_rgb replayed: channel sums over byte positions
    * ≡ c (mod 3), luma sufficient stats over the real pixels (pad
    * pixels contribute zero to the sums, force luma_min to 0 whenever
    * the raster is padded, never raise luma_max), then the same
    * mean/variance/sqrt tree over the PADDED pixel count.
    */
  def pixelStatsRgbSql: String =
    s"""WITH $rgbLumaCtes,
       |cs AS (
       |  SELECT doc_id,
       |    sum(CASE WHEN (i - 1) % 3 = 0
       |      THEN ('0x' || substr(hx, CAST(2 * i - 1 AS INTEGER), 2))::BIGINT ELSE 0 END) AS rs,
       |    sum(CASE WHEN (i - 1) % 3 = 1
       |      THEN ('0x' || substr(hx, CAST(2 * i - 1 AS INTEGER), 2))::BIGINT ELSE 0 END) AS gs,
       |    sum(CASE WHEN (i - 1) % 3 = 2
       |      THEN ('0x' || substr(hx, CAST(2 * i - 1 AS INTEGER), 2))::BIGINT ELSE 0 END) AS bs
       |  FROM (SELECT doc_id, hx, unnest(range(1, CAST(len + 1 AS INTEGER))) AS i FROM dr)
       |  GROUP BY doc_id),
       |ls AS (
       |  SELECT doc_id, sum(l) AS s1, sum(l * l) AS s2, min(l) AS mn, max(l) AS mx,
       |    count(*) AS nreal
       |  FROM lm GROUP BY doc_id)
       |SELECT dr.doc_id AS item_id, CAST(dr.w AS INTEGER) AS width,
       |  CAST(dr.h AS INTEGER) AS height, CAST(3 AS INTEGER) AS channels,
       |  round(CAST(coalesce(cs.rs, 0) AS DOUBLE) / CAST(dr.npix AS DOUBLE), 4) AS r_mean,
       |  round(CAST(coalesce(cs.gs, 0) AS DOUBLE) / CAST(dr.npix AS DOUBLE), 4) AS g_mean,
       |  round(CAST(coalesce(cs.bs, 0) AS DOUBLE) / CAST(dr.npix AS DOUBLE), 4) AS b_mean,
       |  CAST(coalesce(CASE WHEN dr.npix > ls.nreal THEN 0 ELSE ls.mn END, 0) AS INTEGER) AS luma_min,
       |  CAST(coalesce(ls.mx, 0) AS INTEGER) AS luma_max,
       |  round(CAST(coalesce(ls.s1, 0) AS DOUBLE) / CAST(dr.npix AS DOUBLE), 4) AS luma_mean,
       |  round(sqrt(greatest(
       |    CAST(coalesce(ls.s2, 0) AS DOUBLE) / CAST(dr.npix AS DOUBLE)
       |      - (CAST(coalesce(ls.s1, 0) AS DOUBLE) / CAST(dr.npix AS DOUBLE))
       |        * (CAST(coalesce(ls.s1, 0) AS DOUBLE) / CAST(dr.npix AS DOUBLE)),
       |    0.0)), 4) AS luma_std
       |FROM dr LEFT JOIN cs USING (doc_id) LEFT JOIN ls USING (doc_id)
       |ORDER BY item_id""".stripMargin

  /** mm_phash_rgb replayed: the 9×8 dHash grid over the per-pixel
    * integer luma (grid cell (y,x) samples pixel
    * (⌊y·h/8⌋·w + ⌊x·w/9⌋); pad pixels are luma 0), bit assembly and
    * hex digest exactly as [[phashSql]].
    */
  def phashRgbSql: String = {
    val s = PngCodec.PhashSide
    s"""WITH $rgbLumaCtes,
       |g AS (
       |  SELECT dr.doc_id, ty.range AS y, tx.range AS x,
       |    coalesce(lm.l, 0) AS v
       |  FROM dr CROSS JOIN range(0, $s) ty CROSS JOIN range(0, ${s + 1}) tx
       |  LEFT JOIN lm ON lm.doc_id = dr.doc_id
       |    AND lm.p = (ty.range * dr.h // $s) * dr.w + (tx.range * dr.w // ${s + 1})),
       |bits AS (
       |  SELECT a.doc_id, a.y * $s + a.x AS b,
       |    CASE WHEN a.v > n.v THEN 1 ELSE 0 END AS bit
       |  FROM g a JOIN g n ON n.doc_id = a.doc_id AND n.y = a.y AND n.x = a.x + 1
       |  WHERE a.x < $s),
       |ph AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN b < 32 THEN bit * (1::BIGINT << (31 - b)) ELSE 0 END)
       |      AS BIGINT) AS hi,
       |    CAST(sum(CASE WHEN b >= 32 THEN bit * (1::BIGINT << (63 - b)) ELSE 0 END)
       |      AS BIGINT) AS lo
       |  FROM bits GROUP BY doc_id)
       |SELECT doc_id AS item_id, printf('%08X%08X', hi, lo) AS phash,
       |  CAST(bit_count(hi) + bit_count(lo) AS INTEGER) AS n_gradient_bits
       |FROM ph ORDER BY item_id""".stripMargin
  }

  /** Feature extraction surfaced for similarity search: item_id +
    * feature vector + feature norm (plumbing check). Array-returning —
    * feed this to graft.similarity.
    */
  def featureVectors(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions
    pipelineRaw(spark, dir)
      .select(col("item_id"), col("features"),
        round(VectorFunctions.l2norm(col("features")), 4).as("feat_norm"))
      .orderBy("item_id")
  }

  /** Exact multimodal dedup: group binary payloads by content hash and
    * keep the smallest item_id — byte-identical images/audio collapse in
    * ONE hash aggregation with map-side partials, the same single-
    * shuffle shape as text `dedup_exact` but over the binary column
    * directly (no decode needed to kill exact copies — hashing the
    * STORED bytes is both the cheapest and the right semantics for
    * exact-copy elimination).
    */
  def binaryDedup(binTable: DataFrame): DataFrame =
    binTable
      .groupBy(md5(col("payload")).as("payload_md5"))
      .agg(min("item_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies", "payload_md5")
      .orderBy("keep_id")

  def binaryDedup(spark: SparkSession, dir: String): DataFrame =
    binaryDedup(asBinaryTable(Tables.documents(spark, dir)))

  /** Oracle: DuckDB md5 over the same UTF-8 payload bytes. */
  val binaryDedupSql: String =
    """SELECT min(doc_id) AS keep_id, count(*) AS n_copies, md5(text) AS payload_md5
      |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin

  /** Multimodal similarity — the composition the feature vectors exist
    * for: decoded-raster features fed straight into the similarity
    * tier's exact top-k (broadcast queries, one corpus scan). A real
    * deployment swaps the feature extractor for a model forward pass,
    * not this plumbing; at scale the same frame feeds the LSH/IVF
    * candidate generators instead. Hash-certified (pixel-replayable
    * features).
    */
  def similarTopK(spark: SparkSession, dir: String): DataFrame = {
    val feats = pipelineRaw(spark, dir)
      .select(col("item_id").as("vec_id"), col("features").as("embedding"))
    graft.similarity.Ann.bruteForceTopK(feats)
  }

  /** IVF-index variant of [[similarTopK]] — the binary→vector→index
    * composition end-to-end at the SCALE tier: decoded features train
    * the coarse quantizer, the corpus is cell-assigned map-side,
    * queries probe the persisted-index path (`ivfTopKFromIndex`). Brute
    * force scores every (query, item) pair; this touches nProbe cells
    * per query — the same swap a real deployment makes once the corpus
    * outgrows one scan per query batch. Hash-certified
    * ([[similarTopKIvfSql]] — ann_ivf_topk's certified quantizer CTEs
    * over pixel-replayed features); recall vs brute force stays
    * spec-asserted.
    */
  def similarTopKIvf(spark: SparkSession, dir: String): DataFrame = {
    val (centroids, assigned) = cachedMmIvfIndex(spark, dir)
    graft.similarity.Ann.ivfTopKFromIndex(centroids, assigned,
      mmFeatures(spark, dir).filter(col("vec_id") < 10))
  }

  /** The decoded-raster feature table in the ANN contract shape
    * (vec_id, embedding) — every mm similarity face's input. Reads the
    * checkpoint-memoized codec run, so repeated calls cost a select.
    */
  private def mmFeatures(spark: SparkSession, dir: String): DataFrame =
    pipelineRaw(spark, dir)
      .select(col("item_id").as("vec_id"), col("features").as("embedding"))

  /** Memoized mm IVF index (coarse centroids + cell-assigned corpus)
    * over the decoded-raster features, surfaced with the IVFPQ
    * machinery as the `mm_ann_index` bench artifact: without the memo,
    * every `mm_similar_ivf` call re-trains the quantizer and re-assigns
    * the corpus — repeated training work the session-cache discipline
    * exists to eliminate (the embeddings family's `ann_ivf_index`
    * pattern applied to the mm feature table).
    */
  private[graft] def cachedMmIvfIndex(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) =
    graft.SessionCache.getOrElseUpdate(spark, ("mmIvfIndex", dir)) {
      val (c, a) = graft.similarity.Ann.ivfIndex(mmFeatures(spark, dir))
      (c.localCheckpoint(true), a.localCheckpoint(true))
    }

  /** Memoized mm IVF-PQ machinery (coarse centroids, 8×2-dim PQ
    * codebooks, encoded code table) — the `ann_tier_ivfpq` discipline
    * for the mm corpus. Parameters are locked to [[similarTopKIvfPq]]'s
    * face (nCells 16, nSub 8, nCodes 16, trainSize 4096); keep in step
    * or the cache serves a foreign index.
    */
  private[graft] def cachedMmIvfpqMachinery(spark: SparkSession, dir: String)
      : Option[(Array[(Int, Array[Double])], Array[Array[Array[Double]]], DataFrame)] =
    graft.SessionCache.getOrElseUpdate(spark, ("mmIvfpqMachinery", dir)) {
      graft.similarity.Ann.ivfpqMachinery(mmFeatures(spark, dir),
        nCells = 16, nSub = 8, nCodes = 16, trainSize = 4096, materialize = true)
    }

  /** Force both mm ANN index memos — the `mm_ann_index` artifact line
    * (runs after `mm_codec`, so it attributes only quantizer training
    * + corpus assign/encode, not the decode).
    */
  private[graft] def prewarmMmAnnIndex(spark: SparkSession, dir: String): Unit = {
    cachedMmIvfIndex(spark, dir)
    cachedMmIvfpqMachinery(spark, dir)
    ()
  }

  /** IVF-PQ variant of [[similarTopKIvf]] — the multimodal tier at its
    * DEPLOYABLE form: binary → decoded features → coarse cells + PQ
    * codes, ADC scoring only inside probed cells (`Ann.ivfpqTopK`). The
    * feature vectors are 16-dim, so 8 subspaces of 2 dims each keep
    * the codebooks honest (16 codes per 2-dim subspace ≈ lossless at
    * this dim). Hash-certified ([[similarTopKIvfPqSql]] — the certified
    * quantizer + PQ/ADC CTEs over pixel-replayed features); recall vs
    * the exact tier stays spec-asserted next to the flat-IVF variant's.
    */
  def similarTopKIvfPq(spark: SparkSession, dir: String): DataFrame =
    graft.similarity.Ann.ivfpqTopKFromMachinery(
      cachedMmIvfpqMachinery(spark, dir), mmFeatures(spark, dir),
      nQueries = 10, k = 5, nProbe = 6)

  /** Media clustering: Lloyd's k-means ([[graft.similarity.KMeans]] —
    * the same trainer the embedding entry certifies against DuckDB)
    * over the decoded-raster feature vectors, rolled up per cluster —
    * the "group my corpus into visual/audio buckets" pass a multimodal
    * curation pipeline runs for stratified sampling and mix control.
    * Hash-certified — [[mediaKmeansSql]] composes the shared Lloyd
    * replay over the pixel-replayed features; the per-cluster mean
    * distance folds over 4-dp-quantized INTEGER sufficient stats (the
    * embedding_outliers discipline) so no cross-row double summation
    * order can hash-diverge.
    */
  /** Trained-and-assigned media clusters, memoized per (session, dir)
    * and surfaced as the `mm_kmeans_assign` bench artifact (the
    * embeddings face's cachedAssignment discipline): the Lloyd
    * training replay dominated the entry's marginal otherwise.
    */
  private[graft] def cachedMediaAssign(spark: SparkSession, dir: String): DataFrame =
    graft.SessionCache.getOrElseUpdate(spark, ("mmKmeansAssign", dir)) {
      import graft.similarity.KMeans
      val feats = KMeans.widen(pipelineRaw(spark, dir)
        .select(col("item_id").as("vec_id"), col("features").as("embedding")))
        .localCheckpoint(true)
      KMeans.assign(feats, KMeans.train(feats)).localCheckpoint(true)
    }

  def mediaKmeans(spark: SparkSession, dir: String): DataFrame =
    cachedMediaAssign(spark, dir)
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_items"),
        min(col("vec_id")).as("min_item"), max(col("vec_id")).as("max_item"),
        round(sum(round(col("dist") * 1e4).cast("long")).cast("double")
          / count(lit(1)) / 1e4, 4).as("mean_dist"))
      .orderBy("cluster_id")

  /** Driver-facing [[featureVectors]]: the full feature vector unpacked
    * into FeatureDim scalar columns (f0..f15, float widened to double —
    * exact), hash-CERTIFIED: [[featureExtractSql]] recomputes every
    * component from the source bytes, so a wrong bucket sum, a lossy
    * decode, or a batch boundary error anywhere in the mapPartitions
    * pipeline hash-mismatches.
    */
  def featureExtract(spark: SparkSession, dir: String): DataFrame = {
    val fs = (0 until PngCodec.FeatureDim).map(k =>
      col("features").getItem(k).cast("double").as(s"f$k"))
    pipelineRaw(spark, dir)
      .select(col("item_id") +: col("pixel_bytes") +: fs: _*)
      .orderBy("item_id")
  }

  /** Shared oracle CTE rebuilding the raster GEOMETRY from the payload
    * blob: hex-expanded bytes, byte length, width ⌈√len⌉, height
    * ⌈len/w⌉, padded pixel count plen = w·h. Yields
    * `d(doc_id, origin, hx, len, w, h, plen)` over `documents`.
    * (DuckDB resolves lateral column aliases, so w is defined once.)
    */
  private def geomCtes: String =
    s"""d AS MATERIALIZED (
       |  SELECT doc_id, source AS origin, hex(encode(text)) AS hx,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS len,
       |    greatest(CAST(ceil(sqrt(CAST(octet_length(encode(text)) AS DOUBLE))) AS BIGINT), 1) AS w,
       |    greatest((len + w - 1) // w, 1) AS h,
       |    w * greatest((len + w - 1) // w, 1) AS plen
       |  FROM documents)""".stripMargin

  /** [[geomCtes]] extended with the decoded-raster feature rebuild:
    * bucket positions mod FeatureDim over the REAL bytes (the zero pad
    * adds nothing to any bucket sum), exact integer sums, then the
    * codec's own double-division chain + REAL cast with the PADDED
    * length as divisor — bit-identical to [[PngCodec.features]] over
    * the decoded pixels because PNG round-trips the raster losslessly.
    * Yields `f(doc_id, k, fv)` on top of `d`.
    */
  private def featureCtes: String = {
    val dim = PngCodec.FeatureDim
    s"""$geomCtes,
       |v AS (
       |  SELECT doc_id, CAST((i - 1) % $dim AS INTEGER) AS k,
       |    ('0x' || substr(hx, CAST(2 * i - 1 AS INTEGER), 2))::BIGINT AS byte
       |  FROM (SELECT doc_id, hx, unnest(range(1, CAST(len + 1 AS INTEGER))) AS i FROM d)),
       |s0 AS (SELECT doc_id, k, sum(byte) AS bs FROM v GROUP BY 1, 2),
       |ks AS (SELECT unnest(range(0, $dim)) AS k),
       |f AS (
       |  SELECT d.doc_id, d.plen, ks.k,
       |    CAST(CAST(coalesce(s0.bs, 0) AS DOUBLE) / 255.0
       |      / greatest(d.plen // $dim, 1) AS REAL) AS fv
       |  FROM d CROSS JOIN ks
       |  LEFT JOIN s0 ON s0.doc_id = d.doc_id AND s0.k = ks.k)""".stripMargin
  }

  /** mm_feature_extract replayed byte-for-byte in the oracle. */
  def featureExtractSql: String = {
    val pivot = (0 until PngCodec.FeatureDim).map(k =>
      s"CAST(max(CASE WHEN k = $k THEN fv END) AS DOUBLE) AS f$k").mkString(",\n  ")
    s"""WITH $featureCtes
       |SELECT doc_id AS item_id, CAST(any_value(plen) AS INTEGER) AS pixel_bytes,
       |  $pivot
       |FROM f GROUP BY doc_id ORDER BY item_id""".stripMargin
  }

  /** [[featureCtes]] extended with the per-doc DOUBLE[] vector list
    * `fl` — the prefix every vector-consuming mm oracle composes over.
    */
  private def featureListCtes: String =
    s"""$featureCtes,
       |fl AS MATERIALIZED (
       |  SELECT doc_id, list(CAST(fv AS DOUBLE) ORDER BY k) AS v FROM f GROUP BY doc_id)""".stripMargin

  /** mm_similar_topk replayed: the decoded-raster features rebuilt from
    * the source bytes ([[featureCtes]]) feed the ann_bruteforce_topk
    * oracle verbatim — certifying the binary→vector→similarity
    * composition end-to-end.
    */
  def similarTopKSql: String =
    s"""WITH $featureListCtes,
       |q AS (SELECT doc_id AS query_id, v AS qv FROM fl WHERE doc_id < 10),
       |scored AS (
       |  SELECT q.query_id, e.doc_id AS neighbor_id,
       |    round(list_cosine_similarity(q.qv, e.v), 4) AS cosine
       |  FROM q JOIN fl e ON e.doc_id <> q.query_id),
       |ranked AS (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
       |    ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, rank, cosine FROM ranked
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  private val FeatureECte: String = "SELECT doc_id AS vec_id, v FROM fl"

  /** mm_similar_ivf replayed: the certified IVF coarse-quantizer replay
    * (ann_ivf_topk's CTEs) composed over the pixel-replayed features —
    * binary → vector → trained index, all hash-certified.
    */
  def similarTopKIvfSql: String =
    graft.similarity.Ann.ivfTopKSqlWith(featureListCtes, FeatureECte)

  /** mm_similar_ivfpq replayed: the certified IVF-PQ replay
    * (quantizer + PQ codebooks + ADC LUTs) over the pixel-replayed
    * features, at the mm tier's 16-dim / 8-subspace geometry.
    */
  def similarTopKIvfPqSql: String =
    graft.similarity.Ann.ivfpqTopKSqlWith(featureListCtes, FeatureECte,
      dim = PngCodec.FeatureDim, nSub = 8)

  /** mm_kmeans replayed: the shared Lloyd replay
    * ([[graft.similarity.KMeans.kmeansReplayCtes]]) over the exploded
    * pixel-replayed features, rolled up per cluster with the
    * integer-quantized mean (the embedding_outliers sufficient-stat
    * discipline — a plain avg over doubles would hash on summation
    * order).
    */
  def mediaKmeansSql: String =
    s"""WITH $featureListCtes,
       |${graft.similarity.KMeans.kmeansReplayCtes(
           "SELECT doc_id AS vec_id, CAST(k + 1 AS INT) AS d, CAST(fv AS DOUBLE) AS x FROM f")},
       |asg AS (SELECT vec_id, cid AS cluster_id, dist FROM fin WHERE rk = 1)
       |SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_items,
       |  min(vec_id) AS min_item, max(vec_id) AS max_item,
       |  round(CAST(sum(CAST(round(dist * 1e4) AS BIGINT)) AS DOUBLE) / count(*) / 1e4, 4)
       |    AS mean_dist
       |FROM asg GROUP BY cluster_id ORDER BY cluster_id""".stripMargin
}
