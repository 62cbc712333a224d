package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal column plumbing: opaque `binary` payloads + typed
  * metadata, batched decode/feature-extract via `mapPartitions`.
  *
  * The actual media codecs (JPEG/PNG/audio) are NOT in this container,
  * so [[StubCodec]] is a clearly-marked deterministic fake. Everything
  * around it — schema, batch shape, partitioning, the executor-side
  * iterator pipeline — is the real 100 TB design:
  *   - payloads stay binary end-to-end (no base64 inflation);
  *   - decode happens per-partition with reusable scratch buffers, the
  *     same shape a JNI/FFI decoder needs;
  *   - feature vectors come out as fixed-width float arrays, ready for
  *     the graft.similarity operators.
  */
object BinaryPipeline {

  /** STUB: deterministic fake decoder. A real deployment replaces this
    * object with the actual codec (libjpeg/ffmpeg behind JNI); the
    * Spark plumbing does not change.
    */
  object StubCodec {
    val FeatureDim = 16

    /** "Decode" a payload into (width, height, channels) — derived
      * deterministically from the bytes, standing in for a real header
      * parse. The dimensions come from the payload's md5 (first two
      * hex quads mod 512) rather than a JVM-private hash so an
      * external engine replays them verbatim — what promotes
      * mm_binary_pipeline to hash-certified while the decode stays an
      * honest stub.
      */
    def decodeMeta(payload: Array[Byte]): (Int, Int, Int) = {
      val md = java.security.MessageDigest.getInstance("MD5").digest(payload)
      val hx = md.take(4).map("%02x".format(_)).mkString
      (256 + Integer.parseInt(hx.substring(0, 4), 16) % 512,
        256 + Integer.parseInt(hx.substring(4, 8), 16) % 512, 3)
    }

    /** "Extract" a FeatureDim-dim feature vector — per-bucket byte sums
      * (positions ≡ k mod FeatureDim) normalized by 255 and the bucket
      * width, standing in for a real embedding model forward pass.
      * Deterministic AND order-free: the bucket sums are exact integers
      * and the single double division chain + float32 cast are
      * IEEE-determined, so an external engine recomputes the vector
      * bit-identically from the payload bytes — [[featureExtractSql]]
      * does exactly that, which is what promotes mm_feature_extract /
      * mm_similar_topk to hash-certified while the codec stays an
      * honest stub (a real deployment still swaps this object out).
      */
    def features(payload: Array[Byte]): Array[Float] = {
      val sums = new Array[Long](FeatureDim)
      var i = 0
      while (i < payload.length) {
        sums(i % FeatureDim) += (payload(i) & 0xFF)
        i += 1
      }
      val n = math.max(payload.length / FeatureDim, 1)
      val acc = new Array[Float](FeatureDim)
      var j = 0
      while (j < FeatureDim) { acc(j) = (sums(j) / 255.0 / n).toFloat; j += 1 }
      acc
    }
  }

  /** Manufacture the multimodal input table from `documents`: the text
    * bytes play the role of a media payload (driver testdata only — a
    * real pipeline reads payloads from parquet/lance binary columns).
    */
  def asBinaryTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("item_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        col("source").as("origin"),
        col("n_chars").cast("long").as("content_length"),
        lit("text/fake-image").as("mime")).as("meta"))

  val outSchema: StructType = StructType(Seq(
    StructField("item_id", LongType),
    StructField("payload_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("origin", StringType),
    StructField("features", ArrayType(FloatType))))

  /** Decode + feature-extract, batched per partition. Binary-safe,
    * constant memory per partition (iterator in, iterator out — no
    * partition-wide materialization).
    */
  def decodeAndFeaturize(binTable: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    // no repartition: the decode is purely row-local, and shuffling the
    // payload column (the largest in the pipeline) to rebalance would
    // cost more than it saves — the scan's own splits (plus
    // Tables.fanOut for tiny test files) set the parallelism
    binTable
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(r.fieldIndex("item_id"))
          val payload = r.getAs[Array[Byte]]("payload")
          val meta = r.getStruct(r.fieldIndex("meta"))
          val (w, h, c) = StubCodec.decodeMeta(payload)
          Row(id, payload.length, w, h, c, meta.getString(0), StubCodec.features(payload).toSeq)
        }
      }(enc)
  }

  /** End-to-end pipeline over the documents-derived binary table:
    * binary → decode-stub → features → summary columns. Returns the raw
    * feature vectors (array<float>) — the shape downstream similarity
    * operators consume. Memoized per dir (the codec is the family's
    * dominant cost and FIVE driver entries re-run it otherwise — the
    * shared-artifact discipline of the BPE/dedup/ANN caches); the
    * checkpoint also keeps the codec's single execution, which the
    * per-entry localCheckpoint calls previously re-ran per entry.
    */
  def pipelineRaw(spark: SparkSession, dir: String): DataFrame =
    graft.SessionCache.getOrElseUpdate(spark, ("mmRaw", dir))(
      decodeAndFeaturize(asBinaryTable(Tables.documents(spark, dir)))
        .orderBy("item_id").localCheckpoint(true))

  /** Driver-facing view of [[pipelineRaw]]: the feature vector is
    * reduced to its rounded L2 norm because the correctness harness
    * canonicalizes result rows by sorting every column and array cells
    * are not sortable there. Same rows, scalar-only schema —
    * hash-CERTIFIED since r14 ([[pipelineSql]] replays the md5-derived
    * stub dimensions and the byte-rebuilt feature norm), the
    * per-component certification living in mm_feature_extract.
    */
  def pipeline(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions
    pipelineRaw(spark, dir)
      .select(col("item_id"), col("payload_bytes"), col("width"), col("height"),
        col("channels"), col("origin"),
        round(VectorFunctions.l2norm(col("features")), 4).as("feat_norm"))
      .orderBy("item_id")
  }

  /** mm_binary_pipeline replayed: the md5-quad stub dimensions plus the
    * norm of the byte-rebuilt feature vector ([[featureListCtes]]) —
    * `md5(text)` hashes the identical UTF-8 bytes as the Scala digest
    * over the payload (the mm_dedup-certified equivalence), and the
    * `sqrt(list_sum(list_transform(...)))` fold is the
    * embedding_stats-certified twin of [[graft.functions.VectorFunctions.l2norm]].
    */
  def pipelineSql: String =
    s"""WITH $featureListCtes,
       |m AS (SELECT doc_id, source AS origin, md5(text) AS mh FROM documents)
       |SELECT b.doc_id AS item_id, CAST(b.len AS INTEGER) AS payload_bytes,
       |  CAST(256 + ('0x' || substr(m.mh, 1, 4))::BIGINT % 512 AS INTEGER) AS width,
       |  CAST(256 + ('0x' || substr(m.mh, 5, 4))::BIGINT % 512 AS INTEGER) AS height,
       |  CAST(3 AS INTEGER) AS channels, m.origin,
       |  round(sqrt(list_sum(list_transform(fl.v, x -> x * x))), 4) AS feat_norm
       |FROM b JOIN m USING (doc_id) JOIN fl USING (doc_id)
       |ORDER BY item_id""".stripMargin

  /** STUB resize: a real deployment swaps in libvips/PIL behind the same
    * signature. The stand-in deterministically downsamples the payload
    * bytes to a fixed target "resolution" (byte budget), preserving the
    * binary-in/binary-out shape a resize stage has — payloads never
    * inflate to strings, output size is bounded by construction.
    */
  val ResizeTargetBytes = 64
  val resizeSchema: StructType = StructType(Seq(
    StructField("item_id", LongType),
    StructField("orig_bytes", IntegerType),
    StructField("resized", BinaryType),
    StructField("resized_bytes", IntegerType)))

  def resize(binTable: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(resizeSchema)
    binTable.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(r.fieldIndex("item_id"))
        val payload = r.getAs[Array[Byte]]("payload")
        val out = new Array[Byte](math.min(ResizeTargetBytes, payload.length))
        // ceil division: samples must span the WHOLE payload (floor
        // would copy only the first out.length bytes of payloads up to
        // 2x the target, ignoring the tail entirely)
        val stride = math.max(
          (payload.length + math.max(out.length, 1) - 1) / math.max(out.length, 1), 1)
        var i = 0
        while (i < out.length) { out(i) = payload(math.min(i * stride, payload.length - 1)); i += 1 }
        Row(id, payload.length, out, out.length)
      }
    }(enc)
  }

  /** Driver-facing [[resize]]: the resized payload surfaces as its hex
    * string (binary stays the library API; the harness hashes strings)
    * — hash-CERTIFIED since r14: [[resizeSql]] rebuilds every sampled
    * byte position from the payload blob, so a wrong stride, a floor
    * instead of ceil, or an off-by-one at the tail hash-mismatches.
    */
  def resize(spark: SparkSession, dir: String): DataFrame =
    resize(asBinaryTable(Tables.documents(spark, dir)))
      .select(col("item_id"), col("orig_bytes"), col("resized_bytes"),
        hex(col("resized")).as("resized_hex"))
      .orderBy("item_id")

  /** mm_resize replayed: ceil-stride byte sampling over the hex-expanded
    * payload — out_len = min(target, len), stride = ceil(len/out_len),
    * byte i taken at min(i·stride, len−1), re-joined in position order.
    */
  def resizeSql: String =
    s"""WITH b AS MATERIALIZED (
       |  SELECT doc_id, hex(encode(text)) AS hx,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS len
       |  FROM documents),
       |p AS (
       |  SELECT doc_id, hx, len, least($ResizeTargetBytes, len) AS out_len,
       |    greatest((len + greatest(least($ResizeTargetBytes, len), 1) - 1)
       |      // greatest(least($ResizeTargetBytes, len), 1), 1) AS stride
       |  FROM b),
       |s AS (
       |  SELECT doc_id, i,
       |    substr(hx, CAST(2 * least(i * stride, len - 1) + 1 AS INTEGER), 2) AS hb
       |  FROM (SELECT doc_id, hx, len, stride,
       |          unnest(range(0, CAST(out_len AS INTEGER))) AS i FROM p))
       |SELECT p.doc_id AS item_id, CAST(p.len AS INTEGER) AS orig_bytes,
       |  CAST(p.out_len AS INTEGER) AS resized_bytes,
       |  coalesce(string_agg(s.hb, '' ORDER BY s.i), '') AS resized_hex
       |FROM p LEFT JOIN s ON s.doc_id = p.doc_id
       |GROUP BY p.doc_id, p.len, p.out_len
       |ORDER BY item_id""".stripMargin

  /** STUB frame sampling: treats the payload as a "video" of fixed-size
    * frames and keeps every `everyK`-th frame — one output row per kept
    * frame (item_id, frame_idx, frame payload, per-frame features). The
    * explode-to-frame-rows shape is the real pipeline design: frame
    * rows partition freely for downstream embedding/dedup regardless of
    * source-file boundaries.
    */
  val FrameBytes = 256
  val frameSchema: StructType = StructType(Seq(
    StructField("item_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("frame", BinaryType),
    StructField("frame_features", ArrayType(FloatType))))

  def frameSample(binTable: DataFrame, everyK: Int = 4): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(frameSchema)
    binTable.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(r.fieldIndex("item_id"))
        val payload = r.getAs[Array[Byte]]("payload")
        val nFrames = math.max(payload.length / FrameBytes, 1)
        (0 until nFrames by everyK).iterator.map { f =>
          val from = math.min(f * FrameBytes, payload.length)
          val until = math.min(from + FrameBytes, payload.length)
          val frame = java.util.Arrays.copyOfRange(payload, from, until)
          Row(id, f, frame, StubCodec.features(frame).toSeq)
        }
      }
    }(enc)
  }

  /** Driver-facing frame sampling: per-frame feature vectors reduced to
    * the rounded norm for the same harness reason as [[pipeline]]; the
    * frame payload surfaces as its hex string. hash-CERTIFIED since
    * r14: [[frameSampleSql]] rebuilds every kept frame's byte range AND
    * its stub feature norm from the payload blob, so a wrong frame
    * boundary, a skipped tail, or a per-frame bucket-sum error
    * hash-mismatches.
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
    * f covers [f·w, min(f·w+w, len))), plus the per-frame stub feature
    * norm rebuilt with the [[featureCtes]] arithmetic over each frame's
    * own bytes.
    */
  def frameSampleSql: String = {
    val w = FrameBytes
    val dim = StubCodec.FeatureDim
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
    * directly (no decode needed to kill exact copies).
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
    * for: stub-extracted features fed straight into the similarity
    * tier's exact top-k (broadcast queries, one corpus scan). A real
    * deployment swaps the codec, not this plumbing; at scale the same
    * frame feeds the LSH/IVF candidate generators instead.
    * Hash-certified since r13 (byte-replayable stub features).
    */
  def similarTopK(spark: SparkSession, dir: String): DataFrame = {
    val feats = pipelineRaw(spark, dir)
      .select(col("item_id").as("vec_id"), col("features").as("embedding"))
    graft.similarity.Ann.bruteForceTopK(feats)
  }

  /** IVF-index variant of [[similarTopK]] — the binary→vector→index
    * composition end-to-end at the SCALE tier: stub features train the
    * coarse quantizer, the corpus is cell-assigned map-side, queries
    * probe the persisted-index path (`ivfTopKFromIndex`). Brute force
    * scores every (query, item) pair; this touches nProbe cells per
    * query — the same swap a real deployment makes once the corpus
    * outgrows one scan per query batch. r13: PROMOTED rows-only →
    * hash-certified ([[similarTopKIvfSql]] — ann_ivf_topk's certified
    * quantizer CTEs over byte-replayed features); recall vs brute
    * force stays spec-asserted.
    */
  def similarTopKIvf(spark: SparkSession, dir: String): DataFrame = {
    // pipelineRaw is already checkpoint-memoized, so quantizer
    // training, cell assignment and the query slice all read one
    // materialized codec run
    val feats = pipelineRaw(spark, dir)
      .select(col("item_id").as("vec_id"), col("features").as("embedding"))
    val (centroids, assigned) = graft.similarity.Ann.ivfIndex(feats)
    graft.similarity.Ann.ivfTopKFromIndex(centroids, assigned,
      feats.filter(col("vec_id") < 10))
  }

  /** IVF-PQ variant of [[similarTopKIvf]] — the multimodal tier at its
    * DEPLOYABLE form: binary → stub features → coarse cells + PQ codes,
    * ADC scoring only inside probed cells (`Ann.ivfpqTopK`). The
    * feature vectors are 16-dim, so 8 subspaces of 2 dims each keep
    * the codebooks honest (16 codes per 2-dim subspace ≈ lossless at
    * this dim). r13: PROMOTED rows-only → hash-certified
    * ([[similarTopKIvfPqSql]] — the certified quantizer + PQ/ADC CTEs
    * over byte-replayed features); recall vs the exact tier stays
    * spec-asserted next to the flat-IVF variant's.
    */
  def similarTopKIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val feats = pipelineRaw(spark, dir)
      .select(col("item_id").as("vec_id"), col("features").as("embedding"))
    graft.similarity.Ann.ivfpqTopK(feats, nSub = 8)
  }

  /** Media clustering: Lloyd's k-means ([[graft.similarity.KMeans]] —
    * the same trainer the embedding entry certifies against DuckDB)
    * over the stub feature vectors, rolled up per cluster — the
    * "group my corpus into visual/audio buckets" pass a multimodal
    * curation pipeline runs for stratified sampling and mix control.
    * r13: PROMOTED rows-only → hash-certified — the features are
    * byte-replayable since the stub rework, so [[mediaKmeansSql]]
    * composes the shared Lloyd replay over them; the per-cluster mean
    * distance folds over 4-dp-quantized INTEGER sufficient stats (the
    * embedding_outliers discipline) so no cross-row double summation
    * order can hash-diverge.
    */
  def mediaKmeans(spark: SparkSession, dir: String): DataFrame = {
    import graft.similarity.KMeans
    val feats = KMeans.widen(pipelineRaw(spark, dir)
      .select(col("item_id").as("vec_id"), col("features").as("embedding")))
      .localCheckpoint(true)
    KMeans.assign(feats, KMeans.train(feats))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_items"),
        min(col("vec_id")).as("min_item"), max(col("vec_id")).as("max_item"),
        round(sum(round(col("dist") * 1e4).cast("long")).cast("double")
          / count(lit(1)) / 1e4, 4).as("mean_dist"))
      .orderBy("cluster_id")
  }

  /** Driver-facing [[featureVectors]]: the full stub feature vector
    * unpacked into FeatureDim scalar columns (f0..f15, float widened to
    * double — exact), hash-CERTIFIED: [[featureExtractSql]] recomputes
    * every component from the payload bytes, so a wrong bucket sum,
    * normalization, or batch boundary anywhere in the mapPartitions
    * decode pipeline hash-mismatches.
    */
  def featureExtract(spark: SparkSession, dir: String): DataFrame = {
    val fs = (0 until StubCodec.FeatureDim).map(k =>
      col("features").getItem(k).cast("double").as(s"f$k"))
    pipelineRaw(spark, dir)
      .select(col("item_id") +: col("payload_bytes") +: fs: _*)
      .orderBy("item_id")
  }

  /** Shared oracle CTEs rebuilding the stub feature from the payload
    * blob: hex-expand the UTF-8 bytes, bucket positions mod FeatureDim,
    * exact integer sums, then the codec's own double-division chain +
    * REAL cast — bit-identical to [[StubCodec.features]] because every
    * step is order-free integer arithmetic until one IEEE-determined
    * division/cast. Yields `f(doc_id, len, k, fv)` over `documents`.
    */
  private def featureCtes: String = {
    val dim = StubCodec.FeatureDim
    s"""b AS MATERIALIZED (
       |  SELECT doc_id, hex(encode(text)) AS hx,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS len
       |  FROM documents),
       |v AS (
       |  SELECT doc_id, CAST((i - 1) % $dim AS INTEGER) AS k,
       |    ('0x' || substr(hx, CAST(2 * i - 1 AS INTEGER), 2))::BIGINT AS byte
       |  FROM (SELECT doc_id, hx, unnest(range(1, CAST(len + 1 AS INTEGER))) AS i FROM b)),
       |s0 AS (SELECT doc_id, k, sum(byte) AS bs FROM v GROUP BY 1, 2),
       |ks AS (SELECT unnest(range(0, $dim)) AS k),
       |f AS (
       |  SELECT b.doc_id, b.len, ks.k,
       |    CAST(CAST(coalesce(s0.bs, 0) AS DOUBLE) / 255.0
       |      / greatest(b.len // $dim, 1) AS REAL) AS fv
       |  FROM b CROSS JOIN ks
       |  LEFT JOIN s0 ON s0.doc_id = b.doc_id AND s0.k = ks.k)""".stripMargin
  }

  /** mm_feature_extract replayed byte-for-byte in the oracle. */
  def featureExtractSql: String = {
    val pivot = (0 until StubCodec.FeatureDim).map(k =>
      s"CAST(max(CASE WHEN k = $k THEN fv END) AS DOUBLE) AS f$k").mkString(",\n  ")
    s"""WITH $featureCtes
       |SELECT doc_id AS item_id, CAST(any_value(len) AS INTEGER) AS payload_bytes,
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

  /** mm_similar_topk replayed: the stub features rebuilt from the
    * payload bytes ([[featureCtes]]) feed the ann_bruteforce_topk
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
    * (ann_ivf_topk's CTEs) composed over the byte-replayed stub
    * features — binary → vector → trained index, all hash-certified.
    */
  def similarTopKIvfSql: String =
    graft.similarity.Ann.ivfTopKSqlWith(featureListCtes, FeatureECte)

  /** mm_similar_ivfpq replayed: the certified IVF-PQ replay
    * (quantizer + PQ codebooks + ADC LUTs) over the stub features,
    * at the mm tier's 16-dim / 8-subspace geometry.
    */
  def similarTopKIvfPqSql: String =
    graft.similarity.Ann.ivfpqTopKSqlWith(featureListCtes, FeatureECte,
      dim = StubCodec.FeatureDim, nSub = 8)

  /** mm_kmeans replayed: the shared Lloyd replay
    * ([[graft.similarity.KMeans.kmeansReplayCtes]]) over the exploded
    * stub features, rolled up per cluster with the integer-quantized
    * mean (the embedding_outliers sufficient-stat discipline — a plain
    * avg over doubles would hash on summation order).
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
