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
      * parse.
      */
    def decodeMeta(payload: Array[Byte]): (Int, Int, Int) = {
      val h = java.util.Arrays.hashCode(payload)
      (256 + math.abs(h % 512), 256 + math.abs((h >> 9) % 512), 3)
    }

    /** "Extract" a FeatureDim-dim feature vector — a rolling statistic
      * over the bytes, standing in for a real embedding model forward
      * pass. Deterministic in the payload.
      */
    def features(payload: Array[Byte]): Array[Float] = {
      val acc = new Array[Float](FeatureDim)
      var i = 0
      while (i < payload.length) {
        acc(i % FeatureDim) += (payload(i) & 0xFF) / 255.0f
        i += 1
      }
      val n = math.max(payload.length / FeatureDim, 1)
      var j = 0
      while (j < FeatureDim) { acc(j) /= n.toFloat; j += 1 }
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
    val spark = binTable.sparkSession
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    binTable
      .repartition(binTable.sparkSession.sessionState.conf.numShufflePartitions, col("item_id"))
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
    * binary → decode-stub → features → summary columns.
    */
  def pipeline(spark: SparkSession, dir: String): DataFrame = {
    decodeAndFeaturize(asBinaryTable(Tables.documents(spark, dir)))
      .orderBy("item_id")
  }

  /** Feature extraction surfaced for similarity search: item_id +
    * feature vector + feature norm (plumbing check).
    */
  def featureExtract(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions
    pipeline(spark, dir)
      .select(col("item_id"), col("features"),
        round(VectorFunctions.l2norm(col("features")), 4).as("feat_norm"))
      .orderBy("item_id")
  }
}
