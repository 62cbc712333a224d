package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL corpus ingestion — the wire format raw LLM training corpora
  * actually arrive in (jsonl / jsonl.gz dumps, one document object per
  * line). The engine's canonical storage is parquet (columnar, pruned,
  * statistics), but the INGEST edge must read the line format safely at
  * 100 TB, which means two non-negotiables this module encodes:
  *
  *   1. **Explicit schema, never inference.** `spark.read.json` without
  *      a schema runs a FULL extra pass over the data just to infer
  *      types — at 100 TB that doubles the ingest cost and can still
  *      mis-type sparse fields. [[readJsonl]] takes the schema.
  *   2. **Corrupt lines are data, not exceptions.** Web-scale dumps
  *      always carry truncated/garbled lines; FAILFAST kills a week-long
  *      ingest on line 10^12 and DROPMALFORMED silently loses data.
  *      PERMISSIVE + a corrupt-record column keeps every line and lets
  *      [[quarantine]] split clean rows from a quarantine frame that an
  *      operator can audit and re-parse.
  *
  * Gzip is used for the round-trip face (splittable-codec caveat
  * documented: gzip files are NOT splittable — one task per file — so a
  * production layout shards the corpus into many files; the write path
  * here repartitions for exactly that reason).
  *
  * Ref behavior generalized: the reference ingests only Kafka JSON
  * strings (StreamingJobExecutor.scala); file-dump ingestion is the
  * batch half of the same envelope-decode edge.
  */
object CorpusIO {

  /** The documents-table schema, explicit (rule 1). */
  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val CorruptCol = "_corrupt_record"

  /** Write a corpus as sharded JSONL (default gzip). The repartition
    * bounds file count AND guarantees many files — gzip is not
    * splittable, so file count IS the read parallelism.
    */
  def writeJsonl(df: DataFrame, path: String, codec: String = "gzip",
                 shards: Int = 8): Unit =
    df.repartition(shards).write.mode("overwrite")
      .option("compression", codec).json(path)

  /** Read a JSONL corpus with an explicit schema and PERMISSIVE
    * corrupt-record capture: malformed lines land with every data
    * column null and the raw line in `_corrupt_record`.
    */
  def readJsonl(spark: SparkSession, path: String,
                schema: StructType = DocSchema): DataFrame =
    spark.read
      .schema(schema.add(StructField(CorruptCol, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Split a [[readJsonl]] frame into (clean, quarantine): clean rows
    * drop the corrupt column; quarantine carries the raw offending
    * lines for audit/re-parse. Spark requires the corrupt column to be
    * REFERENCED via a materialization boundary before filtering on it
    * (SPARK-21610: a filter on only the corrupt column against a lazy
    * parse is disallowed), so callers that filter immediately should
    * cache/checkpoint first — the face below does.
    */
  def quarantine(parsed: DataFrame): (DataFrame, DataFrame) = (
    parsed.filter(col(CorruptCol).isNull).drop(CorruptCol),
    parsed.filter(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw_line")))

  /** The documents corpus exported as sharded jsonl.gz ONCE per
    * (session, dir) — the Layout scratch discipline; returns the path.
    */
  def jsonlDocuments(spark: SparkSession, dir: String): String =
    graft.SessionCache.getOrElseUpdate(spark, ("jsonlDocs", dir)) {
      val tag = graft.SessionCache.scratchTag(spark, dir)
      val path = s"${System.getProperty("java.io.tmpdir")}/graft-jsonl-$tag"
      writeJsonl(graft.Tables.documents(spark, dir), path)
      path
    }

  /** Driver face: per-lang corpus rollup read THROUGH the jsonl.gz
    * round-trip (write → schema'd permissive read → quarantine split →
    * aggregate). The oracle runs the identical rollup over the RAW
    * parquet, so the round-trip must be lossless: any line dropped,
    * duplicated, or mis-typed by the export/parse cycle hash-mismatches.
    */
  def jsonlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val parsed = readJsonl(spark, jsonlDocuments(spark, dir))
      .localCheckpoint(true) // materialize before filtering on _corrupt_record
    val (clean, _) = quarantine(parsed)
    clean.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"),
        sum(length(col("text")).cast("long")).as("n_text_chars"))
      .orderBy("lang")
  }

  val jsonlRoundtripSql: String =
    """SELECT lang,
      |  count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
      |  CAST(sum(length(text)) AS BIGINT) AS n_text_chars
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
}
