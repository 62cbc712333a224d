package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver-generated TPC-H-ish testdata.
  *
  * All graft operators take the table directory explicitly so the same
  * code runs at any scale factor (and, on a real cluster, against any
  * object-store prefix).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.ts has shipped as both parquet TIMESTAMP(NANOS) (older
    * generator runs) and plain timestamp[us] (current runs), so adapt to
    * whatever is on disk instead of hard-coding one layout.  With
    * `nanosAsLong=true` set up front, a NANOS file surfaces as LongType
    * (convert: nanos → µs timestamp; testdata has no sub-µs components)
    * while a µs file is unaffected and surfaces as TIMESTAMP_NTZ (cast to
    * session-zone TimestampType — sessions run UTC, so values are
    * unchanged and all downstream time functions see one type).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _                => df
    }
  }
  /** Spread a small scan across all cores. The text/vector tables feed
    * CPU-bound per-row work (shingling, minhash, simhash, vector math);
    * a single small parquet file gives the scan one split and pins that
    * work to one task. No-op when the scan already has enough splits —
    * the real-cluster / 100 TB case, where adding a repartition here
    * would be a pure pessimization.
    */
  private def fanOut(s: SparkSession, d: String, name: String): DataFrame = {
    val df = load(s, d, name)
    // estimate the scan's split count from file bytes (no RDD
    // materialization — df.rdd here would cost a plan + job per read)
    val p = new org.apache.hadoop.fs.Path(s"$d/$name.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    val maxSplit = s.sessionState.conf.filesMaxPartitionBytes
    val splits = math.max(1L, (bytes + maxSplit - 1) / maxSplit)
    val target = s.sparkContext.defaultParallelism
    if (splits < target) df.repartition(target) else df
  }
  def documents(s: SparkSession, d: String): DataFrame  = fanOut(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = fanOut(s, d, "embeddings")
}
