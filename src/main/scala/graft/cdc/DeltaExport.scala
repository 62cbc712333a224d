package graft.cdc

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Delta-LAYOUT snapshot export — ecosystem interop for the CDC state.
  *
  * The reference publishes its upserted state as a real Delta table
  * (/root/reference/src/main/scala/com/sg/job/streaming/StreamingJobExecutor.scala:19),
  * which any Delta/Trino/DuckDB-delta reader can consume. This repo's
  * live state uses its own manifest protocol (crash-safe epoch commits
  * — see [[ParquetUpsertSink]]), and no Delta jars ship in this
  * environment, so interop is provided at the EXPORT boundary instead:
  * write the snapshot as parquet plus a `_delta_log` in Delta's public
  * transaction-log format (PROTOCOL.md of the delta-io spec: ndjson
  * actions — protocol, metaData with the Spark-JSON schemaString, one
  * add per data file). A single-version log (00…0.json) fully
  * describes a snapshot table; external Delta readers list the add
  * actions and read exactly those files.
  *
  * Crash safety mirrors the data-then-log discipline: data files land
  * first, the log commit is the last write — a reader never sees a
  * log referencing missing files. Each export REPLACES the table
  * (snapshot semantics, like [[ParquetUpsertSink.exportSnapshot]]) —
  * this is a publish face, not a second source of truth.
  */
object DeltaExport {

  private def esc(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Write `df` at `path` as a Delta-readable snapshot table. Returns
    * the number of data files committed to the log.
    */
  def write(df: DataFrame, path: String): Int = {
    val spark = df.sparkSession
    // 1. data files first (overwrite clears any prior export, including
    //    its _delta_log — a fresh snapshot, not an appended version)
    df.write.mode("overwrite").parquet(path)
    val hconf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(path)
    val fs = dir.getFileSystem(hconf)
    val files = fs.listStatus(dir)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
    // 2. the single-version log, last: protocol + metaData + adds.
    //    Table id is content-derived (md5 of schema + file names) so a
    //    re-export of identical state is byte-stable — the repo's
    //    deterministic-artifact discipline.
    val schemaJson = df.schema.json
    val idSeed = java.security.MessageDigest.getInstance("MD5")
      .digest((schemaJson + files.map(_.getPath.getName).mkString(","))
        .getBytes(StandardCharsets.UTF_8))
    val id = idSeed.map("%02x".format(_)).mkString
      .patch(8, "-", 0).patch(13, "-", 0).patch(18, "-", 0).patch(23, "-", 0)
    val created = files.map(_.getModificationTime).foldLeft(0L)(math.max)
    val actions = Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      s"""{"metaData":{"id":"$id","format":{"provider":"parquet","options":{}},""" +
        s""""schemaString":"${esc(schemaJson)}","partitionColumns":[],""" +
        s""""configuration":{},"createdTime":$created}}""") ++
      files.map { st =>
        // Delta requires add.path to be a percent-encoded RELATIVE URI;
        // Spark part-file names pass through unchanged, but a name with
        // a reserved character would otherwise produce an unreadable log
        s"""{"add":{"path":"${esc(new java.net.URI(null, null, st.getPath.getName, null).toASCIIString)}","partitionValues":{},""" +
          s""""size":${st.getLen},"modificationTime":${st.getModificationTime},""" +
          s""""dataChange":true}}"""
      }
    val logDir = new Path(dir, "_delta_log")
    fs.mkdirs(logDir)
    val logFile = new Path(logDir, "%020d.json".format(0L))
    val out = fs.create(logFile, true)
    try out.write((actions.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    files.length
  }
}
