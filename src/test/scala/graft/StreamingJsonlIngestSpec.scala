package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.CorpusIO
import graft.streaming.StreamingJsonlIngestJob

/** Landing-zone ingestion: clean rows reach the corpus, corrupt lines
  * reach quarantine, counters maintain additively, and a replayed
  * batch is a no-op on every sink.
  */
class StreamingJsonlIngestSpec extends AnyFunSuite with SparkSpec {

  private def goodLine(id: Long, text: String, lang: String) =
    s"""{"doc_id": $id, "text": "$text", "lang": "$lang", "source": "web", "n_chars": ${text.length}}"""

  private def parse(lines: Seq[String]): org.apache.spark.sql.DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("sji-in").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(tmp, "shard.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    CorpusIO.readJsonl(spark, tmp)
  }

  test("readers return empty contract-schema frames before any batch exists") {
    val base = java.nio.file.Files.createTempDirectory("sji-empty").toString
    val job = new StreamingJsonlIngestJob(spark,
      s"$base/corpus", s"$base/quarantine", s"$base/stats")
    val corpus = job.readCorpus()
    assert(corpus.schema === CorpusIO.DocSchema && corpus.count() === 0,
      "pre-first-batch corpus read must be empty, not an AnalysisException")
    val q = job.readQuarantine()
    assert(q.columns.toSeq === Seq("raw_line") && q.count() === 0,
      "pre-first-batch quarantine read must be empty")
  }

  test("clean/corrupt split lands on the right sinks; replay is a no-op") {
    val base = java.nio.file.Files.createTempDirectory("sji").toString
    val job = new StreamingJsonlIngestJob(spark,
      s"$base/corpus", s"$base/quarantine", s"$base/stats")

    val b0 = Seq(goodLine(1, "alpha bravo", "en"), goodLine(2, "charlie", "de"),
      """{"doc_id": 3, "text": "trunc""")
    val b1 = Seq(goodLine(4, "delta echo", "en"), "garbage line")
    job.processBatch(parse(b0), 0L)
    job.processBatch(parse(b1), 1L)

    val corpus = job.readCorpus()
    assert(corpus.count() === 3)
    assert(corpus.select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L, 2L, 4L))
    val quarantined = job.readQuarantine().collect().map(_.getString(0)).toSet
    assert(quarantined === Set("""{"doc_id": 3, "text": "trunc""", "garbage line"))
    val stats = job.readStats().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats === Map("clean" -> 3L, "corrupt" -> 2L))

    // at-least-once replay: re-running batch 1 rewrites its own
    // batch-scoped output and the batchId-keyed counters skip it
    job.processBatch(parse(b1), 1L)
    assert(job.readCorpus().count() === 3, "replayed batch must not duplicate corpus rows")
    assert(job.readStats().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      === Map("clean" -> 3L, "corrupt" -> 2L), "replayed batch must not double-count")
  }

  test("continuous file-source run ingests a landing directory end-to-end") {
    import org.apache.spark.sql.streaming.Trigger
    val base = java.nio.file.Files.createTempDirectory("sji-e2e").toString
    val landing = s"$base/landing"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(landing))
    java.nio.file.Files.write(java.nio.file.Paths.get(landing, "a.jsonl"),
      (Seq(goodLine(10, "foxtrot golf", "en"), "broken {") ++
        Seq(goodLine(11, "hotel", "fr"))).mkString("\n").getBytes("UTF-8"))
    val job = new StreamingJsonlIngestJob(spark,
      s"$base/corpus", s"$base/quarantine", s"$base/stats")
    val q = job.start(landing, s"$base/ckpt", Trigger.ProcessingTime("1 second"))
    try {
      q.processAllAvailable()
      // a second shard arrives later — the file log picks up only it
      java.nio.file.Files.write(java.nio.file.Paths.get(landing, "b.jsonl"),
        Seq(goodLine(12, "india juliet", "en")).mkString("\n").getBytes("UTF-8"))
      q.processAllAvailable()
    } finally q.stop()
    assert(job.readCorpus().select("doc_id").collect().map(_.getLong(0)).toSet
      === Set(10L, 11L, 12L))
    assert(job.readQuarantine().collect().map(_.getString(0)).toSet === Set("broken {"))
    val stats = job.readStats().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats === Map("clean" -> 3L, "corrupt" -> 1L))
  }
}
