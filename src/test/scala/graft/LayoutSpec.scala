package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Layout

class LayoutSpec extends AnyFunSuite with SparkSpec {

  test("date partitioning turns a day filter into directory pruning") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-layout").toString
    val events = Tables.events(spark, sfDir)
    Layout.writeDatePartitioned(events, s"$tmp/by_day")

    val day = events.select(date_format(col("ts"), "yyyy-MM-dd"))
      .orderBy(col("ts")).head().getString(0)
    val pruned = Layout.readDay(spark, s"$tmp/by_day", day)

    // the predicate must be a PartitionFilter on the scan — pruning
    // directories — and must NOT appear as a row-level pushed filter
    val scan = pruned.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("FileScan")).mkString
    assert(scan.contains("PartitionFilters") && scan.contains("event_date"),
      s"day filter must prune partitions:\n$scan")

    // row-for-row equal to filtering the unpartitioned source
    val direct = events.filter(date_format(col("ts"), "yyyy-MM-dd") === day)
    assert(pruned.count() === direct.count())
    assert(pruned.count() > 0)
  }

  test("co-bucketed tables join with zero exchanges") {
    val wh = java.nio.file.Files.createTempDirectory("graft-bkt").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val events = Tables.events(spark, sfDir).select("event_id", "user_id", "value")
      val users = Tables.events(spark, sfDir)
        .groupBy("user_id").agg(count(lit(1)).as("n_events"))
      Layout.writeBucketed(events, "bkt_events", "user_id")
      Layout.writeBucketed(users, "bkt_users", "user_id")

      val joined = spark.table("bkt_events")
        .join(spark.table("bkt_users"), "user_id")
        .groupBy("user_id").agg(sum("value").as("v"), max("n_events").as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-bucketed join + agg on the bucket key must be shuffle-free:\n$plan")

      // and the data survives the layout round trip
      val direct = events.join(users, "user_id").groupBy("user_id")
        .agg(sum("value").as("v"), max("n_events").as("n"))
      assert(joined.exceptAll(direct).count() === 0)
      assert(direct.exceptAll(joined).count() === 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS bkt_events")
      spark.sql("DROP TABLE IF EXISTS bkt_users")
      val _ = wh
    }
  }

  test("layout_bucketed_agg: the driver face joins co-bucketed tables with no shuffle below the join") {
    // disable auto-broadcast to surface the at-scale shape — on 100 TB
    // neither side broadcasts, and the bucketed layout is what keeps
    // the join exchange-free
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Layout.bucketedAgg(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        s"bucketed equi-join should sort-merge over co-bucketed files:\n$plan")
      // every shuffle sits ABOVE the join (the segment agg + final
      // order) — plans print top-down, so above = earlier index
      val exchanges = """\bExchange\b""".r.findAllMatchIn(plan).map(_.start).toSeq
      val joinAt = plan.indexOf("SortMergeJoin")
      assert(exchanges.nonEmpty && exchanges.forall(_ < joinAt),
        s"no Exchange may sit below the bucketed join:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("z-ordering tightens per-file stats on BOTH dims; linear sort only on one") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-z").toString
    val orders = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice")

    Layout.writeZOrdered(orders, s"$tmp/z", "o_custkey", "o_totalprice")
    orders.repartitionByRange(8, col("o_custkey"))
      .sortWithinPartitions("o_custkey")
      .write.mode("overwrite").parquet(s"$tmp/linear")

    // average per-file span as a fraction of the global span — the
    // expected fraction of files a point predicate must open
    def spanFrac(path: String, c: String): Double = {
      val stats = Layout.skippingStats(spark, path, Seq("o_custkey", "o_totalprice"))
        .collect()
      val lo = stats.map(_.getAs[Double](s"${c}__mn")).min
      val hi = stats.map(_.getAs[Double](s"${c}__mx")).max
      stats.map(r => (r.getAs[Double](s"${c}__mx") - r.getAs[Double](s"${c}__mn"))
        / math.max(hi - lo, 1e-9)).sum / stats.length
    }

    // round trip loses nothing
    val back = spark.read.parquet(s"$tmp/z")
    assert(back.count() === orders.count())
    assert(back.exceptAll(orders).count() === 0)

    val zCust = spanFrac(s"$tmp/z", "o_custkey")
    val zPrice = spanFrac(s"$tmp/z", "o_totalprice")
    val linCust = spanFrac(s"$tmp/linear", "o_custkey")
    val linPrice = spanFrac(s"$tmp/linear", "o_totalprice")
    // linear: first dim tight, second dim useless (~full span per file)
    assert(linCust < 0.3, s"linear sort must tighten its own column: $linCust")
    assert(linPrice > 0.8, s"linear sort leaves the other column wide: $linPrice")
    // z-order: BOTH dims must skip most files
    assert(zCust < 0.6, s"z-order custkey span $zCust")
    assert(zPrice < 0.6, s"z-order totalprice span $zPrice")
    assert(zPrice < linPrice / 2,
      s"z-order must at least halve the second dim's span: $zPrice vs $linPrice")
  }

  test("stats-pruned scan skips most files on a selective two-dim predicate, losing no rows") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-zskip").toString
    val orders = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    Layout.writeZOrderedIndexed(orders, s"$tmp/z", "o_custkey", "o_totalprice")

    val b = orders.agg(min("o_custkey").cast("double"), max("o_custkey").cast("double"),
      min("o_totalprice").cast("double"), max("o_totalprice").cast("double")).head()
    // a ~1/4 × 1/4 box in the two-dim domain — selective in both dims
    val (xLo, xHi) = (b.getDouble(0), b.getDouble(0) + (b.getDouble(1) - b.getDouble(0)) / 4)
    val (yLo, yHi) = (b.getDouble(2), b.getDouble(2) + (b.getDouble(3) - b.getDouble(2)) / 4)

    val pruned = Layout.readSkipping(spark, s"$tmp/z",
      "o_custkey", xLo, xHi, "o_totalprice", yLo, yHi)
    // correctness: the pruned scan returns exactly the raw filtered rows
    val raw = spark.read.parquet(s"$tmp/z")
      .filter(col("o_custkey").cast("double").between(xLo, xHi) &&
        col("o_totalprice").cast("double").between(yLo, yHi))
    assert(pruned.exceptAll(raw).count() === 0 && raw.exceptAll(pruned).count() === 0,
      "file skipping must be a pure physical optimization")

    // skipping: the planner must open at most half the files
    val nTotal = spark.read.parquet(Layout.statsPath(s"$tmp/z")).count()
    val nRead = Layout.plannedFiles(spark, s"$tmp/z",
      "o_custkey", xLo, xHi, "o_totalprice", yLo, yHi).length
    assert(nTotal >= 8, s"layout should have written several files, got $nTotal")
    assert(nRead <= nTotal / 2,
      s"selective two-dim predicate must skip at least half the files: read $nRead of $nTotal")
  }

  test("compaction collapses a 64-file spray without a shuffle and preserves every row") {
    val tmp = java.nio.file.Files.createTempDirectory("compact").toString
    val raw = Tables.load(spark, sfDir, "events")
    raw.repartition(64).write.mode("overwrite").parquet(s"$tmp/frag")
    val (before, after) = graft.sources.Layout.compact(spark, s"$tmp/frag", s"$tmp/out")
    assert(before == 64, s"fragmented write should spray 64 files, got $before")
    assert(after <= 4, s"compaction should pack into a handful of files, got $after")
    // pure physical rewrite: row multiset unchanged
    val a = spark.read.parquet(s"$tmp/out")
    assert(a.count() === raw.count())
    assert(a.exceptAll(raw).isEmpty && raw.exceptAll(a).isEmpty,
      "compacted content must equal the source multiset")
    // the rewrite rides the scan's file packing — no exchange anywhere
    val p = spark.read.parquet(s"$tmp/frag").queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"compaction read must not shuffle:\n$p")
  }

  test("jsonl round-trip is lossless and the read stays schema'd") {
    val docs = Tables.documents(spark, sfDir)
    val parsed = graft.sources.CorpusIO.readJsonl(spark,
      graft.sources.CorpusIO.jsonlDocuments(spark, sfDir)).localCheckpoint(true)
    val (clean, bad) = graft.sources.CorpusIO.quarantine(parsed)
    assert(bad.count() === 0, "an export of clean parquet must parse clean")
    assert(clean.count() === docs.count())
    val c = clean.select("doc_id", "text", "lang", "source", "n_chars")
    val d = docs.select("doc_id", "text", "lang", "source", "n_chars")
    assert(c.exceptAll(d).isEmpty && d.exceptAll(c).isEmpty,
      "jsonl round-trip must be lossless, row for row")
    assert(clean.schema("doc_id").dataType.typeName === "long",
      "explicit schema, not inference, governs the parse")
  }

  test("jsonl quarantine captures corrupt lines without dropping clean ones") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-jsonl-bad").toString
    val good = Seq(
      """{"doc_id": 1, "text": "alpha", "lang": "en", "source": "web", "n_chars": 5}""",
      """{"doc_id": 2, "text": "beta", "lang": "de", "source": "web", "n_chars": 4}""")
    val bad = Seq(
      """{"doc_id": 3, "text": "truncated""",   // cut mid-string
      """not json at all""")
    java.nio.file.Files.write(java.nio.file.Paths.get(tmp, "part-0.jsonl"),
      scala.util.Random.shuffle(good ++ bad).mkString("\n").getBytes("UTF-8"))
    val parsed = graft.sources.CorpusIO.readJsonl(spark, tmp).localCheckpoint(true)
    val (clean, quarantine) = graft.sources.CorpusIO.quarantine(parsed)
    assert(clean.count() === 2, "both well-formed lines survive")
    assert(clean.select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    val q = quarantine.collect().map(_.getString(0)).toSet
    assert(q === bad.toSet, "every malformed raw line lands in quarantine verbatim")
  }
}
