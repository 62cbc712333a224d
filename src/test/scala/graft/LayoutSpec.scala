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
}
