package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Ranks

/** The range-decomposed global-window primitives must be BIT-IDENTICAL
  * to the naive single-partition windows they replace (the converted
  * faces kept their oracle hashes on the strength of these equalities),
  * and the converted faces' plans must actually be free of
  * single-partition Window nodes.
  */
class RanksSpec extends AnyFunSuite with SparkSpec {

  private def seeded(n: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // x is deliberately tie-heavy; id is the unique tiebreak
    (1 to n).map(i => (i.toLong, rnd.nextInt(20), rnd.nextInt(1000)))
      .toDF("id", "x", "y")
  }

  test("globalRank equals the naive global row_number (ties, desc mixes, nRanges)") {
    val df = seeded(500)
    val orders = Seq(
      Seq(col("x"), col("id")),
      Seq(col("x").desc, col("id")),
      Seq(col("y").desc, col("x"), col("id")))
    for (order <- orders; nR <- Seq(1, 5)) {
      val naive = df.withColumn("rn",
        row_number().over(Window.orderBy(order: _*)).cast("long"))
        .collect().toSet
      val got = Ranks.globalRank(df, order, nRanges = nR).collect().toSet
      assert(got === naive, s"order=$order nRanges=$nR")
    }
  }

  test("globalNtile equals ntile across remainder, tie and n<k cases") {
    for (n <- Seq(1, 3, 4, 5, 17, 100); k <- Seq(1, 4, 7)) {
      val df = seeded(n)
      val order = Seq(col("x"), col("id"))
      val naive = df.withColumn("bucket",
        ntile(k).over(Window.orderBy(order: _*)))
        .collect().toSet
      val got = Ranks.globalNtile(df, k, order, nRanges = 3).collect().toSet
      assert(got === naive, s"n=$n k=$k")
    }
  }

  test("globalCumsum equals the running-total window and returns the grand total") {
    val df = seeded(300)
    val order = Seq(col("x").desc, col("id"))
    val w = Window.orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = df.withColumn("cum", sum(col("y").cast("long")).over(w))
      .collect().toSet
    for (nR <- Seq(1, 6)) {
      val (got, total) = Ranks.globalCumsum(df, col("y"), order, nRanges = nR)
      assert(got.collect().toSet === naive, s"nRanges=$nR")
      assert(total === df.agg(sum(col("y").cast("long"))).head.getLong(0))
    }
  }

  private def assertNoGlobalWindow(name: String, df: DataFrame): Unit = {
    val bad = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty,
      s"$name: single-partition Window survives in the optimized plan")
  }

  test("converted faces carry no single-partition Window node") {
    import graft.queries.Analytics
    assertNoGlobalWindow("user_activity_gini",
      Analytics.userActivityGini(spark, sfDir))
    assertNoGlobalWindow("orders_rfm", Analytics.ordersRfm(spark, sfDir))
    assertNoGlobalWindow("orders_abc", Analytics.ordersAbc(spark, sfDir))
    assertNoGlobalWindow("join_key_skew", Analytics.joinKeySkew(spark, sfDir))
    assertNoGlobalWindow("curriculum_buckets",
      graft.functions.TextFunctions.curriculumBuckets(spark, sfDir))
    assertNoGlobalWindow("dedup_sorted_neighborhood",
      graft.dedup.Dedup.sortedNeighborhood(Tables.documents(spark, sfDir)))
  }
}
