// scratch scale probe for the r11 graph-maintain work (SURVEY §6)
package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sizes + stage timings for the graph_cc_maintain fold at one SF, to
  * attribute its cost (weight-merge materialization vs labels
  * machinery) before the dirty-bucket rewrite.
  */
object R11Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm
    queries.Graph.ccMaintain(spark, "/root/testdata/sf0.001").count()
    val all = time("artifact:graph_epochs") {
      queries.Graph.cachedEpochPairs(spark, dir)
    }
    time("artifact:graph_wpairs") { queries.Graph.cachedWeightedPairs(spark, dir) }
    time("artifact:graph_edges") { queries.Graph.cachedGraph(spark, dir) }
    time("artifact:graph_lpa_labels") { queries.Graph.cachedLpaLabels(spark, dir) }
    (0 until queries.Graph.NumEpochs).foreach { i =>
      println(s"PROBE epoch $i pairs = " +
        all.filter(col("epoch") === i).count())
    }
    println("PROBE distinct (src,dst) = " +
      all.select("src", "dst").distinct().count())
    (1 to 2).foreach { t =>
      time(s"cc_maintain trial$t") {
        queries.Graph.ccMaintain(spark, dir).count()
      }
    }
    // stage attribution: drive the state manually
    time("staged total") {
      val frames = (0 until queries.Graph.NumEpochs).map(i =>
        all.filter(col("epoch") === i).select("src", "dst", "dw"))
      val st = time("epoch0 init") {
        new queries.Graph.CcMaintainState(spark, frames.head)
      }
      frames.tail.zipWithIndex.foreach { case (d, i) =>
        time(s"epoch${i + 1} apply") { st.applyEpoch(d) }
      }
      time("universe join") {
        val labels = st.labels
        val universe = Tables.part(spark, dir).select(col("p_partkey").as("part_id"))
        val sizes = labels.groupBy("comp").agg(count(lit(1)).as("csize"))
        universe
          .join(labels.select(col("node").as("part_id"), col("comp")), Seq("part_id"), "left")
          .join(broadcast(sizes), Seq("comp"), "left")
          .select(col("part_id"),
            coalesce(col("comp"), col("part_id")).as("component_id"),
            coalesce(col("csize"), lit(1L)).as("component_size"))
          .count()
      }
    }
    spark.stop()
  }
}
