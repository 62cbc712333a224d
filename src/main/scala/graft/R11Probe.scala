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
    spark.stop()
  }
}
