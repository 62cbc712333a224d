package graft

import org.apache.spark.sql.SparkSession

/** Scale-ratio probe for the r10 second-sitting entries (SURVEY §6):
  * same protocol as [[R10Probe]] — each query timed on two directories
  * (default sf0.1 → data/sf1, 10× rows) in fresh sessions after a
  * sf0.001 codegen warm-up. Dev main; not driver contract.
  */
object R10bProbe {

  val Queries: Seq[String] = Seq(
    "pareto_front", "series_acf", "assoc_rules", "event_paths",
    "price_histogram", "sales_seasonality", "orders_abc", "graph_lpa",
    "rank_fusion", "scd2_asof_activity", "daily_anomalies_mad",
    "rolling_revenue_7d", "text_readability")

  def main(args: Array[String]): Unit = {
    val dirA = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dirB = args.lift(1).getOrElse("data/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def fmt(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)

    Queries.foreach(q => try SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()
      catch { case e: Throwable => System.err.println(s"[probe] warm $q: ${e.getMessage}") })

    def timedPass(dir: String): Seq[(String, Double)] = {
      val s = spark.newSession()
      def t(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      try Queries.map(q => q -> t { SparkEntry.queries(q)(s, dir).count(); () })
      finally SessionCache.invalidate(s)
    }
    val (a, b) = (timedPass(dirA), timedPass(dirB))
    println(f"""${"query"}%-28s ${dirA.split('/').last}%12s ${dirB.split('/').last}%12s ratio""")
    a.zip(b).foreach { case ((name, ta), (_, tb)) =>
      println(f"$name%-28s ${fmt(ta)}%12s ${fmt(tb)}%12s ${fmt(tb / math.max(ta, 1e-9))}x")
    }
    spark.stop()
  }
}
