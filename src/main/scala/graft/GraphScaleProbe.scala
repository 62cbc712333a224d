// scratch scale probe for the r10 graph/PCA families (SURVEY §6)
package graft
import org.apache.spark.sql.SparkSession

/** Times the graph + PCA driver entries at two SFs in one JVM:
  * per SF, a fresh-ish pass builds the shared substrates first (timed
  * as their own lines, mirroring Bench's artifact attribution), then
  * each entry is timed twice and the min reported (marginal cost).
  */
object GraphScaleProbe {
  private val entries = Seq(
    "graph_pagerank", "graph_triangles", "graph_cc", "graph_jaccard",
    "graph_degree_maintain", "graph_cc_maintain",
    "embedding_dim_stats", "embedding_pca", "ann_pca_topk",
    "cdc_snapshot_export")

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/root/repo/data/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // codegen/JIT warm-up on the smallest SF
    entries.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case e: Throwable => println(s"WARMFAIL $n: ${e.getMessage}") }
    }
    dirs.foreach { dir =>
      def time(label: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime(); f
        println(f"PROBE $dir $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      time("artifact:graph_epochs") { queries.Graph.cachedEpochPairs(spark, dir) }
      time("artifact:graph_wpairs") { queries.Graph.cachedWeightedPairs(spark, dir) }
      time("artifact:graph_edges") { queries.Graph.cachedGraph(spark, dir) }
      time("artifact:pca_moments") { similarity.Pca.cachedMoments(spark, dir) }
      entries.foreach { n =>
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"PROBE $dir $n ${ts.min}%.2f s")
      }
    }
    // SHUFFLE-FACE pass: the iterative entries with the broadcast
    // budget forced to 0 (graft.graph.maxBroadcastRows) — every gated
    // build side runs as a co-partitioned shuffled hash join, the plan
    // a 100 TB graph forces. Fresh sibling session per dir so the
    // shared artifacts rebuild under the forced gate.
    val gated = Seq("graph_pagerank", "graph_ppr", "graph_hits", "graph_lpa",
      "graph_triangles", "graph_jaccard", "graph_kcore")
    dirs.foreach { dir =>
      val s = spark.newSession()
      s.conf.set("graft.graph.maxBroadcastRows", "0")
      try gated.foreach { n =>
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(s, dir).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"PROBE-SHUFFLE $dir $n ${ts.min}%.2f s")
      } finally SessionCache.invalidate(s)
    }
    spark.stop()
  }
}
