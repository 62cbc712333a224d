package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Graph

/** The iterative graph family's broadcast→co-partitioned gate
  * (`graft.graph.maxBroadcastRows`, [[Graph.gatedBuild]]): forcing the
  * budget to 0 must flip every gated build side onto the shuffled-hash
  * face and leave every entry row-identical to the broadcast face —
  * the same dual-face certification the dedup components family
  * carries (Dedup.MaxExactBroadcastRows / large-small-star).
  */
class GraphGateSpec extends AnyFunSuite with SparkSpec {

  /** Every driver entry whose plan contains a gated build side. */
  private val gatedEntries = Seq(
    "graph_pagerank", "graph_ppr", "graph_hits", "graph_lpa",
    "graph_modularity", "graph_triangles", "graph_triangles_approx",
    "graph_jaccard", "graph_kcore", "graph_assortativity",
    "graph_degree_distribution")

  private def rows(s: org.apache.spark.sql.SparkSession, q: String): Seq[String] =
    SparkEntry.queries(q)(s, sfDir).collect().map(_.toString).sorted.toSeq

  test("gate forced to 0: every gated entry is row-identical to the broadcast face") {
    // a sibling session gets its own conf AND its own SessionCache
    // identity, so the shuffle face rebuilds every shared artifact
    // under the forced gate instead of inheriting broadcast-face frames
    val shuffled = spark.newSession()
    shuffled.conf.set("graft.graph.maxBroadcastRows", "0")
    try gatedEntries.foreach { q =>
      assert(rows(shuffled, q) == rows(spark, q), s"face divergence in $q")
    } finally SessionCache.invalidate(shuffled)
  }

  test("gate=0 pagerank iteration joins the rank vector as a shuffled hash build, not a broadcast") {
    val (edges, deg, n) = Graph.cachedGraph(spark, sfDir)
    val p = Graph.pageRankIter(edges,
        deg.select(col("node"), lit(1.0 / n).as("rank")), n, broadcastRanks = false)
      .queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"), s"expected a shuffled hash join:\n$p")
    assert(!p.contains("BroadcastHashJoin"), s"gate=0 must not broadcast:\n$p")
  }

  test("gate=0 lpa vote round joins labels as a shuffled hash build") {
    val (both, _) = Graph.cachedThresholdedBoth(spark, sfDir)
    val labels = both.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
    val p = Graph.lpaVoteRound(both, labels, broadcastLabels = false)
      .queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"), s"expected a shuffled hash join:\n$p")
    assert(!p.contains("BroadcastHashJoin"), s"gate=0 must not broadcast:\n$p")
    // exchange budget: 2 for the un-partitioned join inputs here + the
    // single src re-key; the (src,lbl) vote count and the (src) argmax
    // must BOTH ride hashpartitioning(src) exchange-free (a 4th
    // exchange means the argmax re-shuffled the vote rows)
    val exchanges = "(?<!AQE)Exchange".r.findAllIn(p).size
    assert(exchanges == 3, s"expected 3 exchanges (join x2 + src re-key), got $exchanges:\n$p")
  }

  test("default budget broadcasts; the conf overrides it per session") {
    assert(Graph.maxBroadcastRows(spark) == Graph.DefaultMaxBroadcastRows)
    val s2 = spark.newSession()
    s2.conf.set("graft.graph.maxBroadcastRows", "7")
    assert(Graph.maxBroadcastRows(s2) == 7L)
    assert(Graph.maxBroadcastRows(spark) == Graph.DefaultMaxBroadcastRows,
      "sibling conf must not leak into the base session")
  }
}
