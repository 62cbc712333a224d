package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Graph analytics over the co-purchase graph (parts are nodes; an
  * undirected edge connects two parts that appear together in at least
  * one order) — the relational-to-graph bridge a catalog/recommendation
  * pipeline runs on the same fact table the TPC-H queries scan.
  *
  * Both operators consume ONE shared, memoized edge table
  * ([[cachedGraph]], the `graph_edges` bench artifact): the edge build
  * pays the basket aggregation + pair-distinct shuffles once, and
  * PageRank / triangle counting are marginal costs over the
  * checkpointed adjacency — the same shared-artifact discipline the
  * dedup pair family uses (SURVEY §4).
  *
  * Scale design:
  *   - Edges expand MAP-SIDE from per-order sorted baskets
  *     ([[graft.dedup.Dedup.postingPairs]]) — never a lineitem
  *     self-join; the expansion is bounded by lines-per-order² inside
  *     the map task, and the only edge-volume shuffles are the basket
  *     groupBy and the pair distinct.
  *   - PageRank's per-iteration rank table is |V| rows — broadcast to
  *     the adjacency for a map-side contribution join, then ONE
  *     dst-keyed aggregation with map-side partials (each task reduces
  *     to ≤|V| rows before the exchange). Lineage is truncated with an
  *     eager localCheckpoint per iteration, the standard guard against
  *     the exponential-plan-growth failure mode of iterative DataFrame
  *     jobs. For a graph whose |V| outgrows broadcast (billions of
  *     nodes), pre-partition adjacency and ranks on src once and the
  *     same loop runs shuffle-joined and exchange-reusing.
  *   - Triangles use degree-ordered orientation (each edge directed
  *     from its lower-(degree, id) endpoint), which provably bounds
  *     out-degrees near O(√|E|) and minimizes the wedge mass Σ outdeg²;
  *     wedges expand map-side from sorted out-neighbor arrays and are
  *     NEVER shuffled — the closing-edge check is a broadcast-hash semi
  *     join against the packed oriented edge set (|E| longs), and the
  *     only post-expansion shuffle carries 3 rows per found triangle
  *     into a map-side-partial node count. At 100 TB the edge set
  *     outgrows broadcast; the same wedge stream then shuffle-joins on
  *     the packed (b,c) key — the design keeps the 83M-row wedge
  *     expansion (sf0.1 figure) out of every exchange either way.
  */
object Graph {

  /** Node ids must fit 32 bits so an oriented edge packs into one long
    * for the triangle semi join ((b << 32) | c) and the orientation key
    * packs as (deg << 32) | node. Part keys are ~2·10⁵ per SF-0.1 and
    * scale linearly with SF — a 100 TB catalog is still far under 2³¹.
    */
  private val NodeBits = 32
  private val NodeMask = (1L << NodeBits) - 1

  /** (directed edge table `src, dst, sdeg`, degree table `node, deg`,
    * |V|) — memoized per (session, dir) and checkpointed: every
    * consumer reads the same materialized adjacency, and the builders
    * below are marginal costs over it. Both directions of each
    * undirected edge are materialized (PageRank pushes mass along both;
    * orientation for triangles filters half back out).
    */
  def cachedGraph(spark: SparkSession, dir: String): (DataFrame, DataFrame, Long) =
    graft.SessionCache.getOrElseUpdate(spark, ("graph", dir)) {
      val u = Tables.lineitem(spark, dir)
        .groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
        .filter(size(col("parts")) >= 2)
        .select(explode(graft.dedup.Dedup.postingPairs(col("parts"))).as("pr"))
        .select(col("pr.id_a").as("src"), col("pr.id_b").as("dst"))
        .distinct()
      val both = u.union(u.select(col("dst").as("src"), col("src").as("dst")))
      val deg = both.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg"))
        .localCheckpoint(true)
      // deg is |V| rows — broadcast onto the edge list, never a shuffle
      val edges = both
        .join(broadcast(deg), col("src") === col("node"))
        .select(col("src"), col("dst"), col("deg").as("sdeg"))
        .localCheckpoint(true)
      (edges, deg, deg.count())
    }

  /** PageRank over the co-purchase graph: `iters` synchronous power
    * iterations at damping 0.85 from a uniform start. Every node has
    * degree ≥ 1 by construction (it appears in some pair), so there is
    * no dangling mass and each iteration is exactly
    * r'(v) = (1-d)/N + d·Σ_{u→v} r(u)/deg(u).
    *
    * Output is the top `k` parts by `rank_ratio` = rank·N (1.0 = the
    * uniform-rank baseline — scale-free, so the 6-dp rounding keeps the
    * same precision at every corpus size). The (rank_ratio DESC,
    * part_id) order is total, making the LIMIT slice deterministic on
    * both engines; the oracle unrolls the same iterations as chained
    * CTEs.
    */
  def pageRank(spark: SparkSession, dir: String, iters: Int = 8, k: Int = 50): DataFrame =
    pageRankRanks(spark, dir, iters)
      .select(col("node").as("part_id"),
        round(col("rank") * col("n_nodes"), 6).as("rank_ratio"))
      .orderBy(col("rank_ratio").desc, col("part_id"))
      .limit(k)

  /** Full unrounded rank vector (node, rank, n_nodes) — the spec face
    * (mass conservation, the (1-d)/N floor) and the substrate of the
    * presentation slice above.
    */
  def pageRankRanks(spark: SparkSession, dir: String, iters: Int = 8): DataFrame = {
    val (edges, deg, n) = cachedGraph(spark, dir)
    var ranks = deg.select(col("node"), lit(1.0 / n.toDouble).as("rank"))
    for (_ <- 1 to iters)
      ranks = pageRankIter(edges, ranks, n).localCheckpoint(true)
    ranks.withColumn("n_nodes", lit(n.toDouble))
  }

  /** One synchronous power iteration — broadcast contribution join +
    * a single dst-keyed aggregation (the plan shape PlanSpec locks).
    */
  private[graft] def pageRankIter(edges: DataFrame, ranks: DataFrame, n: Long): DataFrame =
    edges
      .join(broadcast(ranks), col("src") === col("node"))
      .select(col("dst"), (col("rank") / col("sdeg").cast("double")).as("c"))
      .groupBy("dst")
      .agg(sum(col("c")).as("m"))
      .select(col("dst").as("node"),
        (lit(0.15 / n.toDouble) + lit(0.85) * col("m")).as("rank"))

  def pageRankSql: String = {
    val steps = (1 to 8).map { i =>
      s"""r$i AS (
         |  SELECT a.dst AS node,
         |    0.15/(SELECT n FROM nn) + 0.85*sum(r.rank/a.deg) AS rank
         |  FROM adj a JOIN r${i - 1} r ON r.node = a.src GROUP BY a.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
       |      FROM items a JOIN items b
       |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
       |deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM e GROUP BY src),
       |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
       |adj AS (SELECT e.src, e.dst, d.deg FROM e JOIN deg d USING (src)),
       |r0 AS (SELECT src AS node, 1.0/(SELECT n FROM nn) AS rank FROM deg),
       |$steps
       |SELECT node AS part_id, round(rank * (SELECT n FROM nn), 6) AS rank_ratio
       |FROM r8 ORDER BY rank_ratio DESC, part_id LIMIT 50""".stripMargin
  }

  /** Orientation key: (deg << 32) | node — longs sort exactly as the
    * (deg, node) lexicographic order the degree orientation needs.
    */
  private def okey(deg: Column, node: Column): Column =
    shiftleft(deg, NodeBits) + node

  /** Per-node triangle participation counts, top `k` by (count DESC,
    * part_id). Exact — every unordered node triple carrying all three
    * edges is found exactly once via the degree-ordered DAG (edges
    * a→b→c with a<b<c in (deg, id) order), and each found triangle
    * credits all three corners. The oracle counts the same triangles
    * under plain id-orientation — per-node counts are
    * orientation-invariant, so the engines must agree row-for-row while
    * the Spark side keeps the skew-defeating orientation.
    */
  def triangleCounts(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val (edges, _, _) = cachedGraph(spark, dir)
    // orient each edge from its lower (deg, id) endpoint; sdeg rides
    // the edge row, the dst-side degree arrives from the degree table
    // already joined in cachedGraph's mirror row — recover it by
    // re-keying: the mirrored edge (dst, src, ddeg) exists for every
    // (src, dst, sdeg), so a self-pairing is avoidable by carrying both
    // degrees: join once against the broadcast degree table instead.
    val (_, deg, _) = cachedGraph(spark, dir)
    val ore = edges
      .join(broadcast(deg), col("dst") === col("node"))
      .select(col("src"), col("dst"),
        okey(col("sdeg"), col("src")).as("sk"),
        okey(col("deg"), col("dst")).as("dk"))
      .filter(col("sk") < col("dk"))
      .localCheckpoint(true) // feeds the wedge stream AND the closing-edge set
    // sorted out-neighbor okey arrays; wedge pairs expand map-side in
    // (b, c) orientation order (postingPairs emits i<j on the sorted
    // array), so each candidate is checked in its oriented direction
    val wedges = ore
      .groupBy("src")
      .agg(sort_array(collect_list(col("dk"))).as("nbrs"))
      .filter(size(col("nbrs")) >= 2)
      .select(col("src").as("a"),
        explode(graft.dedup.Dedup.postingPairs(col("nbrs"))).as("pr"))
      .select(col("a"),
        col("pr.id_a").bitwiseAND(lit(NodeMask)).as("b"),
        col("pr.id_b").bitwiseAND(lit(NodeMask)).as("c"))
    // closing-edge membership: |E| packed longs, broadcast-hash semi
    // join — the wedge stream itself is never exchanged
    val closing = ore.select(
      (shiftleft(col("src"), NodeBits) + col("dst")).as("bc"))
    val tri = wedges.join(broadcast(closing),
      shiftleft(col("b"), NodeBits) + col("c") === col("bc"), "left_semi")
    tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("part_id"))
      .groupBy("part_id")
      .agg(count(lit(1)).as("n_triangles"))
      .orderBy(col("n_triangles").desc, col("part_id"))
      .limit(k)
  }

  /** Incrementally MAINTAINED degree table — the IVM discipline of the
    * cdc_*_maintain family applied to graph topology, where the
    * maintained object is a SET (the edge list), not an additive count:
    * order history arrives as four order-date epochs, each epoch's
    * basket pairs are deduplicated against the maintained edge set with
    * an anti-join (the novelty check — set union, not blind addition),
    * and ONLY the genuinely-new edges' endpoints fold into the degree
    * state via the same full-outer merge the CDC aggregates use.
    *
    * Per-epoch cost is Θ(new baskets + |ΔE|) plus one keyed probe of
    * the maintained set (the anti-join — an index lookup at scale,
    * co-partitioned on the canonical (src, dst) key); the fold NEVER
    * rescans history or recomputes a degree from scratch. The oracle
    * computes the batch degrees straight from the full fact table, so
    * the four-epoch incremental composition must land on exactly the
    * recompute-from-scratch answer — the maintained == batch
    * certification every *_maintain entry carries.
    */
  def degreeMaintain(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey")
    val ordYear = Tables.orders(spark, dir)
      .select(col("o_orderkey"), year(col("o_orderdate")).as("y"))
    val epochs: Seq[Column] = Seq(
      col("y") <= 1996, col("y") === 1997, col("y") === 1998, col("y") >= 1999)
    def epochPairs(cond: Column): DataFrame = li
      .join(ordYear.filter(cond), col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
      .filter(size(col("parts")) >= 2)
      .select(explode(graft.dedup.Dedup.postingPairs(col("parts"))).as("pr"))
      .select(col("pr.id_a").as("src"), col("pr.id_b").as("dst"))
      .distinct()
    def degOf(delta: DataFrame): DataFrame = delta
      .select(col("src").as("node"))
      .union(delta.select(col("dst").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    var edges = epochPairs(epochs.head).localCheckpoint(true)
    var deg = degOf(edges).localCheckpoint(true)
    for (cond <- epochs.tail) {
      // novelty check: an edge seen in an earlier epoch must not count again
      val delta = epochPairs(cond)
        .join(edges, Seq("src", "dst"), "left_anti")
        .localCheckpoint(true)
      edges = edges.union(delta).localCheckpoint(true)
      // the CDC merge shape: full-outer on the key, coalesced addition
      deg = deg.select(col("node"), col("deg"))
        .join(degOf(delta).select(col("node"), col("deg").as("d2")),
          Seq("node"), "full_outer")
        .select(col("node"),
          (coalesce(col("deg"), lit(0L)) + coalesce(col("d2"), lit(0L))).as("deg"))
        .localCheckpoint(true)
    }
    deg.select(col("node").as("part_id"), col("deg").as("degree"))
      .orderBy(col("degree").desc, col("part_id"))
      .limit(k)
  }

  val degreeMaintainSql: String =
    """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |u AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      |      FROM items a JOIN items b
      |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |d AS (SELECT node, count(*) AS degree FROM (
      |        SELECT src AS node FROM u UNION ALL SELECT dst FROM u)
      |      GROUP BY node)
      |SELECT node AS part_id, degree
      |FROM d ORDER BY degree DESC, part_id LIMIT 20""".stripMargin

  val triangleCountsSql: String =
    """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |u AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      |      FROM items a JOIN items b
      |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |t AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      |      FROM u e1 JOIN u e2 ON e1.dst = e2.src
      |      JOIN u e3 ON e3.src = e1.src AND e3.dst = e2.dst),
      |pern AS (
      |  SELECT node, count(*) AS n_triangles FROM (
      |    SELECT a AS node FROM t
      |    UNION ALL SELECT b FROM t
      |    UNION ALL SELECT c FROM t)
      |  GROUP BY node)
      |SELECT node AS part_id, n_triangles
      |FROM pern ORDER BY n_triangles DESC, part_id LIMIT 20""".stripMargin
}
