package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Graph

/** Graph family: PageRank invariants + plan locks, and triangle counts
  * cross-checked against an independent id-oriented formulation.
  */
class GraphSpec extends AnyFunSuite with SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("pagerank conserves probability mass and respects the (1-d)/N floor") {
    val ranks = Graph.pageRankRanks(spark, sfDir).collect()
    val n = ranks.length.toDouble
    val mass = ranks.map(_.getAs[Double]("rank")).sum
    assert(math.abs(mass - 1.0) < 1e-9, s"mass drifted: $mass over $n nodes")
    val floor = 0.15 / n
    assert(ranks.forall(_.getAs[Double]("rank") >= floor - 1e-15),
      "every rank must clear the teleport floor")
  }

  test("pagerank top slice is ordered, bounded, and consistent with the full vector") {
    val top = Graph.pageRank(spark, sfDir, k = 10).collect()
    assert(top.length == 10)
    val ratios = top.map(_.getAs[Double]("rank_ratio"))
    assert(ratios.sameElements(ratios.sorted(Ordering[Double].reverse)),
      "slice must be rank-descending")
    // the mean ratio is 1.0 by construction, so the max must reach it
    assert(ratios.head >= 1.0, s"top ratio ${ratios.head} below the uniform mean")
  }

  test("pagerank iteration broadcasts the rank table and partially aggregates — one shuffle") {
    val (edges, deg, n) = Graph.cachedGraph(spark, sfDir)
    val p = plan(Graph.pageRankIter(
      edges, deg.select(col("node"), lit(1.0 / n).as("rank")), n))
    assert(p.contains("BroadcastHashJoin"), s"rank table should broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), "no shuffle join of the adjacency")
    assert(p.contains("partial_sum"), "contributions must partially aggregate map-side")
    // BroadcastExchange is the point; exactly one SHUFFLE exchange allowed
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"exactly one (dst-keyed) shuffle expected:\n$p")
  }

  test("personalized pagerank conserves mass, floors the seeds, and concentrates near them") {
    val ranks = Graph.pprRanks(spark, sfDir).collect()
    val n = ranks.length.toDouble
    val mass = ranks.map(_.getAs[Double]("rank")).sum
    assert(math.abs(mass - 1.0) < 1e-9, s"mass drifted: $mass over $n nodes")
    val byNode = ranks.map(r => r.getAs[Long]("node") -> r.getAs[Double]("rank")).toMap
    val seeds = byNode.keys.toSeq.sorted.take(Graph.PprSeeds)
    val floor = 0.15 / seeds.length
    seeds.foreach { s =>
      assert(byNode(s) >= floor - 1e-15, s"seed $s below the teleport floor")
    }
    // teleport bias: the seed set's mean rank must beat the global mean
    val seedMean = seeds.map(byNode).sum / seeds.length
    assert(seedMean > mass / n, "seeds must carry above-uniform rank")
  }

  test("personalized pagerank top slice is consistent with the full vector") {
    val top = Graph.personalizedPageRank(spark, sfDir, k = 10).collect()
    assert(top.length == 10)
    val ratios = top.map(_.getAs[Double]("ppr_ratio"))
    assert(ratios.sameElements(ratios.sorted(Ordering[Double].reverse)),
      "slice must be ppr-descending")
    val full = Graph.pprRanks(spark, sfDir).collect()
      .map(r => BigDecimal(r.getAs[Double]("rank") * r.getAs[Double]("n_nodes"))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      .sorted(Ordering[Double].reverse).take(10)
    assert(ratios.sameElements(full), "slice must be the top of the full vector")
  }

  test("ppr iteration keeps the pagerank plan shape: broadcasts + one shuffle") {
    val (edges, deg, n) = Graph.cachedGraph(spark, sfDir)
    val seeds = deg.select(col("node")).orderBy("node").limit(Graph.PprSeeds)
      .localCheckpoint(true)
    val p = plan(Graph.pprIter(
      edges, deg.select(col("node"), lit(1.0 / n).as("rank")), seeds, Graph.PprSeeds.toDouble))
    assert(p.contains("BroadcastHashJoin"), s"rank and seed tables should broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), "no shuffle join anywhere in the round")
    assert(p.contains("partial_sum"), "contributions must partially aggregate map-side")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"exactly one (dst-keyed) shuffle expected:\n$p")
  }

  test("hits scores are normalized ratio vectors and round-1 authority tracks degree") {
    val (auth, hub) = Graph.hitsScores(spark, sfDir)
    val aScores = auth.collect().map(r => r.getAs[Long]("part") -> r.getAs[Double]("s")).toMap
    val hScores = hub.collect().map(r => r.getAs[Long]("cust") -> r.getAs[Double]("s")).toMap
    // L1 ratio normalization: each side's scores average to 1.0
    assert(math.abs(aScores.values.sum / aScores.size - 1.0) < 1e-5, "auth mass drifted")
    assert(math.abs(hScores.values.sum / hScores.size - 1.0) < 1e-5, "hub mass drifted")
    assert(aScores.values.forall(_ >= 0) && hScores.values.forall(_ >= 0))
    // with uniform initial hubs, round-1 authority is exactly proportional to
    // distinct-customer degree — check against a literal recompute
    val (a1, _) = Graph.hitsScores(spark, sfDir, iters = 1)
    val degs = Graph.cachedBipartite(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("cust"), r.getAs[Long]("part")))
      .groupBy(_._2).map { case (p, es) => p -> es.length.toDouble }
    val nP = degs.size.toDouble
    val totalDeg = degs.values.sum
    a1.collect().foreach { r =>
      val want = BigDecimal(degs(r.getAs[Long]("part")) / totalDeg * nP)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("s") - want) < 1e-6,
        s"part ${r.getAs[Long]("part")} round-1 authority off degree proportionality")
    }
  }

  test("hits top slice has both sides, descending within side") {
    val top = Graph.hits(spark, sfDir, k = 10).collect()
    val bySide = top.groupBy(_.getAs[String]("side"))
    assert(bySide.keySet === Set("auth", "hub"))
    bySide.values.foreach { rows =>
      val ss = rows.map(_.getAs[Double]("score"))
      assert(ss.sameElements(ss.sorted(Ordering[Double].reverse)))
    }
  }

  test("random walks replay the md5-coin hop selection literally") {
    val (edges, deg, _) = Graph.cachedGraph(spark, sfDir)
    val adj = edges.select("src", "dst").collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
      .groupBy(_._1).map { case (s, es) => s -> es.map(_._2).sorted }
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val walks = Graph.randomWalks(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("start_id"), r.getAs[Int]("step"), r.getAs[Long]("node_id")))
    // exactly one row per (start, step), all starts covered
    assert(walks.length === adj.size * (Graph.WalkSteps + 1))
    assert(walks.groupBy(w => (w._1, w._2)).forall(_._2.length == 1))
    val byWalk = walks.groupBy(_._1)
    byWalk.foreach { case (start, hops) =>
      val path = hops.sortBy(_._2).map(_._3)
      assert(path.head === start, s"walk $start must begin at its start node")
      for (t <- 1 to Graph.WalkSteps) {
        val nbrs = adj(path(t - 1))
        val coin = java.lang.Long.parseLong(md5hex(s"${start}_$t").take(8), 16)
        assert(path(t) === nbrs((coin % nbrs.length).toInt),
          s"walk $start hop $t picked the wrong neighbor")
      }
    }
  }

  test("degree distribution partitions the node set and carries the edge mass") {
    val (edges, deg, nNodes) = Graph.cachedGraph(spark, sfDir)
    val hist = Graph.degreeDistribution(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(hist.map(_._2).sum === nNodes, "bucket counts must partition |V|")
    assert(hist.map { case (d, n) => d * n }.sum === edges.count(),
      "sum degree×count must equal the directed edge count")
    assert(hist.map(_._1).toSeq === hist.map(_._1).sorted.toSeq, "ascending degrees")
    assert(hist.forall(_._1 >= 1), "the symmetrized graph has no isolated rows")
  }

  test("walk skipgrams equal a literal window-pair recompute over the walks") {
    val walks = Graph.cachedWalks(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("start_id"), r.getAs[Int]("step"), r.getAs[Long]("node_id")))
    val want = walks.groupBy(_._1).values.toSeq.flatMap { hops =>
      val hs = hops.toSeq
      for {
        a <- hs; b <- hs
        if a._2 != b._2 && math.abs(a._2 - b._2) <= Graph.SkipgramWindow
      } yield (a._3, b._3)
    }.groupBy(identity).map { case (p, os) => p -> os.size.toLong }
    val got = Graph.walkSkipgrams(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("center_id"), r.getAs[Long]("context_id")) -> r.getAs[Long]("n_pairs"))
      .toMap
    assert(got === want)
  }

  test("walk pmi equals a literal marginal recompute over the skipgram pairs") {
    val pairs = Graph.walkSkipgrams(spark, sfDir).collect()
      .map(r => ((r.getAs[Long]("center_id"), r.getAs[Long]("context_id")),
        r.getAs[Long]("n_pairs")))
    val nC = pairs.groupBy(_._1._1).map { case (c, xs) => c -> xs.map(_._2).sum }
    val nX = pairs.groupBy(_._1._2).map { case (x, xs) => x -> xs.map(_._2).sum }
    val nn = pairs.map(_._2).sum
    val want = pairs.filter(_._2 >= 2).map { case ((c, x), n) =>
      (c, x) -> BigDecimal(math.log(n.toDouble * nn / (nC(c) * nX(x)).toDouble))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val got = Graph.walkPmi(spark, sfDir).collect()
      .map(r => ((r.getAs[Long]("center_id"), r.getAs[Long]("context_id")),
        r.getAs[Double]("pmi")))
    assert(got.nonEmpty)
    got.foreach { case (k, p) =>
      assert(math.abs(p - want(k)) < 1e-9, s"pair $k pmi")
    }
    // the slice is the global top by pmi: nothing outside it scores higher
    val cut = got.map(_._2).min
    assert(want.values.count(_ > cut) <= got.length)
  }

  test("betweenness equals a literal truncated-Brandes replay") {
    val (both, degDf) = Graph.cachedThresholdedBoth(spark, sfDir)
    val adj = both.collect().map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
      .groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
    val seeds = degDf.collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("deg")))
      .sortBy { case (n, d) => (-d, n) }.take(Graph.BetweennessSeeds).map(_._1)
    val acc = scala.collection.mutable.Map[Long, Double]().withDefaultValue(0.0)
    for (s <- seeds) {
      val hop = scala.collection.mutable.Map(s -> 0)
      val sigma = scala.collection.mutable.Map(s -> 1L)
      var frontier = Set(s)
      for (h <- 1 to Graph.BetweennessHops) {
        val contrib = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
        for (v <- frontier; w <- adj.getOrElse(v, Set.empty) if !hop.contains(w))
          contrib(w) += sigma(v)
        // two-phase: only mark new nodes after the whole level expands
        frontier = contrib.keySet.toSet
        for (w <- frontier) { hop(w) = h; sigma(w) = contrib(w) }
      }
      val delta = scala.collection.mutable.Map[Long, Double]().withDefaultValue(0.0)
      for (h <- Graph.BetweennessHops - 1 to 1 by -1;
           v <- hop.collect { case (n, hh) if hh == h => n }) {
        // toSeq before map: mapping a Set of neighbors to contribution
        // VALUES would dedupe equal contributions
        val d = adj.getOrElse(v, Set.empty).toSeq
          .filter(w => hop.get(w).contains(h + 1))
          .map(w => sigma(v).toDouble / sigma(w) * (1.0 + delta(w))).sum
        delta(v) = d
        acc(v) += d
      }
    }
    val want = acc.toSeq.map { case (n, b) =>
      n -> BigDecimal(b).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.filter(_._2 > 0).sortBy { case (n, b) => (-b, n) }.take(30)
    val got = Graph.betweenness(spark, sfDir).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Double]("betweenness"))
    assert(got.length === want.length)
    got.zip(want).foreach { case ((gn, gb), (wn, wb)) =>
      assert(gn === wn && math.abs(gb - wb) < 1e-6, s"node $gn: $gb vs replay $wn: $wb")
    }
  }

  test("triangle counts equal an independent id-oriented 3-way-join formulation") {
    val (edges, _, _) = Graph.cachedGraph(spark, sfDir)
    val u = edges.filter(col("src") < col("dst")).select("src", "dst")
      .localCheckpoint(true)
    val tri = u.as("e1")
      .join(u.as("e2"), col("e1.dst") === col("e2.src"))
      .join(u.as("e3"),
        col("e3.src") === col("e1.src") && col("e3.dst") === col("e2.dst"), "left_semi")
      .select(col("e1.src").as("a"), col("e1.dst").as("b"), col("e2.dst").as("c"))
    val brute = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("part_id"))
      .groupBy("part_id").agg(count(lit(1)).as("n_triangles"))
      .orderBy(col("n_triangles").desc, col("part_id"))
      .limit(20).collect().map(r => (r.getLong(0), r.getLong(1)))
    val fast = Graph.triangleCounts(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fast.sameElements(brute),
      s"degree-oriented counts diverge from brute force:\nfast=${fast.toSeq}\nbrute=${brute.toSeq}")
  }

  test("doulion sampled triangles: exact at p=1, multi-salt mean converges, one coin concentrates") {
    val exact = Graph.triangleTotal(
      Graph.cachedWeightedPairs(spark, sfDir).select("src", "dst"))
      .collect().head.getLong(0)
    assert(exact > 0, "degenerate: no triangles at this SF")
    // p = 100%: the sampler keeps every edge and the estimator must
    // reproduce the exact count bit-for-bit (scaling wired correctly)
    val full = Graph.triangleCountApprox(spark, sfDir, pPct = 100).collect().head
    assert(full.getLong(1) === exact && full.getLong(2) === exact,
      s"p=1 must degenerate to exact: $full vs $exact")
    // unbiasedness: the estimator mean over independent salted coins
    // approaches the exact count (12 salts keep the spec cheap; the
    // tolerance covers the residual sampling variance at this SF)
    val ests = (0 until 12).map(s =>
      Graph.triangleCountApprox(spark, sfDir, pPct = 50, salt = s)
        .collect().head.getLong(2))
    val mean = ests.sum.toDouble / ests.size
    assert(math.abs(mean - exact) / exact < 0.25,
      s"multi-salt mean $mean strays from exact $exact: $ests")
    // concentration: the default single-coin entry stays in the same
    // order of magnitude (the operational promise of the scale tier)
    val one = Graph.triangleCountApprox(spark, sfDir, pPct = 50).collect().head.getLong(2)
    assert(one > 0 && math.abs(one - exact).toDouble / exact < 0.6,
      s"single-coin estimate $one too far from $exact")
  }

  test("maintained degrees equal a from-scratch recompute, and the fold is genuinely incremental") {
    val maintained = Graph.degreeMaintain(spark, sfDir, k = 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // from-scratch recompute off the shared edge table
    val (edges, _, _) = Graph.cachedGraph(spark, sfDir)
    val batch = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(maintained === batch,
      s"incremental fold diverged: ${maintained.size} vs ${batch.size} nodes")
    // epochs must actually split the data — otherwise the novelty
    // anti-join is vacuous and the test proves nothing
    val years = Tables.orders(spark, sfDir)
      .select(year(col("o_orderdate")).as("y")).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(years.exists(_ <= 1996) && years.contains(1997) &&
      years.exists(_ >= 1999), s"degenerate epoch split: $years")
  }

  test("connected components equal an independent BFS labeling, singletons included") {
    val edges = Graph.thresholdedEdges(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty, "degenerate: thresholded graph has no edges at this SF")
    // independent recompute: plain BFS over an adjacency map (the
    // operator's small path is union-find — different algorithm)
    val adj = scala.collection.mutable.HashMap.empty[Long, List[Long]]
    edges.foreach { case (a, b) =>
      adj(a) = b :: adj.getOrElse(a, Nil); adj(b) = a :: adj.getOrElse(b, Nil)
    }
    val label = scala.collection.mutable.HashMap.empty[Long, Long]
    adj.keys.toSeq.sorted.foreach { s =>
      if (!label.contains(s)) {
        var frontier = List(s); label(s) = s
        while (frontier.nonEmpty)
          frontier = frontier.flatMap(adj(_)).filter(v =>
            if (label.contains(v)) false else { label(v) = s; true })
      }
    }
    val sizes = label.values.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val parts = Tables.part(spark, sfDir).select("p_partkey")
      .collect().map(_.getLong(0)).toSet
    val expected = parts.map(p =>
      (p, label.getOrElse(p, p), sizes.getOrElse(label.getOrElse(p, p), 1L)))
    val got = Graph.connectedComponents(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected, s"labelings diverge: ${got.size} vs ${expected.size}")
    // at this SF the w>=2 graph still spans one giant component; the
    // informative multi-component structure appears at sf>=0.01 (129
    // components at the correctness gate's SF), so the guard here is
    // only that the BFS saw a real graph
    assert(label.size === adj.size, "BFS must label every edge endpoint")
  }

  test("neighborhood jaccard equals a brute edge-self-join formulation and never shuffle-joins") {
    val e = Graph.thresholdedEdges(spark, sfDir).localCheckpoint(true)
    val both = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    val deg = both.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    val brute = both.as("e1").join(both.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .groupBy(col("e1.dst").as("b"), col("e2.dst").as("c"))
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= 2)
      .join(e.select(col("src").as("b"), col("dst").as("c")), Seq("b", "c"), "left_anti")
      .join(deg, col("b") === col("node")).withColumnRenamed("deg", "db").drop("node")
      .join(deg, col("c") === col("node"))
      .select(col("b"), col("c"), col("n_common"),
        round(col("n_common").cast("double") /
          (col("db") + col("deg") - col("n_common")).cast("double"), 6).as("j"))
      .orderBy(col("j").desc, col("b"), col("c")).limit(50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val fast = Graph.neighborhoodJaccard(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(fast.sameElements(brute),
      s"wedge formulation diverges:\nfast=${fast.take(5).toSeq}\nbrute=${brute.take(5).toSeq}")
    val p = plan(Graph.neighborhoodJaccard(spark, sfDir))
    assert(!p.contains("SortMergeJoin"),
      s"jaccard path must stay broadcast-only:\n$p")
    assert(p.contains("partial_count") || p.contains("partial"),
      "wedge counts must partially aggregate map-side")
  }

  test("maintained components equal the batch labeling, and epochs genuinely stage the threshold") {
    val batch = Graph.connectedComponents(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val maintained = Graph.ccMaintain(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(maintained === batch,
      s"epoch fold diverged from batch CC: ${maintained.size} vs ${batch.size}")
    // the fold is only a real test if later epochs push edges across
    // the threshold: count pairs whose cumulative weight first reaches
    // 2 strictly after the initial epoch
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_partkey")
    val ordYear = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), year(col("o_orderdate")).as("y"))
    val pairs = li.join(ordYear, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "y")
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
      .filter(size(col("parts")) >= 2)
      .select(col("y"), explode(graft.dedup.Dedup.postingPairs(col("parts"))).as("pr"))
      .select(col("y"), col("pr.id_a").as("src"), col("pr.id_b").as("dst"))
    val lateCrossers = pairs
      .groupBy("src", "dst")
      .agg(count(lit(1)).as("w"),
        sum(when(col("y") <= 1996, 1L).otherwise(0L)).as("w0"))
      .filter(col("w") >= 2 && col("w0") < 2)
      .count()
    assert(lateCrossers > 0,
      "degenerate epoch split: every qualified edge qualifies in epoch 0")
  }

  test("cc maintenance: threshold staging and cross-epoch component merging (hand-built epochs)") {
    import spark.implicits._
    def ep(rows: (Long, Long, Long)*): org.apache.spark.sql.DataFrame =
      rows.toDF("src", "dst", "dw")
    val universe = (1L to 6L).toDF("part_id")
    // epoch 0: {1,2} and {3,4} qualify (dw=2); (2,3) is seen ONCE —
    // below threshold, so the components stay separate
    // epoch 1: (2,3) arrives again -> crosses threshold -> the two
    // established components must merge to min label 1; (5,6) appears
    // once only and must never qualify
    val out = Graph.ccMaintainFold(spark,
      Seq(ep((1L, 2L, 2L), (3L, 4L, 2L), (2L, 3L, 1L)),
        ep((2L, 3L, 1L), (5L, 6L, 1L))),
      universe)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out === Seq(
      (1L, 1L, 4L), (2L, 1L, 4L), (3L, 1L, 4L), (4L, 1L, 4L),
      (5L, 5L, 1L), (6L, 6L, 1L)),
      s"cross-epoch merge wrong: $out")
  }

  test("cc maintenance: an epoch rewrites ONLY the weight buckets its delta touches") {
    import spark.implicits._
    // epoch 0 spreads pairs over several buckets; epoch 1's delta is a
    // single pair, so exactly that pair's bucket may be rewritten
    val e0 = (1L to 40L).map(i => (i, i + 100L, 2L)).toDF("src", "dst", "dw")
    val st = new Graph.CcMaintainState(spark, e0)
    assert(st.generations.map(_._2).reduce(_ ++ _) === (0 until Graph.WBuckets).toSet,
      "initial generations must cover every bucket")
    val pre = (0 until Graph.WBuckets).map(b => b -> st.bucketGen(b)).toMap
    st.applyEpoch(Seq((7L, 107L, 1L)).toDF("src", "dst", "dw"))
    assert(st.lastDirty.size === 1, s"one-pair delta must dirty one bucket: ${st.lastDirty}")
    assert(st.lastDirty.subsetOf((0 until Graph.WBuckets).toSet))
    (0 until Graph.WBuckets).filterNot(st.lastDirty).foreach { b =>
      assert(st.bucketGen(b) eq pre(b),
        s"untouched bucket $b was rewritten (generation frame changed)")
    }
    st.lastDirty.foreach { b =>
      assert(!(st.bucketGen(b) eq pre(b)), s"dirty bucket $b was not rewritten")
    }
    // and the rewrite is semantically the additive merge: (7,107) now 3
    val w7 = st.bucketGen(st.lastDirty.head)
      .filter(col("src") === 7L && col("dst") === 107L)
      .select("w").collect().map(_.getLong(0)).toSeq
    assert(w7 === Seq(3L), s"merged weight wrong: $w7")
  }

  test("weight-state flatten carries NO stale superseded rows across rewrites") {
    import spark.implicits._
    // two merges hit the SAME key: its bucket is rewritten twice, so
    // two older generation frames still physically hold its earlier
    // weights — the flatten must read each bucket from its live
    // generation only, or a key rewritten n times appears n+1 times
    // (and a dw<=0 delta would resurrect a deleted weight)
    val st = new Graph.BucketedWeightState(
      Seq((1L, 2L, 5L), (3L, 4L, 7L)).toDF("src", "dst", "dw"))
    st.merge(Seq((1L, 2L, 3L)).toDF("src", "dst", "dw"))
    st.merge(Seq((1L, 2L, -8L), (5L, 6L, 1L)).toDF("src", "dst", "dw"))
    val flat = Graph.flattenWeightState(st)
      .select("src", "dst", "w").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(flat === Seq((1L, 2L, 0L), (3L, 4L, 7L), (5L, 6L, 1L)),
      s"flattened state must be exactly the current weights: $flat")
  }

  test("cc maintenance: forced spill to the distributed label path matches driver mode") {
    import spark.implicits._
    def ep(rows: (Long, Long, Long)*): org.apache.spark.sql.DataFrame =
      rows.toDF("src", "dst", "dw")
    val universe = (1L to 8L).toDF("part_id")
    val frames = Seq(
      ep((1L, 2L, 2L), (3L, 4L, 2L), (2L, 3L, 1L), (7L, 8L, 1L)),
      ep((2L, 3L, 1L), (5L, 6L, 2L)),
      ep((7L, 8L, 1L), (4L, 5L, 2L)))
    val driverMode = Graph.ccMaintainFold(spark, frames, universe)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // gate 0 can never hold a non-empty edge batch driver-side: epoch 0
    // initializes distributed and every epoch runs the star-contraction
    val spilled = Graph.ccMaintainFold(spark, frames, universe, gate = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(driverMode === spilled,
      s"distributed label path diverged:\n$driverMode\nvs\n$spilled")
    // mid-fold spill: driver mode for epoch 0, distributed afterwards
    val st = new Graph.CcMaintainState(spark, frames.head, gate = 5)
    frames.tail.foreach(st.applyEpoch)
    val mixed = st.labels.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val pure = {
      val s2 = new Graph.CcMaintainState(spark, frames.head)
      frames.tail.foreach(s2.applyEpoch)
      s2.labels.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    }
    assert(mixed === pure, s"mid-fold spill diverged:\n$mixed\nvs\n$pure")
  }

  test("bfs levels are a valid breadth-first layering of the thresholded graph") {
    val levels = Graph.bfsHops(spark, sfDir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // level 0 is exactly the hub
    assert(levels(0)._1 === 1L, s"hop 0 must hold one node: ${levels(0)}")
    assert(levels.keySet === (0 to levels.keySet.max).toSet, "levels have no holes")
    // recompute per-node hops with a driver-side BFS and compare the histogram
    val e = Graph.thresholdedEdges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (e ++ e.map(p => (p._2, p._1))).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    val hub = adj.toSeq.map { case (n, ns) => (n, ns.size) }
      .sortBy { case (n, d) => (-d, n) }.head._1
    var hops = Map(hub -> 0)
    var frontier = Set(hub)
    for (h <- 1 to Graph.MaxBfsHops) {
      frontier = frontier.flatMap(adj.getOrElse(_, Set.empty[Long])) -- hops.keySet
      hops ++= frontier.map(_ -> h)
    }
    val expect = hops.groupBy(_._2).map { case (h, m) =>
      h -> ((m.size.toLong, m.keys.min, m.keys.max)) }
    assert(levels === expect, s"histogram diverges:\n$levels\nvs\n$expect")
  }

  test("k-core equals a driver-side peel to fixpoint") {
    val e = Graph.thresholdedEdges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var adj = (e ++ e.map(p => (p._2, p._1))).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    // peel to fixpoint (the fixed 6 rounds must have converged)
    var changed = true
    while (changed) {
      val dead = adj.collect { case (n, ns) if ns.size < Graph.KCoreK => n }.toSet
      changed = dead.nonEmpty
      adj = adj.collect { case (n, ns) if !dead(n) => n -> (ns -- dead) }
        .filter(_._2.nonEmpty)
    }
    val want = adj.map { case (n, ns) => n -> ns.size.toLong }
    val got = Graph.kcore(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want, s"core mismatch: got ${got.size} nodes, want ${want.size}")
    assert(got.values.forall(_ >= Graph.KCoreK), "every core member keeps >= k neighbors")
  }

  test("assortativity equals a driver-side Pearson over edge-endpoint degrees") {
    val e = Graph.thresholdedEdges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val both = e ++ e.map(p => (p._2, p._1))
    val deg = both.groupBy(_._1).map { case (n, v) => n -> v.length }
    val xs = both.map(p => deg(p._1).toDouble)
    val ys = both.map(p => deg(p._2).toDouble)
    val n = xs.length
    val mx = xs.sum / n; val my = ys.sum / n
    val cov = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
    val vx = xs.map(a => (a - mx) * (a - mx)).sum
    val vy = ys.map(b => (b - my) * (b - my)).sum
    val want = cov / math.sqrt(vx * vy)
    val row = Graph.assortativity(spark, sfDir).collect().head
    assert(row.getLong(0) === n.toLong)
    assert(math.abs(row.getDouble(1) - want) < 1e-3,
      s"assortativity ${row.getDouble(1)} vs replay $want")
    assert(row.getDouble(1).abs <= 1.0 + 1e-9)
  }

  test("graph_lpa replays the synchronous min-tie label propagation literally") {
    val e = Graph.thresholdedEdges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (e ++ e.map(_.swap)).groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    var lbl: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to Graph.LpaRounds) {
      lbl = adj.map { case (n, ns) =>
        val votes = ns.map(lbl).groupBy(identity).toSeq
          .map { case (l, ls) => (l, ls.size) }
        // most frequent neighbor label, smallest label on ties
        n -> votes.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val sizes = lbl.values.groupBy(identity).map { case (l, ls) => l -> ls.size.toLong }
    val got = Graph.lpa(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length === lbl.size)
    got.foreach { case (n, c, s) =>
      assert(c === lbl(n), s"node $n label")
      assert(s === sizes(lbl(n)), s"node $n community size")
    }
    // labels must broadcast onto the edge list each round; the argmax
    // is an aggregate, not a window sort
    val p = plan(Graph.lpa(spark, sfDir))
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"),
      s"label join should broadcast:\n$p")
    assert(!p.contains("RunningWindowFunction") && !p.contains("Window"),
      s"argmax must be a partial-agg max, not a window:\n$p")
    // a vote round over the pre-partitioned edge table must plan with
    // ZERO shuffle exchanges: the checkpointed hashpartitioning(src)
    // satisfies both groupings, and the label join only broadcasts
    val edges = {
      val e = Graph.thresholdedEdges(spark, sfDir)
      val m = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
        .repartition(col("src")).cache()
      m.count()
      m
    }
    val lbl0 = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl")).localCheckpoint(true)
    // the cached edge relation's BUILD plan (nested in explain output)
    // legitimately holds the one-time repartition — only the round
    // plan ABOVE the cache scan must be exchange-free
    val rp = plan(Graph.lpaVoteRound(edges, lbl0))
      .linesIterator.takeWhile(!_.contains("InMemoryRelation")).mkString("\n")
    assert(!rp.contains("Exchange hashpartitioning"),
      s"LPA round must not shuffle over pre-partitioned edges:\n$rp")
  }

  test("graph_modularity equals a literal Q over the LPA partition") {
    val e = Graph.thresholdedEdges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val lab = Graph.lpa(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = e.length.toDouble
    val lin = e.count { case (a, b) => lab(a) == lab(b) }
    val deg = (e ++ e.map(_.swap)).groupBy(_._1).map { case (n, es) => n -> es.size }
    val dsum = lab.toSeq.groupBy(_._2)
      .map { case (_, ns) => ns.map(p => deg(p._1).toLong).sum }
    val q = lin / m - dsum.map(d => d.toDouble * d).sum / (4.0 * m * m)
    val row = Graph.modularity(spark, sfDir).collect().head
    assert(row.getLong(0) === dsum.size.toLong, "community count")
    assert(row.getLong(1) === e.length.toLong, "edge count")
    assert(math.abs(row.getDouble(2) - q) < 1e-3,
      s"modularity ${row.getDouble(2)} vs replay $q")
    assert(row.getDouble(2) >= -0.5 && row.getDouble(2) <= 1.0)
  }

  test("triangle adjacency fetches broadcast; the intersection never rides a shuffle") {
    val p = plan(Graph.triangleCounts(spark, sfDir))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"both adjacency fetches should broadcast-hash-join:\n$p")
    assert(!p.contains("SortMergeJoin"), "no sort-merge join anywhere in the triangle path")
    // the only row-exchanges are the adjacency build and the credit
    // count — the Θ(wedge-mass) intersection work is inside a projection
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 3,
      s"intersection output must go straight to the credit aggregation:\n$p")
  }
}
