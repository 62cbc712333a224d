package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorExpressions

/** Exact, deterministic Lloyd's k-means over the embedding corpus —
  * the clustering face of the similarity family. The IVF tiers
  * ([[Ann.ivfTopK]]) train a coarse quantizer as an internal index
  * artifact; this operator exposes the clustering itself as a
  * certified query: k=[[K]] seeds (the k smallest vec_ids — a
  * deterministic init both engines reproduce), [[Iters]] synchronous
  * Lloyd iterations, squared-L2 assignment with ties to the smaller
  * centroid id, and centroids QUANTIZED to 6 dp after every update so
  * both engines fold bit-identical centroid tables forward (the same
  * cross-engine-determinism trick the PCA family uses for its moment
  * matrices). Output is every vector's final cluster and its 4-dp
  * distance — hash-certified row-for-row against a DuckDB oracle that
  * unrolls the identical iterations as chained CTEs.
  *
  * Scale design: the centroid table is k×dim — always a broadcast.
  * Assignment is a map-side cross join against that broadcast with
  * the fused codegen [[VectorExpressions.l2sq]] (no decode, no UDF),
  * and the per-vector argmin partially aggregates map-side (the
  * exchange carries one candidate struct per vector per partition,
  * never the k-fanout). The centroid update is a (k×dim)-key
  * partial-agg over posexploded members — shuffle volume is corpus
  * dims, the same single repartition any iteration of distributed
  * k-means pays. Per-iteration lineage is truncated with an eager
  * localCheckpoint of the k-row centroid table, so the loop's plan
  * stays constant-size. At 100 TB: same shapes, nothing driver-side.
  */
object KMeans {

  /** Cluster count — small enough that the centroid table is always a
    * broadcast literal, large enough to split the synthetic corpus
    * into non-trivial cells.
    */
  val K = 8

  /** Fixed Lloyd iterations — both engines unroll exactly these. */
  val Iters = 3

  /** (vec_id, cluster_id, dist): final assignment after [[Iters]]
    * rounds, dist = squared L2 to the winning centroid, 4 dp.
    */
  def embeddingKmeans(spark: SparkSession, dir: String): DataFrame =
    cachedAssignment(spark, dir).orderBy("vec_id")

  /** The trained assignment (vec_id, cluster_id, dist@4dp) memoized per
    * (session, dir): the clustering face and the outlier face read the
    * SAME materialized Lloyd run instead of re-training per entry.
    */
  private[graft] def cachedAssignment(spark: SparkSession, dir: String): DataFrame =
    graft.SessionCache.getOrElseUpdate(spark, ("kmeansAssign", dir)) {
      val emb = widen(Tables.embeddings(spark, dir)).localCheckpoint(true)
      assign(emb, train(emb))
        .select(col("vec_id"), col("cluster_id"),
          round(col("dist"), 4).as("dist"))
        .localCheckpoint(true)
    }

  /** Flag vectors ≥ this many cluster-local standard deviations from
    * their centroid. 2σ keeps the flag set small but non-empty on the
    * synthetic corpus at every SF.
    */
  val OutlierZ = 2.0

  /** Per-cluster z-score outlier detection over the certified k-means
    * assignment — the curation pass that prunes noise / mislabeled /
    * out-of-distribution vectors BEFORE training (the complement of
    * SemDeDup-style near-dup pruning: that removes redundancy, this
    * removes junk). Per cluster, μ and σ of the member distances; each
    * vector gets z = (dist−μ)/σ (0 when σ=0 — singleton or degenerate
    * cluster) and an integer flag at z ≥ [[OutlierZ]].
    *
    * Cross-engine determinism: the 4-dp dists are EXACT integers after
    * ×1e4, so μ and σ derive from BIGINT sufficient statistics
    * (n, Σd, Σd²) with no float-accumulation-order sensitivity — the
    * series_correlation discipline. The rounded z is additionally
    * canonicalized with `+ 0.0` so a `round(−ε, 4)` that lands on zero
    * is +0.0 in BOTH engines (IEEE: −0.0 + 0.0 = +0.0; DuckDB's round
    * preserves the sign of −ε, Spark's BigDecimal HALF_UP does not —
    * the r11 hash-FAIL class).
    *
    * Scale design: the stats table is k rows — computed by one
    * map-side-partial agg over the already-materialized assignment and
    * broadcast back; the whole operator adds zero corpus shuffles on
    * top of the clustering it composes.
    */
  def embeddingOutliers(spark: SparkSession, dir: String): DataFrame = {
    val asg = cachedAssignment(spark, dir)
      .withColumn("di", round(col("dist") * 1e4, 0).cast("long"))
    val muRaw = col("s").cast("double") / col("n") / lit(1e4)
    val stats = asg.groupBy("cluster_id")
      .agg(count(lit(1)).as("n"), sum(col("di")).as("s"),
        sum(col("di") * col("di")).as("q"))
      .select(col("cluster_id"),
        round(muRaw, 6).as("mu"),
        round(sqrt(greatest(
          col("q").cast("double") / col("n") / lit(1e8) - muRaw * muRaw,
          lit(0.0))), 6).as("sigma"))
    asg.join(broadcast(stats), "cluster_id")
      .withColumn("z",
        when(col("sigma") > 0,
          round((col("dist") - col("mu")) / col("sigma"), 4) + lit(0.0))
          .otherwise(lit(0.0)))
      .select(col("vec_id"), col("cluster_id"), col("dist"), col("z"),
        (col("z") >= OutlierZ).cast("int").as("flagged"))
      .orderBy("vec_id")
  }

  /** (vec_id, embedding) → (vec_id, v): embeddings widened to double
    * ONCE (float→double is exact, and it keeps every downstream
    * arithmetic in one type on both engines). Callers checkpoint —
    * every Lloyd iteration scans the corpus twice.
    */
  private[graft] def widen(embs: DataFrame): DataFrame =
    embs.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))

  /** The trained k-row centroid table (cid, c) after [[Iters]] Lloyd
    * rounds over a widened corpus — the model artifact the streaming
    * assignment face persists and serves against.
    */
  private[graft] def train(emb: DataFrame): DataFrame = {
    var cents = initCentroids(emb)
    for (_ <- 1 to Iters)
      cents = updateCentroids(assign(emb, cents)).localCheckpoint(true)
    cents
  }

  /** Seeds: the k smallest vec_ids, cid in vec_id order, coordinates
    * rounded like every later centroid (one quantization rule
    * everywhere). The 8-row window is driver-scale by construction.
    */
  private def initCentroids(emb: DataFrame): DataFrame =
    emb.orderBy("vec_id").limit(K)
      .withColumn("cid",
        (row_number().over(Window.orderBy("vec_id")) - 1).cast("int"))
      .select(col("cid"), transform(col("v"), x => round(x, 6)).as("c"))
      .localCheckpoint(true)

  /** (vec_id, cluster_id, dist, v): nearest centroid per vector, ties
    * to the smaller cid via the struct-min ordering. The min partially
    * aggregates map-side, so the exchange never carries the k-fanout.
    */
  private[graft] def assign(emb: DataFrame, cents: DataFrame): DataFrame =
    emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("v"), col("cid"),
        VectorExpressions.l2sq(col("v"), col("c")).as("dist"))
      .groupBy("vec_id")
      .agg(min(struct(col("dist"), col("cid"))).as("m"),
        first(col("v")).as("v"))
      .select(col("vec_id"), col("m.cid").as("cluster_id"),
        col("m.dist").as("dist"), col("v"))

  /** Member-mean per dimension, re-packed into sorted coordinate
    * arrays and 6-dp quantized. A cluster that loses all members
    * drops out — both engines shrink identically.
    */
  private def updateCentroids(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cluster_id").as("cid"), posexplode(col("v")).as(Seq("d", "x")))
      .groupBy("cid", "d").agg(avg(col("x")).as("m"))
      .groupBy("cid")
      .agg(transform(array_sort(collect_list(struct(col("d"), col("m")))),
        s => round(s.getField("m"), 6)).as("c"))

  /** The shared Lloyd replay WITH-chain through `fin` over an arbitrary
    * exploded (vec_id, d, x) vector source — the embeddings faces
    * instantiate it on the embeddings table, mm_kmeans on the
    * byte-replayed stub features (the composed-certified-pieces
    * discipline of ann_recall_report).
    */
  private[graft] def kmeansReplayCtes(evSource: String): String = {
    val steps = (1 to Iters).map { i =>
      s"""a$i AS (
         |  SELECT vec_id, cid, dist, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
         |  FROM (SELECT ev.vec_id, c.cid, sum((ev.x - c.m)*(ev.x - c.m)) AS dist
         |        FROM ev JOIN c${i - 1} c ON ev.d = c.d GROUP BY 1, 2)),
         |c$i AS (SELECT a$i.cid, ev.d, round(avg(ev.x), 6) AS m
         |  FROM a$i JOIN ev ON a$i.vec_id = ev.vec_id AND a$i.rk = 1 GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    s"""ev AS ($evSource),
       |c0 AS (
       |  SELECT ids.cid, ev.d, round(ev.x, 6) AS m FROM (
       |    SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid FROM (
       |      SELECT DISTINCT vec_id FROM ev ORDER BY vec_id LIMIT $K)) ids
       |  JOIN ev USING (vec_id)),
       |$steps,
       |fin AS (
       |  SELECT vec_id, cid, dist, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
       |  FROM (SELECT ev.vec_id, c.cid, sum((ev.x - c.m)*(ev.x - c.m)) AS dist
       |        FROM ev JOIN c$Iters c ON ev.d = c.d GROUP BY 1, 2))""".stripMargin
  }

  private[graft] val EmbeddingsEvSource: String =
    """SELECT vec_id, CAST(unnest(generate_series(1, len(embedding))) AS INT) AS d,
      |    CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings""".stripMargin

  val embeddingKmeansSql: String =
    s"""WITH ${kmeansReplayCtes(EmbeddingsEvSource)}
       |SELECT vec_id, cid AS cluster_id, round(dist, 4) AS dist
       |FROM fin WHERE rk = 1 ORDER BY vec_id""".stripMargin

  /** [[embeddingKmeansSql]] with its per-vector tail swapped for the
    * cluster-stat + z-score CTEs — one Lloyd replay, two certified
    * faces (the langConfusionSql composition trick).
    */
  val embeddingOutliersSql: String = {
    val perVecTail =
      """SELECT vec_id, cid AS cluster_id, round(dist, 4) AS dist
        |FROM fin WHERE rk = 1 ORDER BY vec_id""".stripMargin
    val outlierTail =
      s"""asg AS (
         |  SELECT vec_id, cid AS cluster_id, round(dist, 4) AS dist
         |  FROM fin WHERE rk = 1),
         |ss AS (
         |  SELECT cluster_id, count(*) AS n,
         |    sum(CAST(round(dist*1e4) AS BIGINT)) AS s,
         |    sum(CAST(round(dist*1e4) AS BIGINT)*CAST(round(dist*1e4) AS BIGINT)) AS q
         |  FROM asg GROUP BY 1),
         |st AS (
         |  SELECT cluster_id, round(CAST(s AS DOUBLE)/n/1e4, 6) AS mu,
         |    round(sqrt(greatest(CAST(q AS DOUBLE)/n/1e8
         |      - (CAST(s AS DOUBLE)/n/1e4)*(CAST(s AS DOUBLE)/n/1e4), 0)), 6) AS sigma
         |  FROM ss),
         |zz AS (
         |  SELECT a.vec_id, a.cluster_id, a.dist,
         |    CASE WHEN s.sigma > 0 THEN round((a.dist - s.mu)/s.sigma, 4) + 0.0 ELSE 0.0 END AS z
         |  FROM asg a JOIN st s USING (cluster_id))
         |SELECT vec_id, cluster_id, dist, z,
         |  CAST(z >= $OutlierZ AS INTEGER) AS flagged
         |FROM zz ORDER BY vec_id""".stripMargin
    require(embeddingKmeansSql.endsWith("))\n" + perVecTail),
      "embeddingKmeansSql tail drifted — update embeddingOutliersSql")
    // the last CTE (fin) needs a comma continuation before the new CTEs
    embeddingKmeansSql.stripSuffix(perVecTail).stripSuffix("\n") + ",\n" + outlierTail
  }
}
