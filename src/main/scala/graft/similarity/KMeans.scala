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
  def embeddingKmeans(spark: SparkSession, dir: String): DataFrame = {
    val emb = widen(Tables.embeddings(spark, dir)).localCheckpoint(true)
    assign(emb, train(emb))
      .select(col("vec_id"), col("cluster_id"),
        round(col("dist"), 4).as("dist"))
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

  val embeddingKmeansSql: String = {
    val steps = (1 to Iters).map { i =>
      s"""a$i AS (
         |  SELECT vec_id, cid, dist, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
         |  FROM (SELECT ev.vec_id, c.cid, sum((ev.x - c.m)*(ev.x - c.m)) AS dist
         |        FROM ev JOIN c${i - 1} c ON ev.d = c.d GROUP BY 1, 2)),
         |c$i AS (SELECT a$i.cid, ev.d, round(avg(ev.x), 6) AS m
         |  FROM a$i JOIN ev ON a$i.vec_id = ev.vec_id AND a$i.rk = 1 GROUP BY 1, 2)""".stripMargin
    }.mkString(",\n")
    s"""WITH ev AS (
       |  SELECT vec_id, CAST(unnest(generate_series(1, len(embedding))) AS INT) AS d,
       |    CAST(unnest(embedding) AS DOUBLE) AS x
       |  FROM embeddings),
       |c0 AS (
       |  SELECT ids.cid, ev.d, round(ev.x, 6) AS m FROM (
       |    SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid FROM (
       |      SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT $K)) ids
       |  JOIN ev USING (vec_id)),
       |$steps,
       |fin AS (
       |  SELECT vec_id, cid, dist, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
       |  FROM (SELECT ev.vec_id, c.cid, sum((ev.x - c.m)*(ev.x - c.m)) AS dist
       |        FROM ev JOIN c$Iters c ON ev.d = c.d GROUP BY 1, 2))
       |SELECT vec_id, cid AS cluster_id, round(dist, 4) AS dist
       |FROM fin WHERE rk = 1 ORDER BY vec_id""".stripMargin
  }
}
