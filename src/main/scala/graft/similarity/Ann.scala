package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Three tiers:
  *   - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline
  *     and recall oracle. Queries are broadcast; the corpus is scanned
  *     once (O(|Q|·n) scoring, no corpus shuffle).
  *   - [[lshTopK]]: random-hyperplane LSH — corpus hashed to buckets
  *     once; scoring only within the query's (multi-probed) buckets.
  *   - [[ivfTopK]]: IVF-style coarse quantizer — k-means-lite centroids,
  *     probe the nProbe nearest cells.
  *
  * At 100 TB the brute-force tier is only for per-bucket verify; LSH/IVF
  * bound the scored fraction. All scoring math is codegen'd
  * (zip_with/aggregate), no UDFs.
  */
object Ann {

  val Dim = 64

  /** Exact top-k cosine neighbors for each query vector (vec_id < nQueries). */
  def bruteForceTopK(embs: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val queries = broadcast(
      embs.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("q")))
    val scored = embs.join(queries, col("vec_id") =!= col("query_id"))
      .withColumn("cosine", round(cosine(col("q"), col("embedding")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cosine"))
      .orderBy("query_id", "rank")
  }

  def bruteForceTopK(spark: SparkSession, dir: String): DataFrame =
    bruteForceTopK(Tables.embeddings(spark, dir))

  val bruteForceSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
      |scored AS (
      |  SELECT q.query_id, e.vec_id AS neighbor_id,
      |    round(list_cosine_similarity(q.qv, e.v), 4) AS cosine
      |  FROM q JOIN e ON e.vec_id <> q.query_id),
      |ranked AS (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
      |    ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
      |  FROM scored)
      |SELECT query_id, neighbor_id, rank, cosine FROM ranked
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** LSH ANN: 12-bit random-hyperplane signature buckets; queries probe
    * their own bucket plus all hamming-1 neighbors (multi-probe). Only
    * candidates sharing a probed bucket are scored. Approximate →
    * rows-only check; recall vs brute force asserted in the spec.
    */
  def lshTopK(embs: DataFrame, nQueries: Int = 10, k: Int = 5, nBits: Int = 12): DataFrame = {
    val planes = makePlanes(nBits, Dim)
    val corpus = embs.select(col("vec_id"), col("embedding"),
      hyperplaneSig(col("embedding"), planes).as("bucket"))
    val probes = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"),
        explode(array((lit(0L) +: (0 until nBits).map(i =>
          shiftleft(lit(1L), i))): _*)).as("flip"),
        col("bucket").as("qb"))
      .select(col("query_id"), col("q"), col("qb").bitwiseXOR(col("flip")).as("bucket"))
    val cand = probes.join(corpus, Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("q"), col("vec_id"), col("embedding"))
      .distinct()
      .withColumn("cosine", round(cosine(col("q"), col("embedding")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
    cand
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cosine"))
      .orderBy("query_id", "rank")
  }

  def lshTopK(spark: SparkSession, dir: String): DataFrame =
    lshTopK(Tables.embeddings(spark, dir))

  /** IVF-style ANN: deterministic coarse centroids (every (n/K)-th
    * vector, one Lloyd refinement step), corpus assigned to nearest
    * cell, queries probe nProbe nearest cells. The cell assignment is
    * the only corpus shuffle; at scale cells map to partitions.
    */
  def ivfTopK(embs: DataFrame, nQueries: Int = 10, k: Int = 5,
              nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._

    val n = embs.count()
    val stride = math.max(n / nCells, 1L)
    // seed centroids: deterministic systematic sample
    val seeds = embs.filter(pmod(col("vec_id"), lit(stride)) === 0 && col("vec_id") / stride < nCells)
      .select((col("vec_id") / stride).cast("int").as("cell"), col("embedding").as("centroid"))
    // one Lloyd step: assign to nearest seed, recompute means
    val assigned0 = assignToNearest(embs, seeds)
    val refined = assigned0
      .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("cell", "pos").agg(avg(col("x").cast("double")).as("m"))
      .groupBy("cell").agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cell"), transform(col("pm"), s => s.getField("m").cast("float")).as("centroid"))
    val assigned = assignToNearest(embs, refined)

    val queries = embs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q"))
    // rank cells per query, probe top nProbe
    val qCells = queries.join(broadcast(refined), lit(true))
      .withColumn("d", l2sq(col("q"), col("centroid")))
      .withColumn("cr", row_number().over(
        Window.partitionBy("query_id").orderBy(col("d"), col("cell"))))
      .filter(col("cr") <= nProbe)
      .select("query_id", "q", "cell")
    val cand = qCells.join(assigned, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cosine", round(cosine(col("q"), col("embedding")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
    cand
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cosine"))
      .orderBy("query_id", "rank")
  }

  private def assignToNearest(embs: DataFrame, centroids: DataFrame): DataFrame = {
    val joined = embs.join(broadcast(centroids), lit(true))
      .withColumn("d", l2sq(col("embedding"), col("centroid")))
    val w = Window.partitionBy("vec_id").orderBy(col("d"), col("cell"))
    joined.withColumn("r", row_number().over(w)).filter(col("r") === 1)
      .select(col("vec_id"), col("embedding"), col("cell"))
  }

  def ivfTopK(spark: SparkSession, dir: String): DataFrame =
    ivfTopK(Tables.embeddings(spark, dir))
}
