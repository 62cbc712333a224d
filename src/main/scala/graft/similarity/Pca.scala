package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** PCA over the embedding corpus — the whitening / dimensionality-
  * reduction step large-scale embedding pipelines run before clustering
  * and semantic dedup (SemDeDup-style curation PCA-reduces before the
  * cell k-means; IVF/PQ codebooks train better in decorrelated space).
  *
  * Scale design: the ONLY data-sized work is one distributed pass that
  * accumulates, per partition, the (count, Σx, upper-triangular Σxxᵀ)
  * moment triple with a `mapPartitions` local accumulator (the
  * classic Gramian shape — genuine per-partition imperative logic, a
  * d(d+1)/2 array updated in place per row; an exploded (i,j)
  * formulation would shuffle d²/2 rows per vector). What reaches the
  * driver is ONE moment triple per partition — bounded by partition
  * count, never by corpus size (d=64 → 2 080 doubles each). The
  * 64×64 eigensolve is O(d³) driver arithmetic, independent of corpus
  * size, deterministic (cyclic Jacobi, fixed sweep order, sign-
  * canonicalized eigenvectors).
  *
  * The covariance substrate (per-dim mean/variance = its diagonal) is
  * DuckDB-expressible and hash-certified as `embedding_dim_stats`; the
  * eigensolve itself is not SQL-expressible, so `embedding_pca` is
  * rows-only with the spectral invariants spec-held: Cov·v = λ·v,
  * orthonormality, trace preservation, Eckart–Young reconstruction
  * error equality, and the moment pass cross-checked against an
  * exploded declarative recompute.
  */
object Pca {

  /** Per-dimension corpus stats (dim, n_vecs, mean_v, var_v) — the
    * centering substrate of the PCA pass and the covariance diagonal,
    * SQL-oracled. One posexplode + dim-keyed partial agg; variance is
    * the explicit E[x²] − μ² formula so both engines run identical
    * arithmetic.
    */
  def dimStats(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("dim"), col("x").cast("double").as("x"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n_vecs"),
        round(avg(col("x")), 6).as("mean_v"),
        round(avg(col("x") * col("x")) - avg(col("x")) * avg(col("x")), 6).as("var_v"))
      .orderBy("dim")

  val dimStatsSql: String =
    """WITH dims AS (
      |  SELECT unnest(range(0, (SELECT max(len(embedding)) FROM embeddings))) AS dim),
      |x AS (
      |  SELECT dim, CAST(embedding[dim + 1] AS DOUBLE) AS x FROM embeddings, dims)
      |SELECT CAST(dim AS INT) AS dim, count(*) AS n_vecs,
      |  round(avg(x), 6) AS mean_v,
      |  round(avg(x * x) - avg(x) * avg(x), 6) AS var_v
      |FROM x GROUP BY dim ORDER BY dim""".stripMargin

  /** (mean vector, covariance matrix, n) from the one distributed
    * moment pass — memoized: the eigen table, the projection face and
    * the specs all read it.
    */
  private[graft] def cachedMoments(spark: SparkSession, dir: String): (Array[Double], Array[Array[Double]], Long) =
    graft.SessionCache.getOrElseUpdate(spark, ("pca_moments", dir)) {
      val rows = Tables.embeddings(spark, dir).select("embedding")
      // per-partition: ONE (n, Σx, packed upper Σxxᵀ) accumulator row
      val parts = rows.rdd.mapPartitions { it =>
        var n = 0L
        var sums: Array[Double] = null
        var gram: Array[Double] = null // packed upper triangle, row-major
        it.foreach { r =>
          val v = r.getSeq[Float](0)
          val d = v.length
          if (sums == null) { sums = new Array[Double](d); gram = new Array[Double](d * (d + 1) / 2) }
          n += 1
          var i = 0; var k = 0
          while (i < d) {
            val xi = v(i).toDouble
            sums(i) += xi
            var j = i
            while (j < d) { gram(k) += xi * v(j).toDouble; j += 1; k += 1 }
            i += 1
          }
        }
        if (n == 0) Iterator.empty else Iterator.single((n, sums, gram))
      }.collect() // ≤ one row per partition — bounded by parallelism, not corpus
      require(parts.nonEmpty, s"no embeddings under $dir")
      val d = parts.head._2.length
      val n = parts.map(_._1).sum
      val sums = new Array[Double](d)
      val gram = new Array[Double](d * (d + 1) / 2)
      parts.foreach { case (_, s, g) =>
        var i = 0
        while (i < d) { sums(i) += s(i); i += 1 }
        var k = 0
        while (k < gram.length) { gram(k) += g(k); k += 1 }
      }
      val mean = sums.map(_ / n)
      val cov = Array.ofDim[Double](d, d)
      var i = 0; var k = 0
      while (i < d) {
        var j = i
        while (j < d) {
          val c = gram(k) / n - mean(i) * mean(j)
          cov(i)(j) = c; cov(j)(i) = c
          j += 1; k += 1
        }
        i += 1
      }
      (mean, cov, n)
    }

  /** The moment pass as an ADDITIVE row encoding — the substrate of
    * the streaming face ([[graft.streaming.StreamingPcaMomentsJob]]):
    * (i, j, s) rows where (-1, -1) carries the count, (i, -1) the
    * per-dim sums, and (i ≤ j) the packed upper Gram entries. Moments
    * are sums over rows, so per-batch rows are a pure function of the
    * batch and fold by addition — the same mergeable-state property
    * the vocabulary and bigram streams exploit, here for second-order
    * statistics. One `mapPartitions` accumulator pass + a d²-bounded
    * batch-local sum.
    */
  private[graft] def momentRows(embs: DataFrame): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    embs.select("embedding").rdd.mapPartitions { it =>
      var n = 0L
      var sums: Array[Double] = null
      var gram: Array[Double] = null
      var d = 0
      it.foreach { r =>
        val v = r.getSeq[Float](0)
        if (sums == null) { d = v.length; sums = new Array[Double](d); gram = new Array[Double](d * (d + 1) / 2) }
        n += 1
        var i = 0; var k = 0
        while (i < d) {
          val xi = v(i).toDouble
          sums(i) += xi
          var j = i
          while (j < d) { gram(k) += xi * v(j).toDouble; j += 1; k += 1 }
          i += 1
        }
      }
      if (n == 0) Iterator.empty
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Double)]
        out += ((-1, -1, n.toDouble))
        var i = 0; var k = 0
        while (i < d) {
          out += ((i, -1, sums(i)))
          var j = i
          while (j < d) { out += ((i, j, gram(k))); j += 1; k += 1 }
          i += 1
        }
        out.iterator
      }
    }.toDF("i", "j", "s")
      .groupBy("i", "j").agg(sum(col("s")).as("s"))
  }

  /** Inverse of [[momentRows]]' encoding: collected (i, j, s) rows —
    * d²-bounded by construction — back to (mean, cov, n). */
  private[graft] def momentsOf(rows: Array[(Int, Int, Double)]): (Array[Double], Array[Array[Double]], Long) = {
    val n = rows.collectFirst { case (-1, -1, s) => s.toLong }
      .getOrElse(throw new IllegalStateException("moment rows carry no count"))
    val d = rows.iterator.map(_._1).max + 1
    val mean = new Array[Double](d)
    rows.foreach { case (i, -1, s) if i >= 0 => mean(i) = s / n; case _ => () }
    val cov = Array.ofDim[Double](d, d)
    rows.foreach {
      case (i, j, s) if i >= 0 && j >= 0 =>
        val c = s / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
      case _ => ()
    }
    (mean, cov, n)
  }

  /** Eigen-decomposition of a symmetric matrix by cyclic Jacobi
    * rotations — deterministic (fixed (p,q) sweep order, convergence on
    * off-diagonal Frobenius mass), O(d³) per sweep on a d×d DRIVER
    * matrix. Returns (eigenvalues, eigenvectors as rows) sorted by
    * eigenvalue descending, each vector sign-canonicalized so its
    * largest-magnitude component is positive.
    */
  private[graft] def jacobiEigen(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0; var i = 0
      while (i < d) { var j = i + 1; while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    var sweep = 0
    while (off() > 1e-18 && sweep < 100) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (math.abs(theta) > 1e150) 1.0 / (2.0 * theta) // θ² would overflow
              else {
                val sg = if (theta >= 0.0) 1.0 else -1.0
                sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
              }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < d) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { ci =>
      val col = Array.tabulate(d)(r => v(r)(ci))
      val mi = col.indices.maxBy(i => (math.abs(col(i)), -i))
      if (col(mi) < 0) col.map(-_) else col
    }.toArray
    (vals, vecs)
  }

  private[graft] def cachedEigen(spark: SparkSession, dir: String): (Array[Double], Array[Array[Double]], Array[Double], Long) =
    graft.SessionCache.getOrElseUpdate(spark, ("pca_eigen", dir)) {
      val (mean, cov, n) = cachedMoments(spark, dir)
      val (vals, vecs) = jacobiEigen(cov)
      (vals, vecs, mean, n)
    }

  /** Driver face: the top-`q` principal components' spectrum —
    * (pc, eigenvalue, explained_ratio, cum_ratio), 6-dp rounded.
    * Deterministic (eigenvalues are basis-independent; the sign
    * canonicalization never touches them) but not SQL-expressible, so
    * rows-only with the spectral invariants spec-held.
    */
  def pcaSpectrum(spark: SparkSession, dir: String, q: Int = 8): DataFrame =
    spectrumFrom(spark, cachedEigen(spark, dir)._1, q)

  /** Spectrum table from an eigenvalue vector — shared by the batch
    * face above and the streaming read face. */
  private[graft] def spectrumFrom(spark: SparkSession, vals: Array[Double], q: Int): DataFrame = {
    val trace = vals.sum
    val rows = vals.take(q).zipWithIndex.scanLeft((0, 0.0, 0.0, 0.0)) {
      case ((_, _, _, cum), (l, i)) => (i, l, l / trace, cum + l / trace)
    }.drop(1).map { case (i, l, r, c) =>
      (i, BigDecimal(l).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    import spark.implicits._
    rows.toSeq.toDF("pc", "eigenvalue", "explained_ratio", "cum_ratio")
  }

  /** Projection of every embedding onto the top-`q` components —
    * declarative and fully distributed: the centered coordinates
    * explode to (vec_id, dim, x−μ), the broadcast component table
    * joins on dim, and scores partially aggregate per (vec_id, pc).
    * The d× row amplification stays inside map-side partial aggs; no
    * driver-side corpus work.
    */
  def pcaProject(spark: SparkSession, dir: String, q: Int = 8): DataFrame = {
    val (_, vecs, mean, _) = cachedEigen(spark, dir)
    val comps = vecs.take(q).zipWithIndex.flatMap { case (vrow, pc) =>
      vrow.zipWithIndex.map { case (w, dim) => (pc, dim, w) }
    }
    import spark.implicits._
    val compDf = comps.toSeq.toDF("pc", "dim", "w")
    val meanDf = mean.zipWithIndex.map { case (m, dim) => (dim, m) }.toSeq.toDF("dim", "mu")
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .join(broadcast(meanDf), "dim")
      .join(broadcast(compDf), "dim")
      .groupBy("vec_id", "pc")
      .agg(sum((col("x").cast("double") - col("mu")) * col("w")).as("score"))
  }
}
