package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.similarity.Pca

/** Spectral invariants that pin the PCA pass without an SQL oracle:
  * the distributed moment pass must equal a declarative recompute, the
  * eigensolve must actually decompose the covariance, and the
  * projection face must carry exactly the variance the spectrum says
  * it carries (Eckart–Young equality).
  */
class PcaSpec extends AnyFunSuite with SparkSpec {

  private lazy val (vals, vecs, mean, n) = Pca.cachedEigen(spark, sfDir)
  private lazy val (_, cov, _) = Pca.cachedMoments(spark, sfDir)
  private val d = 64

  test("distributed moment pass equals a declarative exploded recompute") {
    val x = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("vec_id"), col("dim"), col("x").cast("double").as("x"))
      .localCheckpoint(true)
    val pairs = x.as("a").join(x.as("b"), col("a.vec_id") === col("b.vec_id"))
      .groupBy(col("a.dim").as("i"), col("b.dim").as("j"))
      .agg((avg(col("a.x") * col("b.x")) -
        avg(col("a.x")) * avg(col("b.x"))).as("c"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    var maxErr = 0.0
    for (i <- 0 until d; j <- 0 until d)
      maxErr = math.max(maxErr, math.abs(cov(i)(j) - pairs((i, j))))
    assert(maxErr < 1e-9, s"moment pass diverges from declarative covariance: $maxErr")
    val means = x.groupBy().agg(count(lit(1))).head.getLong(0)
    assert(means == n * d, "moment count diverges")
  }

  test("eigenpairs decompose the covariance: Cov v = lambda v, orthonormal, trace-preserving") {
    // residual ||Cov v - lambda v|| for every pair
    for (k <- 0 until d) {
      var res = 0.0
      for (i <- 0 until d) {
        var cv = 0.0
        for (j <- 0 until d) cv += cov(i)(j) * vecs(k)(j)
        res = math.max(res, math.abs(cv - vals(k) * vecs(k)(i)))
      }
      assert(res < 1e-10, s"eigenpair $k residual $res")
    }
    for (a <- 0 until d; b <- a until d) {
      var dot = 0.0
      for (i <- 0 until d) dot += vecs(a)(i) * vecs(b)(i)
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-10, s"orthonormality broken at ($a,$b): $dot")
    }
    val trace = (0 until d).map(i => cov(i)(i)).sum
    assert(math.abs(vals.sum - trace) < 1e-10 * math.max(1.0, math.abs(trace)),
      s"eigenvalue sum ${vals.sum} != trace $trace")
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b - 1e-12 },
      "eigenvalues must be sorted descending")
  }

  test("spectrum face is consistent with the eigensolve and deterministic") {
    val rows = Pca.pcaSpectrum(spark, sfDir).collect()
    assert(rows.length == 8)
    val trace = vals.sum
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(0) == i)
      assert(math.abs(r.getDouble(1) - vals(i)) < 1e-6)
      assert(math.abs(r.getDouble(2) - vals(i) / trace) < 1e-6)
    }
    val again = Pca.pcaSpectrum(spark, sfDir).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("projection carries exactly the top-q variance (Eckart-Young equality)") {
    val q = 8
    val carried = Pca.pcaProject(spark, sfDir, q)
      .agg(sum(col("score") * col("score"))).head.getDouble(0) / n
    val want = vals.take(q).sum
    assert(math.abs(carried - want) < 1e-8 * math.max(1.0, want),
      s"projected variance $carried != top-q eigenvalue mass $want")
    // residual: E||x-mu||^2 minus carried mass equals the dropped tail
    import spark.implicits._
    val meanDf = mean.zipWithIndex.map { case (m, i) => (i, m) }.toSeq.toDF("dim", "mu")
    val total = Tables.embeddings(spark, sfDir)
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .join(broadcast(meanDf), Seq("dim"))
      .agg(sum((col("x").cast("double") - col("mu")) *
        (col("x").cast("double") - col("mu")))).head.getDouble(0) / n
    assert(math.abs((total - carried) - vals.drop(q).sum) < 1e-8 * math.max(1.0, total),
      s"residual ${total - carried} != dropped tail ${vals.drop(q).sum}")
  }

  test("dim stats variance equals the covariance diagonal") {
    val stats = Pca.dimStats(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getDouble(3))).toMap
    for (i <- 0 until d) {
      val want = BigDecimal(cov(i)(i)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(stats(i) - want) < 2e-6, s"dim $i: ${stats(i)} vs $want")
    }
  }
}
