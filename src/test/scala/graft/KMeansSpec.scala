package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.similarity.KMeans

/** Lloyd's k-means: the distributed pipeline must land on exactly the
  * assignment a literal driver-side replay of the algorithm produces
  * (same seeds, same iteration count, same 6-dp centroid
  * quantization), and the per-iteration plan must keep the centroid
  * side broadcast.
  */
class KMeansSpec extends AnyFunSuite with SparkSpec {

  private def replay(vecs: Array[(Long, Array[Double])])
      : (Map[Long, Int], Map[Long, Double]) = {
    val q6 = (x: Double) => BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var cents: Seq[(Int, Array[Double])] = vecs.sortBy(_._1).take(KMeans.K)
      .zipWithIndex.map { case ((_, v), i) => (i, v.map(q6)) }
    def l2sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    def assignAll(): Map[Long, (Int, Double)] = vecs.map { case (id, v) =>
      val (d, c) = cents.map { case (cid, m) => (l2sq(v, m), cid) }.min
      id -> ((c, d))
    }.toMap
    for (_ <- 1 to KMeans.Iters) {
      val a = assignAll()
      cents = a.groupBy(_._2._1).toSeq.sortBy(_._1).map { case (c, members) =>
        val vs = members.keys.toSeq.sorted.map(id => vecs.find(_._1 == id).get._2)
        val dim = vs.head.length
        (c, Array.tabulate(dim)(d => q6(vs.map(_(d)).sum / vs.length)))
      }
    }
    val fin = assignAll()
    (fin.map { case (id, (c, _)) => id -> c },
      fin.map { case (id, (_, d)) => id -> d })
  }

  test("distributed k-means equals a literal driver-side replay") {
    val out = KMeans.embeddingKmeans(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    val (wantC, wantD) = replay(vecs)
    assert(out.length === vecs.length)
    out.foreach { case (id, c, d) =>
      assert(c === wantC(id), s"vec $id assigned to $c, replay says ${wantC(id)}")
      // d is the 4-dp rounded pipeline output; the replay keeps full precision
      assert(math.abs(d - wantD(id)) < 1e-4, s"vec $id dist $d vs ${wantD(id)}")
    }
    // a useful clustering: more than one cluster survives
    assert(out.map(_._2).distinct.length > 1)
  }

  test("outlier z-scores equal a literal recompute over the assignment") {
    def q(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val asg = KMeans.cachedAssignment(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val stats = asg.groupBy(_._2).map { case (cid, members) =>
      val ds = members.map(_._3)
      val mu = q(ds.sum / ds.length, 6)
      val sigma = q(math.sqrt(
        math.max(ds.map(d => d * d).sum / ds.length - (ds.sum / ds.length) * (ds.sum / ds.length), 0.0)), 6)
      cid -> ((mu, sigma))
    }
    val out = KMeans.embeddingOutliers(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3), r.getInt(4)))
    assert(out.length === asg.length)
    out.foreach { case (id, cid, d, z, flag) =>
      val (mu, sigma) = stats(cid)
      val wantZ = if (sigma > 0) q((d - mu) / sigma, 4) else 0.0
      assert(math.abs(z - wantZ) < 1e-9, s"vec $id z $z vs replay $wantZ")
      assert(flag === (if (z >= KMeans.OutlierZ) 1 else 0), s"vec $id flag/z disagree")
    }
    // the z distribution is non-degenerate: spread exists on both sides of the mean
    assert(out.exists(_._4 > 0) && out.exists(_._4 < 0))
  }

  test("outlier stats stay a broadcast join over the memoized assignment") {
    val p = KMeans.embeddingOutliers(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"k-row stats must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no shuffle join:\n$p")
  }

  test("assignment broadcasts the centroid table and argmin partially aggregates") {
    // the driver face memoizes behind a localCheckpoint, so inspect the
    // un-materialized pipeline directly
    val emb = KMeans.widen(Tables.embeddings(spark, sfDir)).localCheckpoint(true)
    val p = KMeans.assign(emb, KMeans.train(emb))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"centroids must be the broadcast side:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"no shuffle join in the assignment path:\n$p")
    assert(p.contains("partial_min"), s"argmin must combine map-side:\n$p")
  }
}
