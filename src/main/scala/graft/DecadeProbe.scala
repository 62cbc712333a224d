// scratch scale probe: the second measured decade (SURVEY §6, r17)
package graft
import org.apache.spark.sql.SparkSession

/** Times the most expensive sf1 entries at sf1 AND sf10 (100× the
  * bench SF) in one JVM — the r16 verdict's ask: the 100× story was
  * extrapolated from one measured decade (sf0.1→sf1); this pins the
  * slope over a second decade so each family's claimed exponent is
  * measured, not inferred. Shared substrates build first as their own
  * timed lines (the Bench artifact-attribution discipline); each entry
  * then runs twice and reports the min (marginal cost).
  *
  * Not part of the driver contract; a dev main:
  *   sbt "runMain graft.DecadeProbe [dirA] [dirB]"
  */
object DecadeProbe {
  private val artifacts = Seq(
    "graph_epochs" -> ((s: SparkSession, d: String) => { queries.Graph.cachedEpochPairs(s, d); () }),
    "graph_degree_state" -> ((s: SparkSession, d: String) => { queries.Graph.cachedDegreePrefix(s, d); () }),
    "graph_wpairs" -> ((s: SparkSession, d: String) => { queries.Graph.cachedWeightedPairs(s, d); () }),
    "graph_edges" -> ((s: SparkSession, d: String) => { queries.Graph.cachedGraph(s, d); () }),
    "dedup_containment_pairs" -> ((s: SparkSession, d: String) => dedup.Dedup.prewarmContainmentPairs(s, d)))

  // exact triangles LAST: its wedge-mass shuffle is the roster's one
  // documented disk-quadratic face (at 100x sf0.1 it overflows this
  // box's disk — a measured result, not a probe bug) and a mid-list
  // disk-full would poison every entry after it.
  private val entries = Seq(
    "graph_pagerank", "graph_ppr", "graph_hits", "graph_betweenness",
    "graph_cc_maintain", "graph_degree_maintain",
    "graph_triangles_approx", "dedup_containment_approx", "value_psi",
    "copurchase_pairs", "graph_triangles")

  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/repo/data/sf1", "/root/repo/data/sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    entries.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case e: Throwable => println(s"WARMFAIL $n: ${e.getMessage}") }
    }
    dirs.foreach { dir =>
      artifacts.foreach { case (label, fn) =>
        val t0 = System.nanoTime(); fn(spark, dir)
        println(f"PROBE $dir artifact:$label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      entries.foreach { n =>
        try {
          val ts = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            SparkEntry.queries(n)(spark, dir).count()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"PROBE $dir $n ${ts.min}%.2f s")
        } catch {
          // a DNF (disk-full wedge spill at 100x) is itself a probe
          // result; record it and keep the rest of the decade honest
          case e: Throwable =>
            println(s"PROBEFAIL $dir $n: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}")
        }
      }
    }
    spark.stop()
  }
}
