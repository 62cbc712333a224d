// scratch full-plan dump harness (not part of the driver contract):
// writes the COMPLETE `.explain("formatted")` output of named plan
// faces to plans/r17/<name>_<tag>.txt. Entry names resolve through
// SparkEntry.queries; internal build faces (the generation chains the
// memoized dir entries hide behind their checkpoints) resolve through
// the `faces` table below.
package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

object PlanDumpFull {

  /** Unmemoized generation-plan faces — what the bench artifact lines
    * actually execute (the driver entries read their checkpoints).
    */
  private def faces(spark: SparkSession, dir: String): Map[String, () => DataFrame] = {
    val docs = () => Tables.documents(spark, dir)
    Map(
      // the generic docs-plans ARE the pre-r17 dir-face build shapes
      // (the dir faces only added the memoizing checkpoint)
      "build_jaccard_generic" -> (() => dedup.Dedup.ngramJaccardPairs(docs())),
      "build_containment_generic" -> (() => dedup.Dedup.ngramContainmentPairs(docs())),
      "build_sn_generic" -> (() => dedup.Dedup.sortedNeighborhood(docs())),
      // the r17 shared/rerouted build chains
      "build_pair_scores" -> (() => dedup.Dedup.pairScoresPlan(spark, dir)),
      "build_sn_dir" -> (() => dedup.Dedup.snPairsDir(spark, dir)),
      "build_ppjoin_dir" -> (() => dedup.Dedup.ppjoinPairs(spark, dir, 0.5, dedup.Dedup.MaxShingleDf)),
      "build_walks" -> (() => queries.Graph.randomWalks(spark, dir)))
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val tag = args(1)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val f = faces(spark, dir)
    Files.createDirectories(Paths.get("plans/r17"))
    args.drop(2).foreach { name =>
      val df = f.get(name).map(_.apply())
        .getOrElse(SparkEntry.queries(name)(spark, dir))
      val out = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.write(Paths.get(s"plans/r17/${name}_$tag.txt"),
        out.getBytes("UTF-8"))
      println(s"WROTE plans/r17/${name}_$tag.txt")
    }
    spark.stop()
  }
}
