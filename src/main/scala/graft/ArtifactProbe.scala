// scratch artifact-timing harness (not part of the driver contract):
// times the named Artifacts builders, in roster order, on one dir —
// the focused view of a bench artifact line without the full roster.
package graft
import org.apache.spark.sql.SparkSession

object ArtifactProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // codegen/JIT warmup on the smallest SF (the Bench discipline) so
    // the timed lines measure the engine, not janino/C2
    Artifacts.builders
      .filter { case (n, _) => names.isEmpty || names.contains(n) }
      .foreach { case (_, fn) =>
        try fn(spark, "/root/testdata/sf0.001") catch { case _: Throwable => () }
      }
    Artifacts.builders
      .filter { case (n, _) => names.isEmpty || names.contains(n) }
      .foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        fn(spark, dir)
        println(f"ARTIFACT $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    spark.stop()
  }
}
