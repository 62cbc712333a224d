// scratch timing harness (not committed)
package graft
import org.apache.spark.sql.SparkSession
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0); val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm codegen once
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
    val trials = args.lift(2).map(_.toInt).getOrElse(3)
    (1 to trials).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      println(f"TIMING $name trial$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
