// scratch plan-audit harness (not part of the driver contract)
package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      println(s"==== $name ====")
      println(df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        .linesIterator.filter(l => l.contains("Scan parquet") ||
          l.contains("PushedFilters") || l.contains("ReadSchema") ||
          l.contains("Exchange") || l.contains("Filter")).mkString("\n"))
    }
    spark.stop()
  }
}
