package graft

import org.scalatest.funsuite.AnyFunSuite

class SchemaGateSpec extends AnyFunSuite with SparkSpec {

  test("gate is clean on the driver-generated testdata at every SF") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = SchemaGate.diffs(spark, s"/root/testdata/$sf")
      assert(d.isEmpty, s"$sf drifted:\n  ${d.mkString("\n  ")}")
    }
  }

  test("gate names (table, column, expected, actual) on a synthetic drift") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gate").toString
    // copy the real tables so only the planted drifts show up
    for (t <- Tables.all if t != "region")
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    // region with r_regionkey widened to bigint, r_name dropped, r_extra added
    Seq((1L, "x")).toDF("r_regionkey", "r_extra")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    val d = SchemaGate.diffs(spark, dir)
    assert(d.exists(l => l.contains("region.r_regionkey") &&
      l.contains("expected one of {int}") && l.contains("actual bigint")), d)
    assert(d.exists(l => l.contains("region.r_name") && l.contains("MISSING")), d)
    assert(d.exists(l => l.contains("region.r_extra") && l.contains("UNEXPECTED")), d)
    assert(d.size == 3, d)
  }

  test("a missing table reads as one UNREADABLE line, not an exception") {
    val d = SchemaGate.diffs(spark, "/tmp/graft-no-such-dir")
    assert(d.size == Tables.all.size)
    assert(d.forall(_.contains("UNREADABLE")), d)
  }
}
