package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorFunctions

class ExtensionsSpec extends AnyFunSuite with SparkSpec {

  test("vec_cosine / vec_l2sq are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT
        |  vec_cosine(array(1.0D, 0.0D, 0.0D), array(1.0D, 0.0D, 0.0D)) AS self,
        |  vec_cosine(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS orth,
        |  vec_cosine(array(0.0D, 0.0D), array(1.0D, 1.0D)) AS zero,
        |  vec_l2sq(array(1.0D, 2.0D), array(4.0D, 6.0D)) AS d2
        |""".stripMargin).head()
    assert(row.getDouble(0) === 1.0)
    assert(row.getDouble(1) === 0.0)
    assert(row.getDouble(2) === 0.0) // zero-norm guard, not NaN
    assert(row.getDouble(3) === 25.0)
  }

  test("SQL function agrees with the Column API on real embeddings") {
    GraftExtensions.register(spark)
    val embs = Tables.embeddings(spark, sfDir).limit(50).cache()
    val viaSql = embs.createOrReplaceTempView("e50")
    val sqlSum = spark.sql(
      "SELECT round(sum(vec_cosine(a.embedding, b.embedding)), 6) AS s " +
        "FROM e50 a JOIN e50 b ON a.vec_id < b.vec_id").head().getDouble(0)
    val apiSum = embs.as("a").join(embs.as("b"), col("a.vec_id") < col("b.vec_id"))
      .agg(round(sum(VectorFunctions.cosine(col("a.embedding"), col("b.embedding"))), 6))
      .head().getDouble(0)
    assert(sqlSum === apiSum)
    embs.unpersist()
  }

  test("dimension mismatch yields NULL, not a truncated-prefix score") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT vec_cosine(array(1.0D, 2.0D, 3.0D), array(1.0D, 2.0D)) AS c,
        |       vec_l2sq(array(1.0D, 2.0D, 3.0D), array(1.0D, 2.0D)) AS d
        |""".stripMargin).head()
    assert(row.isNullAt(0), "cosine over mismatched dims must be NULL")
    assert(row.isNullAt(1), "l2sq over mismatched dims must be NULL")
    // and the interpreted (non-codegen) path agrees
    import spark.implicits._
    val df = Seq((Array(1f, 2f, 3f), Array(1f, 2f))).toDF("a", "b")
    assert(df.select(VectorFunctions.cosine(col("a"), col("b"))).head().isNullAt(0))
  }

  test("wrong arity is rejected with a clear error") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT vec_cosine(array(1.0D))").head()
    }
    assert(e.getMessage.contains("2 arguments"))
  }
}
