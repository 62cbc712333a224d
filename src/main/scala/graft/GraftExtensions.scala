package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{FloatVecCosine, FloatVecL2Sq, SimHash64}

/** SparkSessionExtensions entry point: exposes graft's native codegen'd
  * expressions to SQL users.
  *
  * Production: `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)` on the builder) makes
  * `vec_cosine(a, b)` / `vec_l2sq(a, b)` available in every session of
  * the application. [[GraftExtensions.register]] injects the same
  * functions into an already-running session (specs, notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.descriptors.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {
  private type Builder = Seq[Expression] => Expression

  private def binary(name: String, clazz: Class[_], make: (Expression, Expression) => Expression)
      : (FunctionIdentifier, ExpressionInfo, Builder) =
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"$name expects 2 arguments, got ${args.length}")
        make(args(0), args(1))
      })

  private def unary(name: String, clazz: Class[_], make: Expression => Expression)
      : (FunctionIdentifier, ExpressionInfo, Builder) =
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"$name expects 1 argument, got ${args.length}")
        make(args(0))
      })

  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    binary("vec_cosine", classOf[FloatVecCosine], FloatVecCosine(_, _)),
    binary("vec_l2sq", classOf[FloatVecL2Sq], FloatVecL2Sq(_, _)),
    unary("simhash64", classOf[SimHash64], SimHash64(_)),
    // minhash_bands(hashes): the engine's standard 64-hash/4-row LSH
    // banding (same coefficients as the Dedup pipeline, so SQL users
    // band-join compatibly against indexes it persisted)
    unary("minhash_bands", classOf[graft.functions.MinHashBands],
      graft.functions.MinHashBands(_,
        graft.dedup.Dedup.minhashA.toIndexedSeq, graft.dedup.Dedup.minhashB.toIndexedSeq,
        graft.dedup.Dedup.MinhashPrime, graft.dedup.Dedup.BandRows)))

  /** Register the functions on an existing session's registry. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (ident, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(ident.funcName, builder, "built-in")
    }

  /** Driver face for the SQL surface itself — the path a spark-sql /
    * notebook user takes: [[register]] injects the native expressions
    * into the live session's registry, the embeddings table registers
    * as a view, and the query text below runs through the PARSER (not
    * the DataFrame DSL), so name resolution → builder arity → codegen
    * all execute exactly as they would for an external SQL user. The
    * oracle recomputes both scores relationally in DuckDB, hash-
    * certifying the registered `vec_cosine` / `vec_l2sq` against an
    * independent engine's list arithmetic.
    */
  def sqlSurface(spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    register(spark)
    Tables.embeddings(spark, dir).createOrReplaceTempView("graft_embeddings")
    spark.sql(
      """SELECT a.vec_id,
        |  round(vec_cosine(a.embedding, b.embedding), 4) AS cos_q,
        |  round(vec_l2sq(a.embedding, b.embedding), 4) AS l2sq_q
        |FROM graft_embeddings a JOIN graft_embeddings b ON b.vec_id = 0
        |WHERE a.vec_id BETWEEN 1 AND 200
        |ORDER BY a.vec_id""".stripMargin)
  }

  val sqlSurfaceSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
      |SELECT e.vec_id,
      |  round(list_cosine_similarity(e.v, q.qv), 4) AS cos_q,
      |  round(list_sum(list_transform(list_zip(e.v, q.qv),
      |    p -> (p[1] - p[2]) * (p[1] - p[2]))), 4) AS l2sq_q
      |FROM e, q WHERE e.vec_id BETWEEN 1 AND 200
      |ORDER BY e.vec_id""".stripMargin
}
