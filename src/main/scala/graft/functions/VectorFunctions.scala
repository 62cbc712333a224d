package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * higher-order native functions (`zip_with`, `aggregate`) so the hot
  * path stays inside whole-stage codegen — no UDF serialization, no
  * Python round trips. All arithmetic in double.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ */
  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** cos(a, b) = a·b / (‖a‖‖b‖); 0 when either norm is 0.
    * Native codegen'd expression ([[VectorExpressions.cosine]]) with
    * arithmetic identical to the HOF formulation above.
    */
  def cosine(a: Column, b: Column): Column = VectorExpressions.cosine(a, b)

  /** Squared euclidean distance — native codegen'd fused loop. */
  def l2sq(a: Column, b: Column): Column = VectorExpressions.l2sq(a, b)

  /** Deterministic pseudo-random unit-ish hyperplanes (fixed seed) —
    * consumed by the fused native [[VectorExpressions.hyperplaneSigs]]
    * kernel (the interpreted per-plane formulation it replaced lived
    * here and was removed as dead code).
    */
  def makePlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }
}
