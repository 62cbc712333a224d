package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path.
  *
  * The `zip_with`/`aggregate` formulations in [[VectorFunctions]] are
  * correct but evaluate interpreted (higher-order functions have no
  * codegen) and allocate a lambda frame per element — ~µs per pair.
  * These expressions emit a primitive fused loop via `doGenCode`, so
  * vector math stays inside whole-stage codegen with zero allocation.
  * Arithmetic (per-element double accumulation in ascending order)
  * matches the HOF versions bit-for-bit, so DuckDB oracles agree —
  * including NULL on dimension mismatch (zip_with null-pads to a null
  * aggregate; DuckDB errors): a truncated/corrupt vector must surface,
  * not score a plausible prefix.
  */
object VectorExpressions {

  private def expr(c: Column): Expression = GraftExpressionBridge.expression(c)

  /** cos(a, b) with a fused single-pass loop; 0.0 when either norm is 0. */
  def cosine(a: Column, b: Column): Column =
    GraftExpressionBridge.column(FloatVecCosine(expr(a), expr(b)))

  /** Squared euclidean distance, fused loop. */
  def l2sq(a: Column, b: Column): Column =
    GraftExpressionBridge.column(FloatVecL2Sq(expr(a), expr(b)))

  /** All `nTables` random-hyperplane signatures of `v` in one pass:
    * element t = the nBits-bit signature from planes
    * [t*nBits, (t+1)*nBits). `planes` is flat, plane-major, stride =
    * vector dim.
    */
  def hyperplaneSigs(v: Column, planes: Array[Double], nBits: Int, nTables: Int, dim: Int): Column =
    GraftExpressionBridge.column(HyperplaneSigs(expr(v), planes.toIndexedSeq, nBits, nTables, dim))

  /** PQ encode: per-subspace argmin over a flat codebook
    * (`books[(m*nCodes + j)*subDim + i]`), ties to the lowest code id.
    * One compact generated loop replaces nSub×nCodes inlined distance
    * expressions — the literal-expression form of the same encode blew
    * past the JVM's 64 KB method limit once composed with cell
    * assignment in one projection (IVF-PQ), throwing the whole stage
    * back to interpreted execution.
    */
  def pqEncodeCodes(v: Column, books: Array[Double], nSub: Int, nCodes: Int, subDim: Int): Column =
    GraftExpressionBridge.column(PqEncodeCodes(expr(v), books.toIndexedSeq, nSub, nCodes, subDim))
}

private[functions] trait VecArrayExpr { self: Expression =>
  protected def isFloatArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  protected def checkArrTypes(es: Seq[Expression]): TypeCheckResult =
    if (es.forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double> args, got ${es.map(_.dataType.sql).mkString(", ")}")
  /** Java source reading element `i` of `arr` as double. */
  protected def getJ(arr: String, isFloat: Boolean, i: String): String =
    if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
  protected def getS(a: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
}

case class FloatVecCosine(left: Expression, right: Expression)
    extends BinaryExpression with VecArrayExpr {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine"
  // NULL on dimension mismatch (the HOF zip_with and DuckDB both refuse
  // mismatched lengths) — silently scoring a truncated prefix would
  // mask corrupt embeddings with a plausible number
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = checkArrTypes(Seq(left, right))
  private lazy val lf = isFloatArr(left)
  private lazy val rf = isFloatArr(right)

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = getS(a, lf, i); val y = getS(b, rf, i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x")
      val y = ctx.freshName("y"); val den = ctx.freshName("den")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = $a.numElements();
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $x = ${getJ(a, lf, i)};
         |    final double $y = ${getJ(b, rf, i)};
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  final double $den = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  ${ev.value} = ($den == 0.0) ? 0.0 : ($dot / $den);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class FloatVecL2Sq(left: Expression, right: Expression)
    extends BinaryExpression with VecArrayExpr {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_l2sq"
  // NULL on dimension mismatch — see FloatVecCosine
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = checkArrTypes(Seq(left, right))
  private lazy val lf = isFloatArr(left)
  private lazy val rf = isFloatArr(right)

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    var acc = 0.0; var i = 0
    while (i < n) {
      val d = getS(a, lf, i) - getS(b, rf, i); acc += d * d; i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $d = ${getJ(a, lf, i)} - ${getJ(b, rf, i)};
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** All multi-table random-hyperplane LSH signatures in one fused pass
  * over the vector: output[t] packs nBits sign bits of v·plane. One
  * expression evaluation replaces nTables×nBits interpreted
  * aggregate/zip_with dot products.
  */
case class HyperplaneSigs(child: Expression, planes: IndexedSeq[Double],
                          nBits: Int, nTables: Int, dim: Int)
    extends UnaryExpression with VecArrayExpr {
  require(planes.length == nBits * nTables * dim,
    s"planes length ${planes.length} != $nBits*$nTables*$dim")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_sigs"
  override def checkInputDataTypes(): TypeCheckResult = checkArrTypes(Seq(child))
  private lazy val cf = isFloatArr(child)
  // planes is an IndexedSeq (structural equality — two expressions
  // built from equal plane values canonicalize/unify in the plan, which
  // an Array field's reference equality would prevent); the hot loops
  // read this primitive mirror
  @transient private lazy val planesArr: Array[Double] = planes.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val sigs = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var sig = 0L; var b = 0
      while (b < nBits) {
        val off = (t * nBits + b) * dim
        var dot = 0.0; var i = 0
        while (i < n) { dot += getS(v, cf, i) * planesArr(off + i); i += 1 }
        if (dot >= 0) sig |= (1L << b)
        b += 1
      }
      sigs(t) = sig
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("planes", planesArr, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n"); val sigs = ctx.freshName("sigs")
      val t = ctx.freshName("t"); val b = ctx.freshName("b")
      val off = ctx.freshName("off"); val dot = ctx.freshName("dot")
      val i = ctx.freshName("i"); val sig = ctx.freshName("sig")
      s"""
         |final int $n = java.lang.Math.min($v.numElements(), $dim);
         |final long[] $sigs = new long[$nTables];
         |for (int $t = 0; $t < $nTables; $t++) {
         |  long $sig = 0L;
         |  for (int $b = 0; $b < $nBits; $b++) {
         |    final int $off = ($t * $nBits + $b) * $dim;
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $dot += ${getJ(v, cf, i)} * $pRef[$off + $i];
         |    }
         |    if ($dot >= 0) $sig |= (1L << $b);
         |  }
         |  $sigs[$t] = $sig;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sigs);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Product-quantization encode: code m = argmin_j ‖v[m·subDim ..] −
  * books[m][j]‖² with ties to the lowest j (exactly the struct<d,j> +
  * array_min lexicographic rule the literal-expression form used, so
  * the swap is plan-for-plan value-identical). Output: array<int> of
  * nSub codes; NULL when the vector is shorter than nSub·subDim (a
  * truncated embedding must surface, not encode a prefix).
  */
case class PqEncodeCodes(child: Expression, books: IndexedSeq[Double],
                         nSub: Int, nCodes: Int, subDim: Int)
    extends UnaryExpression with VecArrayExpr {
  require(books.length == nSub * nCodes * subDim,
    s"books length ${books.length} != $nSub*$nCodes*$subDim")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = checkArrTypes(Seq(child))
  private lazy val cf = isFloatArr(child)
  @transient private lazy val booksArr: Array[Double] = books.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() < nSub * subDim) return null
    val codes = new Array[Int](nSub)
    var m = 0
    while (m < nSub) {
      var best = 0; var bestD = Double.MaxValue; var j = 0
      while (j < nCodes) {
        val off = (m * nCodes + j) * subDim
        var d = 0.0; var i = 0
        while (i < subDim) {
          val t = getS(v, cf, m * subDim + i) - booksArr(off + i); d += t * t; i += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      codes(m) = best
      m += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("books", booksArr, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val codes = ctx.freshName("codes"); val m = ctx.freshName("m")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val off = ctx.freshName("off"); val d = ctx.freshName("d")
      val t = ctx.freshName("t"); val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |if ($v.numElements() < ${nSub * subDim}) {
         |  ${ev.isNull} = true;
         |} else {
         |  final int[] $codes = new int[$nSub];
         |  for (int $m = 0; $m < $nSub; $m++) {
         |    int $best = 0; double $bestD = Double.MAX_VALUE;
         |    for (int $j = 0; $j < $nCodes; $j++) {
         |      final int $off = ($m * $nCodes + $j) * $subDim;
         |      double $d = 0.0;
         |      for (int $i = 0; $i < $subDim; $i++) {
         |        final double $t = ${getJ(v, cf, s"$m * $subDim + $i")} - $bRef[$off + $i];
         |        $d += $t * $t;
         |      }
         |      if ($d < $bestD) { $bestD = $d; $best = $j; }
         |    }
         |    $codes[$m] = $best;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
