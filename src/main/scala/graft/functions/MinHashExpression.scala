package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.types._

/** Native MinHash banding: one fused pass over a doc's shingle-hash
  * array computes all K permutation minima AND the LSH band hashes.
  *
  * The HOF formulation ([[graft.dedup.Dedup.minhashFromHashes]] — K
  * `array_min(transform(...))` passes) evaluates interpreted with a
  * lambda frame per element per hash function: K×|shingles| allocations
  * per document, the dominant CPU cost of the whole LSH pipeline. This
  * expression runs the same affine-rehash minima ((a_k·x + b_k) mod p,
  * identical arithmetic) in a primitive loop inside whole-stage codegen
  * and folds the band hashing in (FNV-1a over each band's minima), so
  * the per-doc signature never materializes at all.
  *
  * Band hashes are engine-internal (candidates they generate are always
  * re-verified with exact Jaccard), so the mixer only needs uniformity,
  * not any specific published value.
  */
object MinHashExpression {
  private def expr(c: Column): Expression = GraftExpressionBridge.expression(c)

  /** FNV-1a 64-bit constants used for band mixing — public so the
    * persisted-index format digest can incorporate them.
    */
  val FnvOffset: Long = -3750763034362895579L
  val FnvPrime: Long = 1099511628211L

  /** Band hashes (`numHashes/bandRows` longs) of a 31-bit shingle-hash
    * array; a/b are the affine-permutation coefficients.
    */
  def minhashBandHashes(hashes: Column, a: IndexedSeq[Long], b: IndexedSeq[Long],
                        prime: Long, bandRows: Int): Column =
    GraftExpressionBridge.column(MinHashBands(expr(hashes), a, b, prime, bandRows))

  /** The RAW K permutation minima (no band mixing) — the certification-
    * mode face: the md5-banded oracle twin needs the minima themselves
    * so an external engine can replay the banding with a published hash
    * (md5) instead of the internal FNV kernel. Same fused primitive
    * loop as [[minhashBandHashes]] (the K interpreted HOF passes it
    * replaces were the dominant cost of the md5 twin — 16 s of its
    * first sf0.1 pin).
    */
  def minhashMins(hashes: Column, a: IndexedSeq[Long], b: IndexedSeq[Long],
                  prime: Long): Column =
    GraftExpressionBridge.column(MinHashMins(expr(hashes), a, b, prime))
}

/** See [[MinHashExpression.minhashBandHashes]]. `a`/`b` are IndexedSeq
  * for structural equality (expression canonicalization), mirrored into
  * primitive arrays for the hot loop.
  */
case class MinHashBands(child: Expression, a: IndexedSeq[Long], b: IndexedSeq[Long],
                        prime: Long, bandRows: Int) extends UnaryExpression {
  require(a.length == b.length && a.nonEmpty && a.length % bandRows == 0,
    s"coefficient arrays must be equal-length and a multiple of bandRows=$bandRows")
  private val numHashes = a.length
  private val numBands = numHashes / bandRows

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${t.sql}")
  }

  @transient private lazy val aArr: Array[Long] = a.toArray
  @transient private lazy val bArr: Array[Long] = b.toArray

  private val FnvOffset = MinHashExpression.FnvOffset
  private val FnvPrime = MinHashExpression.FnvPrime

  override protected def nullSafeEval(input: Any): Any = {
    val h = input.asInstanceOf[ArrayData]
    val n = h.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!h.isNullAt(i)) {
        val x = h.getLong(i)
        var k = 0
        while (k < numHashes) {
          val v = (aArr(k) * x + bArr(k)) % prime
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    val bands = new Array[Long](numBands)
    var t = 0
    while (t < numBands) {
      var acc = FnvOffset
      var r = 0
      while (r < bandRows) { acc = (acc ^ mins(t * bandRows + r)) * FnvPrime; r += 1 }
      bands(t) = acc
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(bands)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, h => {
      val n = ctx.freshName("n"); val mins = ctx.freshName("mins")
      val i = ctx.freshName("i"); val k = ctx.freshName("k")
      val x = ctx.freshName("x"); val v = ctx.freshName("v")
      val bands = ctx.freshName("bands"); val t = ctx.freshName("t")
      val r = ctx.freshName("r"); val acc = ctx.freshName("acc")
      s"""
         |final int $n = $h.numElements();
         |final long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$h.isNullAt($i)) {
         |    final long $x = $h.getLong($i);
         |    for (int $k = 0; $k < $numHashes; $k++) {
         |      final long $v = ($aRef[$k] * $x + $bRef[$k]) % ${prime}L;
         |      if ($v < $mins[$k]) $mins[$k] = $v;
         |    }
         |  }
         |}
         |final long[] $bands = new long[$numBands];
         |for (int $t = 0; $t < $numBands; $t++) {
         |  long $acc = ${FnvOffset}L;
         |  for (int $r = 0; $r < $bandRows; $r++) {
         |    $acc = ($acc ^ $mins[$t * $bandRows + $r]) * ${FnvPrime}L;
         |  }
         |  $bands[$t] = $acc;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($bands);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** See [[MinHashExpression.minhashMins]] — the minima loop of
  * [[MinHashBands]] without the band fold, identical affine arithmetic.
  */
case class MinHashMins(child: Expression, a: IndexedSeq[Long], b: IndexedSeq[Long],
                       prime: Long) extends UnaryExpression {
  require(a.length == b.length && a.nonEmpty,
    "coefficient arrays must be equal-length and non-empty")
  private val numHashes = a.length

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_mins"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${t.sql}")
  }

  @transient private lazy val aArr: Array[Long] = a.toArray
  @transient private lazy val bArr: Array[Long] = b.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val h = input.asInstanceOf[ArrayData]
    val n = h.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!h.isNullAt(i)) {
        val x = h.getLong(i)
        var k = 0
        while (k < numHashes) {
          val v = (aArr(k) * x + bArr(k)) % prime
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, h => {
      val n = ctx.freshName("n"); val mins = ctx.freshName("mins")
      val i = ctx.freshName("i"); val k = ctx.freshName("k")
      val x = ctx.freshName("x"); val v = ctx.freshName("v")
      s"""
         |final int $n = $h.numElements();
         |final long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$h.isNullAt($i)) {
         |    final long $x = $h.getLong($i);
         |    for (int $k = 0; $k < $numHashes; $k++) {
         |      final long $v = ($aRef[$k] * $x + $bRef[$k]) % ${prime}L;
         |      if ($v < $mins[$k]) $mins[$k] = $v;
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
