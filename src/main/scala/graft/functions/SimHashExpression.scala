package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Kernel shared by interpreted eval and generated code (the generated
  * code calls it through a ctx reference object): 64-bit SimHash over a
  * token array. Token hash = the FIRST 8 BYTES of MD5(utf8), read
  * big-endian — the pair-family key discipline (SURVEY §2 #32i): md5
  * is the one 64-bit-quality hash BOTH engines expose, which is what
  * lets the DuckDB oracle reproduce the signature bits exactly
  * (`('0x' ¦¦ substr(md5(tok), 1, 16))::UBIGINT`) and certify the
  * whole near-dup entry instead of a rows-only check. Each bit votes
  * ±1; the sign of the vote sum sets the output bit (ties → 0).
  */
class SimHashKernel extends Serializable {
  // MessageDigest is stateful — one instance per executor thread
  @transient private lazy val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def tokenHash(bytes: Array[Byte]): Long = {
    val d = md5.get(); d.reset()
    val dig = d.digest(bytes)
    java.nio.ByteBuffer.wrap(dig, 0, 8).getLong // big-endian first half
  }

  def simhash64(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null && s.numBytes() > 0) {
        val h = tokenHash(s.getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L; var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }
}

/** Map-side SimHash: one fused pass over the token array per row — a
  * pure projection, replacing the explode → 64-conditional-sum groupBy
  * (which shuffled every token row). Empty-string tokens are ignored,
  * matching the declarative formulation's filter.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 expects array<string>, got ${t.sql}")
  }

  @transient private lazy val kernel = new SimHashKernel

  override protected def nullSafeEval(input: Any): Any =
    kernel.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("simhashKernel", new SimHashKernel,
      classOf[SimHashKernel].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $k.simhash64($arr);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHashExpression {
  def simhash64(tokens: Column): Column =
    GraftExpressionBridge.column(SimHash64(GraftExpressionBridge.expression(tokens)))
}
