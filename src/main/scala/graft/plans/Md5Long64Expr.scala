package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the engine's portable 60-bit string hash
  * (TextHashing.md5Long) as one fused digest, bit-identical to the
  * composite formulation
  *   conv(substring(md5(s), 1, 15), 16, 10).cast("long")
  * — the first 15 hex chars of the md5 are the digest's first 60 bits,
  * i.e. (first 8 bytes as unsigned big-endian) >>> 4.
  *
  * Why it exists: the composite form materializes a 32-char hex string,
  * substrings it, and PARSES it back through conv per row — pure
  * allocation/parsing overhead on the hottest path of the dedup family
  * (one hash per shingle per document). This is the "custom Expression
  * beats the built-in chain" rung; values are unchanged, so every oracle
  * row stays green. */
case class Md5Long64Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_md5long requires a string input, got $other")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_md5long"

  override protected def nullSafeEval(input: Any): Any =
    Md5Long64Expr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Md5Long64Expr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $cls.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Long64Expr =
    copy(child = newChild)
}

object Md5Long64Expr {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(s) as a non-negative Long; called from
    * generated code. */
  def compute(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) {
      v = (v << 8) | (d(i) & 0xffL)
      i += 1
    }
    v >>> 4
  }
}
