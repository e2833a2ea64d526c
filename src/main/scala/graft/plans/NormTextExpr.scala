package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused CCNet-style text normalization — single-pass native
  * replacement for `TextDedup.normalizedText`'s declarative chain
  *
  *   trim(regexp_replace(regexp_replace(lower(text),
  *        "[^a-z0-9\\s]", ""), "\\s+", " "))
  *
  * which round-17 sf100 measurement put at 280 s for
  * `dedup_exact_normalized` (16 GB corpus, two full regex passes +
  * Unicode lower + trim per document, all feeding one md5/groupBy).
  * The fused pass emits each kept byte exactly once (~1-2 us/KB):
  * ASCII A-Z lower in place, [a-z0-9] kept, whitespace runs collapse
  * to a single ' ' between kept segments (leading/trailing runs drop,
  * which IS the trim), everything else deleted.
  *
  * Exactness argument (GraftExtensionsSpec pins it against the
  * declarative chain on adversarial strings): Java regex `\s` is the
  * six ASCII whitespace chars, and `[^a-z0-9\s]` deletes every other
  * code point, so on pure-ASCII input the computation is per-byte.
  * After the delete+collapse steps the string's edges can only be the
  * collapsed ' ', so `trim` (which strips 0x20) equals dropping
  * edge runs. The ONLY subtlety is `lower()`: Unicode lowercasing can
  * map non-ASCII code points INTO [a-z0-9] (U+212A KELVIN SIGN lowers
  * to 'k'), so any row containing a non-ASCII byte takes the reference
  * path — the same `UTF8String.toLowerCase` + Java-regex chain the
  * built-ins run. Corpus text is ASCII, so the fast path is the
  * production path; the fallback keeps the law airtight on arbitrary
  * input. The DuckDB oracle keeps the independent regex formulation,
  * so the hash gate cross-checks every group.
  */
case class NormTextExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_norm_text requires a string input, got $other")
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "graft_norm_text"

  override protected def nullSafeEval(input: Any): Any =
    NormTextExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = NormTextExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $cls.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): NormTextExpr =
    copy(child = newChild)
}

object NormTextExpr {

  // Java regex \s — exactly these six ASCII chars
  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  def compute(s: UTF8String): UTF8String = {
    val len = s.numBytes
    val out = new Array[Byte](len)
    var o = 0
    var pendingSpace = false
    var i = 0
    while (i < len) {
      val b = s.getByte(i)
      if (b < 0) return computeSlow(s) // non-ASCII: reference path
      val low: Int =
        if (b >= 'A' && b <= 'Z') b + 32
        else b.toInt
      if ((low >= 'a' && low <= 'z') || (low >= '0' && low <= '9')) {
        if (pendingSpace && o > 0) { out(o) = ' '; o += 1 }
        pendingSpace = false
        out(o) = low.toByte; o += 1
      } else if (isSpace(b)) {
        pendingSpace = true
      }
      // every other ASCII char: deleted (matches [^a-z0-9\s])
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }

  /** Reference path for rows with non-ASCII bytes: the SAME Unicode
    * lowering the built-in lower() runs, then the same Java-regex
    * replaces. After the collapse the edges can only be ' ', so
    * String.trim (which strips <= 0x20) equals Spark's trim here. */
  private def computeSlow(s: UTF8String): UTF8String =
    UTF8String.fromString(
      s.toLowerCase.toString
        .replaceAll("[^a-z0-9\\s]", "")
        .replaceAll("\\s+", " ")
        .trim)
}
