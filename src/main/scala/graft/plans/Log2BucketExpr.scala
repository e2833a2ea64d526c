package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native Catalyst expression: the adaptive quantile sketch's log-bucket
  * key (ops.QuantileSketch.logBucket). HDR-Histogram-style base-2
  * scheme (public: Tene's HdrHistogram; DDSketch, Masson et al. VLDB
  * 2019, is the log-gamma sibling): octave = the value's IEEE binary
  * exponent clamped to [-64, 64], 16 linear subbuckets per octave, sign
  * mirrored, zero its own bucket. Relative bucket width <= 1/16, so a
  * quantile readout from the bucket's upper edge is within 6.25%
  * relative error of the bracketed order statistic — with NO [lo, hi)
  * domain pre-pass, which is what makes it a one-pass batch face and an
  * unknown-domain STREAMING face.
  *
  * Why a custom expression and not log2()+floor(): the key must be
  * bit-identical in Spark and the DuckDB oracle (the hash gate compares
  * exact output). Transcendental log implementations differ in the last
  * ulp between engines, and one ulp at an octave boundary flips the
  * bucket. `Math.getExponent` / `Math.scalb` are EXACT exponent-field
  * operations (no rounding ever), and the oracle mirrors them with a
  * doubling-CTE power table and power-of-two divisions — every step
  * IEEE-exact in both engines.
  *
  * Key layout (positive v): (clamp(exponent, -64, 64) + 65) * 16 +
  * clamp(floor((scalb(v, -e) - 1) * 16), 0, 15) + 1 — ascending in v,
  * range [17, 2080]; negative v maps to the negated key of |v| (still
  * ascending in v); 0 -> 0. Out-of-range magnitudes saturate into the
  * edge buckets (|v| < 2^-64 -> 17, |v| >= 2^65 -> 2080), so state is
  * HARD-bounded at 2 * 2064 + 1 keys per group; NaN saturates into the
  * top octave deterministically. */
case class Log2BucketExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_logbucket requires a double input, got $other")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_logbucket"

  override protected def nullSafeEval(input: Any): Any =
    Log2BucketExpr.compute(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Log2BucketExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $cls.compute($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Log2BucketExpr =
    copy(child = newChild)
}

object Log2BucketExpr {
  /** Subbuckets per octave (power of two: (sub+1)/16 and the octave
    * edge products stay IEEE-exact). */
  val SubBuckets = 16
  /** Clamped octave range — [2^-64, 2^65) covers every realistic
    * metric domain; outside saturates. */
  val ExpLo = -64
  val ExpHi = 64

  def compute(v: Double): Long =
    if (v == 0.0) 0L
    else if (v < 0.0) -positiveKey(-v)
    else positiveKey(v)

  private def positiveKey(v: Double): Long = {
    var e = java.lang.Math.getExponent(v) // exact; subnormal -> -1023
    if (e < ExpLo) e = ExpLo else if (e > ExpHi) e = ExpHi
    val frac = java.lang.Math.scalb(v, -e) // exact: exponent shift
    var sub = java.lang.Math.floor((frac - 1.0) * SubBuckets).toLong
    if (sub < 0L) sub = 0L
    else if (sub >= SubBuckets) sub = SubBuckets - 1L
    (e - ExpLo + 1).toLong * SubBuckets + sub + 1L
  }

  /** Upper edge of a bucket key in the VALUE domain (the quantile
    * readout point): ascending in key, exact dyadic arithmetic. For a
    * negative key this is the edge closer to zero — still the upper
    * edge of the value interval. */
  def upperEdge(key: Long): Double =
    if (key == 0L) 0.0
    else if (key < 0L) -lowerEdgeAbs(-key)
    else upperEdgeAbs(key)

  private def upperEdgeAbs(k: Long): Double = {
    val i = k - 1L
    val e = (i / SubBuckets).toInt + ExpLo - 1
    val sub = (i % SubBuckets).toDouble
    java.lang.Math.scalb(1.0 + (sub + 1.0) / SubBuckets, e)
  }

  private def lowerEdgeAbs(k: Long): Double = {
    val i = k - 1L
    val e = (i / SubBuckets).toInt + ExpLo - 1
    val sub = (i % SubBuckets).toDouble
    java.lang.Math.scalb(1.0 + sub / SubBuckets, e)
  }
}

/** Companion expression: decode a log-bucket key back to its value-domain
  * upper edge (`Log2BucketExpr.upperEdge`) — the readout side of the
  * adaptive sketch, kept plan-side so the batch face never collects. */
case class Log2BucketEdgeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_logbucket_edge requires a long input, got $other")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_logbucket_edge"

  override protected def nullSafeEval(input: Any): Any =
    Log2BucketExpr.upperEdge(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = Log2BucketExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $cls.upperEdge($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Log2BucketEdgeExpr =
    copy(child = newChild)
}
